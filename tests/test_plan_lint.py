"""Whole-surface plan linter: structural red flags that would sink a
100 TB run must never appear in any registered query's physical plan.

- CartesianProduct — O(n*m) row explosion. The only tolerated
  nested-loop joins are broadcast ones over bounded query/dim sets
  (q27's 10-row query set), never CartesianProductExec.
- BatchEvalPython — row-at-a-time Python UDF (the slow path).
  Arrow-batched variants (ArrowEvalPython / MapInPandas /
  FlatMapGroupsInPandas) are the sanctioned Python boundary and remain
  allowed.
"""

from __future__ import annotations

import pytest

from salesanalytics_etl_spark.plans.registry import all_queries

# queries whose CONSTRUCTION runs driver-side work (eager caches, KMeans
# fit, iterative loops) — still linted, but they cost seconds, so they
# run against the tiniest SF only (which conftest's sf_dir already is)
ALL = sorted(all_queries())


@pytest.mark.parametrize("name", ALL)
def test_no_cartesian_or_rowwise_python(spark, sf_dir, name):
    df = all_queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BatchEvalPython" not in plan, (
        f"{name} uses a row-at-a-time Python UDF"
    )
