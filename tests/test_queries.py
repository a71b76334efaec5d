"""Oracle-differential tests for the full query surface (SURVEY.md §5.2).

Mirrors the driver's gate: each ``queries()`` entry vs its ``oracle_sql()``
twin on sf0.001, order-insensitive.
"""

from __future__ import annotations

import pytest

from salesanalytics_etl_spark.plans import all_oracles, all_queries
from tests.oracle_diff import compare

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    compare(df, ORACLES[name], sf_dir)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"order_date", "total_sales"}
