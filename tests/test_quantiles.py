"""Distributed exact percentiles vs the buffered reference aggregate."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from salesanalytics_etl_spark.operators.quantiles import (
    exact_percentiles_distributed,
)

PS = {"p25": 0.25, "p50": 0.5, "p90": 0.9, "p99": 0.99, "pmin": 0.0, "pmax": 1.0}


def _dist(spark, values, ps=PS):
    df = spark.createDataFrame([(v,) for v in values], "v DOUBLE")
    return exact_percentiles_distributed(df, "v", ps).collect()[0].asDict()


def _buffered(spark, values, ps=PS):
    df = spark.createDataFrame([(v,) for v in values], "v DOUBLE")
    return (
        df.agg(
            *[
                F.percentile("v", F.lit(p)).alias(name)
                for name, p in ps.items()
            ]
        )
        .collect()[0]
        .asDict()
    )


def test_matches_buffered_percentile_on_random_data(spark):
    rnd = random.Random(128)
    for size in (1, 2, 3, 10, 101):
        values = [round(rnd.uniform(0, 1000), 2) for _ in range(size)]
        values += values[: size // 3]  # force ties
        got = _dist(spark, values)
        want = _buffered(spark, values)
        for k in PS:
            assert got[k] == pytest.approx(want[k], abs=1e-9), (size, k)


def test_nulls_excluded_and_empty_is_null_row(spark):
    df = spark.createDataFrame(
        [(1.0,), (None,), (3.0,)], "v DOUBLE"
    )
    got = exact_percentiles_distributed(df, "v", {"p50": 0.5}).collect()
    assert got[0].p50 == 2.0  # nulls out, interpolates 1 and 3
    empty = spark.createDataFrame([], "v DOUBLE")
    row = exact_percentiles_distributed(empty, "v", {"p50": 0.5}).collect()
    assert len(row) == 1 and row[0].p50 is None


def test_invalid_args_raise(spark):
    df = spark.range(3).selectExpr("CAST(id AS DOUBLE) AS v")
    with pytest.raises(ValueError, match="outside"):
        exact_percentiles_distributed(df, "v", {"p": 1.5})
    with pytest.raises(ValueError, match="no percentiles"):
        exact_percentiles_distributed(df, "v", {})


def test_no_single_buffer_aggregate_in_plan(spark):
    # the whole point: no percentile() ObjectHashAggregate over the
    # data; the plan's aggregate runs over the rank-filtered rows
    df = spark.range(1000).selectExpr("CAST(id AS DOUBLE) AS v")
    out = exact_percentiles_distributed(df, "v", {"p50": 0.5})
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "percentile" not in plan.lower().replace("percentiles", "")


def test_grouped_matches_buffered_per_group(spark):
    from salesanalytics_etl_spark.operators.quantiles import (
        exact_percentiles_grouped,
    )

    rnd = random.Random(129)
    rows = []
    # group shapes: singleton, pair, large with ties
    for g, size in (("a", 1), ("b", 2), ("c", 57), ("d", 8)):
        vals = [round(rnd.uniform(0, 100), 2) for _ in range(size)]
        vals += vals[: size // 2]  # ties
        rows += [(g, v) for v in vals]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    ps = {"p50": 0.5, "p90": 0.9}
    got = {
        r.g: (r.n_rows, r.p50, r.p90)
        for r in exact_percentiles_grouped(df, ["g"], "v", ps).collect()
    }
    want = {
        r.g: (r.n, r.p50, r.p90)
        for r in df.groupBy("g")
        .agg(
            F.count("v").alias("n"),
            F.percentile("v", F.lit(0.5)).alias("p50"),
            F.percentile("v", F.lit(0.9)).alias("p90"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0]
        assert got[g][1] == pytest.approx(want[g][1], abs=1e-9)
        assert got[g][2] == pytest.approx(want[g][2], abs=1e-9)


def test_grouped_plans_no_unpartitioned_window(spark):
    from salesanalytics_etl_spark.operators.quantiles import (
        exact_percentiles_grouped,
    )

    df = spark.range(100).selectExpr(
        "CAST(id % 3 AS STRING) AS g", "CAST(id AS DOUBLE) AS v"
    )
    out = exact_percentiles_grouped(df, ["g"], "v", {"p50": 0.5})
    plan = out._jdf.queryExecution().executedPlan()

    def walk(node):
        yield node
        if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            yield from walk(node.inputPlan())
            return
        it = node.children().iterator()
        while it.hasNext():
            yield from walk(it.next())

    bad = [
        n
        for n in walk(plan)
        if "Window" in n.getClass().getSimpleName()
        and n.partitionSpec().isEmpty()
    ]
    assert not bad, "grouped percentiles must never plan a global window"


def test_grouped_keeps_all_null_group_like_buffered(spark):
    from salesanalytics_etl_spark.operators.quantiles import (
        exact_percentiles_grouped,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("x", None), (None, 5.0)],
        "g STRING, v DOUBLE",
    )
    got = {
        r.g: (r.n_rows, r.p50)
        for r in exact_percentiles_grouped(df, ["g"], "v", {"p50": 0.5})
        .collect()
    }
    # 'x' (all-NULL values) survives with n_rows 0 + NULL percentile,
    # exactly like groupBy+percentile; NULL group value is its own group
    assert got == {"a": (2, 2.0), "x": (0, None), None: (1, 5.0)}


def test_ps_key_collisions_raise(spark):
    from salesanalytics_etl_spark.operators.quantiles import (
        exact_percentiles_distributed,
        exact_percentiles_grouped,
    )

    df = spark.range(10).selectExpr(
        "CAST(id % 2 AS STRING) AS g", "CAST(id AS DOUBLE) AS v"
    )
    for bad in ("_v", "_r", "_n", "_lo_x", "_hi_x"):
        with pytest.raises(ValueError, match="collide"):
            exact_percentiles_distributed(df, "v", {bad: 0.5})
    with pytest.raises(ValueError, match="collide"):
        exact_percentiles_grouped(df, ["g"], "v", {"n_rows": 0.5})
    with pytest.raises(ValueError, match="collide"):
        exact_percentiles_grouped(df, ["g"], "v", {"g": 0.5})
    # n_rows only reserved on the grouped path's OUTPUT — but keep the
    # rule uniform across both paths (one _validate, one contract)
    with pytest.raises(ValueError, match="collide"):
        exact_percentiles_distributed(df, "v", {"n_rows": 0.5})
