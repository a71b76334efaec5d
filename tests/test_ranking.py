"""Distributed exact rank/NTILE (operators/ranking.py) vs the reference
single-partition window — value-identical on every size and tie shape,
including N < n, N % n != 0, and heavy duplicate metric values (the total
order's unique tiebreak is what makes range boundaries safe)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from salesanalytics_etl_spark.operators.ranking import (
    append_global_ntile,
    append_global_rank,
)


@pytest.mark.parametrize("n_rows", [1, 2, 3, 4, 5, 16, 17, 103, 1000])
def test_ntile_matches_window_ntile(spark, n_rows):
    rng = random.Random(n_rows)
    rows = [(i, rng.randint(0, 20), rng.random()) for i in range(n_rows)]
    df = spark.createDataFrame(rows, ["id", "m", "x"])
    order = [F.desc("m"), F.asc("id")]
    ref = {
        r.id: r.t
        for r in df.select(
            "id", F.ntile(4).over(Window.orderBy(*order)).alias("t")
        ).collect()
    }
    got = {
        r.id: r.t
        for r in append_global_ntile(df, 4, order, "t")
        .select("id", "t")
        .collect()
    }
    assert got == ref


def test_global_rank_matches_row_number(spark):
    rng = random.Random(42)
    rows = [(i, rng.randint(0, 5)) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "m"])
    order = [F.asc("m"), F.desc("id")]
    ref = {
        r.id: r.rk
        for r in df.select(
            "id", F.row_number().over(Window.orderBy(*order)).alias("rk")
        ).collect()
    }
    out = append_global_rank(df, order, out_col="rk", total_col="tot")
    got = out.select("id", "rk", "tot").collect()
    assert {r.id: r.rk for r in got} == ref
    assert all(r.tot == 500 for r in got)


def test_ntile_no_data_scaled_global_window(spark):
    """The whole point: the plan must not funnel the input through a
    single-partition sort. The only allowed global window is over the
    per-partition counts frame (an Aggregate on the partition id)."""
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("m")
    )
    out = append_global_ntile(df, 4, [F.desc("m"), F.asc("id")], "t")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the input-scaled sort must be range-partitioned, never SinglePartition
    assert "rangepartitioning" in plan.lower()


def test_ntile_rejects_nonpositive_n(spark):
    import pytest

    from salesanalytics_etl_spark.operators.ranking import append_global_ntile

    df = spark.range(10).selectExpr("id AS v")
    for bad in (0, -1):
        with pytest.raises(ValueError, match="bucket count"):
            append_global_ntile(df, bad, [df.v], "q")


def test_rank_refuses_exchange_reuse_off(spark):
    import pytest
    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.operators.ranking import append_global_rank

    df = spark.range(10).selectExpr("id AS v")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        with pytest.raises(RuntimeError, match="exchange.reuse"):
            append_global_rank(df, [F.col("v")], out_col="r")
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")
