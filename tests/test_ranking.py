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
    from salesanalytics_etl_spark.operators.ranking import append_global_rank

    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("m")
    )
    # materialize=False exposes the pre-checkpoint plan (the eager
    # checkpoint otherwise truncates lineage and hides the exchange)
    out = append_global_rank(
        df, [F.desc("m"), F.asc("id")], out_col="r", materialize=False
    )
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


def test_rank_correct_with_exchange_reuse_off(spark):
    # the checkpointed ranged frame makes ranks exact even when Spark
    # can never dedup the two branch subtrees — reuse OFF is the
    # worst case the old implementation refused loudly
    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.operators.ranking import append_global_rank

    df = spark.range(5000).selectExpr("id AS v", "id % 97 AS m")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        out = append_global_rank(
            df, [F.desc("m"), F.asc("v")], out_col="r", total_col="n"
        )
        rs = sorted(r.r for r in out.select("r").collect())
        assert rs == list(range(1, 5001))
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")


def test_ntile_multi_matches_single_passes(spark):
    # mixed slot types (bigint / double / string), descending via
    # negation, ties present, sizes spanning N<n, N=n, N%n!=0
    import random

    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.operators.ranking import (
        append_global_ntile,
        append_global_ntile_multi,
    )

    rnd = random.Random(93)
    for size in (1, 3, 4, 17, 200):
        rows = [
            (
                i,
                rnd.randint(0, 5),          # long metric, heavy ties
                rnd.choice([1.5, 2.25, 9.0]),  # double metric, ties
                rnd.choice(["a", "b", "c"]),   # string metric, ties
            )
            for i in range(size)
        ]
        df = spark.createDataFrame(rows, "k INT, v1 INT, v2 DOUBLE, s STRING")
        multi = append_global_ntile_multi(
            df,
            4,
            {
                "q1": -F.col("v1"),   # descending long
                "q2": F.col("v2"),    # ascending double
                "q3": F.col("s"),     # ascending string
            },
            keys=["k"],
        )
        want = df
        for out, col in (
            ("q1", (-F.col("v1"))),
            ("q2", F.col("v2")),
            ("q3", F.col("s")),
        ):
            want = append_global_ntile(
                want, 4, [col.asc(), F.asc("k")], out
            )
        got = {r.k: (r.q1, r.q2, r.q3) for r in multi.collect()}
        exp = {r.k: (r.q1, r.q2, r.q3) for r in want.collect()}
        assert got == exp, f"size={size}"


def test_ntile_multi_rejects_bad_inputs(spark):
    import pytest
    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.operators.ranking import (
        append_global_ntile_multi,
    )

    df = spark.range(5).selectExpr(
        "id AS k",
        "CAST(id AS DECIMAL(20,2)) AS dwide",
        "DATE '2024-01-01' AS dt",
    )
    with pytest.raises(ValueError, match="no metrics"):
        append_global_ntile_multi(df, 4, {}, keys=["k"])
    with pytest.raises(ValueError, match="unsupported metric type"):
        append_global_ntile_multi(df, 4, {"q": F.col("dt")}, keys=["k"])
    # DECIMAL precision > 18: unscaled value can overflow bigint — loud
    with pytest.raises(ValueError, match="DECIMAL\\(20,2\\)"):
        append_global_ntile_multi(df, 4, {"q": F.col("dwide")}, keys=["k"])
    with pytest.raises(ValueError, match="bucket count"):
        append_global_ntile_multi(df, 0, {"q": F.col("k")}, keys=["k"])
    # negative-scale DECIMAL (legacy.allowNegativeScaleOfDecimal):
    # 10**scale would be a Python FLOAT, silently routing the "exact"
    # slot through double — must raise, not degrade
    prev = spark.conf.get("spark.sql.legacy.allowNegativeScaleOfDecimal")
    spark.conf.set("spark.sql.legacy.allowNegativeScaleOfDecimal", "true")
    try:
        from pyspark.sql import types as T

        dneg = spark.createDataFrame(
            [],
            T.StructType(
                [
                    T.StructField("k", T.LongType()),
                    T.StructField("dneg", T.DecimalType(6, -2)),
                ]
            ),
        )
        with pytest.raises(ValueError, match="DECIMAL\\(6,-2\\)"):
            append_global_ntile_multi(
                dneg, 4, {"q": F.col("dneg")}, keys=["k"]
            )
    finally:
        spark.conf.set(
            "spark.sql.legacy.allowNegativeScaleOfDecimal", prev
        )


def test_ntile_multi_decimal_slot_is_exact(spark):
    # DECIMAL(<=18) rides the bigint slot as the exact unscaled value:
    # ntile buckets must match F.ntile over the decimal's native order,
    # including DESC-by-negation and cent-sized ties a double cast at
    # this magnitude could NOT merge — and, critically, values whose
    # DOUBLE images collide (>2^53) must stay distinct
    from pyspark.sql import Window

    from salesanalytics_etl_spark.operators.ranking import (
        append_global_ntile_multi,
    )

    # 92233720368547758.07 is near the decimal(18,2) max; steps of 0.01
    # are far below double resolution at this magnitude (ulp ~ 16.0)
    rows = [(i, f"922337203685477{i:02d}.{i % 100:02d}") for i in range(40)]
    df = spark.createDataFrame(rows, "k INT, s STRING").select(
        "k", F.col("s").cast("decimal(18,2)").alias("d")
    )
    # sanity: the double image of adjacent values actually collides
    assert (
        df.select(F.count_distinct(F.col("d").cast("double")).alias("n"))
        .collect()[0].n
        < 40
    )
    got = {
        r.k: (r.qa, r.qd)
        for r in append_global_ntile_multi(
            df, 4, {"qa": F.col("d"), "qd": -F.col("d")}, keys=["k"]
        ).collect()
    }
    ref = {
        r.k: (r.qa, r.qd)
        for r in df.select(
            "k",
            F.ntile(4).over(Window.orderBy(F.asc("d"), F.asc("k"))).alias("qa"),
            F.ntile(4).over(Window.orderBy(F.desc("d"), F.asc("k"))).alias("qd"),
        ).collect()
    }
    assert got == ref


def test_ntile_multi_long_slot_exact_above_2_53(spark):
    # bigint metrics above 2^53 (where doubles merge neighbors) must
    # rank exactly — the long slot never converts to double
    from pyspark.sql import Window

    from salesanalytics_etl_spark.operators.ranking import (
        append_global_ntile_multi,
    )

    base = 2**53
    rows = [(i, base + i) for i in range(32)]  # doubles merge even/odd here
    df = spark.createDataFrame(rows, "k INT, v LONG")
    got = {
        r.k: r.q
        for r in append_global_ntile_multi(
            df, 4, {"q": -F.col("v")}, keys=["k"]
        ).collect()
    }
    ref = {
        r.k: r.q
        for r in df.select(
            "k",
            F.ntile(4).over(Window.orderBy(F.desc("v"), F.asc("k"))).alias("q"),
        ).collect()
    }
    assert got == ref


def test_ntile_multi_null_metric_sorts_first_pinned(spark):
    # documented contract (asc_nulls_first): a NULL metric value lands in
    # bucket 1, unlike F.desc chains where NULLs sort last — pinned here
    # so the divergence stays a tested contract, not prose
    from salesanalytics_etl_spark.operators.ranking import (
        append_global_ntile_multi,
    )

    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30), (4, 20)], "k INT, v INT"
    )
    got = {
        r.k: r.q
        for r in append_global_ntile_multi(
            df, 4, {"q": F.col("v")}, keys=["k"]
        ).collect()
    }
    assert got[2] == 1, "NULL metric must take bucket 1 (NULLS FIRST)"
    assert got == {2: 1, 1: 2, 4: 3, 3: 4}


def test_group_rank_keeps_null_group(spark):
    # Window.partitionBy ranks the NULL group as a normal group; the
    # offsets join must be null-safe or those rows silently vanish
    from salesanalytics_etl_spark.operators.ranking import append_group_rank

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("a", 1.0), (None, 2.0), (None, 1.0), ("a", 3.0)],
        "g STRING, v DOUBLE",
    )
    got = {
        (r.g, r.v): (r.rk, r.n)
        for r in append_group_rank(
            df, ["g"], [F.asc("v")], out_col="rk", total_col="n"
        ).collect()
    }
    assert got == {
        ("a", 1.0): (1, 2),
        ("a", 3.0): (2, 2),
        (None, 1.0): (1, 2),
        (None, 2.0): (2, 2),
    }


def test_ntile_multi_keeps_null_key_row(spark):
    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.operators.ranking import (
        append_global_ntile_multi,
    )

    df = spark.createDataFrame(
        [(1, 10), (None, 20), (3, 30)], "k INT, v INT"
    )
    out = append_global_ntile_multi(df, 2, {"q": F.col("v")}, keys=["k"])
    assert out.count() == 3  # the null-keyed row must survive the pivot join


@pytest.mark.parametrize("n_rows", [1, 2, 5, 17, 103, 1000])
def test_prefix_sum_matches_window_cumsum(spark, n_rows):
    from salesanalytics_etl_spark.operators.ranking import (
        append_global_prefix_sum,
    )

    rng = random.Random(n_rows)
    # heavy duplicate order keys — the unique id tiebreak is load-bearing
    rows = [(i, rng.randint(0, 9), rng.randint(-50, 500)) for i in range(n_rows)]
    df = spark.createDataFrame(rows, ["id", "m", "v"])
    order = [F.desc("m"), F.asc("id")]
    ref = {
        r.id: (r.c, r.t)
        for r in df.select(
            "id",
            F.sum("v")
            .over(
                Window.orderBy(*order).rowsBetween(
                    Window.unboundedPreceding, 0
                )
            )
            .alias("c"),
            F.sum("v")
            .over(
                Window.orderBy(*order).rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("t"),
        ).collect()
    }
    got = {
        r.id: (r.c, r.t)
        for r in append_global_prefix_sum(
            df, F.col("v"), order, out_col="c", total_col="t"
        )
        .select("id", "c", "t")
        .collect()
    }
    assert got == ref


def test_prefix_sum_decimal_value_stays_exact(spark):
    from salesanalytics_etl_spark.operators.ranking import (
        append_global_prefix_sum,
    )

    df = spark.range(100).selectExpr(
        "id", "CAST(id AS DECIMAL(18,2)) / 4 AS v"
    )
    out = append_global_prefix_sum(df, F.col("v"), [F.asc("id")], "c")
    rows = {r.id: r.c for r in out.collect()}
    from decimal import Decimal

    acc = Decimal(0)
    for i in range(100):
        acc += Decimal(i) / 4
        assert rows[i] == acc


def test_prefix_sum_no_data_scaled_global_window(spark):
    from salesanalytics_etl_spark.operators.ranking import (
        append_global_prefix_sum,
    )

    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 97).alias("v")
    )
    out = append_global_prefix_sum(
        df, F.col("v"), [F.asc("id")], "c", materialize=False
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower()


def test_prefix_sum_correct_with_exchange_reuse_off(spark):
    from salesanalytics_etl_spark.operators.ranking import (
        append_global_prefix_sum,
    )

    df = spark.range(5000).selectExpr("id AS v")
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        out = append_global_prefix_sum(
            df, F.col("v"), [F.asc("v")], out_col="c", total_col="t"
        )
        rows = {r.v: (r.c, r.t) for r in out.collect()}
        acc = 0
        for v in range(5000):
            acc += v
            assert rows[v] == (acc, 12497500)
    finally:
        spark.conf.set("spark.sql.exchange.reuse", "true")


def test_prefix_sum_rejects_float_value(spark):
    """The exactness contract is ENFORCED, not just documented (r10
    ADVICE): a double value would make the prefix depend on partition
    boundaries — the silent-wrong class the module guards loudly."""
    import pytest

    from salesanalytics_etl_spark.operators.ranking import (
        append_global_prefix_sum,
    )

    df = spark.range(100).select(
        F.col("id"), (F.col("id") * 0.5).alias("v")
    )
    with pytest.raises(ValueError, match="exact type"):
        append_global_prefix_sum(df, F.col("v"), [F.asc("id")], "c")
    # the float column CAST to an exact type is accepted
    out = append_global_prefix_sum(
        df, (F.col("v") * 2).cast("bigint"), [F.asc("id")], "c"
    )
    assert out.count() == 100


def test_ntile_exact_on_join_upstream_input(spark):
    """Round-10 regression: a JOIN upstream of the rank machinery made
    AQE materialize the range exchange TWICE with different sampled
    boundaries — counts and ranks diverged and NTILE bucket sizes
    spread by hundreds (silently wrong results that the fully-sampled
    small-data gate could not see). With the checkpointed ranged frame
    the buckets must be exact (sizes within 1) on exactly that shape."""
    from collections import Counter

    from salesanalytics_etl_spark.operators.ranking import append_global_ntile

    left = spark.range(20000).selectExpr(
        "id AS k", "CAST((id * 2654435761) % 1000000 AS BIGINT) AS h"
    )
    right = spark.range(0, 20000, 2).selectExpr(
        "id AS k2", "CAST(id % 1000 AS BIGINT) AS t"
    )
    inp = (
        left.join(right, left.k == right.k2, "left")
        .selectExpr("k", "h", "COALESCE(t, 0) AS t")
    )
    scored = append_global_ntile(
        inp, 10, [F.desc("h"), F.asc("k")], "decile"
    )
    sizes = Counter(r.decile for r in scored.select("decile").collect())
    assert sorted(sizes) == list(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1, sizes
    assert sum(sizes.values()) == 20000
