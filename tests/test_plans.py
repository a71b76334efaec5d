"""Plan-shape regression tests: the scale properties (.explain output) are
part of the contract, not an accident — broadcast joins stay broadcast,
filters stay pushed into the parquet scan, scans stay column-pruned, and
sorted limits stay TakeOrderedAndProject (no global sort)."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from salesanalytics_etl_spark.plans import all_queries

QS = None


def _plan(spark, sf_dir, name) -> str:
    global QS
    if QS is None:
        QS = all_queries()
    df = QS[name](spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def test_flagship_broadcasts_and_prunes(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q03_sales_by_day")
    assert "BroadcastHashJoin" in plan, "fact⋈dim must broadcast"
    assert "PushedFilters: [IsNotNull" in plan, "join-key filter must reach scan"
    assert "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double>" in plan, (
        "lineitem scan must be pruned to the 2 referenced columns"
    )
    n_shuffles = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_shuffles == 1, f"exactly one shuffle (the aggregation), got {n_shuffles}"


def test_dim_join_broadcasts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q05_top_products")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan, "top-k must not global-sort"


def test_anti_join_is_broadcast_anti(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q09_parts_no_sales")
    assert "LeftAnti" in plan


def test_partial_aggregation_before_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q12_order_totals")
    assert "partial_sum" in plan, "map-side combine must run before exchange"


def test_date_filter_pushed_to_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q14_sales_daterange")
    assert "PushedFilters" in plan and "GreaterThanOrEqual(o_orderdate" in plan


def test_partitioned_write_prunes_partitions(spark, sf_dir, tmp_path):
    from salesanalytics_etl_spark.sources.readers import load_driver_tables
    from salesanalytics_etl_spark.sources.writers import write_table

    orders = load_driver_tables(spark, sf_dir, ["orders"])["orders"]
    path = str(tmp_path / "orders_by_date")
    write_table(
        orders.withColumn("order_month", F.date_format("o_orderdate", "yyyy-MM")),
        path,
        partition_by=["order_month"],
    )
    df = spark.read.parquet(path).filter(F.col("order_month") == "1995-03")
    jdf = df._jdf.queryExecution()  # noqa: SLF001
    plan = df._sc._jvm.PythonSQLUtils.explainString(jdf, "formatted")  # noqa: SLF001
    assert "PartitionFilters: [isnotnull(order_month" in plan, (
        "month filter must prune partitions, not scan them"
    )
    assert df.count() > 0


def test_salted_agg_equals_plain_agg(spark, sf_dir):
    from salesanalytics_etl_spark.operators.skew import salted_agg
    from salesanalytics_etl_spark.sources.readers import load_driver_tables

    li = load_driver_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    plain = {
        (r.l_returnflag,): (r.n, str(r.qty))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag,): (r.n, str(r.qty))
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "n": ("count", F.lit(1)),
                "qty": ("sum", F.col("l_quantity").cast("decimal(18,2)")),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_approx_distinct_within_error_bound(spark, sf_dir):
    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.plans import all_queries

    approx = {
        r.event_type: r.approx_users
        for r in all_queries()["q64_approx_distinct_sketch"](spark, sf_dir).collect()
    }
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = {
        r.event_type: r.exact
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for et, ex in exact.items():
        # rsd=0.02 → allow 5x slack for small-cardinality bias
        assert abs(approx[et] - ex) <= max(0.1 * ex, 5), (et, approx[et], ex)


def test_approx_percentiles_within_rank_error(spark):
    """GK sketch at accuracy a guarantees rank error <= n/a: the approx
    p50 must sit between the exact p49 and p51 of a 10k-value column."""
    from salesanalytics_etl_spark.plans.registry import all_queries
    from pyspark.sql import functions as F

    df = spark.range(10_000).select(
        (F.col("id") % 5).alias("g"), F.col("id").cast("double").alias("x")
    )
    got = df.groupBy("g").agg(
        F.round(F.percentile_approx("x", F.lit(0.5), 10000), 2).alias("p50a"),
        F.percentile("x", F.lit(0.49)).alias("lo"),
        F.percentile("x", F.lit(0.51)).alias("hi"),
    )
    for r in got.collect():
        assert r.lo <= r.p50a <= r.hi
    # and the registered query itself runs with a stable shape
    from tests.conftest import SF_DIR

    out = all_queries()["q82_approx_percentile_sketch"](spark, SF_DIR)
    assert out.columns == [
        "c_mktsegment", "n_orders", "p50_approx", "p90_approx", "p99_approx"
    ]
    assert out.count() > 0


def test_driver_record_window_contract():
    """The driver records the FIRST 50 queries() entries. Pin the
    rotation bookkeeping structurally: exactly 50 names, every one
    registered (a typo would silently shrink the window), no
    duplicates, and the ordered surface actually leads with them."""
    from salesanalytics_etl_spark.plans.registry import (
        _CHECK_FIRST,
        all_queries,
    )

    qs = all_queries()
    assert len(_CHECK_FIRST) == 50
    assert len(set(_CHECK_FIRST)) == 50
    missing = [n for n in _CHECK_FIRST if n not in qs]
    assert not missing, missing
    assert list(qs)[:50] == _CHECK_FIRST
    # bench compaction contract: qNN prefixes stay unique
    prefixes = {n.split("_", 1)[0] for n in qs}
    assert len(prefixes) == len(qs)


def test_snapshot_diff_plans_single_cokeyed_join(spark, sf_dir):
    # q125's contract: ONE full-outer shuffle join on the key, both
    # sides exchanged on the same key (co-partitioned), compares in
    # codegen — no second join, no Python boundary
    plan = _plan(spark, sf_dir, "q125_snapshot_diff")
    tree = plan.split("\n\n")[0]
    joins = re.findall(r"SortMergeJoin|ShuffledHashJoin", tree)
    assert len(joins) == 1, f"exactly one shuffle join, got {joins}"
    assert "FullOuter" in plan
    assert "BatchEvalPython" not in plan


def test_gap_fill_spine_joins_without_cartesian(spark, sf_dir):
    # q126: the date spine comes from a 1-row bounds aggregate via
    # sequence+explode; its join to daily sales must be a hash join,
    # and the whole plan must stay free of nested-loop shapes
    plan = _plan(spark, sf_dir, "q126_sales_gap_fill")
    assert "CartesianProduct" not in plan
    assert "Generate explode" in plan or "Generate" in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_bucketed_range_join_plans_equi_join(spark, sf_dir):
    # q127's whole point: a keyless interval join planned as an EQUI
    # join on the manufactured bucket id — never a nested loop over
    # intervals (what Catalyst alone would do without the equi key)
    plan = _plan(spark, sf_dir, "q127_peak_window_traffic")
    assert "CartesianProduct" not in plan
    tree = plan.split("\n\n")[0]
    assert re.search(r"BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin", tree)
