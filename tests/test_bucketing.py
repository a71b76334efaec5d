"""Bucketed co-located join: the whole point is the ABSENCE of Exchange
nodes in the join plan — assert it, and that results equal the plain join."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from salesanalytics_etl_spark.sources.bucketing import bucketed_join, write_bucketed
from salesanalytics_etl_spark.sources.readers import load_driver_tables


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # (gitignored) and are dropped on teardown
    t = load_driver_tables(spark, sf_dir, ["orders", "lineitem"])
    # disable broadcast so the test exercises the fact⋈fact path the
    # bucketing exists for (at real scale neither side broadcasts)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    write_bucketed(
        t["orders"].withColumnRenamed("o_orderkey", "orderkey"),
        "b_orders", "orderkey", n_buckets=8, sort_by="orderkey",
    )
    write_bucketed(
        t["lineitem"].withColumnRenamed("l_orderkey", "orderkey"),
        "b_lineitem", "orderkey", n_buckets=8, sort_by="orderkey",
    )
    yield t
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    df = bucketed_join(spark, "b_orders", "b_lineitem", on="orderkey").select(
        "orderkey", "o_totalprice", "l_extendedprice"
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0, (
        "bucketed join must not shuffle either side:\n" + plan
    )

    # and it computes the same thing as the plain (shuffling) join
    t = bucketed_tables
    plain = (
        t["orders"].join(
            t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey
        )
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
        )
        .collect()[0]
    )
    bucketed = (
        df.groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("s"),
        )
        .collect()[0]
    )
    assert (plain.n, str(plain.s)) == (bucketed.n, str(bucketed.s))


def test_salted_join_equals_plain_join(spark):
    from salesanalytics_etl_spark.operators.skew import salted_join

    # one pathologically hot key (90% of facts) + a cold tail; the hot
    # rows are IDENTICAL — the case a column-hash salt would collapse
    # onto one reducer (regression for the per-row salt fix)
    facts = spark.createDataFrame(
        [(1, 7) for _ in range(900)] + [(k, k) for k in range(2, 102)],
        ["key", "payload"],
    )
    dim = spark.createDataFrame(
        [(k, f"name{k}") for k in range(1, 60)], ["key", "name"]
    )
    plain = facts.join(dim, "key").select("key", "payload", "name")
    salted = salted_join(facts, dim, "key").select("key", "payload", "name")
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
    # left join keeps unmatched facts
    plain_l = facts.join(dim, "key", "left")
    salted_l = salted_join(facts, dim, "key", how="left")
    assert plain_l.count() == salted_l.count() == 1000
