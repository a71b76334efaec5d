"""Heavy-hitters (operators/frequent.py): exactness, the MG superset
guarantee under adversarial partitioning, and the bounded-candidate
contract that makes the operator scale."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesanalytics_etl_spark.operators.frequent import (
    _mg_kernel,
    heavy_hitters,
)


def _exact(df, key_col, phi_denom):
    n = df.count()
    return {
        (r[key_col], r["freq"])
        for r in df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * phi_denom >= F.lit(n))
        .collect()
    }


def test_heavy_hitters_equals_exact_groupby(spark):
    # 3 hot keys on a 2000-key tail, sprayed across 16 partitions so every
    # task sees a mix (the sketch must survive arbitrary row placement).
    rows = spark.range(0, 20000, numPartitions=16).select(
        F.when(F.col("id") % 4 == 0, F.concat(F.lit("hot"), F.col("id") % 3))
        .otherwise(F.concat(F.lit("t"), F.col("id") % 2000))
        .alias("term")
    )
    got = {
        (r["term"], r["freq"])
        for r in heavy_hitters(rows, "term", phi_denom=100, k=256).collect()
    }
    assert got == _exact(rows, "term", 100)
    assert {t for t, _ in got} == {"hot0", "hot1", "hot2"}


def test_heavy_hitters_exact_when_domain_under_capacity(spark):
    rows = spark.range(0, 300).select((F.col("id") % 7).alias("term"))
    got = {
        (r["term"], r["freq"])
        for r in heavy_hitters(rows, "term", phi_denom=10, k=64).collect()
    }
    # 7 keys, each ~1/7 > 1/10 of the data: all are heavy.
    assert len(got) == 7
    assert got == _exact(rows.select(F.col("term").cast("string").alias("term")), "term", 10)


def test_phi_beyond_capacity_raises(spark):
    rows = spark.range(10).select(F.col("id").alias("term"))
    with pytest.raises(ValueError, match="phi_denom"):
        heavy_hitters(rows, "term", phi_denom=1000, k=128)


def test_mg_kernel_bounded_and_superset():
    """Driver-side check of the kernel alone: candidate count stays <= k
    and every key with frequency > n/(k+1) survives, across batch splits
    chosen to force decrements mid-stream."""
    import pandas as pd

    k = 8
    # 40 x 'A', 25 x 'B', singletons C0..C199: n = 265, n/(k+1) ~ 29.4
    data = ["A"] * 40 + ["B"] * 25 + [f"C{i}" for i in range(200)]
    batches = [
        pd.DataFrame({"term": data[i : i + 37]}) for i in range(0, len(data), 37)
    ]
    out = list(_mg_kernel("term", k)(iter(batches)))
    assert len(out) == 1
    pdf = out[0]
    sentinel = pdf[pdf["term"].isnull()]
    assert sentinel["cnt"].tolist() == [len(data)]
    cands = set(pdf[pdf["term"].notnull()]["term"])
    assert len(cands) <= k
    assert "A" in cands  # 40 > 29.4 -> guaranteed survivor


def test_empty_input_yields_empty(spark):
    rows = spark.range(0).select(F.col("id").alias("term"))
    assert heavy_hitters(rows, "term", phi_denom=10, k=64).count() == 0


# -- property: sketch-accelerated output == exact, on arbitrary inputs ----
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(
    st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=200),
    st.integers(min_value=2, max_value=20),
)
@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
def test_heavy_hitters_property_matches_exact(spark, keys, phi_denom):
    n = len(keys)
    want = {
        (str(k), c)
        for k, c in Counter(keys).items()
        if c * phi_denom >= n
    }
    df = spark.createDataFrame(
        [(k,) for k in keys], "term int"
    ).repartition(4)
    got = {
        (r.term, r.freq)
        for r in heavy_hitters(df, "term", phi_denom=phi_denom, k=64).collect()
    }
    assert got == want
