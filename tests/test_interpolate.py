"""interpolate_series — planted-case tests.

Contract: known values untouched; interior NULLs linear between nearest
known neighbors; leading NULLs backfill, trailing NULLs carry forward;
all-NULL keys stay NULL; keys are independent series.
"""

from datetime import date

import pytest
from pyspark.sql import functions as F

from salesanalytics_etl_spark.operators.temporal import interpolate_series


def _vals(df, key):
    rows = sorted(
        (r for r in df.collect() if r.k == key), key=lambda r: r.d
    )
    return [r.v for r in rows]


def test_interpolate_linear_interior_and_edges(spark):
    d = date
    df = spark.createDataFrame(
        [
            ("a", d(2024, 1, 1), None),   # leading → backfill 10.0
            ("a", d(2024, 1, 2), 10.0),
            ("a", d(2024, 1, 3), None),   # 10 + (40-10)*(1/3) = 20.0
            ("a", d(2024, 1, 4), None),   # 10 + (40-10)*(2/3) = 30.0
            ("a", d(2024, 1, 5), 40.0),
            ("a", d(2024, 1, 6), None),   # trailing → LOCF 40.0
        ],
        "k STRING, d DATE, v DOUBLE",
    )
    got = _vals(interpolate_series(df, ["k"], "d", "v"), "a")
    assert got == [10.0, 10.0, 20.0, 30.0, 40.0, 40.0]


def test_interpolate_numeric_time_and_out_col(spark):
    df = spark.createDataFrame(
        [("a", 0, 0.0), ("a", 10, None), ("a", 40, 8.0)],
        "k STRING, d INT, v DOUBLE",
    )
    out = interpolate_series(df, ["k"], "d", "v", out_col="f")
    rows = {r.d: (r.v, r.f) for r in out.collect()}
    # fraction uses the NUMERIC distance: (10-0)/(40-0) = 0.25 → 2.0
    assert rows[10] == (None, 2.0)   # original preserved in v
    assert rows[0] == (0.0, 0.0)


def test_interpolate_keys_are_independent_and_all_null_stays(spark):
    d = date
    df = spark.createDataFrame(
        [
            ("a", d(2024, 1, 1), 1.0),
            ("a", d(2024, 1, 2), None),
            ("a", d(2024, 1, 3), 3.0),
            ("b", d(2024, 1, 1), None),
            ("b", d(2024, 1, 2), None),
        ],
        "k STRING, d DATE, v DOUBLE",
    )
    out = interpolate_series(df, ["k"], "d", "v")
    assert _vals(out, "a") == [1.0, 2.0, 3.0]
    assert _vals(out, "b") == [None, None]


def test_interpolate_rejects_global_series(spark):
    df = spark.createDataFrame([(date(2024, 1, 1), 1.0)], "d DATE, v DOUBLE")
    with pytest.raises(ValueError, match="keys is empty"):
        interpolate_series(df, [], "d", "v")


def test_interpolate_no_unpartitioned_window(spark):
    df = spark.createDataFrame(
        [("a", date(2024, 1, 1), 1.0)], "k STRING, d DATE, v DOUBLE"
    )
    out = interpolate_series(df, ["k"], "d", "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" in plan
    # both windows ride the same key partitioning; no global funnel
    jdf = out._jdf.queryExecution().executedPlan()
    # cheap textual check: every Window line carries the key partition
    for line in plan.splitlines():
        if "windowspecdefinition" in line.lower():
            assert "k#" in line
