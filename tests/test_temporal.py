"""Planted-data semantics for the temporal joins (merge_asof parity)."""

from __future__ import annotations

from datetime import datetime

from salesanalytics_etl_spark.operators.temporal import asof_join, range_join


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_picks_latest_within_horizon(spark):
    left = spark.createDataFrame(
        [
            (1, 100, ts("2024-01-10T12:00:00")),  # two prior rights → latest
            (2, 100, ts("2024-01-01T00:00:00")),  # right at same instant → match
            (3, 200, ts("2024-01-10T12:00:00")),  # only right AFTER → NULL
            (4, 300, ts("2024-06-01T00:00:00")),  # right beyond horizon → NULL
        ],
        ["id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (11, 100, ts("2024-01-01T00:00:00")),
            (12, 100, ts("2024-01-05T00:00:00")),
            (13, 200, ts("2024-01-11T00:00:00")),
            (14, 300, ts("2024-01-01T00:00:00")),
        ],
        ["rid", "user_id", "ts"],
    )
    out = {
        r.id: r.asof_rid
        for r in asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            horizon="30 days", right_cols=["rid", "ts"], tiebreakers=["rid"],
        ).collect()
    }
    assert out == {1: 12, 2: 11, 3: None, 4: None}


def test_asof_join_tiebreak_deterministic(spark):
    left = spark.createDataFrame(
        [(1, 9, ts("2024-01-02T00:00:00"))], ["id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [(21, 9, ts("2024-01-01T00:00:00")), (22, 9, ts("2024-01-01T00:00:00"))],
        ["rid", "user_id", "ts"],
    )
    for _ in range(3):
        out = asof_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            right_cols=["rid", "ts"], tiebreakers=["rid"],
        ).collect()
        assert out[0].asof_rid == 22  # highest rid wins ties, every run


def test_range_join_window_bounds_inclusive(spark):
    left = spark.createDataFrame(
        [(1, 5, ts("2024-01-01T01:00:00"))], ["id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            (31, 5, ts("2024-01-01T00:49:59")),  # outside 10-min lookback
            (32, 5, ts("2024-01-01T00:50:00")),  # exactly on the bound → in
            (33, 5, ts("2024-01-01T01:00:00")),  # same instant → in
            (34, 5, ts("2024-01-01T01:00:01")),  # after → out
        ],
        ["rid", "user_id", "ts"],
    )
    got = sorted(
        r["rid"]
        for r in range_join(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            lower="10 minutes", upper="0 seconds",
        ).select("r.rid").collect()
    )
    assert got == [32, 33]


# ---------------------------------------------------------------------------
# bucketed_range_join (pure interval join, no equi key)
# ---------------------------------------------------------------------------


def _brj(spark, bucket_seconds):
    from salesanalytics_etl_spark.operators.temporal import bucketed_range_join

    points = spark.createDataFrame(
        [
            (1, ts("2024-01-01T00:30:00")),
            (2, ts("2024-01-01T01:59:59")),
            (3, ts("2024-01-01T05:00:00")),  # inside no interval
            (4, ts("2024-01-01T10:00:00")),  # exactly on a lo bound
            (5, ts("2024-01-01T11:00:00")),  # exactly on a hi bound
        ],
        ["pid", "pts"],
    )
    intervals = spark.createDataFrame(
        [
            (10, ts("2024-01-01T00:00:00"), ts("2024-01-01T02:00:00")),
            (11, ts("2024-01-01T01:30:00"), ts("2024-01-01T01:59:59")),
            (12, ts("2024-01-01T10:00:00"), ts("2024-01-01T11:00:00")),
            (13, ts("2024-01-01T12:00:00"), ts("2024-01-01T11:00:00")),  # hi<lo
        ],
        ["iid", "lo", "hi"],
    )
    out = bucketed_range_join(
        points, "pts", intervals, "lo", "hi", bucket_seconds=bucket_seconds
    )
    return sorted((r.pid, r.iid) for r in out.collect())


EXPECTED_PAIRS = [(1, 10), (2, 10), (2, 11), (4, 12), (5, 12)]


def test_bucketed_range_join_exact_containment(spark):
    # closed bounds on both ends; backwards interval dropped; one row per
    # (point, interval) pair — never duplicated by the bucket expansion
    assert _brj(spark, 3600) == EXPECTED_PAIRS


def test_bucketed_range_join_bucket_width_is_semantics_free(spark):
    # bucket width changes COST only, never the result set
    for w in (60, 913, 7200, 86400):
        assert _brj(spark, w) == EXPECTED_PAIRS


def test_bucketed_range_join_rejects_bad_args(spark):
    import pytest

    from salesanalytics_etl_spark.operators.temporal import bucketed_range_join

    pts = spark.createDataFrame([(1, ts("2024-01-01T00:00:00"))], ["pid", "ts"])
    iv = spark.createDataFrame(
        [(2, ts("2024-01-01T00:00:00"), ts("2024-01-01T01:00:00"))],
        ["iid", "lo", "hi"],
    )
    with pytest.raises(ValueError, match="bucket_seconds"):
        bucketed_range_join(pts, "ts", iv, "lo", "hi", bucket_seconds=0)
    clash = iv.withColumnRenamed("iid", "pid")
    with pytest.raises(ValueError, match="overlapping column names"):
        bucketed_range_join(pts, "ts", clash, "lo", "hi")


def test_bucketed_range_join_plans_hash_join_not_nested_loop(spark):
    # the whole point of the operator: an equi join on the manufactured
    # bucket key, NEVER CartesianProduct — regardless of side sizes
    from salesanalytics_etl_spark.operators.temporal import bucketed_range_join

    points = spark.range(1000).selectExpr(
        "id AS pid", "timestamp_seconds(1704067200 + id * 60) AS pts"
    )
    intervals = spark.range(500).selectExpr(
        "id AS iid",
        "timestamp_seconds(1704067200 + id * 120) AS lo",
        "timestamp_seconds(1704067200 + id * 120 + 1800) AS hi",
    )
    out = bucketed_range_join(points, "pts", intervals, "lo", "hi", 3600)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # cross-check against the naive (correct but unscalable) formulation
    naive = points.crossJoin(intervals).filter(
        "pts >= lo AND pts <= hi"
    )
    assert out.count() == naive.count()


def test_asof_join_forward_picks_earliest_within_horizon(spark):
    from salesanalytics_etl_spark.operators.temporal import asof_join_forward

    left = spark.createDataFrame(
        [
            (1, 100, ts("2024-01-01T00:00:00")),  # two later rights → earliest
            (2, 100, ts("2024-01-05T00:00:00")),  # right at same instant → match
            (3, 200, ts("2024-01-12T00:00:00")),  # only right BEFORE → NULL
            (4, 300, ts("2024-01-01T00:00:00")),  # right beyond horizon → NULL
        ],
        ["id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            (11, 100, ts("2024-01-03T00:00:00")),
            (12, 100, ts("2024-01-05T00:00:00")),
            (13, 200, ts("2024-01-11T00:00:00")),
            (14, 300, ts("2024-03-01T00:00:00")),
        ],
        ["rid", "user_id", "ts"],
    )
    out = {
        r.id: r.asof_rid
        for r in asof_join_forward(
            left, right, on="user_id", left_ts="ts", right_ts="ts",
            horizon="30 days", right_cols=["rid", "ts"], tiebreakers=["rid"],
        ).collect()
    }
    assert out == {1: 11, 2: 12, 3: None, 4: None}


def test_asof_join_forward_tiebreak_is_ascending(spark):
    from salesanalytics_etl_spark.operators.temporal import asof_join_forward

    left = spark.createDataFrame(
        [(1, 7, ts("2024-01-01T00:00:00"))], ["id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            (22, 7, ts("2024-01-02T00:00:00")),
            (21, 7, ts("2024-01-02T00:00:00")),  # same instant → SMALLEST rid
        ],
        ["rid", "user_id", "ts"],
    )
    out = asof_join_forward(
        left, right, on="user_id", left_ts="ts", right_ts="ts",
        horizon="30 days", right_cols=["rid", "ts"], tiebreakers=["rid"],
    ).collect()
    assert out[0].asof_rid == 21
