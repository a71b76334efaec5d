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
