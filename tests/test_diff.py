"""Planted-data semantics for the snapshot diff operator."""

from __future__ import annotations

import pytest

from salesanalytics_etl_spark.operators.diff import snapshot_diff


def _rows(df):
    return sorted(
        (r.k, r.status, r.n_changed_cols) for r in df.collect()
    )


def test_snapshot_diff_statuses_and_counts(spark):
    old = spark.createDataFrame(
        [
            (1, "a", 10.0),   # unchanged → absent from output
            (2, "b", 20.0),   # one column changes
            (3, "c", 30.0),   # both columns change
            (4, "d", 40.0),   # removed
            (6, None, 60.0),  # null → value = changed
            (7, None, 70.0),  # null → null = unchanged
        ],
        ["k", "s", "v"],
    )
    new = spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "b", 21.0),
            (3, "C", 31.0),
            (5, "e", 50.0),   # added
            (6, "x", 60.0),
            (7, None, 70.0),
        ],
        ["k", "s", "v"],
    )
    assert _rows(snapshot_diff(old, new, keys="k")) == [
        (2, "changed", 1),
        (3, "changed", 2),
        (4, "removed", None),
        (5, "added", None),
        (6, "changed", 1),
    ]


def test_snapshot_diff_compare_cols_subset(spark):
    # only the requested columns participate: v's change is invisible
    old = spark.createDataFrame([(1, "a", 1.0)], ["k", "s", "v"])
    new = spark.createDataFrame([(1, "a", 2.0)], ["k", "s", "v"])
    assert _rows(snapshot_diff(old, new, "k", compare_cols=["s"])) == []


def test_snapshot_diff_composite_key(spark):
    old = spark.createDataFrame([(1, 1, "a"), (1, 2, "b")], ["k1", "k2", "s"])
    new = spark.createDataFrame([(1, 1, "z"), (2, 2, "b")], ["k1", "k2", "s"])
    got = sorted(
        (r.k1, r.k2, r.status) for r in
        snapshot_diff(old, new, keys=["k1", "k2"]).collect()
    )
    assert got == [
        (1, 1, "changed"),
        (1, 2, "removed"),
        (2, 2, "added"),
    ]


def test_snapshot_diff_missing_column_is_loud(spark):
    old = spark.createDataFrame([(1, "a")], ["k", "s"])
    new = spark.createDataFrame([(1,)], ["k"])
    with pytest.raises(ValueError, match="new snapshot lacks"):
        snapshot_diff(old, new, keys="k")


def test_snapshot_diff_plans_one_shuffle_no_python(spark):
    old = spark.range(1000).selectExpr("id AS k", "id * 2 AS v")
    new = spark.range(900).selectExpr("id AS k", "id * 2 + id % 3 AS v")
    df = snapshot_diff(old, new, keys="k")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # every third overlapping key changed (id % 3 != 0), 100 removed
    got = df.groupBy("status").count().collect()
    counts = {r["status"]: r["count"] for r in got}
    assert counts == {"changed": 600, "removed": 100}


def test_snapshot_diff_presence_only(spark):
    # explicit compare_cols=[] → presence-only diff; keys-only frames
    # take the same path (zero compare columns must not crash)
    old = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "s"])
    new = spark.createDataFrame([(2, "CHANGED"), (3, "c")], ["k", "s"])
    got = _rows(snapshot_diff(old, new, "k", compare_cols=[]))
    assert got == [(1, "removed", None), (3, "added", None)]
    keys_only = snapshot_diff(
        old.select("k"), new.select("k"), keys="k"
    )
    assert _rows(keys_only) == [(1, "removed", None), (3, "added", None)]


def test_snapshot_diff_include_values_carries_new_side(spark):
    from salesanalytics_etl_spark.operators.diff import apply_changes

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (4, "d", 40.0)], ["k", "s", "v"]
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 21.0), (5, "e", 50.0)], ["k", "s", "v"]
    )
    feed = snapshot_diff(old, new, keys="k", include_values=True)
    got = {r.k: (r.status, r.s, r.v) for r in feed.collect()}
    assert got == {
        2: ("changed", "B", 21.0),
        4: ("removed", None, None),  # new side is NULL for removed
        5: ("added", "e", 50.0),
    }
    rebuilt = apply_changes(old, feed, keys="k")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_apply_changes_rejects_keys_only_feed(spark):
    from salesanalytics_etl_spark.operators.diff import apply_changes

    old = spark.createDataFrame([(1, "a")], ["k", "s"])
    new = spark.createDataFrame([(2, "b")], ["k", "s"])
    feed = snapshot_diff(old, new, keys="k")  # no include_values
    with pytest.raises(ValueError, match="include_values"):
        apply_changes(old, feed, keys="k")


def test_snapshot_diff_reserved_names_raise(spark):
    old = spark.createDataFrame([(1, "x")], ["k", "status"])
    with pytest.raises(ValueError, match="collide"):
        snapshot_diff(old, old, keys="k")


def test_apply_changes_null_key_roundtrip(spark):
    from salesanalytics_etl_spark.operators.diff import apply_changes

    old = spark.createDataFrame([(None, "x"), (1, "a")], "k INT, s STRING")
    new = spark.createDataFrame([(None, "y"), (1, "a")], "k INT, s STRING")
    feed = snapshot_diff(old, new, keys="k", include_values=True)
    # null key reports as added+removed, never 'changed'
    assert sorted(r.status for r in feed.collect()) == ["added", "removed"]
    rebuilt = apply_changes(old, feed, keys="k")
    assert sorted(map(tuple, rebuilt.collect()), key=repr) == sorted(
        map(tuple, new.collect()), key=repr
    )


def test_apply_changes_preserves_column_order(spark):
    from salesanalytics_etl_spark.operators.diff import apply_changes

    # keys NOT leading: output order must match the snapshot, not the feed
    old = spark.createDataFrame([("a", 1, "b")], ["c1", "k", "c2"])
    new = spark.createDataFrame([("a", 1, "B"), ("x", 2, "y")],
                                ["c1", "k", "c2"])
    feed = snapshot_diff(old, new, keys="k", include_values=True)
    rebuilt = apply_changes(old, feed, keys="k")
    assert rebuilt.columns == ["c1", "k", "c2"]
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, new.collect())
    )
