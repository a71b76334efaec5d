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


def test_snapshot_diff_validate_unique_catches_dup_keys(spark):
    from salesanalytics_etl_spark.operators.diff import snapshot_diff

    clean = spark.createDataFrame([(1, "a"), (2, "b")], "k INT, v STRING")
    dup = spark.createDataFrame([(1, "a"), (1, "b")], "k INT, v STRING")
    # clean sides pass with validation on
    assert (
        snapshot_diff(clean, clean, ["k"], validate_unique=True).count() == 0
    )
    import pytest

    with pytest.raises(ValueError, match="one-row-per-key"):
        snapshot_diff(dup, clean, ["k"], validate_unique=True)
    with pytest.raises(ValueError, match="new snapshot"):
        snapshot_diff(clean, dup, ["k"], validate_unique=True)
    # NULL-keyed rows never equi-match, so duplicates among them are
    # exempt from the uniqueness contract (each surfaces independently)
    nulls = spark.createDataFrame(
        [(None, "a"), (None, "b"), (1, "c")], "k INT, v STRING"
    )
    assert (
        snapshot_diff(nulls, clean, ["k"], validate_unique=True).count() > 0
    )


# ---- partition-pruned CDC (r9) ---------------------------------------------


def _snap_pair(spark):
    """Two snapshots over 6 partitions; changes confined to p in {1,2,5}."""
    old = spark.createDataFrame(
        [(i, i % 6, f"v{i}", float(i)) for i in range(60)],
        "k INT, p INT, s STRING, v DOUBLE",
    )
    new = spark.createDataFrame(
        # k=13 (p=1) changed value; k=2 (p=2) removed; k=101 (p=5) added
        [
            (i, i % 6, ("CHANGED" if i == 13 else f"v{i}"), float(i))
            for i in range(60)
            if i != 2
        ]
        + [(101, 5, "new", 101.0)],
        "k INT, p INT, s STRING, v DOUBLE",
    )
    return old, new


def test_pruned_diff_matches_full_diff(spark):
    from salesanalytics_etl_spark.operators.diff import snapshot_diff_pruned

    old, new = _snap_pair(spark)
    got = sorted(
        (r.k, r.status, r.n_changed_cols, r.p)
        for r in snapshot_diff_pruned(old, new, "k", ["p"]).collect()
    )
    want = sorted(
        (r.k, r.status, r.n_changed_cols, r.p)
        for r in snapshot_diff(
            old, new, "k", locator_cols=["p"]
        ).collect()
    )
    assert got == want
    assert got == [
        (2, "removed", None, 2),
        (13, "changed", 1, 1),
        (101, "added", None, 5),
    ]
    # removed row still carries its partition (locator coalesce)
    assert all(p is not None for (_, _, _, p) in got)


def test_pruned_diff_identical_snapshots_is_empty(spark):
    from salesanalytics_etl_spark.operators.diff import snapshot_diff_pruned

    old, _ = _snap_pair(spark)
    out = snapshot_diff_pruned(old, old, "k", ["p"])
    assert out.count() == 0
    assert out.columns == ["k", "status", "n_changed_cols", "p"]


def test_pruned_diff_budget_is_loud(spark):
    from salesanalytics_etl_spark.operators.diff import snapshot_diff_pruned

    old, new = _snap_pair(spark)
    with pytest.raises(ValueError, match="partitions"):
        snapshot_diff_pruned(old, new, "k", ["p"], max_changed_partitions=2)


def test_changed_partitions_exactly_the_touched_ones(spark):
    from salesanalytics_etl_spark.operators.diff import changed_partitions

    old, new = _snap_pair(spark)
    got = sorted(
        r.p
        for r in changed_partitions(
            old, new, ["p"], ["k", "p", "s", "v"]
        ).collect()
    )
    assert got == [1, 2, 5]


def test_apply_changes_partitioned_roundtrip(spark, tmp_path):
    import os

    from salesanalytics_etl_spark.operators.diff import (
        apply_changes_partitioned,
        snapshot_diff_pruned,
    )

    old, new = _snap_pair(spark)
    path = str(tmp_path / "tbl")
    old.write.partitionBy("p").parquet(path)
    feed = snapshot_diff_pruned(old, new, "k", ["p"], include_values=True)
    # untouched partition files must survive the apply BYTE-identical
    untouched = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(path, "p=0"))
        for f in fs
        if f.endswith(".parquet")
    )
    mtimes = {f: os.path.getmtime(f) for f in untouched}
    n = apply_changes_partitioned(spark, path, feed, "k", ["p"])
    assert n == 3  # partitions 1, 2, 5
    got = sorted(
        (r.k, r.p, r.s, r.v)
        for r in spark.read.parquet(path).collect()
    )
    want = sorted((r.k, r.p, r.s, r.v) for r in new.collect())
    assert got == want
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m, f"untouched partition rewritten: {f}"


def test_apply_changes_partitioned_rejects_locatorless_feed(spark, tmp_path):
    from salesanalytics_etl_spark.operators.diff import (
        apply_changes_partitioned,
    )

    old, new = _snap_pair(spark)
    path = str(tmp_path / "tbl2")
    old.write.partitionBy("p").parquet(path)
    feed = snapshot_diff(old, new, "k", include_values=True)
    # p IS in the feed (it's a compare col) but NOT as a locator: the
    # removed row carries p=NULL and the apply must refuse loudly
    with pytest.raises(ValueError, match="NULL partition"):
        apply_changes_partitioned(spark, path, feed, "k", ["p"])


def test_apply_changes_partitioned_deletes_emptying_a_partition(
    spark, tmp_path
):
    """A feed that removes EVERY row of a partition must delete that
    partition's files on disk — the dynamic overwrite alone never
    touches a partition absent from the written data, so without the
    explicit directory delete the removed rows would resurrect."""
    import os

    from salesanalytics_etl_spark.operators.diff import (
        apply_changes_partitioned,
        snapshot_diff_pruned,
    )

    old = spark.createDataFrame(
        [(i, i % 4, f"v{i}", float(i)) for i in range(40)],
        "k INT, p INT, s STRING, v DOUBLE",
    )
    # new snapshot drops partition p=3 ENTIRELY and changes one p=1 row
    new = spark.createDataFrame(
        [
            (i, i % 4, ("CHANGED" if i == 5 else f"v{i}"), float(i))
            for i in range(40)
            if i % 4 != 3
        ],
        "k INT, p INT, s STRING, v DOUBLE",
    )
    path = str(tmp_path / "tbl_empty")
    old.write.partitionBy("p").parquet(path)
    feed = snapshot_diff_pruned(old, new, "k", ["p"], include_values=True)
    untouched = sorted(
        os.path.join(dp, f)
        for dp, _, fs in os.walk(os.path.join(path, "p=0"))
        for f in fs
        if f.endswith(".parquet")
    )
    mtimes = {f: os.path.getmtime(f) for f in untouched}
    n = apply_changes_partitioned(spark, path, feed, "k", ["p"])
    assert n == 2  # p=1 (changed row) and p=3 (fully removed)
    got = sorted(
        (r.k, r.p, r.s, r.v) for r in spark.read.parquet(path).collect()
    )
    want = sorted((r.k, r.p, r.s, r.v) for r in new.collect())
    assert got == want  # deleted rows did NOT resurrect
    # the emptied partition's directory is gone from disk
    assert not os.path.exists(os.path.join(path, "p=3"))
    # untouched partitions stay byte-identical
    for f, m in mtimes.items():
        assert os.path.getmtime(f) == m, f"untouched partition rewritten: {f}"
    # idempotent second read (no stale staging dirs)
    assert spark.read.parquet(path).count() == 30


def test_apply_changes_partitioned_failed_delete_is_loud(
    spark, tmp_path, monkeypatch
):
    """r10 ADVICE (medium): a failed emptied-partition delete must FAIL
    the apply — ignore_errors would report success while the deleted
    rows sit on disk, resurrecting on the next read."""
    import shutil

    from salesanalytics_etl_spark.operators.diff import (
        apply_changes_partitioned,
        snapshot_diff_pruned,
    )

    old = spark.createDataFrame(
        [(i, i % 2, f"v{i}") for i in range(10)], "k INT, p INT, s STRING"
    )
    new = old.filter("p != 1")  # empties partition p=1
    path = str(tmp_path / "tbl_faildel")
    old.write.partitionBy("p").parquet(path)
    feed = snapshot_diff_pruned(old, new, "k", ["p"], include_values=True)
    monkeypatch.setattr(shutil, "rmtree", lambda *a, **kw: None)  # NFS hiccup
    with pytest.raises(RuntimeError, match="resurrect"):
        apply_changes_partitioned(spark, path, feed, "k", ["p"])


def test_partition_fingerprints_detect_null_shift(spark):
    """(5, NULL) -> (NULL, 5) within a row (count unchanged) must
    change the partition fingerprint: xxhash64 chains arguments and a
    NULL leaves the seed untouched, so without null markers this shift
    is missed deterministically, not at 2^-64 odds."""
    from salesanalytics_etl_spark.operators.diff import (
        changed_partitions,
        partition_fingerprints,
    )

    old = spark.createDataFrame(
        [(1, 0, 5, None), (2, 1, 7, 7)], "k INT, p INT, a INT, b INT"
    )
    new = spark.createDataFrame(
        [(1, 0, None, 5), (2, 1, 7, 7)], "k INT, p INT, a INT, b INT"
    )
    cols = ["k", "p", "a", "b"]
    fp_old = {
        r.p: (r._fp, r._cnt)
        for r in partition_fingerprints(old, ["p"], cols).collect()
    }
    fp_new = {
        r.p: (r._fp, r._cnt)
        for r in partition_fingerprints(new, ["p"], cols).collect()
    }
    assert fp_old[1] == fp_new[1]  # untouched partition agrees
    assert fp_old[0] != fp_new[0]  # NULL-shift partition differs
    got = [r.p for r in changed_partitions(old, new, ["p"], cols).collect()]
    assert got == [0]


def test_pruned_diff_checks_partition_cols_on_both_sides(spark):
    from salesanalytics_etl_spark.operators.diff import snapshot_diff_pruned

    old = spark.createDataFrame([(1, 0, "a")], "k INT, p INT, s STRING")
    new_no_p = spark.createDataFrame([(1, "a")], "k INT, s STRING")
    with pytest.raises(ValueError, match="new snapshot lacks partition"):
        snapshot_diff_pruned(old, new_no_p, "k", ["p"])
    with pytest.raises(ValueError, match="old snapshot lacks partition"):
        snapshot_diff_pruned(new_no_p, old, "k", ["p"])
