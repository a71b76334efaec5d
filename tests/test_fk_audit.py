"""fk_audit — planted-case tests: orphans vs legal NULL keys, empty
parent, duplicate-name validation, exact basis-point arithmetic."""

import pytest

from salesanalytics_etl_spark.operators.integrity import fk_audit


def test_fk_audit_counts_and_bp(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (99,), (None,)], "fk INT"
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk INT")
    row = fk_audit([("c->p", child, "fk", parent, "pk")]).collect()[0]
    assert (row.edge, row.n_rows, row.n_null_keys, row.n_orphans) == (
        "c->p", 5, 1, 1,
    )
    # 1 orphan / 4 non-null keys = 2500 bp exactly
    assert row.orphan_bp == 2500


def test_fk_audit_multiple_edges_and_empty_parent(spark):
    child = spark.createDataFrame([(1,), (2,)], "fk INT")
    parent = spark.createDataFrame([(1,)], "pk INT")
    empty = spark.createDataFrame([], "pk INT")
    out = {
        r.edge: r
        for r in fk_audit(
            [
                ("a", child, "fk", parent, "pk"),
                ("b", child, "fk", empty, "pk"),
            ]
        ).collect()
    }
    assert out["a"].n_orphans == 1 and out["a"].orphan_bp == 5000
    # empty parent: every non-null key is an orphan
    assert out["b"].n_orphans == 2 and out["b"].orphan_bp == 10000


def test_fk_audit_all_null_keys_has_null_bp(spark):
    child = spark.createDataFrame([(None,), (None,)], "fk INT")
    parent = spark.createDataFrame([(1,)], "pk INT")
    row = fk_audit([("e", child, "fk", parent, "pk")]).collect()[0]
    assert (row.n_rows, row.n_null_keys, row.n_orphans) == (2, 2, 0)
    assert row.orphan_bp is None  # no non-null keys → share undefined


def test_fk_audit_validation(spark):
    df = spark.createDataFrame([(1,)], "k INT")
    with pytest.raises(ValueError, match="no edges"):
        fk_audit([])
    with pytest.raises(ValueError, match="duplicate edge names"):
        fk_audit(
            [("e", df, "k", df, "k"), ("e", df, "k", df, "k")]
        )


def test_fk_audit_duplicate_parent_keys_not_double_counted(spark):
    # parent distinct-ed before the join: dup parent keys must not
    # multiply child rows (n_rows would silently inflate)
    child = spark.createDataFrame([(1,), (2,)], "fk INT")
    parent = spark.createDataFrame([(1,), (1,), (1,)], "pk INT")
    row = fk_audit([("e", child, "fk", parent, "pk")]).collect()[0]
    assert (row.n_rows, row.n_orphans, row.orphan_bp) == (2, 1, 5000)
