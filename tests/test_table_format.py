"""Writer-selection seam (r10 verdict item 7): the parquet MERGE is
single-writer by contract; the Delta backend exists as code behind an
import gate so a deployment with delta-spark gets transaction-log
multi-writer MERGE by flipping one argument. The Delta test itself is
skipped in this container (no delta-spark) but pins the exact semantics
the backend must satisfy the moment the dependency appears."""

from __future__ import annotations

import pytest

from salesanalytics_etl_spark.operators.upsert import (
    delta_available,
    merge_upsert_delta,
    merge_upsert_table,
)


def _rows(spark, path):
    return sorted(
        (r.k, r.s, r.v) for r in spark.read.parquet(path).collect()
    )


def test_parquet_backend_whole_table_merge(spark, tmp_path):
    path = str(tmp_path / "t1")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k INT, s STRING, v DOUBLE"
    )
    merge_upsert_table(spark, path, base, ["k"])  # first load
    batch = spark.createDataFrame(
        [(2, "B", 20.0), (3, "c", 3.0)], "k INT, s STRING, v DOUBLE"
    )
    merge_upsert_table(spark, path, batch, ["k"])
    assert _rows(spark, path) == [(1, "a", 1.0), (2, "B", 20.0), (3, "c", 3.0)]
    # idempotent: the same batch is a fixpoint
    merge_upsert_table(spark, path, batch, ["k"])
    assert _rows(spark, path) == [(1, "a", 1.0), (2, "B", 20.0), (3, "c", 3.0)]


def test_parquet_backend_routes_partitioned(spark, tmp_path):
    path = str(tmp_path / "t2")
    base = spark.createDataFrame(
        [(i, i % 2, float(i)) for i in range(8)], "k INT, p INT, v DOUBLE"
    )
    merge_upsert_table(spark, path, base, ["k"], partition_by=["p"])
    batch = spark.createDataFrame([(0, 0, 99.0)], "k INT, p INT, v DOUBLE")
    merge_upsert_table(spark, path, batch, ["k"], partition_by=["p"])
    got = {(r.k): r.v for r in spark.read.parquet(path).collect()}
    assert got[0] == 99.0 and len(got) == 8


def test_unknown_format_raises(spark, tmp_path):
    df = spark.createDataFrame([(1,)], "k INT")
    with pytest.raises(ValueError, match="unknown table_format"):
        merge_upsert_table(spark, str(tmp_path / "t3"), df, ["k"],
                           table_format="iceberg")


def test_delta_backend_absent_is_loud(spark, tmp_path):
    if delta_available():
        pytest.skip("delta-spark present; the loud-ImportError path is moot")
    df = spark.createDataFrame([(1,)], "k INT")
    with pytest.raises(ImportError, match="delta-spark"):
        merge_upsert_table(spark, str(tmp_path / "t4"), df, ["k"],
                           table_format="delta")


@pytest.mark.skipif(not delta_available(), reason="delta-spark not installed")
def test_delta_backend_merge_semantics(spark, tmp_path):
    """merge_upsert through DeltaTable.merge: matched keys update ALL
    non-key columns, unmatched insert, re-run is a fixpoint — the exact
    contract of the parquet path."""
    path = str(tmp_path / "t5")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k INT, s STRING, v DOUBLE"
    )
    merge_upsert_delta(spark, path, base, ["k"])
    batch = spark.createDataFrame(
        [(2, "B", 20.0), (3, "c", 3.0)], "k INT, s STRING, v DOUBLE"
    )
    merge_upsert_delta(spark, path, batch, ["k"])
    got = sorted(
        (r.k, r.s, r.v)
        for r in spark.read.format("delta").load(path).collect()
    )
    assert got == [(1, "a", 1.0), (2, "B", 20.0), (3, "c", 3.0)]
    merge_upsert_delta(spark, path, batch, ["k"])  # fixpoint
    assert got == sorted(
        (r.k, r.s, r.v)
        for r in spark.read.format("delta").load(path).collect()
    )
