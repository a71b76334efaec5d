"""Streaming MinHash maintenance: the state-store-maintained source
signatures must be BIT-IDENTICAL to a batch run over all documents seen
so far (min is a monotone, duplicate-insensitive fold — the property
that makes the sketch exactly streamable), and the pairwise readout
must equal the batch q172 matrix."""

from __future__ import annotations

import pytest

from salesanalytics_etl_spark.operators.dedup import (
    source_minhash_jaccard,
    source_minhash_signatures,
)
from salesanalytics_etl_spark.streaming.sketch_maintenance import (
    current_estimates,
    run_signature_maintenance_to_memory,
)


@pytest.fixture(scope="module")
def docs_stream_dir(spark, sf_dir, tmp_path_factory):
    """Re-write documents as 3 parquet files so maxFilesPerTrigger=1
    yields 3 real micro-batches (multi-batch state folding, not a
    single-batch degenerate run). No watermark in this pipeline, so
    file order cannot drop rows — any split works."""
    out = str(tmp_path_factory.mktemp("docs_stream"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(3).write.mode("overwrite").parquet(out)
    return out


def test_streamed_signatures_equal_batch(spark, sf_dir, docs_stream_dir):
    q = run_signature_maintenance_to_memory(
        spark, docs_stream_dir, "sig_state", max_files_per_trigger=1
    )
    q.awaitTermination(120)
    assert q.lastProgress is not None
    batches = q.recentProgress
    assert len(batches) >= 3, "expected >= 3 micro-batches"
    got = {
        r["source"]: tuple(r[f"mh{i}"] for i in range(32))
        for r in spark.table("sig_state").collect()
    }
    want = {
        r["source"]: tuple(r[f"mh{i}"] for i in range(32))
        for r in source_minhash_signatures(
            spark.read.parquet(docs_stream_dir)
        ).collect()
    }
    assert got == want  # bit-identical signatures, all sources

    # pairwise readout == the batch q172 matrix on the same corpus
    est_stream = sorted(
        map(tuple, current_estimates(spark, "sig_state").collect())
    )
    est_batch = sorted(
        map(
            tuple,
            source_minhash_jaccard(
                spark.read.parquet(docs_stream_dir)
            ).collect(),
        )
    )
    assert est_stream == est_batch


def test_restarted_maintenance_resumes_from_checkpoint(
    spark, sf_dir, tmp_path
):
    """Restart parity (r14 verdict item 6 sweep): a maintenance query
    killed after N batches and RESTARTED from the same checkpoint must
    restore the signature state from the state store, fold only the NEW
    files, and emit signatures bit-identical to a batch run over the
    union — the exactness claim survives a process restart, not just a
    single uninterrupted run."""
    src = str(tmp_path / "docs_restart")
    ckpt = str(tmp_path / "sig_ckpt")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    half_a = docs.filter("doc_id % 2 = 0")
    half_b = docs.filter("doc_id % 2 = 1")
    half_a.repartition(2).write.mode("overwrite").parquet(src)

    # phase 1: two micro-batches over half the corpus, then the query
    # terminates (availableNow) — the state store holds the partial fold
    q1 = run_signature_maintenance_to_memory(
        spark, src, "sig_restart_a", max_files_per_trigger=1, checkpoint=ckpt
    )
    q1.awaitTermination(120)
    got_a = {
        r["source"]: tuple(r[f"mh{i}"] for i in range(32))
        for r in spark.table("sig_restart_a").collect()
    }
    want_a = {
        r["source"]: tuple(r[f"mh{i}"] for i in range(32))
        for r in source_minhash_signatures(half_a).collect()
    }
    assert got_a == want_a

    # the other half arrives while the query is DOWN
    half_b.repartition(2).write.mode("append").parquet(src)

    # phase 2: restart from the SAME checkpoint — only the new files are
    # read (the source's commit log), the restored mins keep folding
    q2 = run_signature_maintenance_to_memory(
        spark, src, "sig_restart_b", max_files_per_trigger=1, checkpoint=ckpt
    )
    q2.awaitTermination(120)
    assert q2.lastProgress is not None
    got = {
        r["source"]: tuple(r[f"mh{i}"] for i in range(32))
        for r in spark.table("sig_restart_b").collect()
    }
    want = {
        r["source"]: tuple(r[f"mh{i}"] for i in range(32))
        for r in source_minhash_signatures(
            spark.read.parquet(src)
        ).collect()
    }
    assert got == want  # bit-identical to batch over the UNION


def test_restart_with_no_new_files_falls_back_to_batch(
    spark, sf_dir, tmp_path
):
    """The r15 review window: availableNow with every file already
    committed runs NO micro-batch, so the restarted query's memory
    table stays empty even though the state store holds the fold.
    current_signatures/current_estimates with a docs_dir fallback must
    return the full (batch-identical) state instead of nothing."""
    from salesanalytics_etl_spark.streaming.sketch_maintenance import (
        current_signatures,
    )

    src = str(tmp_path / "docs_nonew")
    ckpt = str(tmp_path / "sig_ckpt_nonew")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(2).write.mode("overwrite").parquet(src)

    q1 = run_signature_maintenance_to_memory(
        spark, src, "sig_nonew_a", max_files_per_trigger=1, checkpoint=ckpt
    )
    q1.awaitTermination(120)
    assert spark.table("sig_nonew_a").count() > 0

    # restart with ZERO new files: no batch runs, bare table is empty
    q2 = run_signature_maintenance_to_memory(
        spark, src, "sig_nonew_b", max_files_per_trigger=1, checkpoint=ckpt
    )
    q2.awaitTermination(120)
    assert spark.table("sig_nonew_b").count() == 0  # the review finding

    got = {
        r["source"]: tuple(r[f"mh{i}"] for i in range(32))
        for r in current_signatures(
            spark, "sig_nonew_b", docs_dir=src
        ).collect()
    }
    want = {
        r["source"]: tuple(r[f"mh{i}"] for i in range(32))
        for r in source_minhash_signatures(
            spark.read.parquet(src)
        ).collect()
    }
    assert got == want  # fallback serves the full, batch-identical state

    # populated-table path unchanged: fallback must NOT shadow live state
    got_live = {
        r["source"]: tuple(r[f"mh{i}"] for i in range(32))
        for r in current_signatures(
            spark, "sig_nonew_a", docs_dir=src
        ).collect()
    }
    assert got_live == want


def test_unregistered_table_falls_back_to_batch(spark, sf_dir, tmp_path):
    """The r15 ADVICE window: in a FRESH monitor process the memory
    sink table may not be registered at all (the maintenance query has
    never run there), so current_signatures must treat "table absent"
    like "table empty" when docs_dir is given — batch fold, not
    TABLE_OR_VIEW_NOT_FOUND — and still raise without the fallback."""
    from pyspark.errors import AnalysisException

    from salesanalytics_etl_spark.streaming.sketch_maintenance import (
        current_signatures,
    )

    src = str(tmp_path / "docs_unreg")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(2).write.mode("overwrite").parquet(src)
    assert not spark.catalog.tableExists("sig_never_registered")

    got = {
        r["source"]: tuple(r[f"mh{i}"] for i in range(32))
        for r in current_signatures(
            spark, "sig_never_registered", docs_dir=src
        ).collect()
    }
    want = {
        r["source"]: tuple(r[f"mh{i}"] for i in range(32))
        for r in source_minhash_signatures(
            spark.read.parquet(src)
        ).collect()
    }
    assert got == want  # absent table == empty table when docs_dir given

    # without docs_dir there is nothing to fall back to: still raises
    with pytest.raises(AnalysisException):
        current_signatures(spark, "sig_never_registered").take(1)
