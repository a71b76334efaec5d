"""Streaming winnow near-dup detection: the streamed pair set must equal
the batch pipeline over the union corpus (on corpora where no posting
list crosses the cap mid-stream — arrival-time caps equal batch caps
there), and replay/restart must append nothing (exactly-once by
anti-join construction)."""

from __future__ import annotations

import pytest

from salesanalytics_etl_spark.operators.dedup import winnow_near_dupes
from salesanalytics_etl_spark.streaming.winnow_stream import WinnowNearDupSink


@pytest.fixture(scope="module")
def docs_stream3(spark, sf_dir, tmp_path_factory):
    """documents as 3 parquet files so maxFilesPerTrigger=1 yields 3 real
    micro-batches — cross-batch pairs exist because the planted dups are
    spread round-robin across the files."""
    out = str(tmp_path_factory.mktemp("winnow_stream_src"))
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    docs.repartition(3).write.mode("overwrite").parquet(out)
    return out


def _run(spark, src, state, ckpt):
    sink = WinnowNearDupSink(spark, state)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = sink.attach(stream, ckpt)
    q.awaitTermination(300)
    return sink


def test_streamed_pairs_cover_batch(spark, sf_dir, docs_stream3, tmp_path):
    """Arrival-time caps vs batch caps: posting-list dfc is MONOTONE over
    the stream, so a fingerprint under the cap at a pair's arrival can
    only later turn hot — streamed pairs are therefore a SUPERSET of the
    batch pipeline's (which drops whole hot lists at end-state), every
    common pair carries the identical exact jaccard, and every extra
    pair is still exact-verified >= t (strictly earlier evidence, never
    looser)."""
    sink = _run(
        spark,
        docs_stream3,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in sink.current_pairs().collect()
    }
    docs = spark.read.parquet(docs_stream3)
    want = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in winnow_near_dupes(docs).collect()
    }
    assert want and set(want) <= set(got)
    assert all(got[k] == want[k] for k in want)  # identical jaccards
    assert all(j >= 0.5 for j in got.values())  # extras exact-verified
    # state mirrors the corpus exactly once
    assert sink.current_docs().count() == docs.count()


def test_streamed_equals_batch_when_no_list_crosses_cap(spark, tmp_path):
    """On a corpus whose posting lists never exceed the cap, arrival-time
    and end-state caps agree and the streamed result is BIT-IDENTICAL to
    the batch pipeline — the exact-equality contract, pinned where it
    provably holds. Distinct vocabulary per group keeps every fp's dfc
    <= group size (3)."""
    import random

    rng = random.Random(7)
    rows = []
    for g in range(12):
        words = [
            f"{chr(97 + g)}{rng.randrange(10**6):06d}x{w}" for w in range(40)
        ]
        base = " ".join(words)
        variant = " ".join(
            w for i, w in enumerate(words) if i % 9 != 0
        )  # ~11% drop
        rows.append((3 * g, base))
        rows.append((3 * g + 1, base))  # exact dup
        rows.append((3 * g + 2, variant))  # near dup
    src = str(tmp_path / "nohot_src")
    spark.createDataFrame(rows, ["doc_id", "text"]).repartition(3).write.parquet(
        src
    )
    sink = _run(
        spark, src, str(tmp_path / "nohot_state"), str(tmp_path / "nohot_ckpt")
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in sink.current_pairs().collect()
    }
    want = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in winnow_near_dupes(spark.read.parquet(src)).collect()
    }
    assert got == want and want


def test_replay_appends_nothing(spark, docs_stream3, tmp_path):
    state = str(tmp_path / "state2")
    sink = _run(spark, docs_stream3, state, str(tmp_path / "ckpt2"))
    pairs1 = sorted(
        (r.doc_a, r.doc_b) for r in sink.current_pairs().collect()
    )
    n_fps1 = sink.current_index().count()
    n_docs1 = sink.current_docs().count()
    # fresh checkpoint, SAME state dir: every batch re-processes against
    # state that already holds its rows — the crash-replay window, at
    # its widest
    sink2 = _run(spark, docs_stream3, state, str(tmp_path / "ckpt3"))
    assert (
        sorted((r.doc_a, r.doc_b) for r in sink2.current_pairs().collect())
        == pairs1
    )
    assert sink2.current_index().count() == n_fps1
    assert sink2.current_docs().count() == n_docs1


def test_restart_resumes_from_checkpoint(spark, docs_stream3, tmp_path):
    """Committed checkpoint + no new files: availableNow runs no batch
    and state is untouched."""
    state = str(tmp_path / "state3")
    ckpt = str(tmp_path / "ckpt4")
    sink = _run(spark, docs_stream3, state, ckpt)
    n_pairs = sink.current_pairs().count()
    sink2 = _run(spark, docs_stream3, state, ckpt)  # same checkpoint
    assert sink2.current_pairs().count() == n_pairs
