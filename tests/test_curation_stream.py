"""Streaming curation ingest: the accepted corpus must equal the batch
curation semantics (quality gate + one doc per fingerprint) regardless of
micro-batch boundaries, and re-streaming must append nothing."""

from __future__ import annotations

from pyspark.sql import functions as F

from salesanalytics_etl_spark.operators.text import normalize_text, token_count
from salesanalytics_etl_spark.streaming.curation_stream import CurationIngestSink

LONG = " ".join(f"w{i}" for i in range(12))


def _mk_source(spark, tmp_path):
    rows = [
        (1, "en", LONG),
        (2, "en", LONG),              # dup of 1, later file
        (3, "en", "too short"),       # quality-gated
        (4, "de", LONG + " anders"),  # kept
        (5, "en", LONG),              # dup of 1 again, third file
        (6, "fr", LONG + " autre"),   # kept
    ]
    src = str(tmp_path / "src")
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    # 3 files → ≥3 micro-batches with maxFilesPerTrigger=1: the dup pairs
    # (1,2) and (1,5) cross batch boundaries
    df.repartition(3).write.mode("overwrite").parquet(src)
    return src, df


def test_stream_matches_batch_curation_and_is_idempotent(spark, tmp_path):
    src, df = _mk_source(spark, tmp_path)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    sink = CurationIngestSink(spark, str(tmp_path / "corpus"), min_tokens=10)
    q = sink.attach(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = sink.current().collect()
    # batch twin: quality gate then one representative per fingerprint
    batch = df.filter(token_count(F.col("text")) >= 10).select(
        "doc_id", F.md5(normalize_text(F.col("text"))).alias("fp")
    )
    want_fps = {r.fp for r in batch.collect()}
    assert {r.fingerprint for r in got} == want_fps
    assert len(got) == len(want_fps)  # no fingerprint appears twice
    assert all(len(r.text.split()) >= 10 for r in got)

    # re-stream the same files from a fresh checkpoint: nothing appended
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q2 = sink.attach(stream2, checkpoint=str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    assert sink.current().count() == len(want_fps)


def test_torn_append_then_restart_converges_without_dupes(spark, tmp_path):
    """First-write-after-crash window (r14 verdict item 6 sweep): an
    append job killed mid-commit can leave SOME of a batch's part files
    visible in the corpus dir while the streaming checkpoint never
    committed the batch — the restarted stream then REPLAYS it. The
    replay's anti-join runs against state that already contains the torn
    rows' fingerprints, so it must append only the missing docs: each
    fingerprint exactly once, full coverage, no data loss."""
    src = str(tmp_path / "src_torn")
    corpus = str(tmp_path / "corpus_torn")
    ckpt = str(tmp_path / "ckpt_torn")

    f1 = spark.createDataFrame(
        [(1, "en", LONG), (2, "en", LONG + " zwei")],
        ["doc_id", "lang", "text"],
    )
    f1.coalesce(1).write.mode("overwrite").parquet(src)
    sink = CurationIngestSink(spark, corpus, min_tokens=10)
    schema = spark.read.parquet(src).schema
    q = sink.attach(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        checkpoint=ckpt,
    )
    q.awaitTermination(120)
    assert sink.current().count() == 2

    # the next batch {3, 4} crashes mid-append: doc 3's part file landed,
    # doc 4's did not, and the checkpoint never committed the batch —
    # stage the torn rows directly, exactly as a v2 committer leaves them
    torn = spark.createDataFrame(
        [(3, "fr", LONG + " trois")], ["doc_id", "lang", "text"]
    ).select(
        "doc_id",
        "lang",
        "text",
        F.md5(normalize_text(F.col("text"))).alias("fingerprint"),
    )
    torn.coalesce(1).write.mode("append").parquet(corpus)

    # restart: the full batch {3, 4} (plus a dup of 3) now arrives as new
    # files and the stream replays from the SAME checkpoint
    f2 = spark.createDataFrame(
        [
            (3, "fr", LONG + " trois"),
            (4, "de", LONG + " vier"),
            (5, "fr", LONG + " trois"),  # dup of the torn doc
        ],
        ["doc_id", "lang", "text"],
    )
    f2.coalesce(1).write.mode("append").parquet(src)
    q2 = sink.attach(
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src),
        checkpoint=ckpt,
    )
    q2.awaitTermination(120)

    got = sink.current().collect()
    fps = [r.fingerprint for r in got]
    assert len(fps) == len(set(fps)), "torn append produced a duplicate"
    want = {
        r.fp
        for r in spark.createDataFrame(
            [(1,), (2,), (3,), (4,)], ["i"]
        ).join(
            spark.createDataFrame(
                [
                    (1, LONG),
                    (2, LONG + " zwei"),
                    (3, LONG + " trois"),
                    (4, LONG + " vier"),
                ],
                ["i", "text"],
            ),
            "i",
        )
        .select(F.md5(normalize_text(F.col("text"))).alias("fp"))
        .collect()
    }
    assert set(fps) == want  # no doc lost, the torn doc not doubled
