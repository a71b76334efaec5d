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
