"""Streaming upsert (foreachBatch → merge_upsert): after streaming a table
in micro-batches, the sink state must equal the batch keep-last result, and
re-streaming the same data must not change it (idempotency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from salesanalytics_etl_spark.sources.readers import load_driver_tables
from salesanalytics_etl_spark.streaming.upsert_stream import ParquetUpsertSink


def _state(sink):
    return {
        r.event_id: (r.event_type, r.value) for r in sink.current().collect()
    }


def test_streaming_upsert_converges_and_is_idempotent(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    events = load_driver_tables(spark, sf_dir, ["events"])["events"]
    events.repartition(4).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    sink = ParquetUpsertSink(spark, str(tmp_path / "tbl"), keys=["event_id"])
    q = sink.attach(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = _state(sink)
    want = {
        r.event_id: (r.event_type, r.value) for r in events.collect()
    }
    assert got == want  # event_id unique → upsert state == source table

    # second pass over the same files from a fresh stream: same final state
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    q2 = sink.attach(stream2, checkpoint=str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    assert _state(sink) == want
