"""Structured Streaming path: the hourly rollup produced by the STREAMING
plan must equal the batch plan's result on the same data (Spark's unified
model, verified rather than assumed)."""

from __future__ import annotations

import pytest

from salesanalytics_etl_spark.sources.readers import load_driver_tables
from salesanalytics_etl_spark.streaming.events import (
    hourly_event_rollup,
    run_stream_to_memory,
)


@pytest.fixture(scope="module")
def events_stream_dir(spark, sf_dir, tmp_path_factory):
    """File-stream sources need a DIRECTORY; re-write the events table as 4
    parquet files so maxFilesPerTrigger=1 actually yields 4 micro-batches.

    Files are RANGE-partitioned by ts with ascending mtimes so the source
    processes them in event-time order: with randomly-split files, the
    watermark jumps to (global max − delay) after the first batch and the
    stateful operators legitimately DROP later files' rows as late data —
    an arrival-order property, not an engine bug, but it makes equality-
    with-batch assertions flaky.
    """
    import glob
    import os
    import time

    d = str(tmp_path_factory.mktemp("events_stream"))
    events = load_driver_tables(spark, sf_dir, ["events"])["events"]
    events.repartitionByRange(4, "ts").write.mode("overwrite").parquet(d)
    now = time.time()
    for i, f in enumerate(sorted(glob.glob(f"{d}/part-*.parquet"))):
        os.utime(f, (now + i * 10, now + i * 10))
    return d


def test_stream_stream_join_matches_batch(spark, sf_dir, events_stream_dir):
    from salesanalytics_etl_spark.operators.temporal import range_join
    from salesanalytics_etl_spark.streaming.events import (
        read_events_stream,
        stream_stream_prior_views,
    )

    stream = read_events_stream(spark, events_stream_dir)
    q = (
        stream_stream_prior_views(stream)
        .writeStream.format("memory")
        .queryName("t_ssjoin")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {tuple(r) for r in spark.table("t_ssjoin").collect()}

    events = load_driver_tables(spark, sf_dir, ["events"])["events"]
    purchases = events.filter("event_type = 'purchase'")
    views = events.filter("event_type = 'view'")
    from pyspark.sql import functions as F

    batch = {
        tuple(r)
        for r in range_join(
            purchases, views, on="user_id", left_ts="ts", right_ts="ts",
            lower="10 minutes", upper="0 seconds",
        )
        .select(
            F.col("l.event_id").alias("p_event_id"),
            F.col("l.user_id").alias("p_user"),
            F.col("l.ts").alias("p_ts"),
            F.col("r.ts").alias("v_ts"),
        )
        .collect()
    }
    # inner stream-stream join loses nothing once the stream drains
    assert streamed == batch and len(batch) > 0


def test_streaming_rollup_matches_batch(spark, sf_dir, events_stream_dir):
    q = run_stream_to_memory(spark, events_stream_dir, "t_rollup")
    q.awaitTermination(120)
    streamed = {tuple(r) for r in spark.table("t_rollup").collect()}
    events = load_driver_tables(spark, sf_dir, ["events"])["events"]
    batch = {tuple(r) for r in hourly_event_rollup(events).collect()}
    assert streamed == batch
    assert len(batch) > 0


def test_streaming_dedup_drops_cross_batch_duplicates(spark, tmp_path):
    """Duplicate event_ids delivered in LATER micro-batches (at-least-once
    redelivery) must be dropped by the watermarked stateful dedup."""
    import pandas as pd

    from salesanalytics_etl_spark.streaming.events import (
        read_events_stream,
        streaming_dedup,
    )

    src = str(tmp_path / "dup_events")
    base = pd.Timestamp("2024-01-01 00:00:00")
    b1 = pd.DataFrame(
        {
            "event_id": [1, 2, 3],
            "user_id": [10, 10, 11],
            "event_type": ["view"] * 3,
            "ts": [base, base + pd.Timedelta(minutes=1), base + pd.Timedelta(minutes=2)],
            "value": [1.0, 2.0, 3.0],
            "props": ["{}"] * 3,
        }
    )
    # batch 2 redelivers ids 2 and 3 (same payload) + one new event
    b2 = pd.concat([b1.iloc[1:3], b1.iloc[0:1].assign(event_id=4)])
    import os
    os.makedirs(src, exist_ok=True)
    b1.to_parquet(f"{src}/b1.parquet", index=False)
    b2.to_parquet(f"{src}/b2.parquet", index=False)

    stream = read_events_stream(spark, src)
    deduped = streaming_dedup(stream, keys=["event_id"])
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_id FROM dedup_sink").collect()
    assert sorted(r.event_id for r in got) == [1, 2, 3, 4]


def test_streaming_hopping_rollup_matches_batch(spark, sf_dir, events_stream_dir):
    """The hopping-window rollup (q107) under a watermarked stream equals
    the batch plan on the same data — the sliding-window twin of the
    tumbling equivalence above."""
    from salesanalytics_etl_spark.streaming.events import (
        hopping_event_rollup,
        read_events_stream,
    )

    stream = read_events_stream(spark, events_stream_dir)
    q = (
        hopping_event_rollup(stream.withWatermark("ts", "2 hours"))
        .writeStream.format("memory")
        .queryName("t_hop")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {tuple(r) for r in spark.table("t_hop").collect()}
    events = load_driver_tables(spark, sf_dir, ["events"])["events"]
    batch = {tuple(r) for r in hopping_event_rollup(events).collect()}
    assert streamed == batch
    assert len(batch) > 0
