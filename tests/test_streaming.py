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
    parquet files so maxFilesPerTrigger=1 actually yields 4 micro-batches."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    events = load_driver_tables(spark, sf_dir, ["events"])["events"]
    events.repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_streaming_rollup_matches_batch(spark, sf_dir, events_stream_dir):
    q = run_stream_to_memory(spark, events_stream_dir, "t_rollup")
    q.awaitTermination(120)
    streamed = {tuple(r) for r in spark.table("t_rollup").collect()}
    events = load_driver_tables(spark, sf_dir, ["events"])["events"]
    batch = {tuple(r) for r in hourly_event_rollup(events).collect()}
    assert streamed == batch
    assert len(batch) > 0
