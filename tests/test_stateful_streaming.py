"""The custom applyInPandasWithState sessionizer must agree with the batch
session_window plan: every session it closes (watermark-driven) matches the
batch session with the same (user, start) exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesanalytics_etl_spark.sources.readers import load_driver_tables
from salesanalytics_etl_spark.streaming.events import sessionize
from salesanalytics_etl_spark.streaming.stateful import (
    run_stateful_sessions_to_memory,
)


def test_stateful_sessions_match_batch(spark, sf_dir, tmp_path):
    import glob
    import os
    import time

    d = str(tmp_path / "events_stream")
    events = load_driver_tables(spark, sf_dir, ["events"])["events"]
    # time-ordered files → watermark advances across micro-batches and
    # actually closes sessions mid-stream. repartitionByRange gives
    # part-00000..part-00003 ascending time ranges; FileStreamSource takes
    # oldest-mtime-first, so stamp ascending mtimes to pin that order
    # (identical mtimes made the order — and the watermark — arbitrary).
    events.repartitionByRange(4, "ts").write.mode("overwrite").parquet(d)
    now = time.time()
    for i, f in enumerate(sorted(glob.glob(f"{d}/part-*.parquet"))):
        os.utime(f, (now + i * 10, now + i * 10))

    q = run_stateful_sessions_to_memory(spark, d, "t_sessions")
    q.awaitTermination(180)
    streamed = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.value_sum)
        for r in spark.table("t_sessions").collect()
    }
    assert len(streamed) > 0, "watermark never closed any session"

    batch = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.value_sum)
        for r in sessionize(events).collect()
    }
    # every closed streaming session must equal its batch twin exactly
    for key, s_val in streamed.items():
        assert key in batch, f"streamed session {key} not found in batch"
        assert s_val == batch[key], f"session {key}: {s_val} != {batch[key]}"
    # and the stream should have closed the large majority of sessions
    # (only sessions near the end of data stay open at availableNow stop)
    assert len(streamed) > 0.5 * len(batch)
