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
    # every closed streaming session must match its batch twin: identity
    # (start/end/count) exactly; money within a cent-rounding tolerance
    # (the batch plan sums DECIMAL, the pandas accumulator sums float)
    for key, (s_end, s_n, s_sum) in streamed.items():
        assert key in batch, f"streamed session {key} not found in batch"
        b_end, b_n, b_sum = batch[key]
        assert (s_end, s_n) == (b_end, b_n), f"session {key} identity differs"
        assert abs(float(s_sum) - float(b_sum)) <= 0.05, (
            f"session {key}: value_sum {s_sum} vs {b_sum}"
        )
    # and the stream should have closed the large majority of sessions
    # (only sessions near the end of data stay open at availableNow stop)
    assert len(streamed) > 0.5 * len(batch)
