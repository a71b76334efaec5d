"""Custom stateful streaming operator: incremental sessionization via
``applyInPandasWithState``.

``session_window`` (streaming/events.py) covers the built-in path; this is
the escape hatch the engine exposes for session semantics Spark can't
express declaratively (per-session custom aggregates, mid-session emission,
cross-session carry-over). State: one open session per user; events extend
it while they arrive within ``gap``; an event-time timeout (watermark-driven)
closes and emits the session.

Scale: state lives partitioned by user_id in the state store; the watermark
bounds it — users idle past the gap get closed and evicted every batch, so
state size tracks ACTIVE users, not history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MIN = 30

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("start", T.LongType()),  # epoch micros (timestamps in
        T.StructField("end", T.LongType()),    # state columns round-trip
        T.StructField("n", T.LongType()),      # awkwardly; longs are exact)
        T.StructField("vsum", T.DoubleType()),
    ]
)


def _sessionize_fn(gap_min: int):
    gap_us = gap_min * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def emit(start_us: int, end_us: int, n: int, vsum: float) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "value_sum": [round(vsum, 2)],
                }
            )

        if state.hasTimedOut:
            start_us, end_us, n, vsum = state.get
            state.remove()
            yield emit(start_us, end_us, n, vsum)
            return

        events = pd.concat(list(pdfs))
        ts_us = (events["ts"].astype("int64") // 1000).to_numpy()  # ns→us
        order = ts_us.argsort(kind="stable")
        ts_us = ts_us[order]
        vals = events["value"].to_numpy()[order]

        if state.exists:
            start_us, end_us, n, vsum = state.get
        else:
            start_us, end_us, n, vsum = ts_us[0], ts_us[0] - 1, 0, 0.0
            # end < first ts so the first event "extends" the empty session

        for t_us, v in zip(ts_us, vals):
            # >= gap starts a NEW session — matches F.session_window's
            # half-open [ts, ts+gap) merge rule and the q30 oracle's
            # `diff >= INTERVAL gap` convention (kept aligned across all
            # three sessionization paths)
            if n > 0 and t_us - end_us >= gap_us:
                yield emit(start_us, end_us, n, vsum)
                start_us, end_us, n, vsum = t_us, t_us, 1, float(v)
            else:
                end_us = max(end_us, int(t_us))
                if n == 0:
                    start_us = t_us
                n += 1
                vsum += float(v)

        timeout_ms = int(end_us // 1000) + gap_min * 60 * 1000
        if timeout_ms <= state.getCurrentWatermarkMs():
            # the gap edge is already behind the watermark (events arrived
            # in a batch whose watermark had advanced past them): the
            # session is closed by definition — emit now, keep no state
            yield emit(start_us, end_us, n, vsum)
        else:
            state.update((int(start_us), int(end_us), int(n), float(vsum)))
            # close the open session once the watermark passes its gap edge
            state.setTimeoutTimestamp(timeout_ms)

    return fn


def sessionize_stateful(
    stream: DataFrame, gap_min: int = SESSION_GAP_MIN
) -> DataFrame:
    """30-min-gap sessions over a STREAM, closed by event-time timeout."""
    return (
        stream.withWatermark("ts", f"{gap_min} minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_min),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_stateful_sessions_to_memory(spark, events_dir: str, table: str):
    from salesanalytics_etl_spark.streaming.events import read_events_stream

    stream = read_events_stream(spark, events_dir)
    return (
        sessionize_stateful(stream)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
