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
        # value sum in integer CENTS: a float accumulator drifts with
        # arrival order and Python round() is half-to-even — both diverge
        # from the batch path's order-insensitive DECIMAL(18,2) sums at
        # boundary values (2.675 → 2.67 vs money_out's 2.68)
        T.StructField("cents", T.LongType()),
    ]
)


def _cents(v: float) -> int:
    # mirror Spark's CAST(double AS DECIMAL(18,2)): BigDecimal.valueOf
    # (shortest repr) then HALF_UP — repr() is the same shortest form
    from decimal import ROUND_HALF_UP, Decimal

    return int(
        (Decimal(repr(float(v))) * 100).quantize(Decimal("1"), ROUND_HALF_UP)
    )


def _sessionize_fn(gap_min: int):
    gap_us = gap_min * 60 * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key

        def emit(start_us: int, end_us: int, n: int, cents: int) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(end_us, unit="us")],
                    "n_events": [n],
                    "value_sum": [cents / 100.0],
                }
            )

        if state.hasTimedOut:
            start_us, end_us, n, cents = state.get
            state.remove()
            yield emit(start_us, end_us, n, cents)
            return

        events = pd.concat(list(pdfs))
        ts_us = (events["ts"].astype("int64") // 1000).to_numpy()  # ns→us
        order = ts_us.argsort(kind="stable")
        ts_us = ts_us[order]
        vals = events["value"].to_numpy()[order]

        # Linear interval merge over (stored session ∪ batch events),
        # sorted by start. This handles a late-but-valid event EARLIER
        # than the stored session start uniformly: it either extends the
        # session backwards (start = min — the bug in the previous
        # event-by-event form, which only maxed the end) or forms its own
        # disjoint earlier session. `>= gap` split matches
        # F.session_window's half-open [ts, ts+gap) merge rule and the
        # q30 oracle (aligned across all three sessionization paths).
        items = [tuple(state.get)] if state.exists else []
        items += [
            (int(t), int(t), 1, _cents(v)) for t, v in zip(ts_us, vals)
        ]
        items.sort(key=lambda x: x[0])
        cur = items[0]
        for nxt in items[1:]:
            if nxt[0] - cur[1] >= gap_us:
                yield emit(*cur)
                cur = nxt
            else:
                cur = (
                    cur[0],
                    max(cur[1], nxt[1]),
                    cur[2] + nxt[2],
                    cur[3] + nxt[3],
                )
        start_us, end_us, n, cents = cur

        timeout_ms = int(end_us // 1000) + gap_min * 60 * 1000
        if timeout_ms <= state.getCurrentWatermarkMs():
            # the gap edge is already behind the watermark (events arrived
            # in a batch whose watermark had advanced past them): the
            # session is closed by definition — emit now, keep no state
            yield emit(start_us, end_us, n, cents)
        else:
            state.update((int(start_us), int(end_us), int(n), int(cents)))
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
