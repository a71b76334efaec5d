"""Event-stream analytics (extension beyond the strictly-batch reference —
SURVEY.md §2.10 notes the reference has no streaming; the driver's
``events`` table is the extension surface).

Two execution modes over the SAME logical transformations:
- batch: DataFrame over the parquet `events` table (oracle-checkable),
- streaming: Structured Streaming ``readStream`` + watermark; the hourly
  rollup is exactly the batch expression applied to a streaming source,
  which is the point of Spark's unified model.

Scale: tumbling-window aggregation shuffles on (window, event_type) — a
bounded-cardinality key → tiny state; sessionization shuffles on user_id
with watermark-bounded state eviction in streaming mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from salesanalytics_etl_spark.functions.scalar import money_out

SESSION_GAP = "30 minutes"


def hourly_event_rollup(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour window: event count + value sum per (hour, type).

    Uses ``F.window`` (the streaming-compatible form); window.start for an
    aligned 1h tumble equals date_trunc('hour', ts), which is the oracle
    twin.
    """
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # accumulate in decimal (exact, order-insensitive across any
            # partitioning) but EMIT rounded double — decimal output columns
            # hash-mismatch the driver gate (functions.scalar.money_out)
            money_out(F.sum(F.col("value").cast("decimal(18,2)"))).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def sessionize(events: DataFrame, gap: str = SESSION_GAP) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap.

    Batch mode uses ``F.session_window`` — Catalyst's native session
    operator (merging overlapping [ts, ts+gap) intervals). Output reports
    min/max event time + count per session, which is engine-agnostic (the
    gaps-and-islands SQL oracle computes the identical grouping).
    """
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            money_out(F.sum(F.col("value").cast("decimal(18,2)"))).alias("value_sum"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "value_sum")
    )


# ---------------------------------------------------------------------------
# True streaming path
# ---------------------------------------------------------------------------


def read_events_stream(
    spark: SparkSession, events_dir: str, schema=None
) -> DataFrame:
    """File-source stream over an events parquet directory.

    ``maxFilesPerTrigger=1`` gives incremental micro-batches in tests; in
    production this would be a Kafka source with the same downstream plan.
    """
    from salesanalytics_etl_spark.sources.readers import nanos_to_timestamp

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if schema is None:
        schema = spark.read.parquet(events_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    return nanos_to_timestamp(stream, "ts")


def streaming_hourly_rollup(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """The batch rollup + a watermark for late-data/state eviction."""
    return hourly_event_rollup(stream.withWatermark("ts", watermark))


def stream_stream_prior_views(
    events_stream: DataFrame,
    lookback: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked stream-stream join: each purchase joined to the same
    user's views in the preceding ``lookback``.

    Both sides carry a watermark and the join condition bounds view time
    to [purchase − lookback, purchase], so Spark can size and EVICT the
    view-side state buffer — the required shape for unbounded stream-stream
    joins. Semantically identical to the batch range_join (q42); the
    streaming test asserts that.
    """
    purchases = (
        events_stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_event_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    views = (
        events_stream.filter(F.col("event_type") == "view")
        .select(F.col("user_id").alias("v_user"), F.col("ts").alias("v_ts"))
        .withWatermark("v_ts", watermark)
    )
    return purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {lookback}"))
        & (F.col("v_ts") <= F.col("p_ts")),
    ).select("p_event_id", "p_user", "p_ts", "v_ts")


def run_stream_to_memory(
    spark: SparkSession, events_dir: str, table_name: str = "events_rollup"
):
    """Drive the streaming rollup into an in-memory sink (availableNow:
    process everything currently in the source, then stop). Returns the
    StreamingQuery; caller awaits termination and reads the sink table."""
    stream = read_events_stream(spark, events_dir)
    rollup = streaming_hourly_rollup(stream)
    return (
        rollup.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )


def streaming_dedup(
    stream: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once event dedup for streaming ingest: keep the first
    arrival per key, dropping any duplicate that arrives within the
    watermark horizon.

    ``dropDuplicatesWithinWatermark`` is Spark's native stateful dedup
    with BOUNDED state: entries are evicted once the watermark passes
    their event time, so memory tracks the duplicate-arrival horizon,
    not the stream's lifetime. (Plain ``dropDuplicates(keys)`` without
    the event-time column in the subset never evicts — state grows by
    one entry per distinct key forever; with the event-time column in
    the subset it evicts, but then a redelivery with a different
    timestamp isn't a duplicate. WithinWatermark gives eviction AND
    key-only equality.) This is the streaming counterpart of the batch
    exact_dedupe: at-least-once sources (Kafka redeliveries, file
    re-drops) become effectively-once downstream.
    """
    keys = keys or ["event_id"]
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def hopping_event_rollup(
    events: DataFrame, window: str = "1 hour", slide: str = "15 minutes"
) -> DataFrame:
    """Hopping (sliding) window: 1-hour windows every 15 minutes.

    ``F.window(ts, window, slide)`` assigns each event to window/slide
    (= 4) overlapping epoch-aligned windows — the streaming-compatible
    sliding-window operator (same expression runs under a watermark in
    Structured Streaming). The shuffle carries (window, type)-grain
    partial aggregates: map-side combine means the 4x row fan-out from
    overlap never crosses the exchange as raw events.
    """
    return (
        events.groupBy(
            F.window("ts", window, slide).alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            money_out(F.sum(F.col("value").cast("decimal(18,2)"))).alias(
                "value_sum"
            ),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )
