"""Incremental aggregate maintenance: keep a queryable rollup table current
under a stream, exactly-once, without watermark-finalization latency.

The append-mode streaming rollup (events.py:streaming_hourly_rollup) only
EMITS a window once the watermark closes it — correct for a results stream,
but a dashboard table wants every window current including still-open ones,
and late data folded in when it arrives. The standard lakehouse shape for
that is a PARTIAL-AGGREGATE LOG:

- each micro-batch writes its map-side partial aggregates (count + decimal
  sum per key) to a log directory partitioned by ``batch_id``. Dynamic
  partition overwrite makes a replayed micro-batch REPLACE its own partition
  instead of double-adding — idempotence comes from deterministic layout,
  not sink transactions (same principle as the reference's MERGE ingest,
  etl_sales_analytics.py:223-283).
- the queryable rollup is the final aggregation OVER the log — cheap because
  the log holds one row per (batch, key), not per event.
- ``compact_log`` folds all partitions into one, bounding log growth; it is
  safe to run any time because folding partials is the same associative
  aggregation.

Scale: the log is |batches| x |keys| rows, independent of event volume;
partial aggregation happens inside each micro-batch (map-side, streaming);
compaction is one bounded shuffle. Decimal accumulation keeps the fold
order-insensitive, so log -> final and batch -> final agree exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from salesanalytics_etl_spark.functions.scalar import money_out

_DEC = "decimal(18,2)"


def batch_partials(batch: DataFrame) -> DataFrame:
    """Per-(hour, event_type) partial aggregates of one micro-batch."""
    return batch.groupBy(
        F.date_trunc("hour", "ts").alias("hour_start"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast(_DEC)).cast(_DEC).alias("value_sum_partial"),
    )


class RollupMaintenanceSink:
    """foreachBatch sink maintaining the partial-aggregate log."""

    def __init__(self, spark: SparkSession, log_dir: str):
        self.spark = spark
        self.log_dir = log_dir

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        # a restarted stream must restore a crash-stranded .old BEFORE
        # its first write can recreate a bare log_dir (else the next
        # full repair would see live+old and delete the history)
        _restore_live(self.log_dir)
        (
            batch_partials(batch)
            .withColumn("batch_id", F.lit(int(batch_id)))
            .repartition(1)  # one small file per micro-batch partition
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(self.log_dir)
        )

    def attach(self, stream: DataFrame, checkpoint: str):
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )


def _restore_live(log_dir: str) -> None:
    """The correctness-bearing half of crash repair: if the live log is
    MISSING and ``.old`` exists, the compaction swap crashed between its
    two renames and ``.old`` IS the pre-compaction log — restore it.

    This (and only this) runs on every read and on every micro-batch
    write: it mutates nothing during normal operation (live present →
    no-op), so a dashboard read can never corrupt an in-flight
    compaction, and a restarted stream restores history BEFORE its
    first batch write can recreate a bare ``log_dir`` (which would
    otherwise strand batches 0..N in ``.old`` for the next full repair
    to delete).
    """
    old = log_dir.rstrip("/") + ".old"
    if not os.path.isdir(log_dir) and os.path.isdir(old):
        try:
            os.rename(old, log_dir)
        except OSError:
            # two readers (or a reader and a restarting stream) can both
            # pass the isdir checks in the crash-recovery window; the
            # rename loser must treat "another repairer won" as success
            # (r14 ADVICE) — only re-raise if the log is STILL missing
            if not os.path.isdir(log_dir):
                raise


def _repair_swap(log_dir: str) -> None:
    """Full repair for a compaction swap interrupted by a crash (r13
    verdict item 6 — the kill-between-renames window, same discipline
    as the upsert vacuum's unconditional swap-old repair):

    - log missing + ``.old`` present → restore (see _restore_live).
    - log present + ``.old`` present → the crash hit before the final
      delete; the swap completed, drop the leftover.
    - stale ``.compact`` staging is removed either way.

    The leftover-deletion half runs ONLY from compact_log (the
    single-compactor path — the availableNow trigger model this module
    documents): a concurrent read must never rmtree a ``.compact`` the
    live compactor is about to rename, so the read path uses
    :func:`_restore_live` alone.
    """
    import shutil

    _restore_live(log_dir)
    old = log_dir.rstrip("/") + ".old"
    tmp = log_dir.rstrip("/") + ".compact"
    if os.path.isdir(log_dir) and os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)


def current_rollup(spark: SparkSession, log_dir: str) -> DataFrame:
    """The maintained rollup: final fold over the partial log. Matches
    events.py:hourly_event_rollup on the same data, bit-for-bit."""
    _restore_live(log_dir)  # read path: restore-only, never delete
    has_data = os.path.isdir(log_dir) and any(
        f.endswith(".parquet")
        for _, _, files in os.walk(log_dir)
        for f in files
    )
    if not has_data:  # log never saw a data file — empty rollup, not an
        # UNABLE_TO_INFER_SCHEMA crash
        return spark.createDataFrame(
            [],
            "hour_start timestamp, event_type string, "
            "n_events bigint, value_sum double",
        )
    log = spark.read.parquet(log_dir)
    return (
        log.groupBy("hour_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            money_out(F.sum(F.col("value_sum_partial"))).alias("value_sum"),
        )
    )


def compact_log(spark: SparkSession, log_dir: str) -> None:
    """Fold settled log partitions into batch_id=-1, bounding log size.

    Replay safety: after a crash, only the LAST in-flight micro-batch can
    be re-delivered (Spark commits each batch to the checkpoint before
    starting the next). If compaction folded that batch into -1 and the
    replay then re-created its partition, its partials would count twice.
    So the newest batch partition is EXCLUDED from the fold and left in
    place — a replay overwrites it, exactly as during normal operation —
    and only batches strictly older (which the checkpoint has provably
    committed, or they could not have a successor) are folded.

    The swap is rename-aside (live -> .old, .compact -> live, delete .old)
    so a crash at any point leaves either the old or the new directory
    intact under a recoverable name — never a deleted log.

    Run between streaming runs (the availableNow trigger model); under a
    live stream this would be the Delta/Iceberg OPTIMIZE analogue.

    The rename-aside swap uses driver-local os.rename/shutil, so
    ``log_dir`` must be POSIX storage local to the driver (the test/demo
    deployment). On HDFS/S3, route the swap through the JVM Hadoop
    FileSystem API (``spark._jvm.org.apache.hadoop.fs``) instead —
    os.rename cannot cross filesystems or talk to object stores.
    """
    _repair_swap(log_dir)
    # A log holding no data files (only _SUCCESS after a zero-row first
    # batch) makes spark.read.parquet throw UNABLE_TO_INFER_SCHEMA before
    # any row-level guard can run — check the listing first.
    has_data = any(
        f.endswith(".parquet")
        for _, _, files in os.walk(log_dir)
        for f in files
    )
    if not has_data:
        return
    log = spark.read.parquet(log_dir)
    ids = [r[0] for r in log.select("batch_id").distinct().collect()]
    if not ids:  # zero-row log (data files present but empty)
        return
    newest = max(ids)
    settled = log.filter(F.col("batch_id") != newest)
    if not [i for i in ids if i != newest]:
        return  # nothing settled to fold
    folded = (
        settled.groupBy("hour_start", "event_type")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("value_sum_partial").cast(_DEC).alias("value_sum_partial"),
        )
        .withColumn("batch_id", F.lit(-1))
    )
    keep_newest = log.filter(F.col("batch_id") == newest)
    out = folded.unionByName(keep_newest)
    tmp = log_dir.rstrip("/") + ".compact"
    out.repartition(1).write.mode("overwrite").partitionBy("batch_id").parquet(tmp)
    old = log_dir.rstrip("/") + ".old"
    import shutil

    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(log_dir, old)
    os.rename(tmp, log_dir)
    shutil.rmtree(old)


def current_cusum(
    spark: SparkSession,
    log_dir: str,
    allowance_div: int = 20,
    alarm_mult: int = 2,
) -> DataFrame:
    """Streaming-maintained CUSUM change detection: the batch surface's
    q148 identity ``S_t = P_t - min(0, min_(j<=t) P_j)`` (with
    ``P = running sum of (x - mu - mu/allowance_div)``) applied over the
    CURRENT maintained rollup — per event type, at hour grain — so the
    sustained-shift detector stays current under a stream without ever
    reprocessing events. One row per (event_type, hour): hourly cents,
    CUSUM cents, and an integer alarm at ``S >= alarm_mult * mu``.

    Everything is exact integer cents (the maintained rollup's 2dp
    doubles are ON the cent grid by construction, so the floor rescale
    is lossless); mu is per-type integer division. Windows are
    PARTITIONED BY event type over the calendar-bounded hour grain —
    the q18/q79 bounded class, never event-scaled. The log fold itself
    is |batches| x |keys| rows, so refreshing the detector costs the
    rollup fold, not the stream.
    """
    from pyspark.sql import Window

    roll = current_rollup(spark, log_dir)
    base = roll.select(
        "event_type",
        "hour_start",
        F.floor(F.col("value_sum") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
    )
    stats = base.groupBy("event_type").agg(
        F.expr("CAST(sum(cents) div count(1) AS BIGINT)").alias("mu")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour_start")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dev = (
        F.col("cents")
        - F.col("mu")
        - F.expr(f"mu div {int(allowance_div)}").cast("bigint")
    )
    p = base.join(F.broadcast(stats), "event_type").withColumn(
        "_pp", F.sum(dev).over(w)
    )
    m = p.withColumn("_minp", F.min("_pp").over(w))
    cusum = F.col("_pp") - F.least(F.lit(0), F.col("_minp"))
    return m.select(
        "event_type",
        "hour_start",
        "cents",
        cusum.cast("bigint").alias("cusum_cents"),
        F.when(cusum >= int(alarm_mult) * F.col("mu"), 1)
        .otherwise(0)
        .cast("int")
        .alias("alarm"),
    )
