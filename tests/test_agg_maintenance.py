"""Incremental aggregate maintenance (partial-aggregate log):

1. After streaming events in micro-batches, ``current_rollup`` over the log
   must equal the batch ``hourly_event_rollup`` exactly.
2. Replaying a micro-batch (same batch_id) must not change the rollup —
   dynamic partition overwrite replaces, never double-adds.
3. Compacting the log must not change the rollup.
"""

from __future__ import annotations

from salesanalytics_etl_spark.sources.readers import load_driver_tables
from salesanalytics_etl_spark.streaming.agg_maintenance import (
    RollupMaintenanceSink,
    compact_log,
    current_rollup,
)
from salesanalytics_etl_spark.streaming.events import hourly_event_rollup


def _rollup_map(df):
    return {
        (str(r.hour_start), r.event_type): (r.n_events, r.value_sum)
        for r in df.collect()
    }


def test_maintained_rollup_matches_batch_and_survives_replay(
    spark, sf_dir, tmp_path
):
    src = str(tmp_path / "src")
    events = load_driver_tables(spark, sf_dir, ["events"])["events"]
    events.repartition(4).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    log_dir = str(tmp_path / "rollup_log")
    sink = RollupMaintenanceSink(spark, log_dir)
    q = sink.attach(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    want = _rollup_map(hourly_event_rollup(events))
    assert _rollup_map(current_rollup(spark, log_dir)) == want
    n_batches = (
        spark.read.parquet(log_dir).select("batch_id").distinct().count()
    )
    assert n_batches >= 2, "need multiple micro-batches to prove the log"

    # replay: re-process one micro-batch's data under its original batch_id
    # (simulates a foreachBatch retry after a crash-before-commit)
    replay = spark.read.parquet(src).limit(500)
    sink.process_batch(replay, batch_id=0)
    sink.process_batch(replay, batch_id=0)  # and a double-retry
    # batch 0's partition was REPLACED (with different content than the
    # original batch 0 — the point is no accumulation), so recompute what
    # the log now folds to: all non-zero batches' data is unknowable here,
    # but re-replaying identical data twice must be a no-op:
    after_once = _rollup_map(current_rollup(spark, log_dir))
    sink.process_batch(replay, batch_id=0)
    assert _rollup_map(current_rollup(spark, log_dir)) == after_once

    # compaction folds settled partitions without changing the result; the
    # newest batch partition stays un-folded (replay safety)
    compact_log(spark, log_dir)
    assert _rollup_map(current_rollup(spark, log_dir)) == after_once
    assert (
        spark.read.parquet(log_dir).select("batch_id").distinct().count() == 2
    )

    # CRASH-REPLAY AFTER COMPACTION: only the newest batch can ever be
    # re-delivered, and its partition was kept out of the fold — so the
    # replay overwrites it and the rollup is unchanged (no double count)
    newest = max(
        r[0] for r in spark.read.parquet(log_dir).select("batch_id").collect()
    )
    replay_newest = spark.read.parquet(src).limit(500)
    sink.process_batch(replay_newest, batch_id=newest)
    sink.process_batch(replay_newest, batch_id=newest)
    after_replay = _rollup_map(current_rollup(spark, log_dir))
    sink.process_batch(replay_newest, batch_id=newest)
    assert _rollup_map(current_rollup(spark, log_dir)) == after_replay


def test_compact_and_rollup_tolerate_dataless_log(spark, tmp_path):
    """A log dir holding only _SUCCESS (zero-row first batch) must not
    crash with UNABLE_TO_INFER_SCHEMA — compact_log no-ops, current_rollup
    returns an empty typed frame."""
    import os

    from salesanalytics_etl_spark.streaming.agg_maintenance import (
        compact_log,
        current_rollup,
    )

    log_dir = str(tmp_path / "empty_log")
    os.makedirs(log_dir)
    open(os.path.join(log_dir, "_SUCCESS"), "w").close()
    compact_log(spark, log_dir)  # must not raise
    out = current_rollup(spark, log_dir)
    assert out.count() == 0
    assert set(out.columns) == {
        "hour_start", "event_type", "n_events", "value_sum"
    }


def test_maintained_cusum_matches_batch_identity(spark, sf_dir, tmp_path):
    """current_cusum over the maintained log must equal computing the
    same prefix/running-min identity directly over the batch rollup —
    the streaming and batch change detectors cannot drift apart."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.streaming.agg_maintenance import (
        current_cusum,
    )

    src = str(tmp_path / "src")
    events = load_driver_tables(spark, sf_dir, ["events"])["events"]
    events.repartition(3).write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    log_dir = str(tmp_path / "cusum_log")
    sink = RollupMaintenanceSink(spark, log_dir)
    q = sink.attach(stream, checkpoint=str(tmp_path / "ckpt_cusum"))
    q.awaitTermination()

    got = {
        (r.event_type, str(r.hour_start)): (r.cents, r.cusum_cents, r.alarm)
        for r in current_cusum(spark, log_dir).collect()
    }

    # batch reference: identical identity over the batch rollup
    roll = hourly_event_rollup(events)
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
    dev = F.col("cents") - F.col("mu") - F.expr("mu div 20").cast("bigint")
    p = base.join(stats, "event_type").withColumn("_pp", F.sum(dev).over(w))
    m = p.withColumn("_minp", F.min("_pp").over(w))
    cusum = F.col("_pp") - F.least(F.lit(0), F.col("_minp"))
    want = {
        (r.event_type, str(r.hour_start)): (r.cents, r.cusum_cents, r.alarm)
        for r in m.select(
            "event_type",
            "hour_start",
            "cents",
            cusum.cast("bigint").alias("cusum_cents"),
            F.when(cusum >= 2 * F.col("mu"), 1)
            .otherwise(0)
            .cast("int")
            .alias("alarm"),
        ).collect()
    }
    assert got == want
    assert len(got) > 0
    # CUSUM is non-negative by construction
    assert all(c >= 0 for (_, c, _) in got.values())
