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


def test_compaction_crash_between_renames_recovers(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Fault-injection for the compaction swap (r13 verdict item 6,
    mirroring test_table_format's mid-swap crash): os.rename raises
    IMMEDIATELY AFTER moving live -> .old (the exact window where the
    log directory does not exist), and both the read path
    (current_rollup) and the next compact_log must repair — restoring
    the log, folding correctly, stranding nothing."""
    import os

    import pytest

    import salesanalytics_etl_spark.streaming.agg_maintenance as M

    log_dir = str(tmp_path / "crash_log")
    sink = M.RollupMaintenanceSink(spark, log_dir)
    events = load_driver_tables(spark, sf_dir, ["events"])["events"]
    for bid in range(3):
        sink.process_batch(events.limit(400 + 100 * bid), batch_id=bid)
    want = _rollup_map(current_rollup(spark, log_dir))

    real_rename = os.rename

    def crash_after_first_rename(src, dst):
        real_rename(src, dst)
        if src.rstrip("/") == log_dir.rstrip("/"):
            raise OSError("injected crash between the swap's renames")

    monkeypatch.setattr(M.os, "rename", crash_after_first_rename)
    with pytest.raises(OSError, match="injected crash"):
        M.compact_log(spark, log_dir)
    monkeypatch.setattr(M.os, "rename", real_rename)
    # crash state: live log GONE, .old + .compact stranded
    assert not os.path.exists(log_dir)
    assert os.path.exists(log_dir + ".old")
    # the READ path restores the live log and serves the exact rollup;
    # it is restore-ONLY (never deletes), so .compact survives until
    # the single-compactor path clears it
    assert _rollup_map(current_rollup(spark, log_dir)) == want
    assert os.path.exists(log_dir) and not os.path.exists(log_dir + ".old")
    assert os.path.exists(log_dir + ".compact")
    # the next compaction clears leftovers and completes the fold:
    # batch -1 + newest only
    M.compact_log(spark, log_dir)
    assert _rollup_map(current_rollup(spark, log_dir)) == want
    got_ids = sorted(
        r[0]
        for r in spark.read.parquet(log_dir)
        .select("batch_id")
        .distinct()
        .collect()
    )
    assert got_ids == [-1, 2]
    assert not os.path.exists(log_dir + ".old")
    assert not os.path.exists(log_dir + ".compact")


def test_compaction_crash_before_old_delete_recovers(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The OTHER crash window: both renames completed but the .old
    delete did not run — the swap is live, the leftover must be dropped
    by the next touch, and the rollup is already correct."""
    import os
    import shutil

    import pytest

    import salesanalytics_etl_spark.streaming.agg_maintenance as M

    log_dir = str(tmp_path / "crash_log2")
    sink = M.RollupMaintenanceSink(spark, log_dir)
    events = load_driver_tables(spark, sf_dir, ["events"])["events"]
    for bid in range(3):
        sink.process_batch(events.limit(300 + 100 * bid), batch_id=bid)
    want = _rollup_map(current_rollup(spark, log_dir))

    real_rmtree = shutil.rmtree

    def crash_on_old_delete(path, *a, **k):
        if str(path).rstrip("/") == log_dir + ".old":
            raise OSError("injected crash before the .old delete")
        return real_rmtree(path, *a, **k)

    monkeypatch.setattr("shutil.rmtree", crash_on_old_delete)
    try:
        with pytest.raises(OSError, match="injected crash"):
            M.compact_log(spark, log_dir)
    finally:
        monkeypatch.undo()
    # swap completed; .old stranded. The READ path serves the correct
    # rollup but does NOT delete the leftover (restore-only — a reader
    # must never race a live compactor's files); compact_log clears it
    assert os.path.exists(log_dir) and os.path.exists(log_dir + ".old")
    assert _rollup_map(current_rollup(spark, log_dir)) == want
    assert os.path.exists(log_dir + ".old")
    M.compact_log(spark, log_dir)
    assert not os.path.exists(log_dir + ".old")


def test_stream_restart_after_mid_swap_crash_preserves_history(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The post-close review's data-loss window: compaction crashes
    between its two renames (live gone, history stranded in .old), then
    the STREAM restarts and writes a new micro-batch before any
    read/compact runs. The sink must restore .old first — otherwise its
    write recreates a bare log_dir holding only the new batch and the
    next repair deletes batches 0..N with it."""
    import os

    import pytest

    import salesanalytics_etl_spark.streaming.agg_maintenance as M

    log_dir = str(tmp_path / "restart_log")
    sink = M.RollupMaintenanceSink(spark, log_dir)
    events = load_driver_tables(spark, sf_dir, ["events"])["events"]
    for bid in range(3):
        sink.process_batch(events.limit(300 + 100 * bid), batch_id=bid)

    real_rename = os.rename

    def crash_after_first_rename(src, dst):
        real_rename(src, dst)
        if src.rstrip("/") == log_dir.rstrip("/"):
            raise OSError("injected crash between the swap's renames")

    monkeypatch.setattr(M.os, "rename", crash_after_first_rename)
    with pytest.raises(OSError, match="injected crash"):
        M.compact_log(spark, log_dir)
    monkeypatch.setattr(M.os, "rename", real_rename)
    assert not os.path.exists(log_dir) and os.path.exists(log_dir + ".old")

    # restart: the next micro-batch arrives BEFORE any read or compact
    sink.process_batch(events.limit(700), batch_id=3)
    got = spark.read.parquet(log_dir)
    ids = sorted(r[0] for r in got.select("batch_id").distinct().collect())
    assert ids == [0, 1, 2, 3], ids  # history restored, not replaced
    # and the subsequent full repair + fold keeps all of it
    M.compact_log(spark, log_dir)
    want_ids = sorted(
        r[0]
        for r in spark.read.parquet(log_dir)
        .select("batch_id")
        .distinct()
        .collect()
    )
    assert want_ids == [-1, 3]
