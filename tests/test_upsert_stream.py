"""Streaming upsert (foreachBatch → merge_upsert): after streaming a table
in micro-batches, the sink state must equal the batch keep-last result, and
re-streaming the same data must not change it (idempotency)."""

from __future__ import annotations

from pyspark.sql import functions as F

from salesanalytics_etl_spark.sources.readers import load_driver_tables
from salesanalytics_etl_spark.streaming.upsert_stream import ParquetUpsertSink


def _state(sink):
    return {
        r.event_id: (r.event_type, r.value) for r in sink.current().collect()
    }


def test_streaming_upsert_converges_and_is_idempotent(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    events = load_driver_tables(spark, sf_dir, ["events"])["events"]
    events.repartition(4).write.mode("overwrite").parquet(src)

    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    sink = ParquetUpsertSink(spark, str(tmp_path / "tbl"), keys=["event_id"])
    q = sink.attach(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    got = _state(sink)
    want = {
        r.event_id: (r.event_type, r.value) for r in events.collect()
    }
    assert got == want  # event_id unique → upsert state == source table

    # second pass over the same files from a fresh stream: same final state
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src)
    )
    q2 = sink.attach(stream2, checkpoint=str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    assert _state(sink) == want


def test_partitioned_streaming_upsert_touches_only_batch_partitions(
    spark, sf_dir, tmp_path
):
    """Partition-scoped CDC sink: final state == batch merge result, and a
    micro-batch confined to one partition leaves every other partition's
    data files byte-identical on disk."""
    import glob
    import hashlib
    import os

    from salesanalytics_etl_spark.streaming.upsert_stream import (
        PartitionedParquetUpsertSink,
    )

    src = str(tmp_path / "src")
    events = (
        load_driver_tables(spark, sf_dir, ["events"])["events"]
        .withColumn("day", F.to_date("ts"))
    )
    # seed load: everything except the last day
    days = sorted(r.day for r in events.select("day").distinct().collect())
    hot, cold = days[-1], days[:-1]
    sink = PartitionedParquetUpsertSink(
        spark, str(tmp_path / "tbl"), keys=["event_id"], partition_by=["day"]
    )
    sink.process_batch(events.filter(F.col("day") != hot), batch_id=0)

    def file_hashes():
        out = {}
        for p in glob.glob(os.path.join(sink.path, "**", "*.parquet"),
                           recursive=True):
            with open(p, "rb") as f:
                out[p] = hashlib.md5(f.read()).hexdigest()
        return out

    before = file_hashes()

    # stream ONLY the hot day's events through the sink
    hot_src = str(tmp_path / "hot")
    events.filter(F.col("day") == hot).repartition(3).write.parquet(hot_src)
    schema = spark.read.parquet(hot_src).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(hot_src)
    )
    q = sink.attach(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # cold partitions' files untouched byte-for-byte
    after = file_hashes()
    cold_before = {p: h for p, h in before.items() if f"day={hot}" not in p}
    assert cold_before == {
        p: h for p, h in after.items() if f"day={hot}" not in p
    }

    # final state equals the full-table batch result
    got = {
        r.event_id: (r.event_type, r.value) for r in sink.current().collect()
    }
    want = {r.event_id: (r.event_type, r.value) for r in events.collect()}
    assert got == want


def test_sink_resumes_from_disk_generation(spark, tmp_path):
    """A fresh sink object over an existing table dir must resume from the
    highest gen-N on disk — a memory-only counter reset to gen-0 and the
    next merge silently rebuilt the table from one batch."""
    path = str(tmp_path / "resume_t")
    s1 = ParquetUpsertSink(spark, path, keys=["k"])
    s1.process_batch(spark.createDataFrame([(1, "a")], "k long, v string"), 0)
    s1.process_batch(spark.createDataFrame([(2, "b")], "k long, v string"), 1)

    s2 = ParquetUpsertSink(spark, path, keys=["k"])  # simulated restart
    assert s2.generation == s1.generation
    s2.process_batch(spark.createDataFrame([(3, "c")], "k long, v string"), 2)
    got = {r.k: r.v for r in s2.current().collect()}
    assert got == {1: "a", 2: "b", 3: "c"}  # nothing lost across restart


def test_sink_dedupes_batch_and_gcs_generations(spark, tmp_path):
    import os

    path = str(tmp_path / "dedup_t")
    sink = ParquetUpsertSink(spark, path, keys=["k"], order_col="seq")
    batch = spark.createDataFrame(
        [(1, 1, "old"), (1, 2, "new"), (2, 1, "x")], "k long, seq long, v string"
    )
    sink.process_batch(batch, 0)
    got = {r.k: r.v for r in sink.current().collect()}
    assert got == {1: "new", 2: "x"}  # two updates to k=1 collapse, last wins
    sink.process_batch(
        spark.createDataFrame([(3, 1, "y")], "k long, seq long, v string"), 1
    )
    gens = sorted(d for d in os.listdir(path) if d.startswith("gen-"))
    assert len(gens) <= 2  # superseded generations GC'd (1 predecessor kept)


def test_sink_resume_skips_uncommitted_partial_generation(spark, tmp_path):
    """A write killed mid-flight leaves a gen dir WITHOUT _SUCCESS; a
    restarted sink must resume from the last COMMITTED generation (the
    replayed batch's overwrite then clears the partial dir) — counting
    the partial dir would merge the replay against incomplete data."""
    import os

    path = str(tmp_path / "partial_t")
    s1 = ParquetUpsertSink(spark, path, keys=["k"])
    s1.process_batch(spark.createDataFrame([(1, "a")], "k long, v string"), 0)
    committed = s1.generation
    # simulate the crashed write of the NEXT generation: dir exists,
    # partial data file, no _SUCCESS marker
    partial = os.path.join(path, f"gen-{committed + 1}")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "wb") as f:
        f.write(b"partial garbage")

    s2 = ParquetUpsertSink(spark, path, keys=["k"])  # restart
    assert s2.generation == committed  # partial gen not resumed
    assert {r.k for r in s2.current().collect()} == {1}
    # the replayed batch overwrites the partial dir and commits cleanly
    s2.process_batch(spark.createDataFrame([(2, "b")], "k long, v string"), 1)
    got = {r.k: r.v for r in s2.current().collect()}
    assert got == {1: "a", 2: "b"}
    assert os.path.exists(os.path.join(partial, "_SUCCESS"))


def test_stream_accumulated_small_files_compact(spark, tmp_path):
    """Three micro-batches into one hot partition leave three small
    files; sink.compact() collapses them to one, preserves the exact
    table state, and leaves the cold partition's file untouched."""
    import glob
    import os

    from salesanalytics_etl_spark.streaming.upsert_stream import (
        PartitionedParquetUpsertSink,
    )

    sink = PartitionedParquetUpsertSink(
        spark, str(tmp_path / "tbl"), keys=["k"], partition_by=["dt"]
    )
    sink.process_batch(
        spark.createDataFrame([(0, "cold", "x")], ["k", "dt", "v"]), 0
    )
    for i in range(1, 4):  # three batches, all touching dt=hot
        sink.process_batch(
            spark.createDataFrame([(i, "hot", f"v{i}")], ["k", "dt", "v"]), i
        )

    def files(part):
        return glob.glob(os.path.join(sink.path, f"dt={part}", "*.parquet"))

    # each merge's rewrite file count tracks the shuffle layout, so force
    # the multi-file precondition deterministically: append one extra
    # small file into the hot partition (what a parallel loader does)
    spark.createDataFrame(
        [(99, "hot", "extra")], ["k", "dt", "v"]
    ).coalesce(1).write.mode("append").partitionBy("dt").parquet(sink.path)
    assert len(files("hot")) >= 2  # compaction has real work to do

    cold_before = {f: open(f, "rb").read() for f in files("cold")}
    state_before = sorted(
        (r.k, r.dt, r.v) for r in sink.current().collect()
    )
    assert sink.compact() >= 1
    assert len(files("hot")) == 1
    assert {f: open(f, "rb").read() for f in files("cold")} == cold_before
    assert (
        sorted((r.k, r.dt, r.v) for r in sink.current().collect())
        == state_before
    )


def test_crash_between_generation_write_and_advance_recovers(
    spark, tmp_path, monkeypatch
):
    """Fault-injection twin of test_table_format.py's mid-swap crash
    (r12 verdict item 6): the batch's generation dir is COMMITTED on disk
    but the sink dies before advancing its counter / GC'ing. Both
    recovery routes must converge: the SAME sink object retrying (the
    under-lock _latest_gen re-resolution) and a RESTARTED sink (the
    disk-scan resume)."""
    import os

    import pytest

    from salesanalytics_etl_spark.streaming import upsert_stream as US

    path = str(tmp_path / "crash_t")
    sink = ParquetUpsertSink(spark, path, keys=["k"])
    sink.process_batch(spark.createDataFrame([(1, "a")], "k long, v string"), 0)
    assert sink.generation == 1

    # inject: the post-write _SUCCESS probe for gen-2 reports False ONCE,
    # so process_batch raises AFTER the generation write landed — the
    # exact "committed but not swapped in" state a kill there leaves
    target = os.path.join(path, "gen-2", "_SUCCESS")
    real_exists = os.path.exists
    armed = {"on": True}

    def flaky(p):
        if p == target and armed["on"]:
            armed["on"] = False
            return False
        return real_exists(p)

    monkeypatch.setattr(US.os.path, "exists", flaky)
    batch = spark.createDataFrame([(2, "b")], "k long, v string")
    with pytest.raises(RuntimeError, match="_SUCCESS"):
        sink.process_batch(batch, 1)
    monkeypatch.setattr(US.os.path, "exists", real_exists)
    # crash state: gen-2 committed on disk, counter still at 1
    assert real_exists(target)
    assert sink.generation == 1

    # route 1: the same sink retries the batch — the under-lock
    # re-resolution must pick up gen-2 and merge ON TOP of it
    sink.process_batch(batch, 1)
    assert {r.k: r.v for r in sink.current().collect()} == {1: "a", 2: "b"}

    # route 2: a restarted sink resumes from the highest committed gen
    sink2 = ParquetUpsertSink(spark, path, keys=["k"])
    assert sink2.generation == sink.generation
    sink2.process_batch(spark.createDataFrame([(3, "c")], "k long, v string"), 2)
    assert {r.k: r.v for r in sink2.current().collect()} == {
        1: "a", 2: "b", 3: "c",
    }


def test_stream_crash_after_sink_commit_replays_and_converges(
    spark, tmp_path
):
    """The checkpoint-side crash window: the sink committed a micro-batch
    (generation advanced) but the process dies BEFORE the streaming
    checkpoint commits, so a restart REPLAYS that batch. MERGE idempotency
    must absorb the replay — the restarted stream from the same checkpoint
    converges to exactly the batch keep-state."""
    import pytest

    src = str(tmp_path / "src")
    rows = [(i, f"v{i}") for i in range(8)]
    df = spark.createDataFrame(rows, "k long, v string")
    df.repartition(4).write.parquet(src)
    schema = spark.read.parquet(src).schema

    armed = {"on": True}

    class CrashingSink(ParquetUpsertSink):
        def process_batch(self, batch, batch_id):
            super().process_batch(batch, batch_id)  # sink commit lands
            if armed["on"] and self.generation >= 2:
                armed["on"] = False
                raise RuntimeError("injected crash before checkpoint commit")

    path, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    sink = CrashingSink(spark, path, keys=["k"])
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = sink.attach(stream, checkpoint=ckpt)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination(120)

    # restart: fresh sink (resumes committed generation), SAME checkpoint
    # (replays the uncommitted batch), rest of the stream drains
    sink2 = ParquetUpsertSink(spark, path, keys=["k"])
    assert sink2.generation >= 2
    stream2 = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = sink2.attach(stream2, checkpoint=ckpt)
    q2.awaitTermination(120)
    assert {r.k: r.v for r in sink2.current().collect()} == dict(rows)


def test_partitioned_sink_crash_around_stage_and_swap_recovers(
    spark, tmp_path, monkeypatch
):
    """Restart parity for the partitioned CDC sink (r14 verdict item 6
    sweep): both halves of the stage-and-swap window, crashed and then
    replayed (foreachBatch redelivery after a checkpoint that never
    committed). (a) Crash BETWEEN the staging write and the dynamic
    partition overwrite: the table is untouched and the staging leftover
    must neither be read as table state nor block the replay (its
    overwrite-mode write clears it). (b) Crash AFTER the overwrite,
    BEFORE the staging rmtree: the table already holds the batch; the
    replay must be absorbed idempotently and the leftover cleared."""
    import os
    import shutil as real_shutil

    import pytest

    from salesanalytics_etl_spark.operators import upsert as U
    from salesanalytics_etl_spark.streaming.upsert_stream import (
        PartitionedParquetUpsertSink,
    )

    path = str(tmp_path / "part_crash_t")
    staging = path + ".__swap_staging__"
    sink = PartitionedParquetUpsertSink(
        spark, path, keys=["k"], partition_by=["dt"]
    )
    seed = spark.createDataFrame(
        [(1, "d1", "a"), (2, "d2", "b")], ["k", "dt", "v"]
    )
    sink.process_batch(seed, 0)

    # --- (a) crash between staging write and partition overwrite ------
    real_sas = U._stage_and_swap

    def crash_after_staging(spark_, df, path_, partition_by_, read_schema):
        stg = path_.rstrip("/") + ".__swap_staging__"
        df.write.mode("overwrite").partitionBy(*partition_by_).parquet(stg)
        raise OSError("injected crash before the partition overwrite")

    monkeypatch.setattr(U, "_stage_and_swap", crash_after_staging)
    batch = spark.createDataFrame(
        [(1, "d1", "a2"), (3, "d1", "c")], ["k", "dt", "v"]
    )
    with pytest.raises(OSError, match="injected crash"):
        sink.process_batch(batch, 1)
    monkeypatch.setattr(U, "_stage_and_swap", real_sas)
    # crash state: staging stranded, table untouched, reads unaffected
    assert os.path.isdir(staging)
    assert {r.k: r.v for r in sink.current().collect()} == {
        1: "a", 2: "b",
    }

    # replay of the same batch converges and clears the leftover
    sink.process_batch(batch, 1)
    assert {r.k: r.v for r in sink.current().collect()} == {
        1: "a2", 2: "b", 3: "c",
    }
    assert not os.path.exists(staging)

    # --- (b) crash after the overwrite, before the staging rmtree -----
    armed = {"on": True}

    def flaky_rmtree(p, *a, **k):
        if armed["on"] and str(p).rstrip("/") == staging.rstrip("/"):
            armed["on"] = False
            raise OSError("injected crash before the staging rmtree")
        return real_shutil.rmtree(p, *a, **k)

    monkeypatch.setattr("shutil.rmtree", flaky_rmtree)
    batch2 = spark.createDataFrame([(4, "d2", "d")], ["k", "dt", "v"])
    try:
        with pytest.raises(OSError, match="injected crash"):
            sink.process_batch(batch2, 2)
    finally:
        monkeypatch.undo()
    # crash state: batch LANDED, staging stranded beside a healthy table
    assert os.path.isdir(staging)
    assert {r.k: r.v for r in sink.current().collect()} == {
        1: "a2", 2: "b", 3: "c", 4: "d",
    }

    # redelivered batch is absorbed idempotently; leftover cleared
    sink.process_batch(batch2, 2)
    assert {r.k: r.v for r in sink.current().collect()} == {
        1: "a2", 2: "b", 3: "c", 4: "d",
    }
    assert not os.path.exists(staging)
