"""Streaming ingest → idempotent upsert: the reference's MERGE pattern
(etl_sales_analytics.py:223-283) under Structured Streaming.

``foreachBatch`` is Spark's bridge between a stream and batch-only sinks:
each micro-batch is handed to the same ``merge_upsert`` operator the batch
ETL uses, so exactly-once-per-key semantics come from MERGE idempotency
(re-delivered micro-batches upsert the same keys to the same values), not
from sink transactions. This is the standard lakehouse CDC-ingest shape.

Scale: the per-batch upsert is O(|target|) with the parquet rewrite
(SURVEY.md §7.4 risk 5); with Delta/Iceberg the same foreachBatch body
calls MERGE INTO and becomes file-level.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from salesanalytics_etl_spark.operators.upsert import merge_upsert


class ParquetUpsertSink:
    """Maintains a parquet table state via per-batch MERGE upserts.

    Alternating generation directories (gen-0/gen-1) make each batch's
    rewrite atomic-ish locally: readers always see a complete generation.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        order_col: str | None = None,
    ):
        self.spark = spark
        self.path = path
        self.keys = keys
        self.order_col = order_col
        # Resume from the highest generation already on disk: the counter
        # alone lived only in driver memory, so a restart-from-checkpoint
        # would look for gen-0, find nothing, and silently merge the
        # replayed batch against an EMPTY target — resetting the table.
        self.generation = self._latest_gen()

    def _latest_gen(self) -> int:
        if not os.path.isdir(self.path):
            return 0
        gens = [
            int(d.split("-", 1)[1])
            for d in os.listdir(self.path)
            if d.startswith("gen-")
            and d.split("-", 1)[1].isdigit()
            # only COMMITTED generations count: a write killed mid-flight
            # leaves a partial gen dir without _SUCCESS, and resuming on
            # it would silently merge the replayed batch against
            # incomplete data (the overwrite of the replay then clears
            # the partial dir)
            and os.path.exists(os.path.join(self.path, d, "_SUCCESS"))
        ]
        return max(gens, default=0)

    def _gen_path(self, gen: int) -> str:
        return os.path.join(self.path, f"gen-{gen}")

    def current(self) -> DataFrame | None:
        p = self._gen_path(self.generation)
        # _SUCCESS required for the same reason as _latest_gen: a partial
        # gen-0 from a crashed FIRST write must read as "no table yet"
        if not os.path.exists(os.path.join(p, "_SUCCESS")):
            return None
        return self.spark.read.parquet(p)

    def _dedupe_batch(self, batch: DataFrame) -> DataFrame:
        """merge_upsert requires key-unique incoming rows; a CDC
        micro-batch can carry several updates to one key (Kafka batching)
        and passing them through would persist duplicate keys forever.
        With ``order_col`` the LAST version by that ordering wins (the
        batch ETL's keep-last semantics); without it an arbitrary single
        row per key is kept — the key-unique invariant is preserved
        either way, but CDC streams should supply an ordering column."""
        from salesanalytics_etl_spark.operators.cleaning import (
            dedupe_keep_last,
        )

        if self.order_col is not None:
            return dedupe_keep_last(batch, self.keys, self.order_col)
        return batch.dropDuplicates(self.keys)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        import shutil

        from salesanalytics_etl_spark.operators.upsert import (
            single_writer_lock,
        )

        # SINGLE-WRITER: two streams (or a stream + a batch job) merging
        # into one table would each read a generation, merge, and write the
        # next — last writer silently dropping the other's keys. The
        # advisory lock turns that into a loud ConcurrentWriterError.
        with single_writer_lock(self.path, owner=f"ParquetUpsertSink:{batch_id}"):
            # re-resolve under the lock: another writer may have advanced
            # the generation while we waited to acquire
            self.generation = max(self.generation, self._latest_gen())
            target = self.current()
            merged = merge_upsert(target, self._dedupe_batch(batch), self.keys)
            nxt = self.generation + 1
            merged.write.mode("overwrite").parquet(self._gen_path(nxt))
            # The committed-generation protocol above keys ENTIRELY off
            # _SUCCESS markers; a deployment with the committer's marker
            # disabled (mapreduce.fileoutputcommitter.marksuccessfuljobs=
            # false) would make every committed generation read as absent
            # and the NEXT batch silently merge against an empty target.
            # Fail loudly here, at write time, instead.
            if not os.path.exists(
                os.path.join(self._gen_path(nxt), "_SUCCESS")
            ):
                raise RuntimeError(
                    "ParquetUpsertSink: generation write committed without a "
                    "_SUCCESS marker — is mapreduce.fileoutputcommitter."
                    "marksuccessfuljobs disabled? This sink's crash-recovery "
                    "protocol requires the marker; re-enable it."
                )
            prev = self.generation
            self.generation = nxt
            # GC superseded generations (each holds a FULL table copy; a
            # steady stream would otherwise grow storage linearly with batch
            # count). Keep exactly one predecessor for in-flight readers.
            for g in range(prev):
                shutil.rmtree(self._gen_path(g), ignore_errors=True)

    def attach(self, stream: DataFrame, checkpoint: str):
        """Start the stream writing through this sink (availableNow)."""
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )


class PartitionedParquetUpsertSink:
    """Partition-scoped streaming MERGE: the 100 TB CDC-ingest shape.

    Each micro-batch runs :func:`operators.upsert.merge_upsert_partitioned`
    against ONE live partitioned table — only the partitions the batch
    touches are read and rewritten (dynamic partition overwrite), so a
    steady CDC stream into a 3 000-partition fact table does per-batch work
    proportional to the batch's partition spread, not to the table. This
    removes the O(|target|) per-batch cost :class:`ParquetUpsertSink`
    documents (and keeps its MERGE idempotency: re-delivered micro-batches
    upsert the same keys to the same values).

    Tradeoff vs the generation-dir sink: overwritten partitions are
    replaced in place (per-partition atomicity, not whole-table), the
    standard contract of dynamic partition overwrite on object stores.
    Same caller contract as the batch operator: keys must functionally
    determine their partition values.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        partition_by: list[str],
        order_col: str | None = None,
    ):
        self.spark = spark
        self.path = path
        self.keys = keys
        self.partition_by = partition_by
        self.order_col = order_col
        self.partitions_rewritten = 0  # cumulative, for observability

    def current(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from salesanalytics_etl_spark.operators.cleaning import (
            dedupe_keep_last,
        )
        from salesanalytics_etl_spark.operators.upsert import (
            merge_upsert_partitioned,
        )

        # key-unique the batch first (same contract as ParquetUpsertSink:
        # multiple CDC updates to one key must collapse to a single row)
        if self.order_col is not None:
            batch = dedupe_keep_last(batch, self.keys, self.order_col)
        else:
            batch = batch.dropDuplicates(self.keys)
        self.partitions_rewritten += merge_upsert_partitioned(
            self.spark, self.path, batch, self.keys, self.partition_by
        )

    def compact(self, max_files_per_partition: int = 1) -> int:
        """Maintenance: collapse the small files a steady stream of
        micro-batches accumulates per hot partition (one file per batch
        per touched partition) — run between batches/periodically, NOT
        concurrently with the stream (both sides take the same writer
        lock, so a concurrent call fails loudly rather than corrupting).
        Returns the number of partitions compacted."""
        from salesanalytics_etl_spark.operators.upsert import (
            compact_partitions,
        )

        return compact_partitions(
            self.spark, self.path, self.partition_by, max_files_per_partition
        )

    def attach(self, stream: DataFrame, checkpoint: str):
        """Start the stream writing through this sink (availableNow)."""
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
