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

    def __init__(self, spark: SparkSession, path: str, keys: list[str]):
        self.spark = spark
        self.path = path
        self.keys = keys
        self.generation = 0

    def _gen_path(self, gen: int) -> str:
        return os.path.join(self.path, f"gen-{gen}")

    def current(self) -> DataFrame | None:
        p = self._gen_path(self.generation)
        if not os.path.exists(p):
            return None
        return self.spark.read.parquet(p)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        target = self.current()
        merged = merge_upsert(target, batch, self.keys)
        nxt = self.generation + 1
        merged.write.mode("overwrite").parquet(self._gen_path(nxt))
        self.generation = nxt

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
    ):
        self.spark = spark
        self.path = path
        self.keys = keys
        self.partition_by = partition_by
        self.partitions_rewritten = 0  # cumulative, for observability

    def current(self) -> DataFrame | None:
        if not os.path.exists(self.path):
            return None
        return self.spark.read.parquet(self.path)

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        from salesanalytics_etl_spark.operators.upsert import (
            merge_upsert_partitioned,
        )

        self.partitions_rewritten += merge_upsert_partitioned(
            self.spark, self.path, batch, self.keys, self.partition_by
        )

    def attach(self, stream: DataFrame, checkpoint: str):
        """Start the stream writing through this sink (availableNow)."""
        return (
            stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
