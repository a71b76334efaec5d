"""Idempotent MERGE-upsert (SURVEY.md §2.9 M1-M3).

The reference stages CSV frames then runs a T-SQL ``MERGE target USING
staging ON pk WHEN MATCHED THEN UPDATE <all cols> WHEN NOT MATCHED THEN
INSERT`` (etl_sales_analytics.py:223-283). Because MATCHED updates ALL
non-key columns, the end state is exactly:

    result = incoming ∪ (target rows whose key is absent from incoming)

which is the pure-DataFrame rewrite used here (anti-join + unionByName).
Re-running with the same batch is a fixpoint → idempotent (reference
README.md:5). Delta Lake's ``MERGE INTO`` would do file-level merges; this
repo stays dependency-free and documents the trade-off (SURVEY.md §7.4
risk 5: O(|target|) rewrite per batch).

Scale: the anti-join shuffles target+incoming on the key unless the incoming
batch is small enough to broadcast — typical for incremental loads, so we
hint broadcast when the batch is provably small; AQE decides otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame | None,
    incoming: DataFrame,
    keys: list[str],
    broadcast_incoming: bool | None = None,
) -> DataFrame:
    """Upsert ``incoming`` into ``target`` by ``keys``; returns new state.

    ``target=None`` (first load) → incoming as-is. Incoming is assumed
    key-unique (the pipeline dedupes first, as the reference does before
    staging).
    """
    if target is None:
        return incoming
    incoming = incoming.select(*target.columns)
    probe = incoming.select(*keys).distinct()
    if broadcast_incoming:
        probe = F.broadcast(probe)
    kept = target.join(probe, on=keys, how="left_anti")
    return kept.unionByName(incoming)


def upsert_counts(target_before: DataFrame | None, incoming: DataFrame) -> int:
    """Rows-affected report (M2): every staged row hits UPDATE or INSERT,
    so the MERGE rowcount equals the incoming row count."""
    return incoming.count()
