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


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: list[str],
    tracked: list[str],
    effective_date: str,
) -> DataFrame:
    """Type-2 slowly-changing-dimension merge: apply an update batch to a
    versioned dimension, closing out changed current rows and appending the
    new version.

    ``dim`` carries SCD2 bookkeeping columns ``valid_from`` DATE,
    ``valid_to`` DATE (NULL = open) and ``is_current`` BOOLEAN alongside the
    business columns. ``updates`` carries ``keys`` + ``tracked`` columns
    only, one row per key, for keys with a CURRENT row in the dimension
    (route brand-new keys through :func:`merge_upsert` first; an update
    whose key has no current row — never seeded, or retired upstream —
    matches nothing and is a silent no-op by design, the same contract as
    SQL MERGE's unmatched-source rows without a WHEN NOT MATCHED clause).
    For each
    update whose ``tracked`` values differ (NULL-safely) from the key's
    CURRENT row, that row is closed (``valid_to = effective_date``,
    ``is_current = false``) and a new open row is appended
    (``valid_from = effective_date``); non-tracked business columns carry
    over from the closed row. Updates equal to the current version are
    no-ops, so re-applying the same batch is a fixpoint (idempotent).
    History rows pass through untouched.

    The reference's MERGE overwrites in place and keeps no history
    (etl_sales_analytics.py:223-283); SCD2 is the audit-preserving
    extension of that LOAD step for warehouse dimensions.

    Scale: one broadcast equi-join of the dimension against the (small)
    update batch on the natural key — the dimension is never shuffled and
    no window function is involved, so the plan is a single map-side pass
    over the dimension plus a union.
    """
    from functools import reduce
    from operator import or_

    if not tracked:
        raise ValueError("scd2_apply: `tracked` must name at least one column")
    eff = F.to_date(F.lit(effective_date))
    upd = F.broadcast(
        updates.select(
            *keys, *[F.col(c).alias(f"_u_{c}") for c in tracked]
        ).withColumn("_u_hit", F.lit(True))
    )

    hist = dim.filter(~F.col("is_current"))
    joined = dim.filter(F.col("is_current")).join(upd, on=keys, how="left")
    differs = reduce(
        or_, [~F.col(c).eqNullSafe(F.col(f"_u_{c}")) for c in tracked]
    )
    is_changed = F.coalesce(F.col("_u_hit"), F.lit(False)) & differs

    unchanged = joined.filter(~is_changed).select(*dim.columns)
    closed = (
        joined.filter(is_changed)
        .withColumn("valid_to", eff)
        .withColumn("is_current", F.lit(False))
        .select(*dim.columns)
    )
    new_rows = joined.filter(is_changed).select(
        *[
            F.col(f"_u_{c}").alias(c)
            if c in tracked
            else eff.alias(c)
            if c == "valid_from"
            else F.lit(None).cast("date").alias(c)
            if c == "valid_to"
            else F.lit(True).alias(c)
            if c == "is_current"
            else F.col(c)
            for c in dim.columns
        ]
    )
    return (
        hist.unionByName(unchanged).unionByName(closed).unionByName(new_rows)
    )


