"""Snapshot diff — CDC-style comparison of two keyed table snapshots.

The lakehouse maintenance counterpart to MERGE (operators/upsert.py): given
yesterday's and today's snapshot of a keyed table, emit exactly the rows
whose presence or contents changed — ``added`` / ``removed`` / ``changed``
plus the exact count of differing columns. This is what feeds an
incremental downstream (re-embed only changed documents, re-aggregate only
touched partitions) when the source can't produce a change feed itself.

Scale shape: ONE full-outer shuffle join co-partitioned on the key —
both sides hash-partition on the same key so the join is local after the
exchange. Column comparison is null-safe ``<=>`` per column, entirely
inside whole-stage codegen (no Python, no fingerprint round-trip), and
unchanged rows are dropped before anything downstream sees them. At
100 TB the refinement is pruning, not the join itself: pre-aggregate
``xxhash64`` per storage partition on both snapshots and diff only the
partitions whose aggregate hashes differ — the per-row operator below is
then applied to the (usually tiny) changed-partition subset. The reference
has no diff operator (its MERGE consumes full batches); this is an engine
extension per the brief's training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str] | str,
    compare_cols: list[str] | None = None,
    include_values: bool = False,
) -> DataFrame:
    """Diff two snapshots of a keyed table.

    Returns one row per key present in either snapshot whose row was
    added, removed, or changed: the key columns, ``status`` in
    {'added','removed','changed'}, and ``n_changed_cols`` (exact count of
    compare columns whose values differ null-safely; NULL for
    added/removed rows, where "every column" would be noise).

    ``compare_cols`` defaults to every non-key column of ``old``; an
    explicit ``[]`` requests a presence-only diff (added/removed rows
    only — 'changed' is unreachable with nothing to compare). Both
    frames must carry all key + compare columns. NULL keys never
    equi-match, so a null-keyed row reports as added+removed, never as a
    phantom 'changed' pair — clean nullable keys first (F1).

    ``include_values=True`` additionally emits the NEW-side value for
    every compare column (NULL on removed rows) — the full change feed
    :func:`apply_changes` consumes to roll a snapshot forward.
    """
    if isinstance(keys, str):
        keys = [keys]
    # None → default; an EXPLICIT [] means presence-only diff (added/
    # removed, never 'changed') — `or` would silently widen it back out
    compare = (
        compare_cols
        if compare_cols is not None
        else [c for c in old.columns if c not in keys]
    )
    reserved = {"status", "n_changed_cols"} & {*keys, *compare}
    if reserved:
        raise ValueError(
            f"snapshot_diff: column(s) {sorted(reserved)} collide with the "
            "diff's output columns — rename them in the snapshots first"
        )
    for side, df in (("old", old), ("new", new)):
        missing = [c for c in (*keys, *compare) if c not in df.columns]
        if missing:
            raise ValueError(f"snapshot_diff: {side} snapshot lacks {missing}")

    # presence markers survive the USING-style join (which coalesces the
    # key columns). A NULL key never equi-matches, so a null-keyed row
    # surfaces as added+removed rather than a phantom 'changed' pair —
    # callers with nullable keys should clean them first (F1 drop-null-keys)
    o = old.select(*keys, *compare, F.lit(True).alias("_in_old"))
    n = new.select(*keys, *compare, F.lit(True).alias("_in_new"))

    joined = o.alias("o").join(n.alias("n"), on=keys, how="full_outer")
    # empty compare set (keys-only / presence-only diff): zero columns
    # can differ, so 'changed' is unreachable and n_diff must be a real
    # zero literal, not None
    n_diff = F.lit(0)
    for c in compare:
        d = (~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))).cast("int")
        n_diff = n_diff + d
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(n_diff > 0, F.lit("changed"))
    )
    out_cols = [
        *keys,
        "status",
        F.when(F.col("status") == "changed", n_diff)
        .cast("int")
        .alias("n_changed_cols"),
    ]
    if include_values:
        out_cols += [F.col(f"n.{c}").alias(c) for c in compare]
    return (
        joined.withColumn("status", status)
        .filter(F.col("status").isNotNull())
        .select(*out_cols)
    )


def apply_changes(
    old: DataFrame, changes: DataFrame, keys: list[str] | str
) -> DataFrame:
    """Roll a snapshot forward by a change feed: ``old`` plus the output
    of ``snapshot_diff(old, new, keys, include_values=True)`` reproduces
    ``new`` exactly (the roundtrip is property-tested).

    Semantics are MERGE-with-deletes: rows whose key appears in the feed
    are dropped from ``old`` (covers 'removed' and the stale half of
    'changed'), then the feed's 'added'/'changed' rows are unioned in
    with their new-side values. The anti-join is NULL-SAFE on the keys:
    snapshot_diff reports a null-keyed row as added+removed, so the
    stale null-keyed row must also be evicted here or the roundtrip
    would duplicate it. Output column order matches ``old`` exactly
    (positional consumers — insertInto, union — stay aligned). Scale:
    one left-anti join plus a union — both co-partitioned on the key,
    same shuffle class as the diff itself; the feed is
    change-proportional, not table-proportional.
    """
    if isinstance(keys, str):
        keys = [keys]
    value_cols = [
        c for c in changes.columns if c not in ("status", "n_changed_cols")
    ]
    # the feed must carry EXACTLY the snapshot's columns: extras mean it
    # was diffed against a different table; missing ones mean it was
    # produced without include_values (keys-only) — either way applying
    # it would silently narrow or misalign the output schema
    if set(value_cols) != set(old.columns):
        raise ValueError(
            "apply_changes: feed value columns "
            f"{sorted(value_cols)} != snapshot columns "
            f"{sorted(old.columns)} — produce the feed with "
            "snapshot_diff(..., include_values=True) on this table"
        )
    touched = changes.select(*keys)
    cond = None
    for k in keys:
        c = F.col(f"o.{k}").eqNullSafe(F.col(f"t.{k}"))
        cond = c if cond is None else (cond & c)
    kept = old.alias("o").join(touched.alias("t"), cond, "left_anti")
    incoming = changes.filter(F.col("status") != "removed")
    # honor the snapshot's column ORDER, not the feed's keys-first order
    return kept.select(*old.columns).unionByName(
        incoming.select(*old.columns)
    )
