"""Temporal join operators: range join and as-of join.

Spark has no native ASOF/RANGE join operator (SURVEY.md §2.4: absent from
the reference too — these are engine extensions the brief calls for). Both
are expressed as compositions of existing DataFrame ops, which Catalyst
executes well BECAUSE each carries an equi key:

- **range_join**: equi-join on a partition key (user, instrument, …) plus a
  time-interval residual condition. Catalyst plans a hash join on the equi
  key with the range as a post-join filter — the join never goes
  cross-product as long as the equi key is present. At extreme per-key
  cardinality, pre-bucketing both sides by coarse time buckets bounds the
  per-key blowup (the classic interval-bucket trick).
- **asof_join**: "latest right row at or before each left row". Expressed
  as range_join (bounded lookback) + row_number pick of the newest match.
  The lookback horizon doubles as the skew guard: a key's candidate set is
  |right rows within horizon|, not |right rows ever|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: str | Column,
    upper: str | Column,
) -> DataFrame:
    """Join rows of ``right`` whose timestamp falls in
    ``[left_ts - lower, left_ts + upper]`` for the same ``on`` key.

    ``lower``/``upper`` are interval strings (e.g. "10 minutes") or Columns.
    """
    lo = F.expr(f"INTERVAL {lower}") if isinstance(lower, str) else lower
    hi = F.expr(f"INTERVAL {upper}") if isinstance(upper, str) else upper
    lcol, rcol = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    return left.alias("l").join(
        right.alias("r"),
        (F.col(f"l.{on}") == F.col(f"r.{on}"))
        & (rcol >= lcol - lo)
        & (rcol <= lcol + hi),
    )


def bucketed_range_join(
    points: DataFrame,
    point_ts: str,
    intervals: DataFrame,
    lo_ts: str,
    hi_ts: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Point-in-interval join with NO equi key, as a hash join.

    Joins each ``points`` row to every ``intervals`` row whose closed
    interval ``[lo_ts, hi_ts]`` contains ``point_ts``. Without an equi
    key, Catalyst can only plan this as a nested-loop join — broadcast
    when one side is tiny, CartesianProduct when neither is. This
    operator manufactures the equi key (the classic interval-bucketing
    trick behind engine-native range joins): each interval explodes into
    the fixed-width time buckets it overlaps, each point maps to exactly
    ONE bucket, and the join becomes an equi-join on bucket id with the
    exact containment predicate as a residual filter. No dedup pass is
    needed: a (point, interval) pair can only meet in the point's single
    bucket.

    Scale shape: cost is |points| + Σ(interval_len/bucket + 1) exploded
    interval rows through one hash shuffle — pick ``bucket_seconds``
    near the median interval length so each interval explodes into ~2
    rows. Works for millions of intervals where broadcast nested-loop
    cannot; dense hot buckets (many overlapping intervals) are ordinary
    join skew, handled by AQE's skew-join split. Both inputs must have
    disjoint column names (rename before calling).

    Degenerate intervals (``hi_ts < lo_ts``) are dropped rather than fed
    to ``sequence()``, whose descending step would silently fabricate
    buckets for a backwards interval.
    """
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be > 0, got {bucket_seconds}")
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(
            f"bucketed_range_join: overlapping column names {sorted(overlap)};"
            " rename one side first"
        )
    w = F.lit(int(bucket_seconds))
    p = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / w)
    )
    iv = intervals.filter(F.col(hi_ts) >= F.col(lo_ts)).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(lo_ts)) / w),
                F.floor(F.unix_timestamp(F.col(hi_ts)) / w),
            )
        ),
    )
    return (
        p.join(iv, on="_bucket")
        .filter(
            (F.col(point_ts) >= F.col(lo_ts))
            & (F.col(point_ts) <= F.col(hi_ts))
        )
        .drop("_bucket")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "30 days",
    right_cols: list[str] | None = None,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """For each left row, attach the newest right row with
    ``right_ts <= left_ts`` within ``horizon`` (backward as-of join).

    Left rows with no match in the horizon are kept with NULLs (left join
    semantics, like pandas merge_asof). ``tiebreakers`` (right columns,
    descending) total-order right rows sharing a timestamp — REQUIRED for
    deterministic results when right_ts isn't unique per key.
    """
    # Single-branch plan: ONE left-outer range join + window pick. The row
    # id exists only inside one linear execution, so a nondeterministic
    # monotonically_increasing_id can't diverge between plan branches (the
    # old matched/unmatched two-branch form re-executed the left subtree
    # twice, silently dropping/duplicating rows if ids differed between the
    # executions — e.g. under task retries or AQE replanning).
    left_keyed = left.withColumn("_lid", F.monotonically_increasing_id())
    rcols = right_cols or [c for c in right.columns if c != on]
    # the pick window orders by asof_<right_ts>, so the projection must
    # carry it even when the caller's right_cols omits it — but the output
    # schema honors the requested projection, so drop it again afterwards
    ts_requested = right_ts in rcols
    if not ts_requested:
        rcols = [*rcols, right_ts]
    lo = F.expr(f"INTERVAL {horizon}")
    joined = (
        left_keyed.alias("l")
        .join(
            right.alias("r"),
            (F.col(f"l.{on}") == F.col(f"r.{on}"))
            & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}"))
            & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - lo),
            "left",
        )
        .select(
            "l.*",
            *[F.col(f"r.{c}").alias(f"asof_{c}") for c in rcols],
        )
    )
    # unmatched left rows surface as a single all-NULL right row, ranked
    # below every real match by nulls_last
    order = [F.col(f"asof_{right_ts}").desc_nulls_last()] + [
        F.col(f"asof_{c}").desc_nulls_last() for c in (tiebreakers or [])
    ]
    w = Window.partitionBy("_lid").orderBy(*order)
    picked = (
        joined.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_lid")
    )
    if not ts_requested:
        picked = picked.drop(f"asof_{right_ts}")
    return picked
