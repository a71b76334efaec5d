"""Distributed EXACT percentiles — no single aggregation buffer.

``F.percentile`` (and DuckDB's ``quantile_cont``) is exact but collects
every value into ONE aggregation buffer in the final reduce — at 10⁹+
rows that buffer is a single-task OOM: the same scale-killer class as an
unpartitioned sort, just hidden inside an aggregate where the window
lint can't see it (since r9 the aggregate-buffer lint in
tests/test_plan_lint.py CAN see it, across every registered plan).
q37/q68 ride this module's distributed path; the buffered form survives
only as the value-identity twin in tests/test_quantiles.py. The
identical interpolated quantile comes from DISTRIBUTED exact ranks
(operators/ranking.py):

1. ``append_global_rank`` / ``append_group_rank`` over the value —
   range partition + local row_number + offset join; ties need no
   tiebreak because only the VALUE at a rank is read, and equal values
   yield the same value at every rank they occupy.
2. The classic interpolation positions ``pos = (N-1)·p`` select ≤ 2
   rows per percentile (per group) with a map-side filter (N rides
   every row via ``total_col``, so the needed ranks are plain column
   expressions — no collect, no second pass).
3. One bounded aggregate interpolates ``v = v_lo + frac·(v_hi − v_lo)``.

Cross-engine exactness: the oracle twins re-spell THIS formula (rank
CTE + the same IEEE expression), not ``quantile_cont`` — algebraically
equal interpolation forms can differ in the last ulp, and a last-ulp
flip at a half-cent boundary is exactly what the gate's floor-rounding
would amplify (see functions/scalar.py:safe_div for the precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _validate(
    ps: dict[str, float], who: str, group_cols: list[str] | None = None
) -> None:
    if not ps:
        raise ValueError(f"{who}: no percentiles")
    for name, p in ps.items():
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"percentile {name}={p} outside [0, 1]")
    # output names land next to n_rows/group columns and the _v/_r/_n/
    # _lo_*/_hi_* working columns — a colliding key would yield
    # duplicate/ambiguous output columns instead of a loud error
    # (mirrors snapshot_diff's reserved-name check)
    reserved = {"n_rows", "_v", "_r", "_n", *(group_cols or [])}
    bad = sorted(
        name
        for name in ps
        if name in reserved or name.startswith(("_lo_", "_hi_"))
    )
    if bad:
        raise ValueError(
            f"{who}: percentile output name(s) {bad} collide with "
            "n_rows / group columns / internal working columns — "
            "rename the ps keys"
        )


def _pick_and_interpolate(
    ranked: DataFrame, ps: dict[str, float]
) -> tuple[DataFrame, list[Column]]:
    """Shared second half of both percentile paths: annotate each ranked
    row (columns ``_v``/``_r``/``_n``) with per-percentile lo/hi ranks,
    filter to the ≤ 2 rows per percentile (per group) that matter, and
    build the interpolation aggregate expressions. One definition — the
    global and grouped paths must never drift apart on the rank-bound
    or interpolation arithmetic."""
    keep = None
    bounded = ranked
    for name, p in ps.items():
        posx = (F.col("_n") - 1).cast("double") * F.lit(float(p))
        bounded = bounded.withColumn(
            "_lo_" + name, F.floor(posx).cast("bigint") + 1
        ).withColumn("_hi_" + name, F.ceil(posx).cast("bigint") + 1)
        cond = (F.col("_r") == F.col("_lo_" + name)) | (
            F.col("_r") == F.col("_hi_" + name)
        )
        keep = cond if keep is None else (keep | cond)
    picked = bounded.filter(keep)
    final = []
    for name, p in ps.items():
        posx = (F.min("_n") - 1).cast("double") * F.lit(float(p))
        frac = posx - F.floor(posx)
        v_lo = F.min(F.when(F.col("_r") == F.col("_lo_" + name), F.col("_v")))
        v_hi = F.min(F.when(F.col("_r") == F.col("_hi_" + name), F.col("_v")))
        final.append((v_lo + frac * (v_hi - v_lo)).alias(name))
    return picked, final


def exact_percentiles_distributed(
    df: DataFrame,
    value: Column | str,
    ps: dict[str, float],
) -> DataFrame:
    """One-row DataFrame of exact linear-interpolated percentiles of
    ``value``, named by the keys of ``ps`` (out_col → p in [0, 1]).

    NULL values are excluded (SQL aggregate semantics); empty input
    yields a single all-NULL row. Scale: the only data-scaled stages
    are the range exchange and local sorts inside
    ``append_global_rank``; everything after the rank filter is
    ≤ 2·|ps| rows through one final aggregate.
    """
    from salesanalytics_etl_spark.operators.ranking import append_global_rank

    _validate(ps, "exact_percentiles_distributed")
    vcol = F.col(value) if isinstance(value, str) else value
    vals = df.select(vcol.alias("_v")).filter(F.col("_v").isNotNull())
    ranked = append_global_rank(
        vals, [F.asc("_v")], out_col="_r", total_col="_n"
    )
    picked, final = _pick_and_interpolate(ranked, ps)
    return picked.agg(*final)


def exact_percentiles_grouped(
    df: DataFrame,
    group_cols: list[str],
    value: Column | str,
    ps: dict[str, float],
) -> DataFrame:
    """Per-group exact interpolated percentiles — the grouped form of
    :func:`exact_percentiles_distributed`, one output row per group
    (``n_rows`` = non-null value count, then one column per ``ps`` key).

    ``groupBy(g).agg(percentile(...))`` holds each GROUP's values in one
    aggregation buffer: with low-cardinality groups (segments,
    languages, sources) every buffer is data-scaled. Here
    ``append_group_rank`` range-partitions on (group, value) so big
    groups span partitions, per-group N rides every row, the rank
    filter keeps ≤ 2 rows per (group, percentile) map-side, and the
    final aggregate is |groups|-bounded.

    Groups whose values are ALL NULL are kept (``n_rows`` 0, NULL
    percentiles) — matching the buffered twin, which emits a NULL row
    rather than dropping the group. NULL group values form their own
    group, as with ``Window.partitionBy``.
    """
    from salesanalytics_etl_spark.operators.ranking import append_group_rank

    _validate(ps, "exact_percentiles_grouped", group_cols)
    vcol = F.col(value) if isinstance(value, str) else value
    vals = df.select(*group_cols, vcol.alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    ranked = append_group_rank(
        vals, group_cols, [F.asc("_v")], out_col="_r", total_col="_n"
    )
    picked, final = _pick_and_interpolate(ranked, ps)
    stats = picked.groupBy(*group_cols).agg(
        F.min("_n").alias("n_rows"), *final
    )
    # all-NULL groups vanished at the isNotNull filter; restore them as
    # (group, 0, NULL...) like the buffered twin. NULL-SAFE join — a
    # NULL group value is a legitimate group.
    groups = df.select(*group_cols).distinct()
    cond = None
    for g in group_cols:
        c = F.col(f"g.{g}").eqNullSafe(F.col(f"s.{g}"))
        cond = c if cond is None else (cond & c)
    return (
        groups.alias("g")
        .join(stats.alias("s"), cond, "left")
        .select(
            *[F.col(f"g.{c}") for c in group_cols],
            F.coalesce(F.col("s.n_rows"), F.lit(0)).alias("n_rows"),
            *[F.col(f"s.{name}") for name in ps],
        )
    )
