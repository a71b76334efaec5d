"""Distributed EXACT percentiles — no single aggregation buffer.

``F.percentile`` (and DuckDB's ``quantile_cont``) is exact but collects
every value into ONE aggregation buffer in the final reduce — at 10⁹+
rows that buffer is a single-task OOM: the same scale-killer class as an
unpartitioned sort, just hidden inside an aggregate where the window
lint can't see it. q37 keeps the buffered form as the small-side twin;
this module computes the identical interpolated quantile from
DISTRIBUTED exact ranks (operators/ranking.py):

1. ``append_global_rank`` over the value — range partition + local
   row_number + offset join; ties need no tiebreak because only the
   VALUE at a rank is read, and equal values yield the same value at
   every rank they occupy.
2. The classic interpolation positions ``pos = (N-1)·p`` select ≤ 2
   rows per percentile with a map-side filter (N rides every row via
   ``total_col``, so the needed ranks are plain column expressions —
   no collect, no second pass).
3. One final aggregate over those ≤ 2·|ps| rows interpolates
   ``v = v_lo + frac·(v_hi − v_lo)``.

Cross-engine exactness: the oracle twin re-spells THIS formula (rank
CTE + the same IEEE expression), not ``quantile_cont`` — algebraically
equal interpolation forms can differ in the last ulp, and a last-ulp
flip at a half-cent boundary is exactly what the gate's floor-rounding
would amplify (see functions/scalar.py:safe_div for the precedent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    :func:`append_global_rank`; everything after the rank filter is
    ≤ 2·|ps| rows through one final aggregate.
    """
    from salesanalytics_etl_spark.operators.ranking import append_global_rank

    if not ps:
        raise ValueError("exact_percentiles_distributed: no percentiles")
    for name, p in ps.items():
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"percentile {name}={p} outside [0, 1]")
    vcol = F.col(value) if isinstance(value, str) else value
    vals = df.select(vcol.alias("_v")).filter(F.col("_v").isNotNull())
    ranked = append_global_rank(
        vals, [F.asc("_v")], out_col="_r", total_col="_n"
    )

    # pos is 0-based, ranks 1-based: pos = (N-1)*p, lo = floor(pos)+1,
    # hi = ceil(pos)+1. N rides every row (total_col), so the needed
    # ranks are plain column expressions — the filter is map-side.
    def pos_expr(p: float) -> Column:
        return (F.col("_n") - 1).cast("double") * F.lit(float(p))

    keep = None
    bounded = ranked
    for name, p in ps.items():
        posx = pos_expr(p)
        lo = F.floor(posx).cast("bigint") + 1
        hi = F.ceil(posx).cast("bigint") + 1
        bounded = bounded.withColumn("_lo_" + name, lo).withColumn(
            "_hi_" + name, hi
        )
        cond = (F.col("_r") == F.col("_lo_" + name)) | (
            F.col("_r") == F.col("_hi_" + name)
        )
        keep = cond if keep is None else (keep | cond)
    picked = bounded.filter(keep)

    # ≤ 2·|ps| rows reach this aggregate. _n is constant across them;
    # min() re-derives it for the frac expressions.
    final = []
    for name, p in ps.items():
        posx = (F.min("_n") - 1).cast("double") * F.lit(float(p))
        frac = posx - F.floor(posx)
        v_lo = F.min(F.when(F.col("_r") == F.col("_lo_" + name), F.col("_v")))
        v_hi = F.min(F.when(F.col("_r") == F.col("_hi_" + name), F.col("_v")))
        final.append((v_lo + frac * (v_hi - v_lo)).alias(name))
    return picked.agg(*final)


def exact_percentiles_grouped(
    df: DataFrame,
    group_cols: list[str],
    value: Column | str,
    ps: dict[str, float],
) -> DataFrame:
    """Per-group exact interpolated percentiles — the grouped form of
    :func:`exact_percentiles_distributed`, one output row per group.

    ``groupBy(g).agg(percentile(...))`` holds each GROUP's values in one
    aggregation buffer: with low-cardinality groups (segments,
    languages, sources) every buffer is data-scaled. Here
    ``append_group_rank`` range-partitions on (group, value) so big
    groups span partitions, per-group N rides every row, the rank
    filter keeps ≤ 2 rows per (group, percentile) map-side, and the
    final aggregate is |groups|-bounded.
    """
    from salesanalytics_etl_spark.operators.ranking import append_group_rank

    if not ps:
        raise ValueError("exact_percentiles_grouped: no percentiles")
    for name, p in ps.items():
        if not (0.0 <= p <= 1.0):
            raise ValueError(f"percentile {name}={p} outside [0, 1]")
    vcol = F.col(value) if isinstance(value, str) else value
    vals = df.select(*group_cols, vcol.alias("_v")).filter(
        F.col("_v").isNotNull()
    )
    ranked = append_group_rank(
        vals, group_cols, [F.asc("_v")], out_col="_r", total_col="_n"
    )
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
    return picked.groupBy(*group_cols).agg(
        F.min("_n").alias("_n_group"), *final
    ).withColumnRenamed("_n_group", "n_rows")
