"""Table profiling — per-column stats in ONE pass over the data.

The profile every staging pipeline wants before trusting a load (the
reference eyeballs per-table samples — `etl_sales_analytics.py` prints
`df.head()` after each extract; this is the distributed, engine-grade
version of that instinct): row count, null count, exact distinct count,
typed min/max, and the modal value per column.

Scale design — the naive form is k separate `SELECT COUNT(DISTINCT c)`
scans (k passes, k shuffles) or one multi-distinct aggregate (Spark
plans an Expand that multiplies rows ×k INSIDE one shuffle, all lanes
through the same exchange). This operator instead:

1. renders each column to a canonical string and unpivots via
   ``stack`` — the ×k row expansion happens map-side in codegen, fused
   with the scan (columns pruned to the profiled set);
2. ONE shuffle keyed (col_name, value) with map-side partial
   aggregation → per-value counts (hot values pre-combine per task, so
   a 99%-constant column does not make a hot reducer);
3. everything after is bounded: per-column NDV/null math re-aggregates
   the per-value counts (|distinct values| rows, not |rows|), the modal
   value is a two-phase ``topk_per_group`` pick over the same bounded
   frame, and typed min/max come from ONE narrow global aggregate
   (partial+final, no shuffle) joined in at |columns| grain.

NDV semantics: distinct counts are over the RENDERED string. The
default render (CAST AS STRING) is injective for Spark's atomic types
(shortest-repr doubles round-trip), so NDV equals native NDV; a caller
supplying a lossy render (cents-grid for doubles, date-grain for
timestamps) gets "distinct rendered values" — usually the profile
actually wanted, and exactly what was asked for. Renders are FUNCTIONS
(Column → Column): they apply twice — to the unpivoted values and to
the typed min/max — and must be deterministic scalar expressions.

Ties for the modal value break on the larger rendered string — a total
order, deterministic under any partitioning.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Render = Callable[[Column], Column]


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    renders: dict[str, Render] | None = None,
) -> DataFrame:
    """One row per profiled column:

    ``col_name, n_rows, n_nulls, n_distinct, min_value, max_value,
    top_value, top_count`` — min/max computed on the NATIVE type
    (lexicographic string min/max would rank '9' above '10') and
    rendered afterwards; NULLs excluded from distinct/min/max/top as in
    SQL aggregates. ``renders[c]`` is a function mapping the raw column
    to its canonical rendering (applied to values AND to typed min/max).

    All-NULL and empty inputs keep one row per column (counts 0, NULL
    value fields) — a profiler that drops the broken column is useless.
    """
    from salesanalytics_etl_spark.operators.skew import topk_per_group

    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_columns: no columns to profile")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"profile_columns: not in input: {missing}")
    renders = renders or {}
    unknown = sorted(set(renders) - set(cols))
    if unknown:
        raise ValueError(f"profile_columns: renders for {unknown} not profiled")
    # column names are interpolated into the stack() selectExpr string
    # below ('{c}' literals and `_r_{c}` backtick-quoted identifiers):
    # a quote/backtick in a name would break the generated SQL with an
    # opaque parse error — refuse loudly instead
    bad = [c for c in cols if "'" in c or "`" in c]
    if bad:
        raise ValueError(
            f"profile_columns: column names {bad} contain quotes/"
            "backticks, which the stack() unpivot cannot quote — "
            "rename (withColumnRenamed) before profiling"
        )

    def rendered(c: str, src: Column) -> Column:
        out = renders[c](src) if c in renders else src
        return out.cast("string")

    # 1) unpivot: stack(k, 'c1', r1, ...) → (col_name, value); map-side,
    # fused with the scan, reads only the profiled columns
    pairs = ", ".join(f"'{c}', `_r_{c}`" for c in cols)
    long = df.select(
        *[rendered(c, F.col(c)).alias(f"_r_{c}") for c in cols]
    ).selectExpr(f"stack({len(cols)}, {pairs}) AS (col_name, value)")

    # 2) the ONE data-scaled shuffle: per-(column, value) counts
    per_value = long.groupBy("col_name", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )

    # 3a) bounded re-aggregate → counts per column
    stats = per_value.groupBy("col_name").agg(
        F.sum("cnt").alias("n_rows"),
        F.coalesce(
            F.sum(F.when(F.col("value").isNull(), F.col("cnt"))), F.lit(0)
        ).alias("n_nulls"),
        F.count(F.col("value")).alias("n_distinct"),  # non-null groups
    )

    # 3b) modal value: two-phase top-1 over the bounded per-value frame
    top = topk_per_group(
        per_value.filter(F.col("value").isNotNull()),
        ["col_name"],
        [F.desc("cnt"), F.desc("value")],
        k=1,
    ).select(
        "col_name",
        F.col("value").alias("top_value"),
        F.col("cnt").alias("top_count"),
    )

    # 3c) typed min/max: one narrow global aggregate (no shuffle),
    # rendered AFTER the typed extremum, then unpivoted to |columns| rows
    mm = df.agg(
        *[F.min(c).alias(f"_min_{c}") for c in cols],
        *[F.max(c).alias(f"_max_{c}") for c in cols],
    ).select(
        *[
            rendered(c, F.col(f"_{side}_{c}")).alias(f"_{side}_{c}")
            for c in cols
            for side in ("min", "max")
        ]
    )
    mm_pairs = ", ".join(f"'{c}', `_min_{c}`, `_max_{c}`" for c in cols)
    minmax = mm.selectExpr(
        f"stack({len(cols)}, {mm_pairs}) AS (col_name, min_value, max_value)"
    )

    # a constant |columns|-row spine guarantees one output row per
    # column even when the input is empty (stats/top vanish there);
    # every join here is |columns|-grain — broadcast territory
    spark = df.sparkSession
    names = spark.createDataFrame([(c,) for c in cols], "col_name STRING")
    return (
        names.join(F.broadcast(minmax), "col_name", "left")
        .join(F.broadcast(stats), "col_name", "left")
        .join(F.broadcast(top), "col_name", "left")
        .select(
            "col_name",
            F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
            F.coalesce("n_nulls", F.lit(0)).alias("n_nulls"),
            F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
            "min_value",
            "max_value",
            "top_value",
            "top_count",
        )
    )
