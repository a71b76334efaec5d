"""Cleaning/conformance operators (SURVEY.md §2.2 C1-C4, §2.3 F1-F2).

All pure Column expressions + one window — no UDFs, no shuffles except the
single hash-partition the dedupe window needs (which Catalyst reuses for any
downstream aggregation on the same keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from salesanalytics_etl_spark.sources.readers import SEQ_COL


def trim_strings(df: DataFrame) -> DataFrame:
    """Trim every string column (reference etl_sales_analytics.py:57-60, C1)."""
    return df.select(
        *[
            F.trim(F.col(f.name)).alias(f.name)
            if isinstance(f.dataType, T.StringType)
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def coerce_casts(df: DataFrame, casts: dict[str, T.DataType]) -> DataFrame:
    """Lenient value casts: unparseable → NULL (C2-C4).

    Uses ``try_cast`` so failures coerce to NULL in ANY session mode —
    including Spark 4's ANSI default, where a plain cast would throw on the
    first bad value. Matches ``pd.to_numeric(errors="coerce")`` /
    ``pd.to_datetime(errors="coerce")`` (reference
    etl_sales_analytics.py:161-178) and DuckDB's TRY_CAST.
    """
    return df.select(
        *[
            F.col(f.name).try_cast(casts[f.name]).alias(f.name)
            if f.name in casts
            else F.col(f.name)
            for f in df.schema.fields
        ]
    )


def drop_null_keys(df: DataFrame, keys: list[str]) -> DataFrame:
    """Drop rows with NULL in any key column (F1, reference :183-186)."""
    return df.dropna(subset=keys)


def dedupe_keep_last(
    df: DataFrame, keys: list[str], order_col: str | list[str] = SEQ_COL
) -> DataFrame:
    """Keep-LAST dedupe by key (F2) — pandas ``drop_duplicates(keep="last")``.

    pandas "last" means file order; Spark rows have no order, so the caller
    supplies an ordering column (``_seq`` stamped at ingest by
    ``read_csv_exact(with_seq=True)``, or any domain column like a line
    number). Implemented as ``row_number`` over a window partitioned by the
    key, descending on the order column — one hash shuffle on the key, no
    global sort.

    The ordering column is dropped from the output (the reference's frames
    never carry it).

    Scale: this is the standard distributed idiom; skewed keys are handled by
    AQE skew-join/partition splitting. NOT ``dropDuplicates`` — that keeps an
    arbitrary row (SURVEY.md §2.3 F2).

    ``order_col`` may be a list: ties on the first column fall through to the
    next, making the pick deterministic when a single column isn't a total
    order within key groups.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = Window.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    out = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if order_cols == [SEQ_COL]:
        out = out.drop(SEQ_COL)
    return out
