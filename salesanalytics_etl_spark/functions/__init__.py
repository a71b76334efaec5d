from salesanalytics_etl_spark.functions.scalar import (
    concat_tsql,
    dec182,
    null_label,
    safe_div,
    year_month,
)

__all__ = ["concat_tsql", "dec182", "null_label", "safe_div", "year_month"]
