"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (sales-by-day, SURVEY.md §7.1) at sf0.001.
``queries()`` / ``oracle_sql()`` — the engine's full query surface from
``salesanalytics_etl_spark.plans`` (14 reference queries + engine-op demos +
scale extensions), each with a DuckDB-ANSI oracle twin where
SQL-expressible.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from salesanalytics_etl_spark.plans import all_oracles, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from salesanalytics_etl_spark.plans.queries import q03_sales_by_day

    return q03_sales_by_day(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return all_queries()


def oracle_sql() -> dict[str, str]:
    return all_oracles()
