"""DDL surface (SURVEY.md §2.1 S5/S6).

The reference guards warehouse creation behind ``ensure_tables()`` —
`CREATE TABLE IF NOT EXISTS`-style DDL gated by an env flag (reference
etl_sales_analytics.py:64-116, gate :306-307) — and drops/recreates four
staging tables around every load (reference etl_sales_analytics.py:118-159,
285-293).

Spark-native shape: tables live in the session catalog as parquet-backed
tables (`CREATE TABLE IF NOT EXISTS ... USING PARQUET`), so the same DDL
works against the in-memory catalog in tests and a Hive/Glue metastore on a
cluster. Staging is only an artifact of the reference's server-side MERGE —
the engine's upsert (operators/upsert.py) doesn't need it — but the DDL
lifecycle is reproduced so a reference user's workflow (recreate staging →
append → merge → drop) runs unchanged.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from salesanalytics_etl_spark.schemas import REFERENCE_SCHEMAS

STAGE_PREFIX = "stage_"


def _ddl_cols(schema: T.StructType) -> str:
    # simpleString() renders Spark SQL types directly: int, string,
    # decimal(18,2), timestamp — valid in CREATE TABLE column lists.
    return ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)


def ensure_tables(
    spark: SparkSession,
    database: str = "sales_analytics",
    location: str | None = None,
) -> list[str]:
    """Create the four warehouse tables if absent (reference S5 semantics:
    guarded CREATE, never drops data). Returns the created/ensured names.

    ``location`` pins the database to an explicit directory (tests use a
    tmpdir); default is the session's spark-warehouse.
    """
    loc = f" LOCATION '{location}'" if location else ""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}{loc}")
    names = []
    for name, schema in REFERENCE_SCHEMAS.items():
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {database}.{name} "
            f"({_ddl_cols(schema)}) USING PARQUET"
        )
        names.append(f"{database}.{name}")
    return names


def recreate_staging(
    spark: SparkSession, database: str = "sales_analytics"
) -> list[str]:
    """Drop + recreate the four staging twins (reference S6 semantics:
    staging always starts empty for a load). Returns the staging names."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    names = []
    for name, schema in REFERENCE_SCHEMAS.items():
        stage = f"{database}.{STAGE_PREFIX}{name}"
        spark.sql(f"DROP TABLE IF EXISTS {stage}")
        spark.sql(f"CREATE TABLE {stage} ({_ddl_cols(schema)}) USING PARQUET")
        names.append(stage)
    return names


def drop_staging(spark: SparkSession, database: str = "sales_analytics") -> None:
    """Drop the staging twins after a successful merge (reference
    etl_sales_analytics.py:285-293, called at :327)."""
    for name in REFERENCE_SCHEMAS:
        spark.sql(f"DROP TABLE IF EXISTS {database}.{STAGE_PREFIX}{name}")
