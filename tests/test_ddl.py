"""DDL lifecycle (SURVEY.md §2.1 S5/S6): guarded warehouse creation and
staging drop/recreate against the session catalog."""

from __future__ import annotations

import pytest

from salesanalytics_etl_spark.sources.ddl import (
    drop_staging,
    ensure_tables,
    recreate_staging,
)


@pytest.fixture
def db(spark, tmp_path):
    name = "ddl_test_db"
    yield name, str(tmp_path / "warehouse")
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


def test_ensure_tables_idempotent_and_preserves_data(spark, db):
    database, loc = db
    names = ensure_tables(spark, database, location=loc)
    assert names == [
        f"{database}.customers",
        f"{database}.products",
        f"{database}.orders",
        f"{database}.order_details",
    ]
    spark.sql(
        f"INSERT INTO {database}.customers VALUES "
        "(1, 'Ada', 'Lovelace', 'ada@example.com', NULL, 'London', 'UK')"
    )
    # second call is a no-op: IF NOT EXISTS never drops existing rows
    ensure_tables(spark, database, location=loc)
    assert spark.table(f"{database}.customers").count() == 1
    # declared types survive the catalog round-trip
    dt = dict(spark.table(f"{database}.products").dtypes)
    assert dt["Price"] == "decimal(18,2)" and dt["Stock"] == "int"


def test_staging_recreate_starts_empty(spark, db):
    database, loc = db
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database} LOCATION '{loc}'")
    recreate_staging(spark, database)
    spark.sql(
        f"INSERT INTO {database}.stage_orders VALUES "
        "(1, 1, TIMESTAMP '2024-01-01 00:00:00', 'OK')"
    )
    assert spark.table(f"{database}.stage_orders").count() == 1
    # recreate wipes: staging always starts empty for a load (reference
    # etl_sales_analytics.py:118-159)
    recreate_staging(spark, database)
    assert spark.table(f"{database}.stage_orders").count() == 0

    drop_staging(spark, database)
    tables = {t.name for t in spark.catalog.listTables(database)}
    assert not any(t.startswith("stage_") for t in tables)
