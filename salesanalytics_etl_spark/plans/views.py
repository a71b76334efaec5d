"""View layer — reference EP3 (SURVEY.md §3): ``vw_SalesByDay`` and
``vw_OrderTotals`` (schema_sales_analytics.sql:101-120) as temp views, plus
registration of the base tables, so the engine's full surface is reachable
through ``spark.sql`` exactly like the reference's SQL Server views
(Catalyst inlines view plans into consuming queries the same way).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from salesanalytics_etl_spark.sources.readers import register_driver_views

# Money columns accumulate in DECIMAL (exact, order-insensitive) but the
# view SURFACE emits ROUND(CAST(.. AS DOUBLE), 2) — the gate-safe terminal
# type (see functions.scalar.money_out).
VW_SALES_BY_DAY = """
CREATE OR REPLACE TEMP VIEW vw_sales_by_day AS
SELECT CAST(o.o_orderdate AS DATE) AS order_date,
       ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS total_sales
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY CAST(o.o_orderdate AS DATE)
"""

VW_ORDER_TOTALS = """
CREATE OR REPLACE TEMP VIEW vw_order_totals AS
SELECT l_orderkey,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS order_total,
       ROUND(CAST(SUM(COALESCE(CAST(l_quantity AS DECIMAL(18,2)), 0)) AS DOUBLE), 2)
         AS total_qty,
       COUNT(*) AS n_lines
FROM lineitem GROUP BY l_orderkey
"""


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Base tables + the two reference views as temp views."""
    register_driver_views(spark, sf_dir)
    spark.sql(VW_SALES_BY_DAY)
    spark.sql(VW_ORDER_TOTALS)
