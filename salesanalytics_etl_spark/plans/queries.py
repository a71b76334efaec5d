"""The 14 reference reporting queries + 2 views, re-expressed Spark-first
over the driver's TPC-H-ish tables (SURVEY.md §2.4-2.8, FIXTURES.md mapping:
Customer→customer, Product→part, Orders→orders, OrderDetail→lineitem;
TotalPrice→l_extendedprice, Quantity→l_quantity, Category→p_type).

Every query is a lazy DataFrame expression — Catalyst handles predicate
pushdown, column pruning, join selection (dims broadcast), and top-k as
TakeOrderedAndProject. Monetary sums go through DECIMAL(18,2) so results are
exact and order-insensitive (hash-stable across partitionings AND equal to
the DuckDB oracle's decimal arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from salesanalytics_etl_spark.functions.scalar import (
    concat_tsql,
    dec182,
    floor_cents,
    money_out,
    null_label,
    safe_div,
    year_month,
)
from salesanalytics_etl_spark.plans.registry import register
from salesanalytics_etl_spark.sources.readers import load_driver_tables

# Parameterization of the reference's non-deterministic bits (SURVEY.md §5.2):
# GETDATE()-relative window (queries.sql:182-183) → fixed dates inside the
# testdata's 1995-01-01..2001-08-01 o_orderdate domain.
DATE_FROM = "1996-01-01"
DATE_TO = "1996-12-31"  # inclusive; filter is half-open [from, to+1day)


def _t(spark: SparkSession, sf_dir: str, *names: str) -> list[DataFrame]:
    tables = load_driver_tables(spark, sf_dir, list(names))
    return [tables[n] for n in names]


# --------------------------------------------------------------------------
# Q1 — row-count reconciliation with literal tag column
# (reference queries.sql:10-13: COUNT(*) per table UNION ALL; A1/U1/X11)
# --------------------------------------------------------------------------
@register(
    "q01_table_counts",
    oracle="""
    SELECT 'customer' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows FROM customer
    UNION ALL SELECT 'part', CAST(COUNT(*) AS BIGINT) FROM part
    UNION ALL SELECT 'orders', CAST(COUNT(*) AS BIGINT) FROM orders
    UNION ALL SELECT 'lineitem', CAST(COUNT(*) AS BIGINT) FROM lineitem
    """,
    doc="COUNT(*) per table tagged with a literal, UNION ALL (queries.sql:10-13)",
)
def q01_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, part, orders, lineitem = _t(
        spark, sf_dir, "customer", "part", "orders", "lineitem"
    )
    parts = [
        df.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("table_name"), "n_rows"
        )
        for name, df in [
            ("customer", customer),
            ("part", part),
            ("orders", orders),
            ("lineitem", lineitem),
        ]
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# Q2 — TOP-k sample: latest orders (queries.sql:19-22; O2/O3)
# --------------------------------------------------------------------------
@register(
    "q02_orders_sample_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders ORDER BY o_orderkey DESC LIMIT 10
    """,
    doc="TOP (10) ... ORDER BY pk DESC eyeball sample → TakeOrderedAndProject",
)
def q02_orders_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
        )
        .orderBy(F.desc("o_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q3 — FLAGSHIP: sales by day (queries.sql:28-34 + vw_SalesByDay,
# schema_sales_analytics.sql:101-107; J1/X1/A2/O1)
# --------------------------------------------------------------------------
@register(
    "q03_sales_by_day",
    oracle="""
    SELECT CAST(o.o_orderdate AS DATE) AS order_date,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_sales
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY CAST(o.o_orderdate AS DATE)
    """,
    doc="orders⋈lineitem, SUM by day (flagship; queries.sql:28-34)",
)
def q03_sales_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    return (
        orders.select("o_orderkey", "o_orderdate")
        .join(
            lineitem.select("l_orderkey", "l_extendedprice"),
            orders.o_orderkey == lineitem.l_orderkey,
        )
        .groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(money_out(F.sum(dec182("l_extendedprice"))).alias("total_sales"))
    )


# --------------------------------------------------------------------------
# Q4 — sales by month (queries.sql:40-46; X3/A3)
# --------------------------------------------------------------------------
@register(
    "q04_sales_by_month",
    oracle="""
    SELECT strftime(o.o_orderdate, '%Y-%m') AS order_month,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_sales
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY strftime(o.o_orderdate, '%Y-%m')
    """,
    doc="SUM by 'YYYY-MM' (CONVERT(char(7),...,126) → date_format)",
)
def q04_sales_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    return (
        orders.select("o_orderkey", "o_orderdate")
        .join(
            lineitem.select("l_orderkey", "l_extendedprice"),
            orders.o_orderkey == lineitem.l_orderkey,
        )
        .groupBy(year_month("o_orderdate").alias("order_month"))
        .agg(money_out(F.sum(dec182("l_extendedprice"))).alias("total_sales"))
    )


# --------------------------------------------------------------------------
# Q5 — top-10 products by revenue (queries.sql:52-60; J2/A4/O3)
# --------------------------------------------------------------------------
@register(
    "q05_top_products",
    oracle="""
    SELECT p.p_partkey, p.p_name,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
           ROUND(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_partkey, p.p_name
    ORDER BY revenue DESC, p.p_partkey LIMIT 10
    """,
    doc="fact⋈dim broadcast join, multi-agg, top-k (queries.sql:52-60)",
)
def q05_top_products(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, lineitem = _t(spark, sf_dir, "part", "lineitem")
    return (
        lineitem.select("l_partkey", "l_extendedprice", "l_quantity")
        .join(F.broadcast(part.select("p_partkey", "p_name")),
              lineitem.l_partkey == part.p_partkey)
        .groupBy("p_partkey", "p_name")
        .agg(
            money_out(F.sum(dec182("l_extendedprice"))).alias("revenue"),
            money_out(F.sum(dec182("l_quantity"))).alias("total_qty"),
        )
        .orderBy(F.desc("revenue"), F.asc("p_partkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q6 — top-10 customers: revenue + COUNT(DISTINCT order) (queries.sql:66-75;
# J3/A5). Exact distinct — approx_count_distinct would break oracle parity.
# --------------------------------------------------------------------------
@register(
    "q06_top_customers",
    oracle="""
    SELECT c.c_custkey,
           COALESCE(c.c_name, '') || ' ' || COALESCE(c.c_mktsegment, '')
             AS customer_label,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS n_orders
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
    ORDER BY revenue DESC, c.c_custkey LIMIT 10
    """,
    doc="3-way join + countDistinct, top-k (queries.sql:66-75); customer "
    "label uses T-SQL CONCAT NULL-as-'' semantics (queries.sql:68, X6)",
)
def q06_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders, lineitem = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        lineitem.select("l_orderkey", "l_extendedprice")
        .join(orders.select("o_orderkey", "o_custkey"),
              lineitem.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer.select("c_custkey", "c_name", "c_mktsegment")),
              orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            money_out(F.sum(dec182("l_extendedprice"))).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .select(
            "c_custkey",
            concat_tsql("c_name", "c_mktsegment").alias("customer_label"),
            "revenue",
            "n_orders",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q7 — status histogram with NULL bucket (queries.sql:81-86; A6/X7)
# --------------------------------------------------------------------------
@register(
    "q07_status_histogram",
    oracle="""
    SELECT COALESCE(o_orderstatus, '(NULL)') AS status,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders GROUP BY COALESCE(o_orderstatus, '(NULL)')
    """,
    doc="frequency histogram, ISNULL(x,'(NULL)') → coalesce (queries.sql:81-86)",
)
def q07_status_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(null_label("o_orderstatus").alias("status"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# --------------------------------------------------------------------------
# Q8 — Average Order Value: two-level agg via CTE (queries.sql:93-103; A7)
# --------------------------------------------------------------------------
@register(
    "q08_avg_order_value",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS order_total
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(order_total) AS DOUBLE), 2) AS total_sales,
           FLOOR(CAST(SUM(order_total) AS DOUBLE) / COUNT(*) * 100 + 0.5)
             / 100.0 AS avg_order_value
    FROM per_order
    """,
    doc="re-aggregation: per-order SUM → global COUNT/SUM/AVG (queries.sql:93-103)",
)
def q08_avg_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.sum(dec182("l_extendedprice")).alias("order_total")
    )
    return per_order.agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_out(F.sum("order_total")).alias("total_sales"),
        # floor-formula rounding (see functions.scalar.safe_div): the
        # quotient is an arbitrary double and engine-native ROUND diverges
        # at shortest-repr half boundaries (1.005 -> 1.01 Spark HALF_UP,
        # 1.00 DuckDB rint); the identical IEEE ops agree by construction
        (
            F.floor(
                F.sum("order_total").cast("double")
                / F.count(F.lit(1))
                * F.lit(100.0)
                + F.lit(0.5)
            )
            / F.lit(100.0)
        ).alias("avg_order_value"),
    )


# --------------------------------------------------------------------------
# Q9 — parts with no sales: anti-join (queries.sql:109-113; J4/F6)
# --------------------------------------------------------------------------
@register(
    "q09_parts_no_sales",
    oracle="""
    SELECT p.p_partkey, p.p_name FROM part p
    LEFT JOIN (SELECT DISTINCT l_partkey FROM lineitem) l
      ON p.p_partkey = l.l_partkey
    WHERE l.l_partkey IS NULL
    """,
    doc="LEFT JOIN + IS NULL → left_anti (queries.sql:109-113)",
)
def q09_parts_no_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, lineitem = _t(spark, sf_dir, "part", "lineitem")
    return (
        part.join(
            lineitem.select(F.col("l_partkey").alias("p_partkey")),
            on="p_partkey",
            how="left_anti",
        ).select("p_partkey", "p_name")
    )


# --------------------------------------------------------------------------
# Q10 — customers with no orders: anti-join (queries.sql:119-123; J5/F6)
# --------------------------------------------------------------------------
@register(
    "q10_customers_no_orders",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM customer c
    LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) o
      ON c.c_custkey = o.o_custkey
    WHERE o.o_custkey IS NULL
    """,
    doc="anti-join: customers with no orders (queries.sql:119-123)",
)
def q10_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        customer.join(
            orders.select(F.col("o_custkey").alias("c_custkey")),
            on="c_custkey",
            how="left_anti",
        ).select("c_custkey", "c_name")
    )


# --------------------------------------------------------------------------
# Q11 — detail of the latest order: scalar subquery + guarded division
# (queries.sql:130-148; J6/F7/X8/X9)
# --------------------------------------------------------------------------
@register(
    "q11_last_order_details",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_name, l.l_quantity,
           ROUND(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS line_total,
           CASE WHEN l.l_quantity > 0
                THEN FLOOR(l.l_extendedprice / l.l_quantity * 100.0 + 0.5) / 100.0
           END AS est_unit_price
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_orderkey = (SELECT MAX(o_orderkey) FROM orders)
    """,
    doc="uncorrelated scalar subquery (max key) + CASE-guarded division "
    "(queries.sql:130-148); max computed as a 1-row broadcast join, no collect",
)
def q11_last_order_details(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, orders, lineitem = _t(spark, sf_dir, "part", "orders", "lineitem")
    max_key = orders.agg(F.max("o_orderkey").alias("_max_orderkey"))
    return (
        lineitem.join(
            F.broadcast(max_key), lineitem.l_orderkey == F.col("_max_orderkey")
        )
        .join(F.broadcast(part.select("p_partkey", "p_name")),
              lineitem.l_partkey == part.p_partkey)
        .select(
            "l_orderkey",
            "l_linenumber",
            "p_name",
            "l_quantity",
            money_out(dec182("l_extendedprice")).alias("line_total"),
            safe_div(F.col("l_extendedprice"), F.col("l_quantity")).alias(
                "est_unit_price"
            ),
        )
    )


# --------------------------------------------------------------------------
# Q12 — per-order totals view (vw_OrderTotals,
# schema_sales_analytics.sql:113-120; A8)
# --------------------------------------------------------------------------
@register(
    "q12_order_totals",
    oracle="""
    SELECT l_orderkey,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS order_total,
           ROUND(CAST(SUM(COALESCE(CAST(l_quantity AS DECIMAL(18,2)), 0)) AS DOUBLE), 2) AS total_qty,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem GROUP BY l_orderkey
    """,
    doc="vw_OrderTotals consumed through the spark.sql view surface "
    "(schema_sales_analytics.sql:113-120) — like q17 for vw_SalesByDay, "
    "this proves the second reference view end-to-end; Catalyst inlines "
    "the view plan into the consuming query",
)
def q12_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from salesanalytics_etl_spark.plans.views import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        "SELECT l_orderkey, order_total, total_qty, n_lines FROM vw_order_totals"
    )


# --------------------------------------------------------------------------
# Q13 — order reconciliation: header total vs sum of lines
# (queries.sql:152-163; A9)
# --------------------------------------------------------------------------
@register(
    "q13_order_reconciliation",
    oracle="""
    SELECT o.o_orderkey, o.o_orderdate,
           ROUND(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS header_total,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS lines_total
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
    doc="reconciliation: per-order header total vs SUM(lines) (queries.sql:152-163)",
)
def q13_order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    return (
        orders.select("o_orderkey", "o_orderdate", "o_totalprice")
        .join(lineitem.select("l_orderkey", "l_extendedprice"),
              orders.o_orderkey == lineitem.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            money_out(F.sum(dec182("l_extendedprice"))).alias("lines_total")
        )
        .select(
            "o_orderkey",
            "o_orderdate",
            money_out(dec182("o_totalprice")).alias("header_total"),
            "lines_total",
        )
    )


# --------------------------------------------------------------------------
# Q14 — date-bounded daily sales, half-open window (queries.sql:185-193;
# F5/X4/A11). GETDATE()-relative in the reference → parameterized fixed
# dates (deterministic; SURVEY.md §5.2).
# --------------------------------------------------------------------------
@register(
    "q14_sales_daterange",
    oracle=f"""
    SELECT CAST(o.o_orderdate AS DATE) AS order_date,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_sales
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderdate >= TIMESTAMP '{DATE_FROM} 00:00:00'
      AND o.o_orderdate < (TIMESTAMP '{DATE_TO} 00:00:00' + INTERVAL 1 DAY)
    GROUP BY CAST(o.o_orderdate AS DATE)
    """,
    doc="half-open date-range filter [d1, d2+1day) + daily SUM (queries.sql:185-193)",
)
def q14_sales_daterange(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    lo = F.lit(DATE_FROM).cast("timestamp")
    hi = F.date_add(F.lit(DATE_TO).cast("date"), 1).cast("timestamp")
    return (
        orders.select("o_orderkey", "o_orderdate")
        .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
        .join(lineitem.select("l_orderkey", "l_extendedprice"),
              orders.o_orderkey == lineitem.l_orderkey)
        .groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(money_out(F.sum(dec182("l_extendedprice"))).alias("total_sales"))
    )


# --------------------------------------------------------------------------
# Q17 — the SQL surface: flagship view consumed via spark.sql (EP3,
# schema_sales_analytics.sql:101-107). Same semantics as Q3, but through
# CREATE TEMP VIEW + SQL text → proves the engine's second query surface.
# --------------------------------------------------------------------------
@register(
    "q17_view_sales_by_day_sql",
    oracle="""
    SELECT CAST(o.o_orderdate AS DATE) AS order_date,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_sales
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY CAST(o.o_orderdate AS DATE)
    """,
    doc="vw_SalesByDay through the spark.sql surface (view inlined by "
    "Catalyst exactly like SQL Server inlines vw definitions, EP3)",
)
def q17_view_sales_by_day_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    from salesanalytics_etl_spark.plans.views import register_views

    register_views(spark, sf_dir)
    return spark.sql("SELECT order_date, total_sales FROM vw_sales_by_day")


# --------------------------------------------------------------------------
# Q18 — running (cumulative) daily sales: window-function extension.
# Cumulative frames aren't in the reference (SURVEY.md §2.11) but fall out
# of Catalyst's window operator; deterministic because order_date is unique
# after the daily pre-aggregation.
# --------------------------------------------------------------------------
@register(
    "q18_running_daily_sales",
    oracle="""
    WITH daily AS (
      SELECT CAST(o.o_orderdate AS DATE) AS order_date,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS day_sales_dec
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY CAST(o.o_orderdate AS DATE)
    )
    SELECT order_date,
           ROUND(CAST(day_sales_dec AS DOUBLE), 2) AS day_sales,
           ROUND(CAST(SUM(day_sales_dec) OVER (
             ORDER BY order_date ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2)
             AS cumulative_sales
    FROM daily
    """,
    doc="cumulative SUM window over the daily rollup (running total)",
)
def q18_running_daily_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    daily = (
        orders.select("o_orderkey", "o_orderdate")
        .join(lineitem.select("l_orderkey", "l_extendedprice"),
              orders.o_orderkey == lineitem.l_orderkey)
        .groupBy(F.to_date("o_orderdate").alias("order_date"))
        .agg(F.sum(dec182("l_extendedprice")).alias("day_sales_dec"))
    )
    # the running total accumulates in DECIMAL (exact — safe to window-sum
    # in any engine); only the emitted columns are double.
    # Unpartitioned BY DESIGN over the calendar-bounded DAY grain (the
    # WindowExec single-partition WARN at sf0.1 is expected and benign;
    # tests/test_plan_lint.py allowlists exactly this bounded class)
    w = Window.orderBy("order_date").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        "order_date",
        money_out(F.col("day_sales_dec")).alias("day_sales"),
        money_out(F.sum("day_sales_dec").over(w)).alias("cumulative_sales"),
    )


# --------------------------------------------------------------------------
# Q19 — top-3 parts per type: rank-within-group (window) extension.
# --------------------------------------------------------------------------
@register(
    "q19_top_parts_per_type",
    oracle="""
    WITH rev AS (
      SELECT p.p_type, p.p_partkey, p.p_name,
             ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS revenue
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY p.p_type, p.p_partkey, p.p_name
    )
    SELECT p_type, p_partkey, p_name, revenue,
           CAST(rk AS INT) AS rank_in_type
    FROM (SELECT *, ROW_NUMBER() OVER (
            PARTITION BY p_type ORDER BY revenue DESC, p_partkey) AS rk
          FROM rev)
    WHERE rk <= 3
    """,
    doc="top-N per group: row_number over (partition by type, order by "
    "revenue) — the distributed form of the reference's TOP-k pattern",
)
def q19_top_parts_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, lineitem = _t(spark, sf_dir, "part", "lineitem")
    rev = (
        lineitem.select("l_partkey", "l_extendedprice")
        .join(F.broadcast(part.select("p_partkey", "p_name", "p_type")),
              lineitem.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_partkey", "p_name")
        .agg(money_out(F.sum(dec182("l_extendedprice"))).alias("revenue"))
    )
    # two-phase pick (operators/skew.py): |part|-grain rows over a
    # ~150-value p_type domain would otherwise sort in ~150 tasks
    from salesanalytics_etl_spark.operators.skew import topk_per_group

    return topk_per_group(
        rev,
        ["p_type"],
        [F.desc("revenue"), F.asc("p_partkey")],
        3,
        rank_col="rank_in_type",
    ).select("p_type", "p_partkey", "p_name", "revenue", "rank_in_type")


# --------------------------------------------------------------------------
# Q35-Q38 — OLAP extensions beyond the reference surface (SURVEY.md §2.5
# "not present: grouping sets/rollup, percentiles, pivot — all Catalyst
# built-ins if we choose to extend"): we choose to extend.
# --------------------------------------------------------------------------
@register(
    "q35_sales_rollup",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS order_year,
           CAST(EXTRACT(month FROM o.o_orderdate) AS INT) AS order_month,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total_sales
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY ROLLUP (CAST(EXTRACT(year FROM o.o_orderdate) AS INT),
                     CAST(EXTRACT(month FROM o.o_orderdate) AS INT))
    """,
    doc="ROLLUP(year, month): subtotal + grand-total rows (grouping sets)",
)
def q35_sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, lineitem = _t(spark, sf_dir, "orders", "lineitem")
    return (
        orders.select("o_orderkey", "o_orderdate")
        .join(lineitem.select("l_orderkey", "l_extendedprice"),
              orders.o_orderkey == lineitem.l_orderkey)
        .select(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            "l_extendedprice",
        )
        .rollup("order_year", "order_month")
        .agg(money_out(F.sum(dec182("l_extendedprice"))).alias("total_sales"))
    )


@register(
    "q36_status_pivot",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f
    FROM orders GROUP BY 1
    """,
    doc="pivot: order counts per status column by year (Spark pivot() ≡ "
    "conditional aggregation)",
)
def q36_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.select(F.year("o_orderdate").alias("order_year"), "o_orderstatus")
        .groupBy("order_year")
        .pivot("o_orderstatus", ["P", "O", "F"])
        .count()
        .select(
            "order_year",
            F.coalesce("P", F.lit(0)).alias("n_p"),
            F.coalesce("O", F.lit(0)).alias("n_o"),
            F.coalesce("F", F.lit(0)).alias("n_f"),
        )
    )


@register(
    "q37_order_value_percentiles",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS order_total
      FROM lineitem GROUP BY l_orderkey
    ), ranked AS (
      SELECT order_total AS v,
             ROW_NUMBER() OVER (ORDER BY order_total) AS r,
             COUNT(*) OVER () AS n
      FROM per_order
    ), bounded AS (
      SELECT v, r, n,
             CAST(FLOOR(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 AS lo50,
             CAST(CEIL(CAST(n - 1 AS DOUBLE) * 0.5) AS BIGINT) + 1 AS hi50,
             CAST(FLOOR(CAST(n - 1 AS DOUBLE) * 0.9) AS BIGINT) + 1 AS lo90,
             CAST(CEIL(CAST(n - 1 AS DOUBLE) * 0.9) AS BIGINT) + 1 AS hi90,
             CAST(FLOOR(CAST(n - 1 AS DOUBLE) * 0.99) AS BIGINT) + 1 AS lo99,
             CAST(CEIL(CAST(n - 1 AS DOUBLE) * 0.99) AS BIGINT) + 1 AS hi99
      FROM ranked
    ), picked AS (
      SELECT * FROM bounded
      WHERE r = lo50 OR r = hi50 OR r = lo90 OR r = hi90
         OR r = lo99 OR r = hi99
    )
    SELECT
      FLOOR((MIN(CASE WHEN r = lo50 THEN v END)
             + (CAST(MIN(n) - 1 AS DOUBLE) * 0.5
                - FLOOR(CAST(MIN(n) - 1 AS DOUBLE) * 0.5))
               * (MIN(CASE WHEN r = hi50 THEN v END)
                  - MIN(CASE WHEN r = lo50 THEN v END))) * 100 + 0.5)
        / 100.0 AS p50,
      FLOOR((MIN(CASE WHEN r = lo90 THEN v END)
             + (CAST(MIN(n) - 1 AS DOUBLE) * 0.9
                - FLOOR(CAST(MIN(n) - 1 AS DOUBLE) * 0.9))
               * (MIN(CASE WHEN r = hi90 THEN v END)
                  - MIN(CASE WHEN r = lo90 THEN v END))) * 100 + 0.5)
        / 100.0 AS p90,
      FLOOR((MIN(CASE WHEN r = lo99 THEN v END)
             + (CAST(MIN(n) - 1 AS DOUBLE) * 0.99
                - FLOOR(CAST(MIN(n) - 1 AS DOUBLE) * 0.99))
               * (MIN(CASE WHEN r = hi99 THEN v END)
                  - MIN(CASE WHEN r = lo99 THEN v END))) * 100 + 0.5)
        / 100.0 AS p99
    FROM picked
    """,
    doc="exact percentiles (linear interpolation) of per-order totals, "
    "computed on the DISTRIBUTED rank path (operators/quantiles.py — "
    "r9: re-pointed per the r8 verdict; the buffered F.percentile "
    "form collected every value into one final-reduce buffer, a "
    "single-task OOM at 10^9 rows, and now lives only in unit tests "
    "as the value-identity twin, tests/test_quantiles.py). Oracle "
    "re-spells the rank CTE + the identical IEEE interpolation (NOT "
    "quantile_cont — algebraically equal forms differ in the last ulp)",
)
def q37_order_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from salesanalytics_etl_spark.operators.quantiles import (
        exact_percentiles_distributed,
    )

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    per_order = lineitem.groupBy("l_orderkey").agg(
        F.sum(dec182("l_extendedprice")).cast("double").alias("order_total")
    )
    res = exact_percentiles_distributed(
        per_order, "order_total", {"p50": 0.5, "p90": 0.9, "p99": 0.99}
    )
    return res.select(
        floor_cents(F.col("p50")).alias("p50"),
        floor_cents(F.col("p90")).alias("p90"),
        floor_cents(F.col("p99")).alias("p99"),
    )


@register(
    "q40_churned_customers_except",
    oracle="""
    SELECT o_custkey AS c_custkey FROM orders
    WHERE EXTRACT(year FROM o_orderdate) = 1995
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE EXTRACT(year FROM o_orderdate) = 1996
    """,
    doc="EXCEPT set op: customers ordering in 1995 but not 1996",
)
def q40_churned_customers_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    y1995 = orders.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("c_custkey")
    )
    y1996 = orders.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("c_custkey")
    )
    # subtract == EXCEPT (set semantics): any 1996 appearance excludes the
    # key entirely (exceptAll would only cancel per-occurrence)
    return y1995.subtract(y1996)


@register(
    "q41_part_name_search",
    oracle="""
    SELECT p_type,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN lower(p_name) LIKE '%green%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_green
    FROM part GROUP BY p_type
    """,
    doc="string search: LIKE pattern predicate + conditional count by type",
)
def q41_part_name_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    is_green = F.lower(F.col("p_name")).like("%green%")
    return part.groupBy("p_type").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(F.when(is_green, 1).otherwise(0)).alias("n_green"),
    )


@register(
    "q38_repeat_customers_intersect",
    oracle="""
    SELECT o_custkey AS c_custkey FROM orders
    WHERE EXTRACT(year FROM o_orderdate) = 1995
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE EXTRACT(year FROM o_orderdate) = 1996
    """,
    doc="INTERSECT set op: customers ordering in both 1995 and 1996 "
    "(SURVEY §2.7: not in reference — Catalyst built-in extension)",
)
def q38_repeat_customers_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    y1995 = orders.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("c_custkey")
    )
    y1996 = orders.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return y1995.intersect(y1996)


# --------------------------------------------------------------------------
# Q15 — keep-last dedupe as a query (F2, etl_sales_analytics.py:183-186):
# lineitem has real duplicate (l_orderkey,l_partkey) keys; "last" is keyed
# on the explicit l_linenumber ordering column (distributed-safe, unlike
# pandas file order).
# --------------------------------------------------------------------------
@register(
    "q15_dedupe_keep_last",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity,
           ROUND(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE), 2) AS line_total
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY l_orderkey, l_partkey
        ORDER BY l_linenumber DESC, l_quantity DESC, l_extendedprice DESC) AS rn
      FROM lineitem
    ) WHERE rn = 1
    """,
    doc="keep-LAST dedupe by (orderkey,partkey), explicit ordering columns "
    "(etl_sales_analytics.py:186 semantics, distributed-safe; the quantity/"
    "price tiebreakers total-order the testdata's 7 linenumber-tied groups)",
)
def q15_dedupe_keep_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    from salesanalytics_etl_spark.operators.cleaning import dedupe_keep_last

    (lineitem,) = _t(spark, sf_dir, "lineitem")
    deduped = dedupe_keep_last(
        lineitem,
        keys=["l_orderkey", "l_partkey"],
        order_col=["l_linenumber", "l_quantity", "l_extendedprice"],
    )
    return deduped.select(
        "l_orderkey",
        "l_partkey",
        "l_linenumber",
        "l_quantity",
        money_out(dec182("l_extendedprice")).alias("line_total"),
    )


# --------------------------------------------------------------------------
# Q16 — FK-integrity audit (F3/F4, etl_sales_analytics.py:192-207): count
# of child rows violating each FK edge (clean data → zeros; the reject-file
# path itself is covered by unit tests with injected violations).
# --------------------------------------------------------------------------
@register(
    "q16_fk_violations",
    oracle="""
    SELECT 'orders->customer' AS fk_edge, CAST(COUNT(*) AS BIGINT) AS n_bad
    FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
    UNION ALL
    SELECT 'lineitem->orders', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'lineitem->part', CAST(COUNT(*) AS BIGINT)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey)
    """,
    doc="FK validation as anti-join counts over each edge (etl_sales_analytics.py:192-207)",
)
def q16_fk_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from salesanalytics_etl_spark.operators.integrity import fk_split

    customer, part, orders, lineitem = _t(
        spark, sf_dir, "customer", "part", "orders", "lineitem"
    )
    edges = [
        ("orders->customer", fk_split(orders, customer, "o_custkey", "c_custkey")[1]),
        ("lineitem->orders", fk_split(lineitem, orders, "l_orderkey", "o_orderkey")[1]),
        ("lineitem->part", fk_split(lineitem, part, "l_partkey", "p_partkey")[1]),
    ]
    parts = [
        rej.agg(F.count(F.lit(1)).alias("n_bad")).select(
            F.lit(name).alias("fk_edge"), "n_bad"
        )
        for name, rej in edges
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# Q52 — MERGE-upsert on the driver-checked surface (J8/M1,
# etl_sales_analytics.py:223-283): upsert a derived batch (updates = 1997
# orders restated, inserts = 1998 orders re-keyed) into the base orders
# state. T-SQL MERGE with update-all-columns ≡ incoming ∪ (target rows
# whose key is absent from incoming) — SQL-expressible, so a full oracle
# twin exists. Derivations avoid ROUND on arbitrary doubles (Spark
# BigDecimal-HALF_UP vs DuckDB scale-and-rint can differ at half
# boundaries); +1000.0 is exact in both engines.
# --------------------------------------------------------------------------
@register(
    "q52_merge_upsert",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
      FROM orders
    ), incoming AS (
      SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
             o_totalprice + 1000.0 AS o_totalprice, o_orderdate
      FROM base WHERE EXTRACT(year FROM o_orderdate) = 1997
      UNION ALL
      SELECT o_orderkey + 100000000, o_custkey, 'N',
             o_totalprice, o_orderdate
      FROM base WHERE EXTRACT(year FROM o_orderdate) = 1998
    )
    SELECT * FROM incoming
    UNION ALL
    SELECT b.* FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM incoming i
                      WHERE i.o_orderkey = b.o_orderkey)
    """,
    doc="MERGE upsert end-state (anti-join + unionByName) — updates hit "
    "every 1997 order, inserts add re-keyed 1998 orders "
    "(etl_sales_analytics.py:223-283 semantics)",
)
def q52_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from salesanalytics_etl_spark.operators.upsert import merge_upsert

    (orders,) = _t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
    base = orders.select(*cols)
    updates = (
        base.filter(F.year("o_orderdate") == 1997)
        .withColumn("o_orderstatus", F.lit("U"))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
    )
    inserts = base.filter(F.year("o_orderdate") == 1998).select(
        (F.col("o_orderkey") + F.lit(100000000)).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        "o_orderdate",
    )
    incoming = updates.unionByName(inserts)
    return merge_upsert(base, incoming, keys=["o_orderkey"])


# --------------------------------------------------------------------------
# Q53-Q55 — the remaining S7 TOP-k eyeball samples (reference samples all
# four loaded tables: Result Set del select de cada tabla cargada..sql:5-26,
# queries.sql:19-22; q02 covers orders). lineitem needs a TOTAL order over
# every output column: the testdata has duplicate (l_orderkey, l_partkey)
# keys and l_linenumber ties (SURVEY.md §5.2), and Spark/DuckDB tie-break
# differently on partial orders.
# --------------------------------------------------------------------------
@register(
    "q53_customer_sample_topk",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer ORDER BY c_custkey DESC LIMIT 10
    """,
    doc="TOP (10) customer sample by pk (queries.sql:19; S7)",
)
def q53_customer_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (customer,) = _t(spark, sf_dir, "customer")
    return customer.orderBy(F.desc("c_custkey")).limit(10)


@register(
    "q54_part_sample_topk",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
    FROM part ORDER BY p_partkey DESC LIMIT 10
    """,
    doc="TOP (10) part sample by pk (queries.sql:20; S7)",
)
def q54_part_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    return part.orderBy(F.desc("p_partkey")).limit(10)


@register(
    "q55_lineitem_sample_topk",
    oracle="""
    SELECT l_orderkey, l_partkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    ORDER BY l_orderkey DESC, l_partkey DESC, l_linenumber DESC,
             l_quantity DESC, l_extendedprice DESC
    LIMIT 10
    """,
    doc="TOP (10) lineitem sample — total order over all output columns "
    "(duplicate keys exist; S7/O2)",
)
def q55_lineitem_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    return (
        lineitem.select(
            "l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
            "l_extendedprice",
        )
        .orderBy(
            F.desc("l_orderkey"), F.desc("l_partkey"), F.desc("l_linenumber"),
            F.desc("l_quantity"), F.desc("l_extendedprice"),
        )
        .limit(10)
    )


# --------------------------------------------------------------------------
# Q56 — conformance/coercion on the driver-checked surface (C1-C4/F1,
# etl_sales_analytics.py:57-60,161-186): a deliberately ragged source is
# derived from orders (NULL keys every 97th, garbage ints every 13th,
# garbage timestamps every 11th, garbage decimals every 7th, whitespace
# padding), then trimmed, try_cast-coerced, and key-filtered by the
# cleaning operators; the oracle applies the identical trim/TRY_CAST
# pipeline in SQL. Only parsed VALUES must agree, never string renderings,
# so engine to-string formatting differences can't bite.
# --------------------------------------------------------------------------
@register(
    "q56_conformance_coercion",
    oracle="""
    WITH ragged AS (
      SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL
                  ELSE CAST(o_orderkey AS VARCHAR) END AS raw_key,
             CASE WHEN o_orderkey % 13 = 0 THEN 'N/A'
                  ELSE '  ' || CAST(o_custkey AS VARCHAR) || ' ' END AS raw_cust,
             CASE WHEN o_orderkey % 11 = 0 THEN 'not-a-date'
                  ELSE CAST(o_orderdate AS VARCHAR) END AS raw_ts,
             CASE WHEN o_orderkey % 7 = 0 THEN '?'
                  ELSE CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR)
                  END AS raw_price
      FROM orders
    ), cleaned AS (
      SELECT TRY_CAST(trim(raw_key) AS BIGINT) AS k,
             TRY_CAST(trim(raw_cust) AS BIGINT) AS c,
             TRY_CAST(trim(raw_ts) AS TIMESTAMP) AS t,
             TRY_CAST(trim(raw_price) AS DECIMAL(18,2)) AS p
      FROM ragged
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(c) AS BIGINT) AS n_cust_ok,
           CAST(COUNT(t) AS BIGINT) AS n_ts_ok,
           CAST(COUNT(p) AS BIGINT) AS n_price_ok,
           ROUND(CAST(SUM(p) AS DOUBLE), 2) AS price_sum,
           CAST(SUM(c) AS BIGINT) AS cust_sum
    FROM cleaned WHERE k IS NOT NULL
    """,
    doc="trim → lenient casts (unparseable→NULL) → drop-null-keys, "
    "aggregated so the driver checks the coerced VALUES (C1-C4/F1; "
    "etl_sales_analytics.py:57-60,161-186)",
)
def q56_conformance_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from salesanalytics_etl_spark.operators.cleaning import (
        coerce_casts,
        drop_null_keys,
        trim_strings,
    )

    (orders,) = _t(spark, sf_dir, "orders")
    ragged = orders.select(
        F.when(F.col("o_orderkey") % 97 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("o_orderkey").cast("string"))
        .alias("raw_key"),
        F.when(F.col("o_orderkey") % 13 == 0, F.lit("N/A"))
        .otherwise(F.concat(F.lit("  "), F.col("o_custkey").cast("string"), F.lit(" ")))
        .alias("raw_cust"),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("not-a-date"))
        .otherwise(F.col("o_orderdate").cast("string"))
        .alias("raw_ts"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("?"))
        .otherwise(dec182("o_totalprice").cast("string"))
        .alias("raw_price"),
    )
    cleaned = coerce_casts(
        trim_strings(ragged),
        {
            "raw_key": T.LongType(),
            "raw_cust": T.LongType(),
            "raw_ts": T.TimestampType(),
            "raw_price": T.DecimalType(18, 2),
        },
    )
    kept = drop_null_keys(cleaned, ["raw_key"])
    return kept.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("raw_cust").alias("n_cust_ok"),
        F.count("raw_ts").alias("n_ts_ok"),
        F.count("raw_price").alias("n_price_ok"),
        money_out(F.sum("raw_price")).alias("price_sum"),
        F.sum("raw_cust").alias("cust_sum"),
    )


# --------------------------------------------------------------------------
# Q61 — correlated-scalar-subquery pattern (TPC-H Q17 shape): lineitems
# whose quantity is below 20% of their part's average. The T-SQL form is a
# correlated subquery per row; the distributed idiom decorrelates it into
# a per-part aggregate joined back (Catalyst does this rewrite for SQL
# text too — this query pins the DataFrame form). Revenue accumulates in
# decimal, emitted as rounded double (gate type contract).
# --------------------------------------------------------------------------
@register(
    "q61_small_quantity_revenue",
    oracle="""
    WITH part_avg AS (
      SELECT l_partkey,
             AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lines,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS small_qty_revenue
    FROM lineitem l JOIN part_avg p ON l.l_partkey = p.l_partkey
    WHERE l.l_quantity < 0.2 * p.avg_qty
    """,
    doc="TPC-H Q17 shape: correlated scalar subquery decorrelated into "
    "per-part AVG + join-back; the 0.2*avg comparison stays in double on "
    "both sides (no rounding of the predicate input)",
)
def q61_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    (lineitem,) = _t(spark, sf_dir, "lineitem")
    part_avg = lineitem.groupBy("l_partkey").agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(part_avg, "l_partkey")
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            money_out(F.sum(dec182("l_extendedprice"))).alias("small_qty_revenue"),
        )
    )


# --------------------------------------------------------------------------
# Q62 — CHECK-constraint audit (reference schema_sales_analytics.sql:52-53,
# 87-88: CHECK (Price >= 0) etc., enforced only inside SQL Server there).
# check_split surfaces them as an engine operator; this query audits each
# constraint over the driver tables (clean data → zero violations, like
# the FK audit q16 — the reject path itself is unit-tested with injected
# violations).
# --------------------------------------------------------------------------
@register(
    "q62_check_violations",
    oracle="""
    SELECT 'part.p_retailprice>=0' AS check_name,
           CAST(COUNT(*) FILTER (WHERE NOT (p_retailprice >= 0)
                                 OR p_retailprice IS NULL) AS BIGINT) AS n_bad
    FROM part
    UNION ALL
    SELECT 'lineitem.l_quantity>=0',
           CAST(COUNT(*) FILTER (WHERE NOT (l_quantity >= 0)
                                 OR l_quantity IS NULL) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.l_extendedprice>=0',
           CAST(COUNT(*) FILTER (WHERE NOT (l_extendedprice >= 0)
                                 OR l_extendedprice IS NULL) AS BIGINT)
    FROM lineitem
    """,
    doc="CHECK-constraint violation counts per declared check "
    "(schema_sales_analytics.sql:52-53,87-88) via check_split's reject "
    "side — predicate-only, no shuffle",
)
def q62_check_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from salesanalytics_etl_spark.operators.integrity import check_split

    part, lineitem = _t(spark, sf_dir, "part", "lineitem")
    audits = [
        ("part.p_retailprice>=0",
         check_split(part, {"price": F.col("p_retailprice") >= 0})[1]),
        ("lineitem.l_quantity>=0",
         check_split(lineitem, {"qty": F.col("l_quantity") >= 0})[1]),
        ("lineitem.l_extendedprice>=0",
         check_split(lineitem, {"price": F.col("l_extendedprice") >= 0})[1]),
    ]
    parts = [
        rej.agg(F.count(F.lit(1)).alias("n_bad")).select(
            F.lit(name).alias("check_name"), "n_bad"
        )
        for name, rej in audits
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# Q63 — CUBE grouping sets (completes §2.5's grouping-set family beside
# q35's ROLLUP and q36's pivot): sales by (year × status) with all four
# subtotal combinations.
# --------------------------------------------------------------------------
@register(
    "q63_sales_cube",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS order_year,
           o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_value
    FROM orders
    GROUP BY CUBE (CAST(EXTRACT(year FROM o_orderdate) AS INT), o_orderstatus)
    """,
    doc="CUBE(year, status): every subtotal combination incl. grand total "
    "— Catalyst expands grouping sets into one Expand + single shuffle",
)
def q63_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("order_year"),
            "o_orderstatus",
            "o_totalprice",
        )
        .cube("order_year", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_out(F.sum(dec182("o_totalprice"))).alias("total_value"),
        )
    )
