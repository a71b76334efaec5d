"""Declared schemas (SURVEY.md §1.2-1.3).

The reference enforces an exact column list per source (reference
etl_sales_analytics.py:46-61) and re-declares SQL types in DDL
(schema_sales_analytics.sql:30-90). We declare the same four reference-domain
schemas as StructTypes, plus the driver's TPC-H-ish parquet tables
(TESTDATA.md) used by the query library.

Type mapping (SURVEY.md §1.3): INT→IntegerType, NVARCHAR→StringType,
DECIMAL(18,2)→DecimalType(18,2), DATETIME2→TimestampType.
"""

from __future__ import annotations

from pyspark.sql import types as T

DEC182 = T.DecimalType(18, 2)

# --- Reference-domain tables (schema_sales_analytics.sql:30-90) -----------

CUSTOMER_SCHEMA = T.StructType(
    [
        T.StructField("CustomerID", T.IntegerType()),
        T.StructField("FirstName", T.StringType()),
        T.StructField("LastName", T.StringType()),
        T.StructField("Email", T.StringType()),
        T.StructField("Phone", T.StringType()),
        T.StructField("City", T.StringType()),
        T.StructField("Country", T.StringType()),
    ]
)

PRODUCT_SCHEMA = T.StructType(
    [
        T.StructField("ProductID", T.IntegerType()),
        T.StructField("ProductName", T.StringType()),
        T.StructField("Category", T.StringType()),
        T.StructField("Price", DEC182),
        T.StructField("Stock", T.IntegerType()),
    ]
)

ORDERS_SCHEMA = T.StructType(
    [
        T.StructField("OrderID", T.IntegerType()),
        T.StructField("CustomerID", T.IntegerType()),
        T.StructField("OrderDate", T.TimestampType()),
        T.StructField("Status", T.StringType()),
    ]
)

ORDER_DETAIL_SCHEMA = T.StructType(
    [
        T.StructField("OrderID", T.IntegerType()),
        T.StructField("ProductID", T.IntegerType()),
        T.StructField("Quantity", T.IntegerType()),
        T.StructField("TotalPrice", DEC182),
    ]
)

REFERENCE_SCHEMAS: dict[str, T.StructType] = {
    "customers": CUSTOMER_SCHEMA,
    "products": PRODUCT_SCHEMA,
    "orders": ORDERS_SCHEMA,
    "order_details": ORDER_DETAIL_SCHEMA,
}

# Primary keys (schema_sales_analytics.sql:38,51,65,84) — drive the
# drop-null-key filter and keep-last dedupe (etl_sales_analytics.py:183-186).
PRIMARY_KEYS: dict[str, list[str]] = {
    "customers": ["CustomerID"],
    "products": ["ProductID"],
    "orders": ["OrderID", "CustomerID"],  # null CustomerID also drops the row
    "order_details": ["OrderID", "ProductID"],
}

DEDUPE_KEYS: dict[str, list[str]] = {
    "customers": ["CustomerID"],
    "products": ["ProductID"],
    "orders": ["OrderID"],
    "order_details": ["OrderID", "ProductID"],
}

# --- Driver testdata tables (TESTDATA.md) ---------------------------------

DRIVER_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
