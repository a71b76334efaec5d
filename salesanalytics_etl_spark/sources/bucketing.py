"""Bucketed tables: co-located fact⋈fact joins without a per-query shuffle.

The reference's nonclustered join-key indexes (IX_Orders_CustomerID,
IX_OrderDetail_ProductID — schema_sales_analytics.sql:72-73,93) declare its
intended access paths. The lakehouse analogue is BUCKETING: write both join
sides hash-partitioned by the key into the same bucket count, and every
subsequent equi-join on that key reads co-located buckets — no Exchange on
either side, at any scale. This is the one join optimization Catalyst can't
invent at read time; it has to be baked into the layout.

Broadcast joins cover dim tables; bucketing is for the fact⋈fact case
(orders⋈lineitem at 100 TB, where neither side broadcasts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_key: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Save as a bucketed (optionally sort-within-bucket) managed table.

    ``sortBy`` additionally orders rows inside each bucket so sort-merge
    joins skip their sort phase too.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_key)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str] | str
) -> DataFrame:
    """Join two bucketed tables on their bucket key (shuffle-free)."""
    return spark.table(left_table).join(spark.table(right_table), on=on)
