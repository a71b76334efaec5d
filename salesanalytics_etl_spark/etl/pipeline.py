"""End-to-end ETL pipeline — the reference's dataflow (SURVEY.md §2.13),
Spark-first.

``main()`` in the reference (etl_sales_analytics.py:302-330) composes:
CSV scan+conform+trim → coercing casts → drop-null-keys → keep-last dedupe
→ FK validation with reject sinks (orders BEFORE details — cascade order,
:198→:201) → stage → MERGE upsert → counts.

Here the staging tables disappear (they exist only to feed SQL Server's
MERGE); the upsert is the anti-join+union rewrite over the parquet target.
Error stance preserved: coerce, don't crash — bad values → NULL, bad rows →
reject files, missing files → empty frames.

Scale: each per-table flow is one lazy DAG; Catalyst pushes the null-key
filters into the scan, the dedupe is the only wide op per dim table, and
FK validation broadcasts parent key sets (dims ≪ facts at 100 TB).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from salesanalytics_etl_spark.operators.cleaning import (
    dedupe_keep_last,
    drop_null_keys,
    trim_strings,
)
from salesanalytics_etl_spark.operators.integrity import fk_split, fk_split_composite
from salesanalytics_etl_spark.operators.upsert import merge_upsert
from salesanalytics_etl_spark.schemas import (
    DEDUPE_KEYS,
    PRIMARY_KEYS,
    REFERENCE_SCHEMAS,
)
from salesanalytics_etl_spark.sources.readers import read_csv_exact
from salesanalytics_etl_spark.sources.writers import write_rejects


@dataclass
class PipelineResult:
    tables: dict[str, DataFrame]
    reject_counts: dict[str, int] = field(default_factory=dict)
    counts: dict[str, int] = field(default_factory=dict)


def clean_table(raw: DataFrame, name: str) -> DataFrame:
    """trim → drop-null-keys → keep-last dedupe (reference :171-186)."""
    df = trim_strings(raw)
    df = drop_null_keys(df, PRIMARY_KEYS[name])
    return dedupe_keep_last(df, DEDUPE_KEYS[name])


def recover_interrupted_swap(target_dir: str) -> list[str]:
    """Restore table directories left invisible by a crash mid
    stage-and-swap (between ``rename(dst, old)`` and
    ``rename(stage, dst)``): prefer a COMPLETE staged copy (newer, has
    ``_SUCCESS``), else roll the ``.__old__`` snapshot back.

    Public and idempotent — a caller restarting an incremental run must
    invoke this (or ``run_pipeline`` with the same ``target_dir``, which
    calls it first) BEFORE reading prior state from ``target_dir``;
    recovery inside the write loop alone would be too late for a caller
    whose ``spark.read.parquet`` of the missing table path fails first.
    Returns the table names restored.
    """
    restored: list[str] = []
    if not os.path.isdir(target_dir):
        return restored
    bases = set()
    for entry in os.listdir(target_dir):
        for suffix in (".__old__", ".__stage__"):
            if entry.endswith(suffix):
                bases.add(entry[: -len(suffix)])
    for base in sorted(bases):
        dst = os.path.join(target_dir, base)
        if os.path.exists(dst):
            continue  # swap completed; leftovers are cleaned on next write
        stage = dst + ".__stage__"
        old = dst + ".__old__"
        if os.path.exists(os.path.join(stage, "_SUCCESS")):
            os.rename(stage, dst)  # staged copy is complete and newer
        elif os.path.exists(old):
            os.rename(old, dst)  # roll back to the pre-swap snapshot
        else:
            continue  # partial stage of a first-ever write: nothing to save
        restored.append(base)
    return restored


def run_pipeline(
    spark: SparkSession,
    data_dir: str,
    target_dir: str | None = None,
    rejects_dir: str | None = None,
    existing: dict[str, DataFrame] | None = None,
) -> PipelineResult:
    """Run the full ETL over ``data_dir/{customers,products,orders,
    order_details}.csv``; upsert into ``existing`` state (or fresh).

    Returns final table states + reject/row counts (the reference's
    [COUNT]/[WARN] reporting, :295-299).
    """
    rejects_dir = rejects_dir or os.path.join(data_dir, "rejects")

    raw = {
        name: read_csv_exact(
            spark,
            os.path.join(data_dir, f"{name}.csv"),
            schema,
            with_seq=True,
        )
        for name, schema in REFERENCE_SCHEMAS.items()
    }

    customers = clean_table(raw["customers"], "customers")
    products = clean_table(raw["products"], "products")
    orders = clean_table(raw["orders"], "orders")
    details = clean_table(raw["order_details"], "order_details")

    reject_counts: dict[str, int] = {}

    # Reference guard (etl_sales_analytics.py:196-199): FK validation is
    # SKIPPED when the parent frame is empty/missing — children pass
    # through, zero rejects. Without this, the anti-join against an empty
    # key set would reject every child row (and cascade to an empty
    # warehouse on a missing customers.csv).

    # FK: orders→customers first (cascade order, reference :198)
    if customers.isEmpty():
        orders_ok, orders_bad = orders, orders.limit(0)
    else:
        orders_ok, orders_bad = fk_split(orders, customers, "CustomerID")
    reject_counts["orders"] = write_rejects(orders_bad, rejects_dir, "orders")

    # FK: details→{post-filter orders, products}, conjunctive (reference :200-207).
    # The skip guard tests the PRE-filter parent: the reference's guard is
    # about a missing/empty parent FILE. A batch whose orders all failed
    # their own FK has a non-empty file — details must validate against
    # the (empty) post-filter set and be rejected as orphans, not pass
    # through unvalidated.
    detail_edges = []
    if not orders.isEmpty():
        detail_edges.append((orders_ok, "OrderID", "OrderID"))
    if not products.isEmpty():
        detail_edges.append((products, "ProductID", "ProductID"))
    if detail_edges:
        details_ok, details_bad = fk_split_composite(details, detail_edges)
    else:
        details_ok, details_bad = details, details.limit(0)
    reject_counts["order_details"] = write_rejects(
        details_bad, rejects_dir, "order_details"
    )

    cleaned = {
        "customers": customers,
        "products": products,
        "orders": orders_ok,
        "order_details": details_ok,
    }

    # MERGE upsert into target state (M1); idempotent by construction.
    final: dict[str, DataFrame] = {}
    for name, incoming in cleaned.items():
        target = (existing or {}).get(name)
        final[name] = merge_upsert(target, incoming, DEDUPE_KEYS[name])

    if target_dir:
        # Stage-and-swap: on an incremental run, `existing` tables were
        # read from these very paths, and Spark rejects overwriting a
        # path its own plan is reading ("Cannot overwrite a path that is
        # also being read from"). Write beside, then swap directories.
        import shutil

        # Crash recovery BEFORE writing (see recover_interrupted_swap):
        # an interrupted swap never silently loses a table. Callers
        # restarting an incremental run should call it themselves before
        # reading prior state.
        recover_interrupted_swap(target_dir)
        for name, df in final.items():
            dst = os.path.join(target_dir, name)
            stage = dst + ".__stage__"
            shutil.rmtree(stage, ignore_errors=True)
            df.write.mode("overwrite").parquet(stage)
            old = dst + ".__old__"
            shutil.rmtree(old, ignore_errors=True)
            if os.path.exists(dst):
                os.rename(dst, old)
            os.rename(stage, dst)
            shutil.rmtree(old, ignore_errors=True)
        final = {
            name: spark.read.parquet(os.path.join(target_dir, name))
            for name in final
        }

    counts = {name: df.count() for name, df in final.items()}
    return PipelineResult(tables=final, reject_counts=reject_counts, counts=counts)
