"""Query registry — the engine's query surface.

Each query registers a Spark callable ``(spark, sf_dir) -> DataFrame`` plus
(when SQL-expressible) a DuckDB-ANSI oracle string over the same parquet
tables. The driver's correctness gate compares the two (row-count + schema +
order-insensitive value hash), so EVERY computed column is aliased to the
same name on both sides, monetary aggregates are summed as DECIMAL(18,2)
(exact, order-insensitive — immune to partitioning), and double-valued
derivations round identically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query to the engine surface."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


# Round-5 rotation: every query has at least one driver row after r04
# (r02 ∪ r03 ∪ r04 = all 100), so this prefix now prioritizes (a) the
# surface that CHANGED this round and must re-record green — q66 (postings
# became a joined string after its r4 canonicalizer ERR), q49/q31/q45/q46
# (rows-only → oracle-backed this round), q25 (6×5 banding), q94 (scd2
# duplicate-update guard) — then (b) staleness: the core reference surface
# q01-q19 and q35-q62, whose last driver rows are r02/r03-era, re-recorded
# on the current code. q59-q63 and the remaining rows-only queries keep
# their r03/r04 rows. Every name here is also swept locally by
# tests/test_queries.py + tests/strict_gate.py against the same oracles,
# so reordering changes what the driver RECORDS, never what is verified.
_CHECK_FIRST = [
    "q66_inverted_index",
    "q49_dedup_clusters",
    "q31_media_features",
    "q45_media_resize",
    "q46_media_frame_sample",
    "q25_minhash_neardup",
    "q94_scd2_customers",
    "q101_heavy_hitter_shingles",
    "q102_exact_jaccard_join",
    "q103_duplicate_spans",
    "q104_unigram_surprisal",
    "q105_cluster_representatives",
    "q106_token_budget_mixture",
    "q01_table_counts",
    "q02_orders_sample_topk",
    "q03_sales_by_day",
    "q04_sales_by_month",
    "q05_top_products",
    "q06_top_customers",
    "q07_status_histogram",
    "q08_avg_order_value",
    "q09_parts_no_sales",
    "q10_customers_no_orders",
    "q11_last_order_details",
    "q12_order_totals",
    "q13_order_reconciliation",
    "q14_sales_daterange",
    "q15_dedupe_keep_last",
    "q16_fk_violations",
    "q17_view_sales_by_day_sql",
    "q18_running_daily_sales",
    "q19_top_parts_per_type",
    "q35_sales_rollup",
    "q36_status_pivot",
    "q37_order_value_percentiles",
    "q38_repeat_customers_intersect",
    "q39_events_json_props",
    "q40_churned_customers_except",
    "q41_part_name_search",
    "q42_purchases_with_prior_views",
    "q43_purchase_asof_signup",
    "q44_docs_rolling_fingerprint",
    "q47_docs_chunking",
    "q48_pricing_summary",
    "q50_curation_sample",
    "q51_train_val_test_split",
    "q52_merge_upsert",
    "q53_customer_sample_topk",
    # q54-q63 keep their r2/r3/r4 rows — the new-surface queries
    # q103-q108 took the tail window slots: never-recorded code outranks
    # stale-but-green rows.
    "q107_hopping_window",
    "q108_identifier_linkage",
]


def _ordered() -> dict[str, QuerySpec]:
    first = [n for n in _CHECK_FIRST if n in _REGISTRY]
    first_set = set(first)
    rest = [n for n in _REGISTRY if n not in first_set]
    return {n: _REGISTRY[n] for n in [*first, *rest]}


def all_queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: spec.fn for name, spec in _ordered().items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle
        for name, spec in _ordered().items()
        if spec.oracle is not None
    }


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import salesanalytics_etl_spark.plans.queries  # noqa: F401
    import salesanalytics_etl_spark.plans.extensions  # noqa: F401
