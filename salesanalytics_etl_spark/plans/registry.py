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


# Round-9 rotation (driver records the FIRST 50 entries), priority order:
# (0) the six queries NEW this round (partition-pruned CDC diff, event
# transition matrix, retention cohorts, equi-depth histogram, Benford
# digit audit, winsorized robust stats) — never recorded; (1) the queries whose code or oracle
# CHANGED this round and must re-stamp on current code: q37/q68
# (re-pointed onto the distributed exact-percentile path, oracles
# re-spelled as rank CTEs — the r8 verdict's item 1), q129 (grouped
# rank lost its forced offsets broadcast), q125 (snapshot_diff emit
# path refactored for locator columns), q93 (ntile_multi slot typing
# extended), q131 (profiler input validation); (2) ALL 13 r5-era
# driver rows — the r8 verdict's item 3 CORRECT list (q14, q17, q18,
# q38-q43, q51, q53, q94, q101; ROUND8.md had undercounted 7); (3) the
# stalest r6-era rows in query order. 25 of the 32 remaining r6 rows
# fit; the six r6-era portable replays (q109/q110/q111/q114/q115/q116)
# and q84 roll to r10, after which nothing older than r6 remains and
# only those seven r6 rows are left anywhere. Every name here is also swept by
# tests/test_queries.py + tests/strict_gate.py against the same oracles,
# so reordering changes what the driver RECORDS, never what is verified.
_CHECK_FIRST = [
    # --- (0) new this round, never recorded ---
    "q134_pruned_snapshot_diff",
    "q135_event_transitions",
    "q136_retention_cohorts",
    "q137_order_value_histogram",
    "q138_benford_digit_audit",
    "q139_winsorized_order_stats",
    # --- (1) code/oracle changed this round ---
    "q37_order_value_percentiles",
    "q68_segment_percentiles",
    "q129_segment_percentiles_distributed",
    "q125_snapshot_diff",
    "q93_customer_rfm",
    "q131_orders_profile",
    # --- (2) the 13 r5-era driver rows (r8 verdict item 3) ---
    "q14_sales_daterange",
    "q17_view_sales_by_day_sql",
    "q18_running_daily_sales",
    "q38_repeat_customers_intersect",
    "q39_events_json_props",
    "q40_churned_customers_except",
    "q41_part_name_search",
    "q42_purchases_with_prior_views",
    "q43_purchase_asof_signup",
    "q51_train_val_test_split",
    "q53_customer_sample_topk",
    "q94_scd2_customers",
    "q101_heavy_hitter_shingles",
    # --- (3) r6-era rows, query order (q109-q116 replays roll to r10) ---
    "q20_docs_fingerprint",
    "q21_docs_exact_dedupe",
    "q24_docs_langid",
    "q27_ann_cosine_topk",
    "q28_ann_cosine_lsh",
    "q29_events_hourly",
    "q30_events_sessionize",
    "q32_embedding_neardup",
    "q33_token_frequencies",
    "q54_part_sample_topk",
    "q55_lineitem_sample_topk",
    "q56_conformance_coercion",
    "q57_ngram_jaccard_pairs",
    "q58_mom_sales_growth",
    "q59_salted_event_rollup",
    "q60_winnowing_fingerprints",
    "q61_small_quantity_revenue",
    "q62_check_violations",
    "q63_sales_cube",
    "q76_incremental_dedupe",
    "q77_label_centroids",
    "q78_regional_supplier_revenue",
    "q79_rolling_7day_sales",
    "q80_event_funnel",
    "q83_sentence_dedup_stats",
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
