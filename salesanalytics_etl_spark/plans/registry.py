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


# Round-6 rotation (driver records the FIRST 50 entries): leads with the
# 14 queries whose latest driver rows are r03-era (q20-q24, q26-q28,
# q54-q56, q61-q63 — code under several changed since: by-name CSV
# conformance under q56, FIFO cache eviction, portable rounding; q26/q28
# were CONVERTED to oracle-backed this round and must record their first
# hash-checked rows), then the r04-era rows stalest-first. Deferred to r7:
# the five no_oracle sketch/ANN rows (q34/q64/q82/q85/q89 — a rows-only
# driver row re-stamp is low-value; their planted/property unit tests run
# every session) and q90-q93, q95-q99 (static paths untouched since
# r4). Every name here is also swept locally by tests/test_queries.py +
# tests/strict_gate.py against the same oracles, so reordering changes
# what the driver RECORDS, never what is verified.
_CHECK_FIRST = [
    # --- r03-era rows: stalest first ---
    "q20_docs_fingerprint",
    "q21_docs_exact_dedupe",
    "q22_docs_token_stats",
    "q23_docs_quality",
    "q24_docs_langid",
    "q26_simhash_neardup",
    "q27_ann_cosine_topk",
    "q28_ann_cosine_lsh",
    "q54_part_sample_topk",
    "q55_lineitem_sample_topk",
    "q56_conformance_coercion",
    "q61_small_quantity_revenue",
    "q62_check_violations",
    "q63_sales_cube",
    # --- NEW this round (never recorded) ---
    "q109_minhash_lsh_replay",
    "q110_hll_distinct_replay",
    "q111_hdr_percentile_replay",
    "q112_ivf_replay",
    "q113_cell_stats_replay",
    "q114_bloom_membership_audit",
    "q115_compressibility_replay",
    "q116_lsh_bucket_audit",
    "q117_quality_threshold_calibration",
    "q118_fuzzy_decontamination",
    # --- r04-era oracle-backed rows ---
    "q29_events_hourly",
    "q30_events_sessionize",
    "q32_embedding_neardup",
    "q33_token_frequencies",
    "q57_ngram_jaccard_pairs",
    "q58_mom_sales_growth",
    "q59_salted_event_rollup",
    "q60_winnowing_fingerprints",
    "q65_tfidf_top_terms",
    "q67_pii_redaction",
    "q68_segment_percentiles",
    "q69_repetition_filter",
    "q70_benchmark_decontamination",
    "q71_sequence_packing",
    "q72_language_rebalance",
    "q73_embedding_quantization",
    "q74_source_overlap",
    "q75_curation_pipeline",
    "q76_incremental_dedupe",
    "q77_label_centroids",
    "q78_regional_supplier_revenue",
    "q79_rolling_7day_sales",
    "q80_event_funnel",
    "q81_bigram_merge_candidates",
    "q83_sentence_dedup_stats",
    "q84_split_leakage_check",
    "q86_bm25_search",
    "q87_stratified_cap_sample",
    "q88_lang_metadata_agreement",
    "q100_etl_dataflow",
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
