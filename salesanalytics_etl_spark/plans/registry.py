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


# Round-11 rotation (driver records the FIRST 50 entries). The list is
# COUNTED from CORRECTNESS_r*.json latest-record rounds, not from memory
# (the r10 roll note undercounted its own list — 21 r7-era rows, not 20,
# and said "six new" where fourteen were listed; this comment is the
# stamp bookkeeping future rounds rely on, so: 2+21+7+16+4 = 50).
# Priority order:
# (0) q154/q155 — registered late in r10, ZERO driver records;
# (1) the 21 r7-era rows (code unchanged; record hygiene);
# (2) queries whose code changed this round and must re-stamp:
#     q149 (per-value entropy term moved to the floor formula — values
#     on 7th-decimal midpoints change), q109/q116 (the shared banded
#     signature subtree is now memoized/checkpointed and the verify
#     shingle-sets persisted — values MUST be identical, re-stamp
#     proves it on current code), q112/q113/q122 (the portable IVF
#     assignment got the same materialize-once memo) and q27 (the
#     exact top-k ground truth got it too, shared with both recall
#     audits q121/q122 — q121 is already in section (1));
# (3) the 16 queries NEW this round (q156-q171: Theil-Sen, autocorr,
#     Zipf, soft-FD, chi-square digits, cross-source dup matrix,
#     centroid distances, trigram TTR, price elasticity, purchase
#     hazard, cluster-size histogram, orphan trend, k-anonymity,
#     packing utilization, source-pair Jaccard, per-source length
#     deciles) — never recorded, and never-recorded outranks stale;
# (4) the stalest r8-era rows in query order (q01-q04); the remaining
#     r8-era rows (q05-q13, q22, q26, q47, q52, q65, q66, q70, q71,
#     q75, q81, q86, q90, q106, q118, q126, q127, q128, q130, q132,
#     q133) roll to r12.
# Every name here is also swept by tests/test_queries.py +
# tests/strict_gate.py against the same oracles, so reordering changes
# what the driver RECORDS, never what is verified.
_CHECK_FIRST = [
    # --- (0) registered r10, never recorded ---
    "q154_time_to_conversion",
    "q155_new_vs_returning",
    # --- (1) r7-era rows (all 21 — incl. q50, missed by r10's note) ---
    "q50_curation_sample",
    "q64_approx_distinct_sketch",
    "q67_pii_redaction",
    "q73_embedding_quantization",
    "q74_source_overlap",
    "q82_approx_percentile_sketch",
    "q85_compression_quality",
    "q87_stratified_cap_sample",
    "q88_lang_metadata_agreement",
    "q89_embedding_cluster_stats",
    "q91_cohort_retention",
    "q92_part_cooccurrence",
    "q95_sentence_split_udtf",
    "q96_event_transition_matrix",
    "q97_daily_sales_anomalies",
    "q100_etl_dataflow",
    "q107_hopping_window",
    "q108_identifier_linkage",
    "q121_ann_recall_audit",
    "q123_typo_linkage_degree",
    "q124_join_key_skew",
    # --- (2) code changed this round ---
    "q149_categorical_entropy",
    "q109_minhash_lsh_replay",
    "q116_lsh_bucket_audit",
    "q112_ivf_replay",
    "q113_cell_stats_replay",
    "q122_ivf_recall_audit",
    "q27_ann_cosine_topk",
    # --- (3) new this round, never recorded ---
    "q156_theil_sen_trend",
    "q157_sales_autocorrelation",
    "q158_zipf_slope",
    "q159_soft_fd_audit",
    "q160_digit_uniformity_chi2",
    "q161_cross_source_dup_matrix",
    "q162_centroid_distance_matrix",
    "q163_trigram_diversity",
    "q164_price_elasticity",
    "q165_purchase_hazard",
    "q166_cluster_size_histogram",
    "q167_orphan_rate_trend",
    "q168_k_anonymity_audit",
    "q169_packing_utilization",
    "q170_source_shingle_jaccard",
    "q171_source_length_deciles",
    # --- (4) stalest r8-era rows, query order ---
    "q01_table_counts",
    "q02_orders_sample_topk",
    "q03_sales_by_day",
    "q04_sales_by_month",
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
    import salesanalytics_etl_spark.plans.analytics  # noqa: F401
