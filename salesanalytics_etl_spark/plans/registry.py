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


# Round-12 rotation (driver records the FIRST 50 entries). The list is
# COUNTED from CORRECTNESS_r*.json latest-record rounds, not from memory
# (the r10 roll note undercounted its own list; r11 made the arithmetic
# self-counting — this comment is the stamp bookkeeping future rounds
# rely on, so: 9+5+29+7 = 50). Priority order:
# (0) the 9 queries NEW this round, ZERO driver records (never-
#     recorded outranks stale): q172 source-pair MinHash sketch twin,
#     q173 dup-cluster source span, q174 source length PSI, q175 event
#     co-occurrence lift, q176 sketch-vs-exact error audit, q177
#     boilerplate fraction, q178 near-dup split leakage, q179
#     lang-source mutual information, q180 dedup yield curve;
# (1) queries whose code changed this round and must re-stamp: q112/
#     q113/q122 (the portable-IVF cold path now derives its anchor
#     sample through the memoized _portable_anchors_cached — one scan
#     instead of two; values MUST be identical since the md5-smallest
#     sample is deterministic, the re-stamp proves it on current code);
#     q109 (its verified-pair frame is now memoized, shared with q178)
#     and q170 (its exact matrix moved into the memoized
#     source_shingle_jaccard_cached operator, shared with q176) — both
#     pure-perf, value-identical, re-stamp proves it;
# (2) the 29 r8-era rows in query order — the ENTIRE remaining r8 debt,
#     including the reference-core q05-q13 (r11 verdict item 1: the
#     reference's own queries.sql surface must not carry the stalest
#     records);
# (3) 7 slots left, filled with the stalest r9-era rows in query
#     order (q14-q28); the remaining 38 r9-era rows (q29, q30, q32,
#     q33, q37-q43, q51, q53-q56, q58-q63, q68, q76, q78-q80, q83,
#     q94, q101, q125, q129, q131, q135-q139) roll to r13 — after this
#     window closes, NO query's latest driver record is older than r9.
# Every name here is also swept by tests/test_queries.py +
# tests/strict_gate.py against the same oracles, so reordering changes
# what the driver RECORDS, never what is verified.
_CHECK_FIRST = [
    # --- (0) new this round, never recorded ---
    "q172_source_minhash_jaccard",
    "q173_dup_cluster_source_span",
    "q174_source_length_psi",
    "q175_event_cooccurrence_lift",
    "q176_source_jaccard_sketch_error",
    "q177_boilerplate_fraction",
    "q178_split_neardup_leakage",
    "q179_lang_source_mutual_info",
    "q180_dedup_yield_curve",
    # --- (1) code changed this round (anchor-collect memo; pair/matrix
    #     memos shared with the q176/q178 compositions) ---
    "q112_ivf_replay",
    "q113_cell_stats_replay",
    "q122_ivf_recall_audit",
    "q109_minhash_lsh_replay",
    "q170_source_shingle_jaccard",
    # --- (2) all 29 r8-era rows, query order ---
    "q05_top_products",
    "q06_top_customers",
    "q07_status_histogram",
    "q08_avg_order_value",
    "q09_parts_no_sales",
    "q10_customers_no_orders",
    "q11_last_order_details",
    "q12_order_totals",
    "q13_order_reconciliation",
    "q22_docs_token_stats",
    "q26_simhash_neardup",
    "q47_docs_chunking",
    "q52_merge_upsert",
    "q65_tfidf_top_terms",
    "q66_inverted_index",
    "q70_benchmark_decontamination",
    "q71_sequence_packing",
    "q75_curation_pipeline",
    "q81_bigram_merge_candidates",
    "q86_bm25_search",
    "q90_weighted_priority_sample",
    "q106_token_budget_mixture",
    "q118_fuzzy_decontamination",
    "q126_sales_gap_fill",
    "q127_peak_window_traffic",
    "q128_distributed_percentiles",
    "q130_robust_order_outliers",
    "q132_nation_revenue_interpolated",
    "q133_fk_integrity_sweep",
    # --- (3) the 11 stalest r9-era rows, query order ---
    "q14_sales_daterange",
    "q17_view_sales_by_day_sql",
    "q18_running_daily_sales",
    "q20_docs_fingerprint",
    "q21_docs_exact_dedupe",
    "q24_docs_langid",
    "q28_ann_cosine_lsh",
]


# Queries whose bench FLOOR is a materialize-once memo HIT, not a cold
# cost (the warm number is a fair account of a whole-surface session —
# the memo IS the plan — but a cold-path regression in their shared
# subtree shows only in the SWEEP column, where the first toucher pays
# the build). tools/floor_diff.py reads this to compare those queries on
# the sweep column and annotate them; keep in sync with the memoized
# operators (dedup._BANDED_MEMO/_PAIRS_MEMO/_SRC_*_MEMO,
# ivf._ASSIGNMENT_MEMO/_ANCHORS_MEMO, similarity._BRUTEFORCE_MEMO).
MEMO_BACKED = frozenset(
    {
        "q25_minhash_neardup",
        "q27_ann_cosine_topk",
        "q28_ann_cosine_lsh",
        "q34_ann_cosine_ivf",
        "q109_minhash_lsh_replay",
        "q112_ivf_replay",
        "q113_cell_stats_replay",
        "q116_lsh_bucket_audit",
        "q121_ann_recall_audit",
        "q122_ivf_recall_audit",
        "q170_source_shingle_jaccard",
        "q172_source_minhash_jaccard",
        "q176_source_jaccard_sketch_error",
        "q178_split_neardup_leakage",
    }
)


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
