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


# Round-13 rotation (driver records the FIRST 50 entries). The list is
# COUNTED from CORRECTNESS_r*.json latest-record rounds, not from memory
# (the r10 roll note undercounted its own list; r11 made the arithmetic
# self-counting — this comment is the stamp bookkeeping future rounds
# rely on, so: 12+7+31 = 50). Priority order:
# (0) the 12 queries NEW this round, ZERO driver records (never-
#     recorded outranks stale): q181 hash-sampled boilerplate monitor,
#     q182 its decile-drift audit, q183 sampled MinHash+LSH replay,
#     q184 per-source surprisal drift, q185 CMS frequency audit,
#     q186 edit-noise LSH recall audit, q187 edit-noise SimHash audit,
#     q188 int8 quantization audit, q189 winnowing edit-noise
#     fidelity, q190 int8 top-k recall, q191 cluster-safe split,
#     q192 Bloom decontamination audit (the last seven displaced
#     q129/q131/q135-q139 — the seven stalest-by-query-order r9 rows
#     whose operators are unchanged since r9 — to r14);
# (1) 7 code-changed re-stamps, ONE per code path changed this round
#     (values must be identical; the re-stamp proves it on current
#     code): q52 (merge_upsert_table now auto-invalidates the
#     materialize-once memos after its swap — r12 ADVICE), plus one
#     query per memoized operator that gained record_sources bookkeeping
#     at its set site: q109 (banded+pairs memos), q176 (both source-
#     matrix memos), q170 (exact-matrix memo consumer), q112
#     (anchors+assignment memos), q122 (IVF recall + bruteforce memo),
#     q28 (bruteforce memo via the ANN surface). Late r13 review
#     refactors re-stamp through rows ALREADY in this window: the
#     shared split helper via q51 (section 2) and q191, the q190 norm
#     hoist via q190 itself; q75 (composed pipeline, r12 record) also
#     rides the split helper and rolls to r14 — its values were
#     re-gated green against the oracle after the refactor. The REST
#     of the
#     memo-backed family (q25, q27, q34, q113, q116, q121, q172, q178)
#     shares exactly those code paths, carries r11/r12 records, and
#     rolls to the r14 window so the ENTIRE r9-era debt retires now
#     (r12 verdict item 1 takes the remaining slots);
# (2) 31 of the 38 r9-era rows in query order (q29, q30, q32, q33,
#     q37-q43, q51, q53-q56, q58-q63, q68, q76, q78-q80, q83, q94,
#     q101, q125). q129/q131/q135-q139 roll to r14 (they lost their
#     slots to the never-recorded q186-q192); after the r14 window
#     stamps them, NO record is older than r10.
# Every name here is also swept by tests/test_queries.py +
# tests/strict_gate.py against the same oracles, so reordering changes
# what the driver RECORDS, never what is verified.
_CHECK_FIRST = [
    # --- (0) new this round, never recorded ---
    "q181_boilerplate_sampled",
    "q182_boilerplate_sample_error",
    "q183_sampled_neardup_replay",
    "q184_source_surprisal_drift",
    "q185_cms_user_frequency_audit",
    "q186_editnoise_lsh_recall",
    "q187_editnoise_simhash",
    "q188_int8_quantization_audit",
    "q189_editnoise_winnow_fidelity",
    "q190_int8_topk_recall",
    "q191_cluster_safe_split",
    "q192_bloom_decontamination_audit",
    # --- (1) code-changed re-stamps, one per changed code path ---
    "q52_merge_upsert",
    "q109_minhash_lsh_replay",
    "q176_source_jaccard_sketch_error",
    "q170_source_shingle_jaccard",
    "q112_ivf_replay",
    "q122_ivf_recall_audit",
    "q28_ann_cosine_lsh",
    # --- (2) 31 of the 38 r9-era rows, query order (7 rolled to r14,
    #     see the arithmetic above) ---
    "q29_events_hourly",
    "q30_events_sessionize",
    "q32_embedding_neardup",
    "q33_token_frequencies",
    "q37_order_value_percentiles",
    "q38_repeat_customers_intersect",
    "q39_events_json_props",
    "q40_churned_customers_except",
    "q41_part_name_search",
    "q42_purchases_with_prior_views",
    "q43_purchase_asof_signup",
    "q51_train_val_test_split",
    "q53_customer_sample_topk",
    "q54_part_sample_topk",
    "q55_lineitem_sample_topk",
    "q56_conformance_coercion",
    "q58_mom_sales_growth",
    "q59_salted_event_rollup",
    "q60_winnowing_fingerprints",
    "q61_small_quantity_revenue",
    "q62_check_violations",
    "q63_sales_cube",
    "q68_segment_percentiles",
    "q76_incremental_dedupe",
    "q78_regional_supplier_revenue",
    "q79_rolling_7day_sales",
    "q80_event_funnel",
    "q83_sentence_dedup_stats",
    "q94_scd2_customers",
    "q101_heavy_hitter_shingles",
    "q125_snapshot_diff",
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
        # r13: q183 rides the _PAIRS_MEMO via minhash_near_dupes_portable
        # (on its sampled frame), q188/q190 the _BRUTEFORCE_MEMO via the
        # q27 ground-truth frame
        "q183_sampled_neardup_replay",
        "q188_int8_quantization_audit",
        "q190_int8_topk_recall",
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
