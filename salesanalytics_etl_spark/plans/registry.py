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


# Round-16 rotation, RECOMPOSED by the optimization round (driver
# records the FIRST 50 entries; the r13 rule: any query whose operator
# code changes goes back into the window so its driver row re-stamps on
# current code). Self-counting arithmetic (the r10/r13 failure mode was
# headers contradicting the list): 6 new + 28 code-changed re-stamps +
# 16 roll-debt = 50. Priority order:
# (0) the 6 queries NEW in the r16 build, ZERO driver records:
#     q202-q207 (winnow near-dup pipeline + its recall/slack/cluster/
#     recovery/index-health audits — see the r16 build notes in
#     ROUND16.md). q204/q206/q207 ALSO changed in the optimization
#     round (slack conditional-agg rewrite; recovery-branch
#     checkpoints; bucket-frame checkpoint).
# (1) 28 code-changed re-stamps — every query whose operator code the
#     r16 OPTIMIZATION round touched (OPTIMIZATION_r16.md has the
#     per-query log; results verified identical by strict_compare at
#     sf0.01 after each change):
#     - editnoise audits (redundant-distinct removal + SQL-string
#       aggregates): q186, q187, q189, q193, q194, q195, q197, q198,
#       q199;
#     - simhash (SQL-string votes/fold + recovery-branch chunk
#       checkpoint): q26, q201;
#     - MinHash/LSH family (SQL-string signatures/band keys/agreement
#       sums): q109, q116, q170, q172, q176, q183, q196, q178;
#     - bloom audits (fused probe pass / persisted gram frames): q114,
#       q192, q200;
#     - boilerplate family (window-count doc frequency): q177, q181,
#       q182;
#     - lang_id spread: q24, q88;
#     - q60 (r16 build: factored winnow_fingerprints — stamp retained).
# (2) 16 roll-debt rows, oldest records first: r11-era q166, q167,
#     q168, q169, q171, q50, q64, q67, q73, q74, q82, q85, q87, q89,
#     q91, q92 (q88 is already in (1)). The 3 remaining r11-era rows
#     (q95, q96, q97) and the r12-era tail roll to r17 — the
#     optimization round's re-stamp obligation outranks finishing the
#     freshness program in one window.
# Every name here is also swept by tests/test_queries.py +
# tests/strict_gate.py against the same oracles, so reordering changes
# what the driver RECORDS, never what is verified.
_CHECK_FIRST = [
    # --- (0) new this round, never recorded ---
    "q202_winnow_neardup",
    "q203_winnow_recall_audit",
    "q204_winnow_slack_curve",
    "q205_winnow_cluster_histogram",
    "q206_winnow_recovery_gate",
    "q207_winnow_index_health",
    # --- (1) 28 code-changed re-stamps (optimization round) ---
    "q186_editnoise_lsh_recall",
    "q187_editnoise_simhash",
    "q189_editnoise_winnow_fidelity",
    "q193_editnoise_mixed_lsh",
    "q194_editnoise_mixed_simhash",
    "q195_editnoise_mixed_winnow",
    "q197_editnoise_reorder_lsh",
    "q198_editnoise_reorder_simhash",
    "q199_editnoise_reorder_winnow",
    "q26_simhash_neardup",
    "q201_simhash_recovery_gate",
    "q109_minhash_lsh_replay",
    "q116_lsh_bucket_audit",
    "q170_source_shingle_jaccard",
    "q172_source_minhash_jaccard",
    "q176_source_jaccard_sketch_error",
    "q183_sampled_neardup_replay",
    "q196_sampled_neardup_recovery",
    "q178_split_neardup_leakage",
    "q114_bloom_membership_audit",
    "q192_bloom_decontamination_audit",
    "q200_bloom_sized_audit",
    "q177_boilerplate_fraction",
    "q181_boilerplate_sampled",
    "q182_boilerplate_sample_error",
    "q24_docs_langid",
    "q88_lang_metadata_agreement",
    "q60_winnowing_fingerprints",
    # --- (2) 16 roll-debt rows, oldest first (arithmetic above) ---
    "q166_cluster_size_histogram",
    "q167_orphan_rate_trend",
    "q168_k_anonymity_audit",
    "q169_packing_utilization",
    "q171_source_length_deciles",
    "q50_curation_sample",
    "q64_approx_distinct_sketch",
    "q67_pii_redaction",
    "q73_embedding_quantization",
    "q74_source_overlap",
    "q82_approx_percentile_sketch",
    "q85_compression_quality",
    "q87_stratified_cap_sample",
    "q89_embedding_cluster_stats",
    "q91_cohort_retention",
    "q92_part_cooccurrence",
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
        "q196_sampled_neardup_recovery",
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
