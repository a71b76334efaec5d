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


# Round-10 rotation (driver records the FIRST 50 entries), priority order:
# (0) the six queries NEW this round (segment regression/correlation,
# 30-day EWMA, Pareto/ABC via the distributed prefix sum, weekday
# seasonality index, inter-purchase gap histogram, exact sliding-window
# distinct users) — never recorded; (1) the queries whose operator code
# CHANGED this round and must re-stamp on current code: q134 (diff.py
# grew null-disambiguated partition fingerprints + both-side partition-
# column validation — the r9 ADVICE items), q93 (ranking.py's ntile
# slot typing gained the negative-scale decimal guard); (2) the last
# seven r6-era rows (q109/q110/q111/q114/q115/q116/q84 — ROUND9.md's
# handoff list; after r10 lands nothing older than r7 remains);
# (3) the stalest r7-era rows in query order — 13 fit after the
# floor-formula re-stamps claimed their slots; q50/q64/q67/q73/q74/q82/
# q85/q87/q88/q89/q91/q92/q95/q96/q97/q100/q107/q108/q121/q123/q124
# roll to r11 (r7-era, code UNCHANGED — their recorded rows stay valid).
# Every name here is also swept by tests/test_queries.py +
# tests/strict_gate.py against the same oracles, so reordering changes
# what the driver RECORDS, never what is verified.
_CHECK_FIRST = [
    # --- (0) new this round, never recorded ---
    "q140_segment_regression",
    "q141_sales_ewma",
    "q142_pareto_parts",
    "q143_weekday_seasonality",
    "q144_purchase_gap_histogram",
    "q145_active_users_sliding",
    "q146_weighted_price_percentiles",
    "q147_customer_gini",
    "q148_sales_cusum",
    "q149_categorical_entropy",
    "q150_truncation_audit",
    "q151_supplier_hhi",
    "q152_decile_lift",
    "q153_seasonal_backtest",
    # --- (1) code changed this round ---
    "q134_pruned_snapshot_diff",
    "q93_customer_rfm",
    # surprisal/KL emits moved to the floor formula (q104 was RED at
    # the r10 sf0.1 sweep — 4dp midpoints; q119/q120 carried the same
    # latent class); values on 4dp midpoints change, so all three must
    # re-stamp on the current code
    "q104_unigram_surprisal",
    "q119_bigram_surprisal",
    "q120_source_kl_divergence",
    # ... and the rest of the engine-native-ROUND class (small-integer
    # quotients: jaccard, quality/repetition ratios, rates, shares)
    # moved to the same floor formula — values on midpoints change, so
    # every oracle-backed consumer re-stamps (q49/q109 already above/
    # below in this window)
    "q23_docs_quality",
    "q57_ngram_jaccard_pairs",
    "q69_repetition_filter",
    "q72_language_rebalance",
    "q77_label_centroids",
    "q98_supplier_type_share",
    "q99_priority_sla",
    "q102_exact_jaccard_join",
    "q103_duplicate_spans",
    "q105_cluster_representatives",
    "q117_quality_threshold_calibration",
    # --- (2) the last seven r6-era rows (ROUND9.md handoff) ---
    "q109_minhash_lsh_replay",
    "q110_hll_distinct_replay",
    "q111_hdr_percentile_replay",
    "q114_bloom_membership_audit",
    "q115_compressibility_replay",
    "q116_lsh_bucket_audit",
    "q84_split_leakage_check",
    # --- (3) r7-era rows, query order (q124 rolls to r11) ---
    "q15_dedupe_keep_last",
    "q16_fk_violations",
    "q19_top_parts_per_type",
    "q25_minhash_neardup",
    "q31_media_features",
    "q34_ann_cosine_ivf",
    "q35_sales_rollup",
    "q36_status_pivot",
    "q44_docs_rolling_fingerprint",
    "q45_media_resize",
    "q46_media_frame_sample",
    "q48_pricing_summary",
    "q49_dedup_clusters",
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
