"""Record linkage / entity resolution: exact edit-distance-1 similarity
join via the deletion neighborhood (the SymSpell blocking scheme).

The naive form of "find every pair of identifiers within one typo" is an
all-pairs Levenshtein — O(n²) comparisons, a cross join at 100 TB. Prefix
or first-character blocking collapses on real identifier spaces: every
customer name here shares the literal prefix ``Customer#``, so a
first-half block puts the WHOLE table into one block (measured — that
scheme was rejected for this operator).

The deletion neighborhood is the public SymSpell/FastSS result: for
strings a, b with ``levenshtein(a,b) <= 1``, the set
``D(s) = {s} ∪ {s with one char removed}`` satisfies D(a) ∩ D(b) ≠ ∅ —
 * equal-length single substitution at position p: both delete p,
 * one insertion/deletion: the longer's deletion equals the shorter.
So an EQUI-join on deletion variants proposes every qualifying pair
(recall 1), each string expands into only ``len+1`` variants, and block
sizes are bounded by true near-neighbor density, not by shared prefixes.
The exact ``levenshtein`` verify then removes hash/variant false
positives. The same result generalizes: for ``levenshtein(a,b) <= k``
the depth-k neighborhoods (delete UP TO k chars) intersect — each of
the <= k edits costs at most one deletion per side — so depth 2 covers
distance-2 linkage at ~len²/2 variants per string (the known SymSpell
cost curve; implemented for k <= 2, with a loud length guard on the
quadratic expansion).

Shuffle inventory: one explode (len+1 ×, compact rows), one equi-join on
a 64-bit variant hash (collisions only ADD candidates — the verifier is
exact), one distinct on the candidate pair. No cross product anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from salesanalytics_etl_spark.operators.dedup import spread_partitions


def deletion_variants(df: DataFrame, col: str, depth: int = 1) -> DataFrame:
    """(name, vh) rows: xxhash64 of each deletion-neighborhood member at
    the given ``depth`` (delete UP TO ``depth`` chars; the string itself
    is always included as the zero-deletion member).

    Depth 1: variant 0 is the string, variant i (1-based) removes char
    i. Depth 2 chains a second up-to-one deletion over the depth-1
    stream (two explodes, each guarded by the j=0 keep-sentinel so empty
    and length-1 strings stay valid) and DISTINCTs the (name, hash)
    rows — without it the same variant reached via two deletion orders
    would double every candidate. Hashing shrinks the join key to 8
    bytes; the exact verify after the join makes collisions harmless.
    """
    if depth not in (1, 2):
        raise NotImplementedError("deletion neighborhood depth 1 or 2 only")
    one_del = (
        "transform(sequence(0, length({s})), i -> "
        "if(i = 0, {s}, "
        "concat(substring({s}, 1, i - 1), substring({s}, i + 1))))"
    )
    base = spread_partitions(df.select(F.col(col).alias("name")), by="name")
    out = base.select(
        "name", F.explode(F.expr(one_del.format(s="name"))).alias("_v")
    )
    if depth == 2:
        out = out.select(
            "name", F.explode(F.expr(one_del.format(s="_v"))).alias("_v")
        )
    out = out.select("name", F.xxhash64("_v").alias("vh"))
    return out.distinct() if depth == 2 else out


def edit_distance_join(
    df: DataFrame, col: str, max_dist: int = 1
) -> DataFrame:
    """All DISTINCT-value pairs of ``col`` within ``max_dist`` edits
    (recall 1.0) via the depth-``max_dist`` deletion neighborhood;
    ``max_dist`` in {1, 2} (see module docstring for the cost curve).

    Returns (name_a, name_b) with name_a < name_b.

    Depth 2 expands each string into ~len²/2 variants, so identifiers
    longer than 64 chars are refused LOUDLY (len² = 4k+ variants per
    row is the silent-quadratic shape every other candidate path here
    budgets against) — normalize or truncate identifiers first, or use
    the MinHash path for long-string similarity.
    """
    if max_dist not in (1, 2):
        raise NotImplementedError(
            "deletion-neighborhood depth 1 or 2 only (identifier-typo "
            "linkage); longer-range similarity belongs to the MinHash path"
        )
    names = df.select(F.col(col)).distinct()
    if max_dist == 2:
        mx = names.agg(F.max(F.length(col)).alias("m")).collect()[0].m or 0
        if mx > 64:
            raise RuntimeError(
                f"edit_distance_join(max_dist=2): longest identifier is "
                f"{mx} chars -> ~{mx * mx // 2} deletion variants per row; "
                "refusing the quadratic expansion. Normalize/truncate the "
                "identifier column, or use MinHash similarity for long "
                "strings."
            )
    # persist: BOTH sides of the self-join consume the variant subtree,
    # and unpersisted each alias re-runs the explode(+distinct at depth
    # 2) — measured ~2× the variant stage at sf0.1. The (bounded) pair
    # result is materialized via localCheckpoint so the cache can be
    # released before returning (the repo's standard double-consumer
    # shape).
    v = deletion_variants(names, col, depth=max_dist).persist()
    v.count()
    a = v.select(F.col("name").alias("name_a"), "vh")
    b = v.select(F.col("name").alias("name_b"), "vh")
    # verify BEFORE distinct: levenshtein is a codegen'd filter on the
    # joined stream, so the distinct's shuffle carries only true-pair
    # multiplicity instead of every variant-sharing candidate (lev-2
    # coincidences, hash collisions). Wall-time-neutral at sf0.1 (the
    # local join is small either way); at 100 TB the distinct IS a
    # shuffle and its input size is the cost.
    out = (
        a.join(b, "vh")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.levenshtein("name_a", "name_b") <= max_dist)
        )
        .select("name_a", "name_b")
        .distinct()
        .localCheckpoint()
    )
    v.unpersist()
    return out
