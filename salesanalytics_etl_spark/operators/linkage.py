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
positives. Generalizes to distance k by deleting up to k chars (variant
count ~ len^k — the known cost curve; k=1 is the identifier-typo case).

Shuffle inventory: one explode (len+1 ×, compact rows), one equi-join on
a 64-bit variant hash (collisions only ADD candidates — the verifier is
exact), one distinct on the candidate pair. No cross product anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from salesanalytics_etl_spark.operators.dedup import spread_partitions


def deletion_variants(df: DataFrame, col: str) -> DataFrame:
    """(name, vh) rows: xxhash64 of each deletion-neighborhood member.

    Variant 0 is the string itself; variant i (1-based) removes char i.
    Hashing shrinks the join key to 8 bytes — the exact verify after the
    join makes hash collisions harmless.
    """
    variants = F.expr(
        "transform(sequence(0, length(name)), i -> "
        "if(i = 0, name, "
        "concat(substring(name, 1, i - 1), substring(name, i + 1))))"
    )
    return (
        spread_partitions(df.select(F.col(col).alias("name")), by="name")
        .select("name", F.explode(variants).alias("_v"))
        .select("name", F.xxhash64("_v").alias("vh"))
    )


def edit_distance_join(
    df: DataFrame, col: str, max_dist: int = 1
) -> DataFrame:
    """All DISTINCT-value pairs of ``col`` within ``max_dist`` edits
    (recall 1.0). Only ``max_dist=1`` is implemented — the deletion
    neighborhood of depth 1; see module docstring for the k>1 shape.

    Returns (name_a, name_b) with name_a < name_b.
    """
    if max_dist != 1:
        raise NotImplementedError(
            "deletion-neighborhood depth 1 only (identifier-typo linkage);"
            " depth-k variants generalize with len^k expansion"
        )
    names = df.select(F.col(col)).distinct()
    v = deletion_variants(names, col)
    a = v.select(F.col("name").alias("name_a"), "vh")
    b = v.select(F.col("name").alias("name_b"), "vh")
    # verify BEFORE distinct: levenshtein is a codegen'd filter on the
    # joined stream, so the distinct's shuffle carries only true-pair
    # multiplicity instead of every variant-sharing candidate (lev-2
    # coincidences, hash collisions). Wall-time-neutral at sf0.1 (the
    # local join is small either way); at 100 TB the distinct IS a
    # shuffle and its input size is the cost.
    return (
        a.join(b, "vh")
        .filter(
            (F.col("name_a") < F.col("name_b"))
            & (F.levenshtein("name_a", "name_b") <= max_dist)
        )
        .select("name_a", "name_b")
        .distinct()
    )
