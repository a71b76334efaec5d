"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point — these must survive 100 TB):

- **Exact**: hash-groupBy on a fingerprint — one shuffle on a short hex key,
  map-side partial aggregation, no data skew (md5 is uniform).
- **MinHash+LSH**: signatures via explode(shingles) → groupBy(doc) with 32
  ``min`` aggregates — each shingle hashed once, partials combined map-side.
  Candidates come from an equi-join on (band_id, band_hash): only docs
  sharing a band bucket ever meet, never an O(n²) cross join. Degenerate
  buckets (boilerplate clusters — every member pair would be a candidate)
  are CAPPED at ``max_bucket_size`` members, industry practice for web-scale
  dedup where a few giant clusters would otherwise dominate the pair count.
  Verification (exact Jaccard on shingle sets) touches only candidate pairs.
- **SimHash**: 63-bit signature via bit-vote aggregation over token hashes
  (explode → 63 conditional sums), near-dup candidates via banding the bits
  into 16-bit chunks (Hamming ≤ 3 ⇒ ≥1 of 4 chunks equal — pigeonhole),
  same bucket cap.
- **n-gram Jaccard**: the exact verifier used by both LSH paths.

Everything below is built-in Spark SQL expressions (sequence/transform/
xxhash64/array_*), zero UDFs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from salesanalytics_etl_spark.operators.text import normalize_text

SHINGLE_K = 5  # character shingles
N_HASHES = 32  # minhash signature length
N_BANDS = 8  # LSH bands (4 rows/band)
ROWS_PER_BAND = N_HASHES // N_BANDS
MAX_BUCKET = 64  # cap on members of one LSH bucket (degenerate-cluster guard)


def exact_dedupe(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedupe by normalized-text fingerprint: keep min doc_id per group.

    Returns (fingerprint, keep_id, dup_count). One shuffle on the md5 key.
    """
    fp = F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    return (
        df.select(fp, "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("dup_count"))
    )


def shingle_rows(df: DataFrame, text_col: str = "text", k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, sh) rows: k-char shingles of the normalized text, WITH
    duplicates (min-aggregation downstream is duplicate-insensitive).

    Deliberately explode(sequence)+substr — flat codegen'd operators —
    rather than a ``transform`` lambda: higher-order functions are
    interpreted per element (and would re-evaluate the normalize regex per
    shingle), an order-of-magnitude difference at scale. The norm column is
    materialized in its own projection so the regex runs once per doc.
    """
    normed = df.select("doc_id", normalize_text(F.col(text_col)).alias("norm"))
    return normed.select(
        "doc_id",
        "norm",
        F.explode(
            F.sequence(F.lit(1), F.greatest(F.length("norm") - (k - 1), F.lit(1)))
        ).alias("i"),
    ).select("doc_id", F.expr(f"substr(norm, i, {k})").alias("sh"))


def shingle_sets(sh_rows: DataFrame) -> DataFrame:
    """(doc_id, shingles set) for exact-Jaccard verification."""
    return sh_rows.groupBy("doc_id").agg(F.collect_set("sh").alias("shingles"))


def minhash_signatures(sh_rows: DataFrame) -> DataFrame:
    """Per-doc MinHash signature as N_HASHES columns ``mh0..mh31``.

    One ``min(xxhash64(salt_i, shingle))`` aggregate per hash function:
    each shingle is hashed exactly N_HASHES times total, partial mins
    combine map-side, and the only shuffle is on doc_id.
    """
    aggs = [
        F.min(F.xxhash64(F.lit(f"mh{i}"), F.col("sh"))).alias(f"mh{i}")
        for i in range(N_HASHES)
    ]
    return sh_rows.groupBy("doc_id").agg(*aggs)


def lsh_candidates(sigs: DataFrame, max_bucket: int = MAX_BUCKET) -> DataFrame:
    """LSH banding: docs agreeing on any band become candidate pairs
    (doc_a < doc_b).

    Buckets larger than ``max_bucket`` are dropped before pairing — a
    degenerate bucket of m docs contributes m(m-1)/2 pairs, so one
    boilerplate cluster of 10⁵ docs would otherwise emit 5·10⁹ candidates.
    Exact duplicates of such clusters are still caught by exact_dedupe;
    LSH targets the *near*-dup tail, where buckets are small by nature.
    """
    band_hashes = [
        F.xxhash64(
            *[F.col(f"mh{i}") for i in range(b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND)]
        )
        for b in range(N_BANDS)
    ]
    banded = sigs.select(
        "doc_id", F.posexplode(F.array(*band_hashes)).alias("band_id", "band_hash")
    )
    w = Window.partitionBy("band_id", "band_hash")
    banded = banded.withColumn("_bs", F.count(F.lit(1)).over(w)).filter(
        F.col("_bs") <= max_bucket
    )
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_id") == F.col("r.band_id"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_verify(
    candidates: DataFrame, sh_sets: DataFrame, threshold: float
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only.

    Joins the shingle arrays back (two hash joins on doc_id), then
    |A∩B| / |A∪B| via array_intersect/array_union — still no Python.
    """
    a = sh_sets.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sh_sets.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
    jac = F.size(F.array_intersect("sh_a", "sh_b")) / F.size(
        F.array_union("sh_a", "sh_b")
    )
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_near_dupes(
    df: DataFrame,
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """End-to-end MinHash+LSH near-duplicate pairs with exact verification.

    Shingle sets are only materialized for docs that actually appear in a
    candidate pair (semi-join): at scale candidates ≪ corpus, so the
    collect_set shuffle is proportional to the near-dup tail, not the data.
    """
    rows = shingle_rows(df, text_col)
    sigs = minhash_signatures(rows)
    # candidates are consumed twice (pair list + verify semi-join); they are
    # tiny relative to the corpus, so cache them instead of recomputing the
    # signature+banding pipeline per consumer
    cands = lsh_candidates(sigs, max_bucket).persist()
    docs_in_pairs = (
        cands.select(F.col("doc_a").alias("doc_id"))
        .unionByName(cands.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sets = shingle_sets(rows.join(docs_in_pairs, "doc_id", "left_semi"))
    return jaccard_verify(cands, sets, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

N_SIM_BITS = 63  # bits 0..62: keeping the sign bit clear avoids signed-
# long overflow juggling and loses almost nothing for the sketch


def simhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """63-bit SimHash per doc from distinct-token hashes.

    explode tokens → one xxhash64 per token → groupBy(doc) with 63
    conditional-sum "bit votes" (map-side combinable) → fold votes into a
    single long. One shuffle on doc_id, each token hashed once.
    """
    toks = F.array_distinct(F.split(normalize_text(F.col(text_col)), r"\s+"))
    exploded = df.select("doc_id", F.explode(toks).alias("tok")).select(
        "doc_id", F.xxhash64("tok").alias("h")
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            )
        ).alias(f"v{b}")
        for b in range(N_SIM_BITS)
    ]
    voted = exploded.groupBy("doc_id").agg(*votes)
    sig = reduce(
        lambda acc, b: acc
        + F.when(F.col(f"v{b}") > 0, F.lit(2 ** b).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
        range(1, N_SIM_BITS),
        F.when(F.col("v0") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )
    return voted.select("doc_id", sig.alias("simhash"))


def simhash_near_dupes(
    df: DataFrame,
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Candidate generation by banding the 64 bits into 4×16-bit chunks
    (pigeonhole: Hamming ≤ 3 ⇒ ≥1 chunk identical) — an equi-join, not a
    cross join; degenerate chunk buckets capped like the MinHash path;
    exact Hamming check on candidates via bit_count(xor).
    """
    sigs = simhash_signatures(df, text_col)
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF))
                    for c in range(4)
                ]
            )
        ).alias("chunk_id", "chunk_val"),
    )
    w = Window.partitionBy("chunk_id", "chunk_val")
    chunks = chunks.withColumn("_bs", F.count(F.lit(1)).over(w)).filter(
        F.col("_bs") <= max_bucket
    )
    l, r = chunks.alias("l"), chunks.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.chunk_id") == F.col("r.chunk_id"))
            & (F.col("l.chunk_val") == F.col("r.chunk_val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("doc_a"),
            F.col("r.doc_id").alias("doc_b"),
            F.col("l.simhash").alias("sh_a"),
            F.col("r.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cands.select("doc_a", "doc_b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
