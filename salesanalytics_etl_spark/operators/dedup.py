"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point — these must survive 100 TB):

- **Exact**: hash-groupBy on a fingerprint — one shuffle on a short hex key,
  map-side partial aggregation, no data skew (md5 is uniform).
- **MinHash+LSH**: per-doc signature computation is a pure map (array
  expressions inside codegen — no Python), then candidate generation is an
  equi-join on (band_id, band_hash) — i.e. only docs sharing a band bucket
  ever meet, never an O(n²) cross join. Bucket join keys are uniform hashes
  → no skew. Verification (exact Jaccard on shingle sets) touches only
  candidate pairs.
- **SimHash**: 64-bit signature via bit-vote aggregation over token hashes,
  again all map-side; near-dup candidates via banding the 64 bits into
  16-bit chunks (Hamming ≤ 3 ⇒ at least one of 4 chunks equal — pigeonhole).
- **n-gram Jaccard**: the exact verifier used by both LSH paths.

Everything below is built-in Spark SQL expressions (sequence/transform/
xxhash64/array_*), zero UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from salesanalytics_etl_spark.operators.text import normalize_text

SHINGLE_K = 5  # character shingles
N_HASHES = 32  # minhash signature length
N_BANDS = 8  # LSH bands (4 rows/band)
ROWS_PER_BAND = N_HASHES // N_BANDS


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


def shingles(text_col, k: int = SHINGLE_K):
    """Distinct k-char shingles of the normalized text (array<string>).

    Expressed as sequence+transform so it stays a JVM array expression:
    positions 1..len-k+1, substr(norm, i, k).
    """
    norm = normalize_text(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(norm) - (k - 1), F.lit(1))),
            lambda i: F.substring(norm, i, F.lit(k)),
        )
    )


def minhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc MinHash signature: array of N_HASHES minima of salted xxhash64.

    hash_i(s) = xxhash64(salt_i, s) — Spark's 64-bit xxhash over the salt
    column and shingle; array_min over the shingle set. All map-side.
    """
    sh = shingles(F.col(text_col))
    sig = F.array(
        *[
            F.array_min(
                F.transform(sh, lambda s, i=i: F.xxhash64(F.lit(f"mh{i}"), s))
            )
            for i in range(N_HASHES)
        ]
    )
    return df.select("doc_id", sh.alias("shingles"), sig.alias("signature"))


def lsh_candidates(sigs: DataFrame) -> DataFrame:
    """LSH banding: docs agreeing on any band of the signature become
    candidate pairs (doc_a < doc_b).

    explode bands → equi-join on (band_id, band_hash) via self-join of the
    banded table; distinct pairs. The join is the scale-critical step: it
    shuffles only (doc_id, band_hash) pairs — ~N_BANDS rows per doc — not
    the documents themselves.
    """
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        *[
                            F.col("signature")[i]
                            for i in range(
                                b * ROWS_PER_BAND, (b + 1) * ROWS_PER_BAND
                            )
                        ]
                    )
                    for b in range(N_BANDS)
                ]
            )
        ).alias("band_id", "band_hash"),
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
    candidates: DataFrame, sigs: DataFrame, threshold: float
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs only.

    joins the shingle arrays back (two hash joins on doc_id), then
    |A∩B| / |A∪B| via array_intersect/array_union — still no Python.
    """
    a = sigs.select(F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a"))
    b = sigs.select(F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b"))
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
    df: DataFrame, text_col: str = "text", threshold: float = 0.5
) -> DataFrame:
    """End-to-end MinHash+LSH near-duplicate pairs with exact verification."""
    sigs = minhash_signatures(df, text_col)
    cands = lsh_candidates(sigs)
    return jaccard_verify(cands, sigs, threshold)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash_signatures(df: DataFrame, text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc from token hashes, as a single map expression.

    For each bit b: vote = Σ_tokens (bit_b(xxhash64(token)) ? +1 : −1);
    signature bit b = vote > 0. Folded into a long via aggregate over the
    bit array — stays in codegen, no shuffle.
    """
    toks = F.array_distinct(
        F.split(normalize_text(F.col(text_col)), r"\s+")
    )  # distinct tokens: weight 1 per unique token (deterministic)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_vote(b: int):
        votes = F.transform(
            hashes,
            lambda h: F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(
                -1
            ),
        )
        return F.when(
            F.aggregate(votes, F.lit(0), lambda acc, v: acc + v) > 0,
            F.lit(1).cast("long") * F.lit(2 ** b).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    # bits 0..62 only: keeping the sign bit clear avoids overflow juggling
    # in a signed 64-bit long and loses almost nothing for 63-bit sketches.
    sig = bit_vote(0)
    for b in range(1, 63):
        sig = sig + bit_vote(b)
    return df.select("doc_id", sig.alias("simhash"))


def simhash_near_dupes(
    df: DataFrame, text_col: str = "text", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming.

    Candidate generation by banding the 64 bits into 4×16-bit chunks
    (pigeonhole: Hamming ≤ 3 ⇒ ≥1 chunk identical) — an equi-join, not a
    cross join; exact Hamming check on candidates via bit_count(xor).
    """
    sigs = simhash_signatures(df, text_col)
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), 16 * c)
                    .bitwiseAND(F.lit(0xFFFF))
                    .alias(f"c{c}")
                    for c in range(4)
                ]
            )
        ).alias("chunk_id", "chunk_val"),
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
