"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) query set
  against the corpus; cosine via zip_with/aggregate array expressions
  (JVM-side, no Python). This is the correctness baseline and is already
  the right 100 TB plan when |queries| is small: the corpus is scanned once,
  partition-parallel, with the queries broadcast — no shuffle of the corpus.
- ``cosine_topk_lsh`` — the scale path for large query sets: random-
  hyperplane LSH buckets both sides, so only vectors sharing a bucket are
  compared (equi-join instead of cross product), then exact re-rank within
  buckets. Recall < 1 by construction → registered as a rows-only check.

Determinism note: dot products are computed left-to-right in double
precision — the same association DuckDB's list_cosine_similarity uses — so
similarities are bit-identical and safe to hash-compare after round(6).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

N_PLANES = 4  # hyperplanes per table → 16 buckets/table
N_TABLES = 8  # independent hash tables; a pair is a candidate if it
# collides in ANY table — the standard recall knob (recall grows with L,
# candidate fraction ≈ L/2^planes). Defaults favor recall on weakly-
# clustered data; for real embedding corpora (tight clusters) raise
# N_PLANES to cut candidates by 2^Δ.


def _dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a, b) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``corpus`` for each row of ``queries``.

    Output: (query_id, neighbor_id, cosine_sim), k rows per query,
    self-matches excluded, ties broken by neighbor_id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def _lsh_bucket(vec, planes: list[list[float]]) -> Column:
    """Sign-of-projection bucket id: bit p = (vec · plane_p) > 0."""
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(x) for x in plane]),
                lambda x, y: x.cast("double") * y,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(2 ** p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def _deterministic_planes(
    dim: int, n: int = N_PLANES, table: int = 0
) -> list[list[float]]:
    """Pseudo-random hyperplanes from a fixed LCG — no RNG state, so plans
    are reproducible across sessions/executors; ``table`` salts the stream
    so each LSH table gets independent planes."""
    planes = []
    seed = 0x2545F4914F6CDD1D
    x = 88172645463325252 + 7919 * table
    for _ in range(n):
        row = []
        for _ in range(dim):
            x = (x * seed + 0xB504F333) % (1 << 63)
            row.append((x / float(1 << 63)) * 2.0 - 1.0)
        planes.append(row)
    return planes


def _bucket_array(vec, dim: int) -> Column:
    """array of (table_id*2^planes + bucket) keys, one per LSH table."""
    keys = []
    for t in range(N_TABLES):
        planes = _deterministic_planes(dim, N_PLANES, table=t)
        keys.append(
            _lsh_bucket(vec, planes) + F.lit(t * (2 ** N_PLANES)).cast("long")
        )
    return F.array(*keys)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: compare only vectors colliding in ≥1 LSH table.

    At 100 TB the cross product is impossible; this turns ANN into an
    equi-join on (table, bucket) keys — each side explodes to N_TABLES rows,
    the join key is uniform-ish (no skew), and a pair is compared at most
    once thanks to the distinct() on candidate ids before scoring.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(_bucket_array(F.col(vec_col), dim)).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(_bucket_array(F.col(vec_col), dim)).alias("bucket"),
    )
    cand = (
        c.join(F.broadcast(q.select("query_id", "bucket")), on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
    scored = (
        cand.join(
            F.broadcast(q.select("query_id", "q_vec").distinct()), on="query_id"
        )
        .join(
            corpus.select(
                F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
            ),
            on="neighbor_id",
        )
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
