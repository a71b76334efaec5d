"""Similarity search over embedding columns (array<float>).

- ``cosine_topk_bruteforce`` — exact top-k: broadcast the (small) query set
  against the corpus; cosine via zip_with/aggregate array expressions
  (JVM-side, no Python). This is the correctness baseline and is already
  the right 100 TB plan when |queries| is small: the corpus is scanned once,
  partition-parallel, with the queries broadcast — no shuffle of the corpus.
- ``embedding_neardup_exact`` — exact ALL-PAIRS above a threshold. A row-
  at-a-time pair join is hopeless (the 4M-pair join materializes GBs of
  array copies before any math); instead each corpus partition runs an
  Arrow-batched numpy kernel against a broadcast of the (normalized) corpus
  block — the classic block-matrix design. At true scale the broadcast side
  is sharded into B passes; the kernel is unchanged.
- ``cosine_topk_lsh`` — the scale path for large query sets: random-
  hyperplane LSH buckets both sides, so only vectors sharing a bucket are
  compared (equi-join instead of cross product), then exact re-rank within
  buckets. Recall < 1 by construction → registered as a rows-only check.

Determinism note: every dot/norm — JVM expression or numpy kernel — is
accumulated strictly left-to-right over the dimension in float64 (the numpy
kernel loops over dims, vectorizing across PAIRS, so per-pair order is
sequential), the same association DuckDB's list_cosine_similarity uses.
Similarities are therefore bit-identical across engines and safe to
hash-compare after round(6). This is why the kernel does NOT use np.dot /
BLAS: dgemm reorders the accumulation.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def _seq_dots(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    """Row-wise dot(A[i], B[i]) with strict left-to-right accumulation over
    the dimension (vectorized across rows) — bit-identical to a scalar
    sequential loop, unlike np.dot/BLAS."""
    acc = np.zeros(len(A), dtype=np.float64)
    for d in range(A.shape[1]):
        acc += A[:, d] * B[:, d]
    return acc


def _seq_sqnorms(A: np.ndarray) -> np.ndarray:
    acc = np.zeros(len(A), dtype=np.float64)
    for d in range(A.shape[1]):
        acc += A[:, d] * A[:, d]
    return acc


def embedding_neardup_exact(
    spark,
    corpus: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (a < b) with cosine ≥ threshold, exact.

    Each partition of the corpus is compared against a broadcast copy of
    the whole (small) corpus with a float64 numpy kernel; only surviving
    pairs are emitted, so the output is ~|near-dup tail|, never O(n²).
    At 100 TB the broadcast side becomes B column-blocks processed in B
    passes (or a block-matrix join); the per-block kernel is identical.
    """
    pdf = corpus.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
    norms = np.sqrt(_seq_sqnorms(mat))
    bc = spark.sparkContext.broadcast((ids, mat, norms))

    out_schema = T.StructType(
        [
            T.StructField("vec_a", T.LongType()),
            T.StructField("vec_b", T.LongType()),
            T.StructField("cosine_sim", T.DoubleType()),
        ]
    )

    def block(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat, all_norms = bc.value
        for b in batches:
            for _, row in b.iterrows():
                a_id = row[id_col]
                a_vec = np.asarray(row[vec_col], dtype=np.float64)
                mask = all_ids > a_id  # upper triangle only
                if not mask.any():
                    continue
                B, Bn, Bi = all_mat[mask], all_norms[mask], all_ids[mask]
                A = np.broadcast_to(a_vec, B.shape)
                a_norm = float(np.sqrt(_seq_sqnorms(a_vec[None, :]))[0])
                sims = np.round(_seq_dots(A, B) / (a_norm * Bn), 6)
                keep = sims >= threshold
                if keep.any():
                    yield pd.DataFrame(
                        {
                            "vec_a": np.full(int(keep.sum()), a_id, dtype=np.int64),
                            "vec_b": Bi[keep].astype(np.int64),
                            "cosine_sim": sims[keep],
                        }
                    )

    return corpus.select(id_col, vec_col).mapInPandas(block, schema=out_schema)


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


def _bucket_array_pandas(dim: int):
    """Vectorized bucket computation: one Arrow batch → numpy matmul over
    the stacked plane matrix → N_TABLES bucket keys per vector. The
    per-row JVM expression form (_bucket_array) evaluates 32 interpreted
    higher-order lambdas per vector; this is the same math at matrix speed
    (sign bits only, so BLAS accumulation order is irrelevant here).
    """
    from pyspark.sql.functions import pandas_udf

    all_planes = np.array(
        [
            _deterministic_planes(dim, N_PLANES, table=t)
            for t in range(N_TABLES)
        ]
    ).reshape(N_TABLES * N_PLANES, dim)  # (T*P, dim)
    offsets = np.arange(N_TABLES, dtype=np.int64) * (2 ** N_PLANES)
    powers = (1 << np.arange(N_PLANES, dtype=np.int64))

    @pandas_udf(T.ArrayType(T.LongType()))
    def buckets(vecs: pd.Series) -> pd.Series:
        mat = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        if len(mat) == 0:
            return pd.Series([], dtype=object)
        proj = mat @ all_planes.T  # (n, T*P)
        bits = (proj > 0).reshape(len(mat), N_TABLES, N_PLANES)
        keys = (bits * powers).sum(axis=2) + offsets  # (n, T)
        return pd.Series(list(keys))

    return buckets


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
    bucketer = _bucket_array_pandas(dim)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(bucketer(F.col(vec_col))).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(bucketer(F.col(vec_col))).alias("bucket"),
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
