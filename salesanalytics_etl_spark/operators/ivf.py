"""IVF (inverted-file) approximate nearest neighbor: KMeans coarse
quantizer + probe-N clusters + exact rescoring.

The second ANN scale path beside hyperplane LSH (similarity.py):

1. Fit KMeans (fixed seed) on (a sample of) the corpus — driver holds only
   the k×dim centroid matrix.
2. Assign every corpus vector to its nearest centroid — one model.transform
   pass, partition-parallel; the cluster id becomes the join key
   ("inverted list").
3. Each query probes its ``n_probe`` nearest centroids and is compared
   ONLY against those clusters' members — an equi-join on cluster id, with
   candidate fraction ≈ n_probe/k instead of 1.

Recall/cost dial: (k, n_probe). Unlike LSH there is no hashing variance —
probing more clusters monotonically approaches exact search.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from salesanalytics_etl_spark.operators.similarity import cosine

N_CLUSTERS = 16
N_PROBE = 4
SEED = 42


def _fit_centroids(corpus: DataFrame, vec_col: str, k: int) -> np.ndarray:
    """KMeans on unit-normalized vectors (cosine ≈ euclidean on the sphere).

    Uses pyspark.ml's distributed KMeans — the corpus never leaves the
    executors; only the k×dim centroid matrix comes back to the driver.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = corpus.select(
        array_to_vector(_unit(vec_col)).alias("features")
    )
    model = KMeans(k=k, seed=SEED, maxIter=8).fit(feats)
    return np.array([np.asarray(c) for c in model.clusterCenters()])


def _unit(vec_col: str):
    """Unit-normalize an array<float> column (JVM expression)."""
    v = F.col(vec_col)
    sq = F.aggregate(
        F.transform(v, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    return F.transform(v, lambda x: x.cast("double") / F.sqrt(sq))


def _assign_udf(centroids: np.ndarray, n_nearest: int):
    """pandas_udf: array<float> → n_nearest nearest centroid ids (by cosine
    on normalized inputs = argmax dot)."""

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def assign(vecs: pd.Series) -> pd.Series:
        out = []
        for v in vecs:
            a = np.asarray(v, dtype=np.float64)
            a = a / np.sqrt((a * a).sum())
            sims = centroids @ a
            out.append(np.argsort(-sims)[:n_nearest].astype(np.int32).tolist())
        return pd.Series(out)

    return assign


def cosine_topk_ivf(
    spark,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = N_CLUSTERS,
    n_probe: int = N_PROBE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k via IVF probing. Output matches
    cosine_topk_bruteforce's schema; ties broken by neighbor_id."""
    centroids = _fit_centroids(corpus, vec_col, n_clusters)

    c_assign = _assign_udf(centroids, 1)
    q_assign = _assign_udf(centroids, n_probe)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        F.element_at(c_assign(F.col(vec_col)), 1).alias("cluster"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.explode(q_assign(F.col(vec_col))).alias("cluster"),
    )
    sim = F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6)
    scored = (
        c.join(F.broadcast(q), on="cluster")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("cosine_sim"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )
