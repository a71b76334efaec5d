"""Iterative graph operators: connected components for dedup clustering.

Near-dup detection yields PAIRS (q25/q26); deduplication needs CLUSTERS —
the transitive closure (a~b, b~c ⇒ {a,b,c} share one keeper). Implemented
as label propagation: every node starts labeled with its own id and
repeatedly adopts the minimum label among itself and its neighbors until a
fixpoint. Converges in O(diameter) rounds; near-dup graphs are unions of
small cliques, so diameter is tiny (2-3 rounds typical).

Iteration is driver-controlled (a loop of DataFrame jobs with a converged?
check) — this is the class of algorithm the oracle gate marks rows-only:
not SQL-expressible, but exactly what Spark's lazy DAG + caching does well.
Each round is one join + one aggregate on the (small) edge set, NOT the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 20,
) -> DataFrame:
    """(node, component) for every node in ``edges``; component = min node
    id reachable. Undirected."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .persist()
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Near-dup pairs → clusters: (cluster_id = min member, doc_id).

    Downstream dedup keeps one doc per cluster_id (e.g. the min id) and
    drops the rest — the final step of the MinHash/SimHash pipelines.
    """
    cc = connected_components(pairs)
    return cc.select(
        F.col("component").alias("cluster_id"), F.col("node").alias("doc_id")
    )
