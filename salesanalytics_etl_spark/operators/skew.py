"""Skew-mitigation helpers.

AQE's skew-join splitting handles most runtime skew automatically (enabled
in session.py), but aggregations over a heavily-skewed key still funnel one
key's rows into one reducer. ``salted_agg_sum`` is the classic two-phase
rewrite: spray each key across ``n_salts`` partial groups, aggregate, then
aggregate the partials — turning one hot reducer into n.

Use when a groupBy key has pathological frequency skew (e.g. grouping
events by a handful of mega-users at 100 TB). For uniform keys the plain
groupBy is strictly better (one shuffle, not two) — this is a targeted
tool, not a default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# phase-1 aggregate and the combiner that re-aggregates its partials
_SALT_FNS: dict[str, tuple] = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),  # count partials combine by SUM
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a random salt on the group key.

    ``aggs`` maps output column name → ``(fn, column)`` with fn one of
    ``sum | count | min | max`` — the re-aggregable functions, declared
    EXPLICITLY. (An earlier API took pre-built aggregate Columns and
    sniffed the function from ``Column.toString()`` — which renders
    count(DISTINCT x) as plain 'count(x)', so a non-re-aggregable
    DISTINCT silently produced double-counted garbage. The declared form
    makes that unrepresentable.) avg = sum + count, decomposed by the
    caller; DISTINCT requires a dedupe before the salted pass.
    """
    for name, (fn, _) in aggs.items():
        if fn not in _SALT_FNS:
            raise ValueError(
                f"salted_agg: unsupported fn {fn!r} for {name!r} — only "
                f"{sorted(_SALT_FNS)} partials are re-aggregable; "
                "decompose avg into sum + count, dedupe before DISTINCT"
            )
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[_SALT_FNS[fn][0](col).alias(name) for name, (fn, col) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[_SALT_FNS[fn][1](name).alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: salt the fact side, replicate the (small) dim
    side once per salt, join on (key, salt).

    The classic rewrite for a hot key that AQE's skew splitting can't
    save (e.g. one mega-key holding >1 executor's worth of rows joined to
    a dim too big to broadcast outright): each hot key's rows spread over
    ``n_salts`` reducers instead of one. The dim side is replicated
    n_salts× — use only when |dim| * n_salts is shuffle-affordable; for
    broadcastable dims, ``F.broadcast`` is strictly better.

    Supports inner and left joins (the fact side keeps its rows).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins only")
    # per-ROW salt, not a hash of the row's columns: identical hot-key
    # rows (duplicate impressions etc.) would all hash to one salt and
    # defeat the spreading exactly when it matters. The salt value is
    # allowed to differ across retries — every salt joins the same
    # replicated dim rows, so the result is unaffected.
    salted = facts.withColumn(
        "_salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int"),
    )
    replicated = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = salted.join(replicated, [on, "_salt"], how)
    return out.drop("_salt")


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Two-phase top-k per group — the window analogue of salted_agg.

    A single ``row_number`` window partitioned by a LOW-cardinality group
    key funnels every input row into |groups| tasks: one straggler sort
    per group at scale. Phase 1 keeps k rows per (group, input
    partition) — a superset of the global top-k under ANY partition
    layout — so the final window ranks ≤ k × partitions rows per group.

    ``order_cols`` must be a TOTAL order (ties tie-broken) or the result
    is nondeterministic — same contract as the single-window form, which
    this reproduces row-for-row. ``rank_col`` keeps the final rank in
    the output (1..k); None drops it.

    The helper injects ``_p``/``_rk`` working columns; ``withColumn``
    would SILENTLY overwrite same-named caller columns (and a colliding
    ``rank_col`` would corrupt the rank filter), so collisions raise.
    """
    from pyspark.sql import Window

    taken = set(df.columns)
    clash = {"_p", "_rk"} & taken
    if rank_col in taken:
        clash.add(rank_col)
    if clash:
        raise ValueError(
            f"topk_per_group: column(s) {sorted(clash)} already exist in the "
            "input — rename them (withColumn would silently overwrite)"
        )

    w1 = Window.partitionBy(*group_cols, "_p").orderBy(*order_cols)
    partial = (
        df.withColumn("_p", F.spark_partition_id())
        .withColumn("_rk", F.row_number().over(w1))
        .filter(F.col("_rk") <= k)
        .drop("_rk", "_p")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    out = partial.withColumn(rank_col or "_rk", F.row_number().over(w2)).filter(
        F.col(rank_col or "_rk") <= k
    )
    return out if rank_col else out.drop("_rk")
