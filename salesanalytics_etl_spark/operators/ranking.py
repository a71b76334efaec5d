"""Distributed exact ranking — global row_number / NTILE without a
single-partition sort.

``Window.orderBy(...)`` with no partition key funnels the entire input
through ONE sort partition — the classic scale-killer the plan linter
exists to catch (the r7 verdict flagged q93's customer-grain ntile as the
last such funnel on the surface). For a TOTAL order the same result is
computable exactly with distributed machinery:

1. ``repartitionByRange`` on the order columns — partitions are disjoint,
   globally ordered key ranges (sampling only affects partition SIZES,
   never ordering, so exactness is unaffected).
2. ``row_number`` within each range partition (the per-partition window
   sorts locally and spills; no partition sees more than its range).
3. Per-partition row counts (one tiny aggregate, <= shuffle-partitions
   rows) turned into cumulative offsets; global rank = offset + local
   row_number via a broadcast join on the partition id.
4. NTILE(n) derived from the global rank and total count with the exact
   SQL bucket arithmetic (first ``N mod n`` buckets get ``N div n + 1``
   rows) — bit-identical to ``F.ntile`` over the same total order.

The ONLY unpartitioned window left is the cumulative sum over the
per-partition COUNTS frame — bounded by ``spark.sql.shuffle.partitions``
(dozens of rows at any data size), the same bounded-grain class as the
sketch/bucket windows the plan-lint allowlist documents.

The ranged frame is eagerly ``localCheckpoint``ed: steps 2 and 3 are two
consumers of one range exchange, and their partition ids must agree —
exchange reuse alone does NOT guarantee that under AQE (round 10 found a
join-upstream plan where the exchange materialized twice with different
sampled boundaries and ranks silently corrupted at sf0.1 while the
fully-sampled sf0.01 gate stayed green). One materialization, truncated
lineage, identical blocks for every consumer — correct with or without
reuse, with or without AQE, at the cost of storing the frame once.

The order must be TOTAL (include a unique tiebreak column, as SQL NTILE
determinism requires anyway) — with duplicate composite keys the range
boundary between two equal keys could otherwise split them arbitrarily.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from salesanalytics_etl_spark import telemetry


def append_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str = "rank",
    total_col: str | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Append the exact global row_number over ``order_cols`` (a total
    order) without a single-partition sort. Optionally also append the
    total row count as ``total_col`` (needed by NTILE derivation).

    Correctness requires the counts branch and the join branch to
    observe the SAME range exchange (identical ``spark_partition_id``
    per row). Exchange reuse is NOT a guarantee of that: under AQE the
    two instantiations of the ranged subtree may fail to canonicalize
    (observed round 10 on a join-upstream input: the ntile-shaped plan
    materialized the exchange twice, each sampling DIFFERENT range
    boundaries, and ranks silently corrupted — invisible at sf0.01
    where the boundary sample covers every row, wrong at sf0.1). The
    ranged frame is therefore ``localCheckpoint``ed (eager): one
    materialization, lineage truncated, both branches read the same
    blocks — partition ids cannot diverge, with or without reuse, with
    or without AQE. Cost: the frame is stored once on the executors
    (MEMORY_AND_DISK, spills) and the operator triggers that job at
    plan-build time; blocks free when the plan is garbage-collected.
    """
    telemetry.bump("range_exchange")
    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = df.repartitionByRange(nparts, *order_cols).withColumn(
        "_rk_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_rk_pid").orderBy(*order_cols)
    # eager single materialization — see docstring; correctness, not perf.
    # materialize=False skips it for PLAN INSPECTION ONLY (tests pin the
    # range-partitioned shape the checkpoint otherwise hides): the lazy
    # form's two branch subtrees can observe divergent exchanges.
    local = ranged.withColumn("_rk_rn", F.row_number().over(w))
    if materialize:
        local = local.localCheckpoint()
    counts = local.groupBy("_rk_pid").agg(F.count(F.lit(1)).alias("_rk_c"))
    # bounded-grain global window: <= nparts rows regardless of data
    # size — the WindowExec single-partition WARN it logs at sf0.1 is
    # expected and benign (plan-lint counts and allowlists this class)
    wo = Window.orderBy("_rk_pid")
    offsets = counts.select(
        "_rk_pid",
        F.coalesce(
            F.sum("_rk_c").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_rk_off"),
        F.sum("_rk_c")
        .over(
            wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("_rk_total"),
    )
    ranked = local.join(F.broadcast(offsets), "_rk_pid").withColumn(
        out_col, F.col("_rk_off") + F.col("_rk_rn")
    )
    keep = [c for c in df.columns] + [out_col]
    if total_col is not None:
        ranked = ranked.withColumn(total_col, F.col("_rk_total"))
        keep.append(total_col)
    return ranked.select(*keep)


def append_global_prefix_sum(
    df: DataFrame,
    value: Column,
    order_cols: list[Column],
    out_col: str = "prefix_sum",
    total_col: str | None = None,
    materialize: bool = True,
) -> DataFrame:
    """Append the exact global RUNNING SUM of ``value`` over a total
    order without a single-partition sort — the distributed prefix sum
    behind Pareto/ABC classification, cumulative-share reports, and
    quota cutoffs.

    Same machinery as :func:`append_global_rank`: ``repartitionByRange``
    on the order columns (disjoint, globally ordered ranges), a local
    running sum inside each range partition, then per-partition TOTALS
    (<= shuffle-partitions rows) rolled into cumulative offsets and
    broadcast back — global prefix = partition offset + local running
    sum. The only unpartitioned window is over the bounded totals frame.

    ``value`` should be an EXACT type (bigint / decimal): the offsets
    are added in whatever type the sum produces, and a double here
    would make the prefix depend on partition boundaries. The order
    must be TOTAL (unique tiebreak column) — with duplicate order keys
    both the range boundary and the within-partition ROWS frame would
    place ties arbitrarily. Optionally appends the grand total as
    ``total_col`` (for share-of-total arithmetic downstream).

    The ranged frame is ``localCheckpoint``ed (eager) for the same
    reason as :func:`append_global_rank` (see its docstring): the
    totals branch and the prefix join must observe ONE materialization
    of the range exchange — exchange reuse alone is not a guarantee
    under AQE, and divergent boundary samples would silently corrupt
    the prefix sums.
    """
    from pyspark.sql import types as T

    vdt = df.select(value).schema[0].dataType
    if isinstance(vdt, (T.FloatType, T.DoubleType)):
        # enforce the docstring's exactness contract (mirrors the
        # ntile_multi slot guards): float addition is not associative,
        # so offsets + local running sums would silently differ across
        # partition boundaries — the silent-wrong class this module
        # guards against loudly
        raise ValueError(
            f"append_global_prefix_sum: value is {vdt.simpleString()} — "
            "floating-point prefix sums depend on partition boundaries; "
            "pass an exact type (bigint / decimal), e.g. cents as bigint"
        )
    telemetry.bump("range_exchange")
    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    ranged = (
        df.withColumn("_ps_v", value)
        .repartitionByRange(nparts, *order_cols)
        .withColumn("_ps_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_ps_pid").orderBy(*order_cols)
    # eager single materialization — see append_global_rank's docstring
    # (materialize=False is for plan inspection in tests ONLY)
    local = ranged.withColumn(
        "_ps_run",
        F.sum("_ps_v").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    if materialize:
        local = local.localCheckpoint()
    totals = local.groupBy("_ps_pid").agg(F.sum("_ps_v").alias("_ps_t"))
    # bounded-grain global window: <= nparts rows regardless of data
    # size — the WindowExec single-partition WARN it logs at sf0.1 is
    # expected and benign (plan-lint counts and allowlists this class)
    wo = Window.orderBy("_ps_pid")
    offsets = totals.select(
        "_ps_pid",
        F.coalesce(
            F.sum("_ps_t").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_ps_off"),
        F.sum("_ps_t")
        .over(
            wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("_ps_tot"),
    )
    out = local.join(F.broadcast(offsets), "_ps_pid").withColumn(
        out_col, F.col("_ps_off") + F.col("_ps_run")
    )
    keep = [c for c in df.columns] + [out_col]
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_ps_tot"))
        keep.append(total_col)
    return out.select(*keep)


def append_global_ntile(
    df: DataFrame,
    n: int,
    order_cols: list[Column],
    out_col: str,
) -> DataFrame:
    """Append exact NTILE(n) over a total order, computed via
    :func:`append_global_rank` — no data-scaled single-partition sort.
    Chainable: call once per metric to accumulate quartile columns.

    Bucket arithmetic is SQL NTILE's, all integer: with N rows the first
    ``N mod n`` buckets hold ``N div n + 1`` rows, the rest ``N div n``
    (greatest() keeps the unreached else-branch division defined when
    N < n)."""
    if n <= 0:
        raise ValueError(f"NTILE bucket count must be >= 1, got {n}")
    ranked = append_global_rank(
        df, order_cols, out_col="_nt_rank", total_col="_nt_total"
    )
    r = F.expr(f"_nt_total % {n}")
    cut = r * (F.expr(f"_nt_total div {n}") + 1)
    rank = F.col("_nt_rank")
    bucket = (
        F.when(
            rank <= cut,
            F.expr(f"(_nt_rank - 1) div (_nt_total div {n} + 1)"),
        )
        .otherwise(
            r
            + F.expr(
                f"(_nt_rank - (_nt_total % {n}) * (_nt_total div {n} + 1) - 1)"
                f" div greatest(_nt_total div {n}, 1)"
            )
        )
        .cast("int")
        + F.lit(1)
    )
    return ranked.withColumn(out_col, bucket.cast("int")).drop(
        "_nt_rank", "_nt_total"
    )


def append_global_ntile_multi(
    df: DataFrame,
    n: int,
    metrics: dict[str, Column],
    keys: list[str],
) -> DataFrame:
    """Exact NTILE(n) for SEVERAL metrics through ONE range exchange.

    Chaining :func:`append_global_ntile` per metric pays one full-width
    range exchange per metric. This variant unpivots to narrow
    (keys, metric-id, typed value slots) rows, ranks ALL metrics in a
    single :func:`append_global_rank` pass — the metric id leads the
    sort order, and since every metric contributes exactly |df| rows,
    the within-metric rank is ``global_rank - metric_index * |df|`` —
    then pivots the buckets back and joins them on ``keys``.

    Contract:
    - ``metrics``: out_col → ASCENDING order expression. Express
      descending orders by negation (numerics) or ``-unix_date`` /
      ``-unix_timestamp`` (dates/timestamps) — strictly order-reversing,
      tie-preserving. Supported slot types: integral (exact bigint
      slot), float/double (double slot), string, and DECIMAL with
      precision <= 18 (routed EXACTLY through the bigint slot as the
      unscaled value ``v * 10^scale`` — decimal negation and the
      rescale are both exact, so DESC-by-negation decimals keep every
      tie distinct). DECIMAL(p>18) raises — its unscaled value can
      overflow bigint and a silent cast to double would merge values
      >2^53 apart by <1 ulp. PRECISION NOTE on the double slot: doubles
      are ranked bit-exactly AS DOUBLES (negation is a sign-bit flip,
      order- and tie-exact at any magnitude, property-tested >2^53);
      but if the double was itself produced by casting a wider exact
      type, values that collided IN THE CAST are ties here too — rank
      the exact source type instead (bigint/decimal slots).
    - ``keys``: the tiebreak AND pivot-back identity — must be UNIQUE
      per row (SQL NTILE determinism needs a total order anyway);
      duplicate keys would merge distinct rows' buckets in the pivot.
    - NULL metric values sort FIRST (asc_nulls_first), like Spark's
      ``F.asc``; engines defaulting to NULLS LAST (DuckDB) differ on
      null-valued metrics — keep nulls out of ranked metrics (q93's
      aggregates are null-free by construction).

    Scale: one narrow range exchange of |metrics|·|df| rows, one pivot
    aggregate back to |df| rows, one co-partitioned join on ``keys`` —
    vs |metrics| full-width exchanges for the chained form. The
    unpartitioned-offsets-frame bound is inherited from
    :func:`append_global_rank`.
    """
    if n <= 0:
        raise ValueError(f"NTILE bucket count must be >= 1, got {n}")
    if not metrics:
        raise ValueError("append_global_ntile_multi: no metrics given")
    names = list(metrics)

    from pyspark.sql import types as T

    def slot_of(col: Column) -> tuple[str, Column]:
        """(slot name, order-exact transformed column) for a metric."""
        dt = df.select(col).schema[0].dataType
        if isinstance(
            dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        ):
            return "_v_long", col
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            return "_v_dbl", col
        if isinstance(dt, T.StringType):
            return "_v_str", col
        if isinstance(dt, T.DecimalType):
            if dt.precision > 18 or dt.scale < 0:
                # p>18: unscaled value can overflow bigint. scale<0
                # (spark.sql.legacy.allowNegativeScaleOfDecimal):
                # 10**scale is a Python FLOAT, so the product would
                # silently route through double — the exact inexactness
                # this slot exists to prevent.
                raise ValueError(
                    f"append_global_ntile_multi: DECIMAL({dt.precision},"
                    f"{dt.scale}) metric — the exact bigint slot needs "
                    "precision <= 18 and scale >= 0; rescale or rank a "
                    "bigint surrogate"
                )
            # exact: v*10^s is integral with |unscaled| < 10^18 < 2^63;
            # the product stays decimal (precision p+s+1 <= 37) until
            # the final bigint cast, so no double ever intervenes
            return "_v_long", (col * F.lit(10 ** dt.scale)).cast("bigint")
        raise ValueError(
            f"append_global_ntile_multi: unsupported metric type {dt} — "
            "pre-convert to an exact integral/decimal(<=18)/double/"
            "string order key (e.g. -unix_date for a descending date)"
        )

    slots = ["_v_long", "_v_dbl", "_v_str"]
    casts = {"_v_long": "bigint", "_v_dbl": "double", "_v_str": "string"}
    parts = []
    for i, name in enumerate(names):
        mine, col = slot_of(metrics[name])
        parts.append(
            df.select(
                *keys,
                F.lit(i).alias("_m"),
                *[
                    (col if s == mine else F.lit(None))
                    .cast(casts[s])
                    .alias(s)
                    for s in slots
                ],
            )
        )
    stacked = parts[0]
    for p in parts[1:]:
        stacked = stacked.unionByName(p)

    order = [F.asc("_m")] + [F.asc_nulls_first(s) for s in slots] + [
        F.asc(k) for k in keys
    ]
    ranked = append_global_rank(
        stacked, order, out_col="_gr", total_col="_gt"
    )
    # every metric contributes exactly |df| rows, so the within-metric
    # frame is [m*N+1 .. (m+1)*N] of the global order. All-integer
    # arithmetic (div/%), mirroring append_global_ntile exactly
    k = len(names)
    ranked = ranked.withColumn(
        "_N", F.expr(f"_gt div {k}")
    ).withColumn("_wr", F.expr("_gr - _m * _N"))
    r = F.expr(f"_N % {n}")
    cut = r * (F.expr(f"_N div {n}") + 1)
    bucket = (
        F.when(
            F.col("_wr") <= cut,
            F.expr(f"(_wr - 1) div (_N div {n} + 1)"),
        )
        .otherwise(
            r
            + F.expr(
                f"(_wr - (_N % {n}) * (_N div {n} + 1) - 1)"
                f" div greatest(_N div {n}, 1)"
            )
        )
        .cast("int")
        + F.lit(1)
    )
    pivoted = (
        ranked.withColumn("_bk", bucket)
        .groupBy(*keys)
        .agg(
            *[
                F.max(F.when(F.col("_m") == i, F.col("_bk"))).alias(name)
                for i, name in enumerate(names)
            ]
        )
    )
    # NULL-SAFE pivot-back join: groupBy treats NULL keys as one group
    # (consistent with the uniqueness contract — one null-keyed row is
    # legal), and a plain equi-join would silently drop that row
    cond = None
    for k in keys:
        c = F.col(f"d.{k}").eqNullSafe(F.col(f"p.{k}"))
        cond = c if cond is None else (cond & c)
    return (
        df.alias("d")
        .join(pivoted.alias("p"), cond)
        .select(*[F.col(f"d.{c}") for c in df.columns], *names)
    )


def append_group_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    out_col: str = "rank",
    total_col: str | None = None,
) -> DataFrame:
    """Per-group exact row_number over ``order_cols`` WITHOUT per-group
    sort funnels — the grouped analog of :func:`append_global_rank`.

    ``Window.partitionBy(group).orderBy(...)`` sorts each group in ONE
    task: fine for high-cardinality groups, a straggler/OOM when a few
    huge groups hold the data (customer segments, languages, sources —
    the usual low-cardinality grouping). Here the data range-partitions
    on (group, order) so a big group SPANS partitions, local row_numbers
    run per (partition, group) slice, and per-group offsets come from
    the (partition × group) counts frame — bounded by
    ``shuffle.partitions × |groups|`` — via a window partitioned BY
    GROUP over partition ids (never unpartitioned, never data-scaled).

    The ranged frame is ``localCheckpoint``ed (eager) for the same
    reason as :func:`append_global_rank` (see its docstring): this
    function has its own two consumers of the ranged subtree, and the
    counts and join branches must observe ONE materialization of the
    range exchange — exchange reuse alone is not a guarantee under AQE.
    """
    telemetry.bump("range_exchange")
    spark = df.sparkSession
    nparts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    gcols = [F.col(g) for g in group_cols]
    ranged = df.repartitionByRange(nparts, *gcols, *order_cols).withColumn(
        "_gk_pid", F.spark_partition_id()
    )
    w = Window.partitionBy("_gk_pid", *group_cols).orderBy(*order_cols)
    # eager single materialization — see append_global_rank's docstring
    local = ranged.withColumn("_gk_rn", F.row_number().over(w)).localCheckpoint()
    counts = local.groupBy("_gk_pid", *group_cols).agg(
        F.count(F.lit(1)).alias("_gk_c")
    )
    # bounded counts frame: <= nparts × |groups| rows; windows are
    # partitioned by group (grain = partitions-per-group)
    wo = Window.partitionBy(*group_cols).orderBy("_gk_pid")
    offsets = counts.select(
        "_gk_pid",
        *group_cols,
        F.coalesce(
            F.sum("_gk_c").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("_gk_off"),
        F.sum("_gk_c")
        .over(
            wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        )
        .alias("_gk_total"),
    )
    # NULL-SAFE on the group columns: Window.partitionBy ranks a NULL
    # group as a normal group, and a plain equi-join here would silently
    # DROP every null-group row instead (they'd never match offsets)
    cond = F.col("l._gk_pid") == F.col("r._gk_pid")
    for g in group_cols:
        cond = cond & F.col(f"l.{g}").eqNullSafe(F.col(f"r.{g}"))
    # NO broadcast hint on offsets: the frame is shuffle.partitions ×
    # |groups| rows — bounded for the low-cardinality groups this
    # operator targets, but |groups| is caller-controlled and a FORCED
    # broadcast of a high-cardinality offsets frame would OOM the
    # driver. AQE sizes the built side at runtime and broadcasts
    # exactly when it is actually small (the global form keeps its
    # hint: its frame is <= shuffle.partitions rows at ANY cardinality)
    ranked = (
        local.alias("l")
        .join(offsets.alias("r"), cond)
        .withColumn(out_col, F.col("r._gk_off") + F.col("l._gk_rn"))
    )
    keep = [F.col(f"l.{c}") for c in df.columns] + [F.col(out_col)]
    if total_col is not None:
        ranked = ranked.withColumn(total_col, F.col("r._gk_total"))
        keep.append(F.col(total_col))
    return ranked.select(*keep)
