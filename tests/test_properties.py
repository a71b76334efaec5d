"""Property-based checks (hypothesis) for the reference-semantics core.

The reference defines dedupe as pandas ``drop_duplicates(keep="last")``
(etl_sales_analytics.py:186) and MERGE as update-all-columns-or-insert
(etl_sales_analytics.py:223-283). Example-based tests pin known cases;
these properties assert the DISTRIBUTED implementations agree with the
single-node reference semantics on arbitrary inputs — keys with any
duplicate multiplicity, any seq ordering, any batch overlap.

Spark session startup dominates per-example cost, so examples are few and
small; the value is the adversarial shapes hypothesis finds (all-same-key,
interleaved seq ties broken by later columns, empty batches), not volume.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from salesanalytics_etl_spark.operators.cleaning import dedupe_keep_last
from salesanalytics_etl_spark.operators.upsert import merge_upsert

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),  # key: few values → many dups
        st.integers(min_value=0, max_value=100),  # payload
    ),
    min_size=1,
    max_size=30,
)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(_rows)
@_SETTINGS
def test_dedupe_keep_last_matches_pandas(spark, data):
    # stamp file order as _seq, exactly like read_csv_exact(with_seq=True)
    pdf = pd.DataFrame(
        [(k, v, i) for i, (k, v) in enumerate(data)],
        columns=["k", "v", "_seq"],
    )
    want = (
        pdf.sort_values("_seq")
        .drop_duplicates(subset=["k"], keep="last")
        .set_index("k")["v"]
        .to_dict()
    )
    df = spark.createDataFrame(pdf, "k INT, v INT, _seq INT").repartition(3)
    got = {
        r.k: r.v
        for r in dedupe_keep_last(df, keys=["k"], order_col="_seq").collect()
    }
    assert got == want


@given(_rows, _rows)
@_SETTINGS
def test_merge_upsert_matches_dict_update(spark, base, batch):
    # reference MERGE: end state == dict(base) updated by dict(batch),
    # where each input is itself key-deduped keep-last first (the pipeline
    # dedupes before staging, as the reference does)
    def last_wins(rows):
        return {k: v for k, v in rows}

    want = last_wins(base)
    want.update(last_wins(batch))

    def df_of(rows):
        pdf = pd.DataFrame(
            [(k, v, i) for i, (k, v) in enumerate(rows)],
            columns=["k", "v", "_seq"],
        )
        d = spark.createDataFrame(pdf, "k INT, v INT, _seq INT")
        return dedupe_keep_last(d, keys=["k"], order_col="_seq")

    got = {
        r.k: r.v
        for r in merge_upsert(df_of(base), df_of(batch), keys=["k"]).collect()
    }
    assert got == want


@given(
    st.lists(  # dimension seed: key -> initial segment
        st.tuples(st.integers(0, 5), st.sampled_from(["A", "B", "C"])),
        min_size=1,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
    st.lists(  # update batch: key -> new segment (keys may be absent/same)
        st.tuples(st.integers(0, 5), st.sampled_from(["A", "B", "C", "D"])),
        min_size=0,
        max_size=6,
        unique_by=lambda t: t[0],
    ),
)
@_SETTINGS
def test_scd2_invariants(spark, seed, batch):
    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.operators.upsert import scd2_apply

    dim = spark.createDataFrame(
        [(k, s) for k, s in seed], "k INT, seg STRING"
    ).select(
        "k",
        "seg",
        F.to_date(F.lit("2020-01-01")).alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    # scd2_apply contract: update keys must exist in the dimension
    seed_keys = {k for k, _ in seed}
    updates_rows = [(k, s) for k, s in batch if k in seed_keys]
    if not updates_rows:
        return
    updates = spark.createDataFrame(updates_rows, "k INT, seg STRING")

    out = scd2_apply(dim, updates, ["k"], ["seg"], "2024-06-01")
    rows = out.collect()

    # exactly one OPEN (current) row per key, and it carries the latest seg
    cur = {r.k: r.seg for r in rows if r.is_current}
    assert sorted(cur) == sorted(seed_keys)
    want_cur = dict(seed)
    want_cur.update(dict(updates_rows))
    assert cur == want_cur
    # every closed row is consistently terminated, never truncated history
    for r in rows:
        assert r.is_current == (r.valid_to is None)
    # changed keys have exactly two rows; unchanged keys exactly one
    from collections import Counter

    per_key = Counter(r.k for r in rows)
    changed = {k for k, s in updates_rows if dict(seed)[k] != s}
    for k in seed_keys:
        assert per_key[k] == (2 if k in changed else 1)

    # fixpoint: re-applying the same batch changes nothing
    again = scd2_apply(out, updates, ["k"], ["seg"], "2024-07-01")
    assert {tuple(r) for r in again.collect()} == {tuple(r) for r in rows}


_PMERGE_SETTINGS = settings(
    max_examples=6,  # each example writes parquet twice — keep it tight
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@given(
    st.lists(  # seed rows (key, payload); dt partition derived from key
        st.tuples(st.integers(0, 9), st.integers(0, 100)),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    st.lists(  # incoming batch
        st.tuples(st.integers(0, 9), st.integers(0, 100)),
        min_size=0,
        max_size=8,
        unique_by=lambda t: t[0],
    ),
)
@_PMERGE_SETTINGS
def test_merge_upsert_partitioned_matches_full_merge(
    spark, tmp_path_factory, seed, batch
):
    """End state always equals the full-table merge_upsert semantics, and
    partitions absent from the batch are never rewritten (file bytes
    identical) — the two invariants of the partition-scoped MERGE, under
    arbitrary key overlap. The partition column is derived from the key
    (dt = key % 3), satisfying the keys-determine-partition contract."""
    import hashlib
    import os

    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.operators.upsert import (
        merge_upsert,
        merge_upsert_partitioned,
    )

    path = str(tmp_path_factory.mktemp("pmerge") / "t")

    def mk(rows):
        return spark.createDataFrame(
            [(k, f"d{k % 3}", v) for k, v in rows], "k INT, dt STRING, v INT"
        )

    seed_df, batch_df = mk(seed), mk(batch)
    merge_upsert_partitioned(spark, path, seed_df, ["k"], ["dt"])

    def snapshot(dts):
        out = {}
        for dt in dts:
            d = os.path.join(path, f"dt={dt}")
            if os.path.isdir(d):
                out[dt] = {
                    f: hashlib.md5(
                        open(os.path.join(d, f), "rb").read()
                    ).hexdigest()
                    for f in sorted(os.listdir(d))
                    if f.endswith(".parquet")
                }
        return out

    batch_dts = {f"d{k % 3}" for k, _ in batch}
    untouched = {f"d{i}" for i in range(3)} - batch_dts
    before = snapshot(untouched)

    merge_upsert_partitioned(spark, path, batch_df, ["k"], ["dt"])
    assert snapshot(untouched) == before  # untouched partitions unchanged

    got = {(r.k, r.dt, r.v) for r in spark.read.parquet(path).collect()}
    want = {
        (r.k, r.dt, r.v)
        for r in merge_upsert(seed_df, batch_df, ["k"]).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# Connected components: distributed label propagation at its dispatch gate
# ---------------------------------------------------------------------------

_edges_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=24),
        st.integers(min_value=0, max_value=24),
    ).map(lambda p: (min(p), max(p))).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=40,
)

_CC_SETTINGS = settings(
    max_examples=5,  # each example runs 2-5 distributed label-prop rounds
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@_CC_SETTINGS
@given(_edges_strategy)
def test_label_propagation_agrees_with_union_find_at_gate(spark, edges):
    """Force the DISPATCH through the distributed path by lowering
    DRIVER_CC_MAX_EDGES to 0 (every r5-era test exercised the path only by
    calling _label_propagation directly, never the gate) and assert it
    matches driver union-find on arbitrary graphs — including multi-edges,
    reversed duplicates, and star/chain mixtures hypothesis cooks up."""
    from salesanalytics_etl_spark.operators import graph

    df = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    want = sorted(
        map(tuple, graph._driver_union_find(df, "doc_a", "doc_b").collect())
    )
    old = graph.DRIVER_CC_MAX_EDGES
    graph.DRIVER_CC_MAX_EDGES = 0
    try:
        got = sorted(map(tuple, graph.connected_components(df).collect()))
    finally:
        graph.DRIVER_CC_MAX_EDGES = old
    assert got == want


def test_gate_nonconvergence_raises_through_public_entry(spark):
    """A diameter-11 chain with the gate lowered and max_iter=3 must hit
    the loud non-convergence raise THROUGH connected_components (the
    r5-era test called _label_propagation directly, so the gate branch
    to the raise was never covered)."""
    import pytest as _pytest

    from salesanalytics_etl_spark.operators import graph

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], ["doc_a", "doc_b"]
    )
    old = graph.DRIVER_CC_MAX_EDGES
    graph.DRIVER_CC_MAX_EDGES = 0
    try:
        with _pytest.raises(RuntimeError, match="did not converge"):
            graph.connected_components(chain, max_iter=3)
        # and with an adequate budget the same dispatch converges
        got = graph.connected_components(chain, max_iter=15)
        assert {r.component for r in got.collect()} == {0}
    finally:
        graph.DRIVER_CC_MAX_EDGES = old


_topk_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),    # group: few → hot keys
        st.integers(min_value=-50, max_value=50), # order value, with ties
        st.integers(min_value=0, max_value=999),  # tiebreak id (may repeat)
    ),
    min_size=1,
    max_size=40,
)


@given(_topk_rows, st.integers(min_value=1, max_value=5),
       st.integers(min_value=1, max_value=7))
@_SETTINGS
def test_topk_per_group_matches_single_window(spark, data, k, nparts):
    """The two-phase pick must reproduce the single-window form row for
    row under ANY repartitioning — the phase-1 superset argument is a
    universal claim, so hypothesis drives the layout too."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.operators.skew import topk_per_group

    df = spark.createDataFrame(
        [(g, v, i) for g, v, i in data], ["g", "v", "i"]
    ).repartition(nparts)
    order = [F.desc("v"), F.asc("i")]
    got = sorted(
        (r.g, r.v, r.i)
        for r in topk_per_group(df, ["g"], order, k).collect()
    )
    w = Window.partitionBy("g").orderBy(*order)
    want = sorted(
        (r.g, r.v, r.i)
        for r in df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
        .collect()
    )
    # (g, v, i) may not be unique — row_number ties on duplicate triples
    # are arbitrary but the MULTISET of kept triples is determined
    assert got == want


# ---------------------------------------------------------------------------
# round-8 operators: snapshot diff + keyless bucketed range join
# ---------------------------------------------------------------------------

_snap = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),   # key: collisions likely
        st.integers(min_value=0, max_value=3),   # payload a: small domain
        st.one_of(st.none(), st.integers(min_value=0, max_value=2)),  # nullable
    ),
    max_size=15,
    unique_by=lambda t: t[0],  # snapshots are keyed: one row per key
)


@given(_snap, _snap)
@_SETTINGS
def test_snapshot_diff_matches_dict_semantics(spark, old_rows, new_rows):
    from salesanalytics_etl_spark.operators.diff import snapshot_diff

    schema = "k INT, a INT, b INT"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    o, n = {t[0]: t[1:] for t in old_rows}, {t[0]: t[1:] for t in new_rows}
    want = {}
    for k in o.keys() | n.keys():
        if k not in o:
            want[k] = ("added", None)
        elif k not in n:
            want[k] = ("removed", None)
        elif o[k] != n[k]:  # tuple compare: None == None, like <=>
            want[k] = (
                "changed",
                sum(1 for x, y in zip(o[k], n[k]) if x != y),
            )
    got = {
        r.k: (r.status, r.n_changed_cols)
        for r in snapshot_diff(old, new, keys="k").collect()
    }
    assert got == want


@given(_snap)
@_SETTINGS
def test_snapshot_diff_self_is_empty(spark, rows):
    from salesanalytics_etl_spark.operators.diff import snapshot_diff

    df = spark.createDataFrame(rows, "k INT, a INT, b INT")
    assert snapshot_diff(df, df, keys="k").count() == 0


_pts = st.lists(
    st.integers(min_value=0, max_value=50_000),  # seconds offset
    min_size=1,
    max_size=20,
)
_ivs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50_000),
        st.integers(min_value=-100, max_value=50_000),  # may be < lo
    ),
    min_size=1,
    max_size=15,
)


@given(_pts, _ivs, st.sampled_from([60, 997, 3600, 86_400]))
@_SETTINGS
def test_bucketed_range_join_matches_naive(spark, pts, ivs, width):
    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.operators.temporal import bucketed_range_join

    base = 1_700_000_000
    points = spark.createDataFrame(
        [(i, p) for i, p in enumerate(pts)], "pid INT, off INT"
    ).select("pid", F.timestamp_seconds(F.col("off") + base).alias("pts"))
    intervals = spark.createDataFrame(
        [(i, lo, lo + d) for i, (lo, d) in enumerate(ivs)],
        "iid INT, lo_off INT, hi_off INT",
    ).select(
        "iid",
        F.timestamp_seconds(F.col("lo_off") + base).alias("lo"),
        F.timestamp_seconds(F.col("hi_off") + base).alias("hi"),
    )
    got = sorted(
        (r.pid, r.iid)
        for r in bucketed_range_join(
            points, "pts", intervals, "lo", "hi", bucket_seconds=width
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, p in enumerate(pts)
        for j, (lo, d) in enumerate(ivs)
        if lo <= p <= lo + d
    )
    assert got == want


@given(_snap, _snap)
@_SETTINGS
def test_diff_apply_roundtrip(spark, old_rows, new_rows):
    from salesanalytics_etl_spark.operators.diff import (
        apply_changes,
        snapshot_diff,
    )

    schema = "k INT, a INT, b INT"
    old = spark.createDataFrame(old_rows, schema)
    new = spark.createDataFrame(new_rows, schema)
    feed = snapshot_diff(old, new, keys="k", include_values=True)
    rebuilt = apply_changes(old, feed, keys="k")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(new_rows)


# --- round 11: distributed selection agrees with brute force ------------

_series = st.lists(
    st.integers(min_value=-1000, max_value=1000),
    min_size=2,
    max_size=14,
    unique=False,
)


@given(_series)
@_SETTINGS
def test_global_rank_median_pick_matches_bruteforce(spark, values):
    """The q156 pattern — append_global_rank + r == (n+1) div 2 — must
    return the exact lower median of an arbitrary value list (ties,
    negatives, even/odd counts; the even count is the shape that broke
    the double-division spelling this round)."""
    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.operators.ranking import append_global_rank

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i INT, v INT"
    )
    ranked = append_global_rank(
        df, [F.asc("v"), F.asc("i")], out_col="r", total_col="n"
    )
    got = ranked.filter(F.col("r") == F.expr("(n + 1) div 2")).collect()
    assert len(got) == 1
    want = sorted(values)[(len(values) + 1) // 2 - 1]
    assert got[0].v == want
