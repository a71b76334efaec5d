"""Winnow-pipeline volume probe (r16): `winnow_near_dupes` measured on
realistic near-duplicate cliques at probe volume, with the slack knob
swept — the pipeline counterpart of the q189/q199 fidelity audits and
the MinHash/SimHash probes recorded in SCALE.md Rounds 13-15.

Ground truth is within-clique exact 5-gram Jaccard (base_id-keyed
self-join, bounded FACTOR^2 pairs per base — never all-pairs), computed
ONCE; every `--slack` value then runs in the same warm session, so the
wall-time deltas between slack values are the marginal verify cost the
slack buys, not JVM/load noise (the r15 probe-sweep pattern). Recall is
reported per 500-bp exact-Jaccard band for GT pairs with j_bp >= 5000,
directly comparable to the LSH/recovery tables in SCALE.md.

Usage (reuses an existing probe corpus with --no-build):
    SPARK_GRAFT_PROBE_EDITNOISE=1 SPARK_GRAFT_PROBE_FACTOR=30 \
        [SPARK_GRAFT_PROBE_EDITMODE=mixed|reorder] \
        python tools/winnow_probe.py [--no-build] [--slack S1,S2,...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_PROBE_EDITNOISE", "1")

from tools import scale_probe  # noqa: E402  (reads env at import)


def _int_list(flag: str) -> list[int] | None:
    if flag not in sys.argv:
        return None
    i = sys.argv.index(flag) + 1
    if i >= len(sys.argv) or sys.argv[i].startswith("--"):
        sys.exit(f"usage: {flag} N1[,N2,...] — missing value")
    try:
        return [int(x) for x in sys.argv[i].split(",")]
    except ValueError:
        sys.exit(f"usage: {flag} N1[,N2,...] — got {sys.argv[i]!r}")


def main() -> None:
    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.operators.dedup import (
        WINNOW_SLACK_BP,
        shingle_rows,
        shingle_sets,
        winnow_near_dupes,
    )
    from salesanalytics_etl_spark.session import get_spark

    assert scale_probe.EDITNOISE, "set SPARK_GRAFT_PROBE_EDITNOISE=1"
    # parse knob lists BEFORE any Spark work: a malformed flag
    # ('--slack' with the value forgotten) must exit with usage, not
    # IndexError minutes into the corpus build (r16 review)
    slacks = _int_list("--slack")
    recovers = _int_list("--recover")
    spark = get_spark(app_name="winnow_probe")

    base_dir, probe_dir = scale_probe.BASE, scale_probe.PROBE
    if "--no-build" not in sys.argv:
        scale_probe.build(spark, ["documents"])
    docs = spark.read.parquet(f"{probe_dir}/documents.parquet")
    dom = (
        spark.read.parquet(f"{base_dir}/documents.parquet")
        .agg(F.max("doc_id"))
        .collect()[0][0]
        + 1
    )
    n_docs = docs.count()
    print(
        f"probe corpus: {n_docs} docs ({scale_probe.FACTOR}x, "
        f"mode={scale_probe.EDITMODE}, dom={dom})"
    )

    # --- 1. ground truth: within-clique exact Jaccard (the
    # editnoise_probe construction — base_id-keyed, bounded) -----------
    sets = (
        shingle_sets(shingle_rows(docs))
        .withColumn("base_id", F.col("doc_id") % dom)
        .persist()
    )
    sets.count()
    a = sets.select(
        "base_id",
        F.col("doc_id").alias("doc_a"),
        F.col("shingles").alias("sh_a"),
    )
    b = sets.select(
        "base_id",
        F.col("doc_id").alias("doc_b"),
        F.col("shingles").alias("sh_b"),
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("long")
    gt = (
        a.join(b, "base_id")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            inter.alias("ov"),
            (
                F.size("sh_a").cast("long")
                + F.size("sh_b").cast("long")
                - inter
            ).alias("un"),
        )
        .select(
            "doc_a",
            "doc_b",
            F.expr("(ov * 20000 + un) div (2 * un)").alias("j_bp"),
        )
        .localCheckpoint()
    )
    sets.unpersist()
    target = gt.filter(F.col("j_bp") >= 5000).persist()
    n_target = target.count()
    print(f"GT clique pairs with exact J >= 0.5: {n_target}")

    band = F.expr("least(j_bp, 9999) div 500 * 500").alias("band")
    gt_by = target.select(band).groupBy("band").agg(
        F.count("*").alias("n_gt")
    )

    # --- 2. pipeline sweeps (one warm session) ------------------------
    def _measure(label: str, **kwargs) -> None:
        t0 = time.perf_counter()
        found = winnow_near_dupes(docs, **kwargs)  # localCheckpoint
        n_found = found.count()
        dt = time.perf_counter() - t0
        hit = target.join(found, ["doc_a", "doc_b"], "left_semi")
        n_hit = hit.count()
        overall = n_hit / n_target if n_target else float("nan")
        print(
            f"{label}: {n_found} pairs in {dt:.1f}s; "
            f"clique recall {n_hit}/{n_target} = {overall:.3f}"
        )
        hit_by = hit.select(band).groupBy("band").agg(
            F.count("*").alias("n_hit")
        )
        for r in (
            gt_by.join(hit_by, "band", "left")
            .select(
                "band",
                "n_gt",
                F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
            )
            .orderBy("band")
            .collect()
        ):
            frac = r.n_hit / r.n_gt if r.n_gt else float("nan")
            print(
                f"  band [{r.band/10000:.2f},{(r.band+500)/10000:.2f}): "
                f"recall {r.n_hit}/{r.n_gt} = {frac:.3f}"
            )

    for slack in slacks if slacks is not None else [WINNOW_SLACK_BP]:
        _measure(f"slack={slack}", slack_bp=slack)
    # --recover R1,R2,...: the r16 min-fingerprint-band recovery knee,
    # measured in the same warm session so wall deltas are marginal cost
    for rec in recovers or []:
        _measure(f"recover_bands={rec}", recover_bands=rec)
    target.unpersist()


if __name__ == "__main__":
    main()
