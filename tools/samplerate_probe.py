"""q181 sample-rate sensitivity probe (r13 verdict item 5).

q182's confusion matrix says when the 1/16 shingle-identity sample is
too thin, but no measurement existed for ALTERNATIVE rates. This probe
runs the q181 monitor at mod 8 / 16 / 32 against the q177-exact per-doc
deciles at probe volume and reports, per rate:

- off-diagonal mass (docs whose sampled decile != exact decile),
- mean |decile error| over monitored docs,
- the -1 column (docs the monitor cannot see at all: no sampled
  shingle), and
- wall time of the monitor pipeline alone (the cadence cost knob).

All sampled deciles are computed in ONE pass per rate over the shared
exact frame (persisted), so the timings are comparable. Results are
recorded in SCALE.md (Round-14) and drive the documented sample-rate
recommendation.

Usage:
    SPARK_GRAFT_PROBE_FACTOR=30 python tools/samplerate_probe.py [--no-build]
    # add SPARK_GRAFT_PROBE_EDITNOISE=1 to probe the realistic-content
    # corpus (distinct variants, growing shingle domain)
    # --flip builds/uses the FLIPPABLE-decile corpus at /tmp/probe_flip
    # (base36 unique pads sized per doc_id%10 — r15 verdict item 2: the
    # template testdata has no df=1 mass, so every doc sat at decile 10
    # and the off-diagonal axis was structurally dead)
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tools import scale_probe  # noqa: E402  (reads env at import)


def _build_flip_corpus(spark, out_dir: str, factor: int):
    """Corpus with FLIPPABLE deciles (r14 handoff → r15 verdict item 2).

    The template-generated testdata has no df=1 shingle mass — every doc
    sits at exact decile 10, so q182's off-diagonal axis was
    structurally dead and the mod-16 recommendation rested on the unseen
    column alone. This corpus appends to each doc a UNIQUE pad sized so
    the doc's common-shingle fraction lands at ~(10 - doc_id%10)/10:
    exact deciles spread over 1..10 and sampling CAN misestimate them.

    Pad alphabet is base36 (``conv(md5-hex, 16, 36)`` — 36^5 ≈ 60M
    5-gram space), per the handoff: hex-only pads collide at 5-gram
    grain and stay df>=2. Pads key on the SHIFTED doc_id, so replicas of
    one base doc share their template text (df stays high there) but
    never a pad gram by construction intent (rare base36 birthday
    collisions only blur a doc's fraction, they cannot collapse the
    spread)."""
    import shutil

    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.operators.text import normalize_text

    base = spark.read.parquet(f"{scale_probe.BASE}/documents.parquet")
    hi = base.agg(F.max("doc_id")).collect()[0][0] + 1
    reps = []
    for i in range(factor):
        reps.append(
            base.withColumn("doc_id", F.col("doc_id") + F.lit(i * hi))
        )
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    # u = unique-gram target fraction in {0.0 .. 0.9}; pad chars =
    # len(t) * u / (1 - u) (10-char base36 tokens, one md5 each)
    padded = (
        big.withColumn("t", normalize_text(F.col("text")))
        .withColumn("u10", F.col("doc_id") % 10)
        .withColumn(
            "n_tok",
            F.expr("int(ceil(length(t) * u10 / (10.0 - u10) / 11.0))"),
        )
        .withColumn(
            "pad",
            F.array_join(
                F.transform(
                    F.sequence(F.lit(1), F.col("n_tok")),
                    lambda j: F.conv(
                        F.substring(
                            F.md5(
                                F.concat(
                                    F.lit("flip-"),
                                    F.col("doc_id").cast("string"),
                                    F.lit("-"),
                                    j.cast("string"),
                                )
                            ),
                            1,
                            13,
                        ),
                        16,
                        36,
                    ),
                ),
                " ",
            ),
        )
        .withColumn(
            "text",
            F.when(F.col("n_tok") <= 0, F.col("t")).otherwise(
                F.concat(F.col("t"), F.lit(" "), F.col("pad"))
            ),
        )
        .select(*big.columns)
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    padded.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")


def main() -> None:
    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.operators.dedup import (
        md5_token_hash,
        sampled_shingle_boilerplate,
        shingle_rows,
    )
    from salesanalytics_etl_spark.session import get_spark

    spark = get_spark(app_name="samplerate_probe")
    if "--flip" in sys.argv:
        probe_dir = "/tmp/probe_flip"
        if "--no-build" not in sys.argv:
            _build_flip_corpus(spark, probe_dir, scale_probe.FACTOR)
    else:
        probe_dir = scale_probe.PROBE
        if "--no-build" not in sys.argv:
            scale_probe.build(spark, ["documents"])
    docs = spark.read.parquet(f"{probe_dir}/documents.parquet")
    n_docs = docs.count()
    print(f"probe corpus: {n_docs} docs ({scale_probe.FACTOR}x)")

    # exact per-doc decile (q177/q182's exact branch), computed once
    sh = (
        shingle_rows(docs)
        .select("doc_id", md5_token_hash(F.col("sh")).alias("h"))
        .distinct()
    )
    edf = sh.groupBy("h").agg(F.count(F.lit(1)).alias("d"))
    exact_doc = (
        sh.join(edf, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum(F.when(F.col("d") >= 2, 1).otherwise(0)).alias("n_c"),
        )
        .select(
            "doc_id",
            F.expr("cast(n_c * 10000 div n_sh div 1000 as int)").alias(
                "exact_decile"
            ),
        )
        .persist()
    )
    n_exact = exact_doc.count()
    print(f"exact frame: {n_exact} docs with >=1 shingle")
    hist = (
        exact_doc.groupBy("exact_decile")
        .count()
        .orderBy("exact_decile")
        .collect()
    )
    print(
        "exact-decile histogram: "
        + " ".join(f"{r.exact_decile}:{r['count']}" for r in hist)
    )

    for mod in (8, 16, 32):
        t0 = time.perf_counter()
        samp = sampled_shingle_boilerplate(docs, mod=mod)
        sampled = samp.select(
            "doc_id",
            F.expr(
                "cast(n_common * 10000 div n_sampled div 1000 as int)"
            ).alias("sampled_decile"),
            "n_sampled",
        ).localCheckpoint()
        dt = time.perf_counter() - t0
        joined = exact_doc.join(sampled, "doc_id", "left")
        agg = joined.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("sampled_decile").isNull()).cast("long")
            ).alias("unseen"),
            F.sum(
                (
                    F.col("sampled_decile").isNotNull()
                    & (F.col("sampled_decile") != F.col("exact_decile"))
                ).cast("long")
            ).alias("offdiag"),
            F.sum(
                F.when(
                    F.col("sampled_decile").isNotNull(),
                    F.abs(
                        F.col("sampled_decile") - F.col("exact_decile")
                    ),
                )
            ).alias("abs_err_sum"),
            F.sum(F.coalesce("n_sampled", F.lit(0))).alias(
                "sampled_shingles"
            ),
        ).collect()[0]
        seen = agg.n - agg.unseen
        print(
            f"mod={mod:>2}: monitor {dt:6.2f}s  "
            f"unseen {agg.unseen}/{agg.n} "
            f"({agg.unseen / agg.n:.4f})  "
            f"offdiag {agg.offdiag}/{seen} ({agg.offdiag / max(seen, 1):.4f})  "
            f"mean|err| {agg.abs_err_sum / max(seen, 1):.4f} deciles  "
            f"sampled shingles {agg.sampled_shingles}"
        )
    exact_doc.unpersist()


if __name__ == "__main__":
    main()
