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


def main() -> None:
    from pyspark.sql import functions as F

    from salesanalytics_etl_spark.operators.dedup import (
        md5_token_hash,
        sampled_shingle_boilerplate,
        shingle_rows,
    )
    from salesanalytics_etl_spark.session import get_spark

    spark = get_spark(app_name="samplerate_probe")
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
