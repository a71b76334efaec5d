"""10× scale probe: replicate sf0.1 tables with shifted keys and time
registered queries against the replica vs the base.

Usage:
    python tools/scale_probe.py q94 q100 q107

Construction matches the round-4/5 probes recorded in SCALE.md: each
table is unioned 10× with primary/foreign keys shifted by
``i * (max_key + 1)`` so referential integrity holds per replica and the
key domains grow with the data (string identifiers embedding a key get
the shifted key re-embedded). Every timing is a WARM second run in one
local[32] session — the probe measures scaling shape, not JVM startup.
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# r10 verdict item 4: the heaviest family's 100× behavior (bucket-cap hit
# rates, candidate budgets) diverges beyond the 10× probes — the factor
# is env-tunable so the text/dedup family can probe at 30×+
FACTOR = int(os.environ.get("SPARK_GRAFT_PROBE_FACTOR", "10"))
# r12 verdict gap #2: exact-copy replication probes the DEGENERATE
# duplicate regime (every doc a J=1.0 clique). With EDITNOISE=1 each
# document replica i>0 is instead a deterministic ~10%-token-drop
# variant (salt 'rep{i}'), so replicas of one base doc form a clique of
# REALISTIC near-duplicates (pairwise shingle Jaccard ~0.6-0.85) — the
# regime LSH/SimHash bucketing actually faces at 100 TB.
EDITNOISE = os.environ.get("SPARK_GRAFT_PROBE_EDITNOISE", "") == "1"
# EDITMODE=mixed makes each replica a delete+replace+insert variant
# (operators/editnoise.py mixed mode) instead of drop-only — the
# shingle-ADDING clique regime for the r14 recall probes;
# EDITMODE=reorder permutes 8 token runs per replica (r15 — the
# token-multiset-preserving regime)
EDITMODE = os.environ.get("SPARK_GRAFT_PROBE_EDITMODE", "drop")
_MODE_SUFFIX = {"drop": "en", "mixed": "enm", "reorder": "enr"}
PROBE = os.environ.get(
    "SPARK_GRAFT_PROBE_DIR",
    f"/tmp/probe{FACTOR}x"
    + (_MODE_SUFFIX.get(EDITMODE, "en") if EDITNOISE else ""),
)

# per-table key columns to shift; (col, parent_table, parent_key) for FKs
_SHIFTS: dict[str, list[tuple[str, str]]] = {
    # col -> key-domain name (cols sharing a name shift by the same base)
    "customer": [("c_custkey", "custkey")],
    "orders": [("o_orderkey", "orderkey"), ("o_custkey", "custkey")],
    "lineitem": [("l_orderkey", "orderkey"), ("l_partkey", "partkey")],
    "part": [("p_partkey", "partkey")],
    "events": [("event_id", "eventid"), ("user_id", "userid")],
    "documents": [("doc_id", "docid")],
    "embeddings": [("vec_id", "vecid")],
}


def build(spark, tables: list[str]) -> None:
    from pyspark.sql import functions as F

    os.makedirs(PROBE, exist_ok=True)
    # one shift base per key DOMAIN so FKs stay consistent across tables
    dom_base: dict[str, int] = {}
    frames = {}
    for t in tables:
        df = spark.read.parquet(f"{BASE}/{t}.parquet")
        frames[t] = df
        for col, dom in _SHIFTS.get(t, []):
            if col in df.columns:
                hi = df.agg(F.max(col)).collect()[0][0] or 0
                dom_base[dom] = max(dom_base.get(dom, 0), int(hi) + 1)
    for t in tables:
        out = f"{PROBE}/{t}.parquet"
        if os.path.exists(out):
            shutil.rmtree(out)
        df = frames[t]
        reps = []
        for i in range(FACTOR):
            rep = df
            for col, dom in _SHIFTS.get(t, []):
                if col in rep.columns:
                    rep = rep.withColumn(
                        col, F.col(col) + F.lit(i * dom_base[dom])
                    )
            # c_name embeds the key ("Customer#000001") — re-embed so
            # name-keyed operators (q108) see a 10× identifier space
            if t == "customer" and i > 0:
                rep = rep.withColumn(
                    "c_name",
                    F.format_string("Customer#%09d", F.col("c_custkey")),
                )
            if t == "documents" and i > 0 and EDITNOISE:
                from salesanalytics_etl_spark.operators.editnoise import (
                    perturbed_text,
                )
                from salesanalytics_etl_spark.operators.text import (
                    normalize_text,
                )

                # perturb with the UNSHIFTED base id so the variant is a
                # pure function of (base doc, replica) — the GT pairing
                # in tools/editnoise_probe.py recovers base via modulo.
                # perturbed_text takes SQL expression strings (r17), so
                # the computed inputs are staged as columns first.
                rep = (
                    rep.withColumn(
                        "_pbase",
                        F.col("doc_id") - F.lit(i * dom_base["docid"]),
                    )
                    .withColumn("_pnorm", normalize_text(F.col("text")))
                    .withColumn(
                        "text",
                        perturbed_text(
                            "_pbase", "_pnorm",
                            salt=f"rep{i}", edits=EDITMODE,
                        ),
                    )
                    .drop("_pbase", "_pnorm")
                )
            reps.append(rep)
        big = reps[0]
        for r in reps[1:]:
            big = big.unionByName(r)
        big.write.mode("overwrite").parquet(out)
        print(f"built {out}")


def main() -> None:
    from salesanalytics_etl_spark.plans import all_queries
    from salesanalytics_etl_spark.session import get_spark

    args = sys.argv[1:]
    skip_build = "--no-build" in args
    prefixes = [a for a in args if not a.startswith("--")]
    if not prefixes:
        raise SystemExit("usage: scale_probe.py [--no-build] qNN [qNN ...]")
    queries = all_queries()
    picked = {
        name: fn
        for name, fn in queries.items()
        if any(name == p or name.startswith(p + "_") for p in prefixes)
    }
    if len(picked) != len(prefixes):
        raise SystemExit(f"matched {sorted(picked)} for {prefixes}")

    spark = get_spark(app_name="scale_probe")
    tables = sorted(
        {
            t
            for t in _SHIFTS
            if os.path.exists(f"{BASE}/{t}.parquet")
        }
    )
    os.makedirs(PROBE, exist_ok=True)
    # nation/region/supplier are tiny dims — copy unshifted if referenced
    for t in ("nation", "region", "supplier"):
        src, dst = f"{BASE}/{t}.parquet", f"{PROBE}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            if os.path.isdir(src):
                shutil.copytree(src, dst)
            else:
                shutil.copy(src, dst)
    if not skip_build:
        build(spark, tables)

    jvm_gc = spark._jvm.System.gc  # noqa: SLF001
    for name, fn in picked.items():
        for label, d in (("sf0.1", BASE), (f"{FACTOR}x", PROBE)):
            fn(spark, d).toPandas()  # warm (cache footers, JIT)
            runs = []
            for _ in range(2):
                jvm_gc()  # don't bill the build phase's heap to a query
                t0 = time.perf_counter()
                out = fn(spark, d).toPandas()
                runs.append(time.perf_counter() - t0)
            print(
                f"{name} @ {label}: {min(runs):.2f}s "
                f"(runs {[round(r, 2) for r in runs]}), {len(out)} rows",
                flush=True,
            )


if __name__ == "__main__":
    main()
