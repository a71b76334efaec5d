"""Benchmark harness — times the engine's headline queries.

Runs every registered query at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing is per-query wall clock around a full materialization via
Arrow (``toPandas``) — full result transfer to the client, minus the
Py4J row-deserialization artifact that plain ``collect()`` adds (which
would dominate the 100k+-row queries and measure the wrong thing).
JVM/session startup is excluded (fixed cost, not a query cost).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from salesanalytics_etl_spark.plans import all_queries
    from salesanalytics_etl_spark.session import get_spark

    spark = get_spark(app_name="bench")
    queries = all_queries()
    # qNN prefixes must be unique (they become the compact JSON keys) —
    # fail BEFORE the multi-minute sweep, not after it
    prefixes = {n.split("_", 1)[0] for n in queries}
    assert len(prefixes) == len(queries), "duplicate qNN prefix in query names"

    # Warm the JVM with the flagship once, then touch every table's
    # parquet footers + pages so first-scan penalties (footer parse, OS
    # page-cache misses) don't land on whichever query alphabetically
    # reads a table first — that cost is layout-fixed, not query work.
    queries["q03_sales_by_day"](spark, sf_dir).toPandas()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
    # Spawn all Python workers once (daemon + per-core workers + Arrow
    # init): ~5s that would otherwise land on whichever query first
    # crosses the Python boundary (measured on q101 — 7.3s cold vs 2.1s
    # warm at sf0.1). Worker spawn is deployment-fixed, not query work.
    spark.range(256).repartition(int(spark.sparkContext.defaultParallelism)) \
        .mapInPandas(lambda it: it, schema="id long").count()

    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    jvm_gc = spark._jvm.System.gc  # noqa: SLF001
    for name in sorted(queries):
        # Collect garbage BETWEEN queries: single-JVM sweeps otherwise
        # attribute one query's accumulated heap to a random successor's
        # mid-run GC pause (the round-4 q08 "8x regression" was exactly
        # this — isolated runs showed 1x).
        jvm_gc()
        t0 = time.perf_counter()
        try:
            queries[name](spark, sf_dir).toPandas()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as ex:  # one broken query must not zero the round
            errors[name] = f"{type(ex).__name__}: {ex}"[:200]

    # The driver parses this line from a bounded tail of stdout (~2000
    # chars), so the line must stay short: keys are compacted to the qNN
    # prefix, times to 2 decimals, separators minimal. (Rounds 2-3 emitted
    # full names for 90 queries → >2000 chars → the driver recorded
    # ``parsed: null``.)
    short = {name.split("_", 1)[0]: round(t, 2) for name, t in timings.items()}
    # qNN prefixes must be unique or two queries silently share one slot
    assert len(short) == len(timings), "duplicate qNN prefix in query names"
    out = {
        "metric": "total_query_wall_seconds",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": short,
        "sf": sf,
    }
    if errors:
        out["errors"] = {
            name.split("_", 1)[0]: msg[:40] for name, msg in list(errors.items())[:5]
        }
    line = json.dumps(out, separators=(",", ":"))
    if len(line) > 1900:  # last-resort guard: drop per-query detail, keep total
        out.pop("queries", None)
        line = json.dumps(out, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
