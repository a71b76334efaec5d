"""Closing gate for exchange-sensitive queries — run once before a round
closes: ``python -m tools.exchange_gate [sf_dir]`` (default sf0.1).

Round 10's rank bug proved the sf0.01 oracle gate is structurally blind
to range-exchange boundary-sampling divergence: ``repartitionByRange``
reservoir-samples its boundaries, and at sf0.01 the sample covers every
row, so two independent materializations agree BY LUCK. Every query that
rides a range exchange (the rank/NTILE/prefix-sum machinery, shard
export, z-order write) must therefore re-gate at a volume where sampling
is real — sf0.1.

The query list is DERIVED, never hardcoded (round-10's hand-kept roll
list missed an entry; this class of bookkeeping must be mechanical):
building each registered query bumps ``telemetry.counters
["range_exchange"]`` inside the operators that own a range exchange, so
a new query adopting the machinery is swept automatically. Discovery
builds plans at sf0.001 (the eager checkpoints run tiny jobs); the gate
then strict-compares the discovered queries against their DuckDB
oracles at the target SF.
"""

from __future__ import annotations

import sys
import time


def exchange_sensitive_queries(spark, discover_sf: str) -> list[str]:
    """Names of registered queries whose plan construction uses a
    range exchange, discovered by counter-diffing each build."""
    from salesanalytics_etl_spark import telemetry
    from salesanalytics_etl_spark.plans import all_queries

    out = []
    for name, fn in all_queries().items():
        before = telemetry.counters.get("range_exchange", 0)
        try:
            fn(spark, discover_sf)
        except Exception as ex:  # discovery must be total — fail loud
            raise RuntimeError(f"building {name} at {discover_sf}: {ex!r}")
        if telemetry.counters.get("range_exchange", 0) > before:
            out.append(name)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from salesanalytics_etl_spark.session import get_spark
    from tests.strict_gate import run_gate

    spark = get_spark(app_name="exchange_gate")
    t0 = time.time()
    names = exchange_sensitive_queries(spark, "/root/testdata/sf0.001")
    print(
        f"exchange-sensitive queries ({len(names)}, discovered "
        f"{time.time() - t0:.0f}s): {' '.join(names)}",
        flush=True,
    )
    return run_gate(spark, sf_dir, set(names))


if __name__ == "__main__":
    raise SystemExit(main())
