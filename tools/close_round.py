"""Round-closing gate runner: one command, the full closing discipline.

    python -m tools.close_round [--skip-bench]

Runs, in order, and fails loudly on the first red:
1. full-surface sweep under a DEFAULT session (no ansi/timeZone pins —
   Spark 4 defaults ANSI ON; the driver builds its own session, so the
   surface must not depend on `get_spark`'s pins) at sf0.01, entry
   smoke included;
2. the exchange-sensitive sf0.1 gate (`tools/exchange_gate.py` — the
   volume where range-exchange boundary sampling is real; this caught
   q156's double-division median pick in r11 after the sf0.01 gate
   certified it green);
3. `bench.py` (unless --skip-bench), asserting the JSON line parses.

Each step is a fresh subprocess so session pins can't leak between
steps. This exists because the closing steps were previously a
checklist in a round note — and checklists drift (r10's roll list
missed an entry; r11 made the list mechanical, this makes the RUN
mechanical).
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)

_ANSI_SWEEP = r"""
import sys
sys.path.insert(0, %(repo)r)
sys.path.insert(0, %(repo)r + "/tests")
import __spark_entry__ as e
from pyspark.sql import SparkSession
from strict_gate import strict_compare

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "16")
         .config("spark.ui.enabled", "false").getOrCreate())
assert spark.conf.get("spark.sql.ansi.enabled") == "true", "expected ANSI-on default"
assert len(e.entry(spark).collect()) > 0, "entry smoke: 0 rows"
qs, os_ = e.queries(), e.oracle_sql()
n_red = 0
for name, fn in qs.items():
    sql = os_.get(name)
    try:
        if sql is None:
            fn(spark, "/root/testdata/sf0.01").count()
            continue
        probs = strict_compare(fn(spark, "/root/testdata/sf0.01"), sql,
                               "/root/testdata/sf0.01")
    except Exception as ex:
        probs = [repr(ex)[:300]]
    if probs:
        n_red += 1
        print("RED", name, probs, flush=True)
print("ANSI sweep:", "ALL GREEN" if not n_red else f"{n_red} RED")
sys.exit(1 if n_red else 0)
"""


def _run(argv: list[str], label: str) -> None:
    print(f"==> {label}", flush=True)
    rc = subprocess.run(argv, cwd=_REPO).returncode
    if rc != 0:
        raise SystemExit(f"close_round: {label} FAILED (rc={rc})")


def main() -> None:
    skip_bench = "--skip-bench" in sys.argv
    _run(
        [sys.executable, "-c", _ANSI_SWEEP % {"repo": _REPO}],
        "full-surface DEFAULT-session (ANSI-on) sweep @ sf0.01",
    )
    _run(
        [sys.executable, "-m", "tools.exchange_gate", "/root/testdata/sf0.1"],
        "exchange-sensitive strict gate @ sf0.1",
    )
    if not skip_bench:
        print("==> bench @ sf0.1", flush=True)
        out = subprocess.run(
            [sys.executable, "bench.py"], cwd=_REPO, capture_output=True,
            text=True,
        )
        if out.returncode != 0:
            raise SystemExit(f"close_round: bench FAILED\n{out.stderr[-500:]}")
        line = out.stdout.strip().splitlines()[-1]
        parsed = json.loads(line)  # raises on malformed line
        print(
            f"bench: value={parsed['value']} value_min={parsed['value_min']} "
            f"len={len(line)}"
        )
    print("close_round: ALL GATES GREEN")


if __name__ == "__main__":
    main()
