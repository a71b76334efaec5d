"""Round-over-round per-query floor comparison from the untrimmed bench
files — the analysis the driver's budget-trimmed stdout line cannot
support (r11 lost 16 queries' floors to the tail budget; r12 started
persisting `BENCH_LOCAL_r{N}.json`).

    python -m tools.floor_diff [N_PREV N_CUR] [--threshold-pct 30]

With no arguments, compares the two newest BENCH_LOCAL files. Prints
one line per materially-regressed query (floor-vs-floor, both the
absolute and relative delta filters must trip — small queries jitter
in absolute terms, big ones in relative terms), then a summary with
the shared-query floor totals. Exit code 1 when any regression crosses
the threshold, so a closing script can gate on it.

Floors (two-pass min), not sweep times: sweep numbers carry neighbor
effects (GC, JIT order, page cache) that two opposite-order passes
mostly cancel — the floor is the regression signal, the sweep is the
load signal (bench.py's contract since r4's false-alarm 8× "q08
regression").
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent

ABS_FLOOR_SECONDS = 0.3  # ignore sub-0.3s absolute jitter


def _local_files() -> dict[int, Path]:
    out = {}
    for p in _REPO.glob("BENCH_LOCAL_r*.json"):
        m = re.fullmatch(r"BENCH_LOCAL_r(\d+)\.json", p.name)
        if m:
            out[int(m.group(1))] = p
    return out


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    pct = 30.0
    for a in sys.argv[1:]:
        if a.startswith("--threshold-pct"):
            pct = float(a.split("=", 1)[1]) if "=" in a else pct
    files = _local_files()
    if args:
        prev_n, cur_n = int(args[0]), int(args[1])
    else:
        rounds = sorted(files)
        if len(rounds) < 2:
            print(
                f"floor_diff: need two BENCH_LOCAL files, have {len(rounds)}"
                " — nothing to compare (first round with untrimmed data)"
            )
            return 0
        prev_n, cur_n = rounds[-2], rounds[-1]
    prev = json.loads(files[prev_n].read_text())["floors"]
    cur = json.loads(files[cur_n].read_text())["floors"]
    shared = sorted(set(prev) & set(cur))
    regressions = []
    for q in shared:
        d = cur[q] - prev[q]
        if d > ABS_FLOOR_SECONDS and d > prev[q] * pct / 100.0:
            regressions.append((d, q))
    for d, q in sorted(regressions, reverse=True):
        print(
            f"REGRESSED {q}: {prev[q]:.2f}s -> {cur[q]:.2f}s "
            f"(+{d:.2f}s, +{d / prev[q] * 100:.0f}%)"
        )
    tot_prev = sum(prev[q] for q in shared)
    tot_cur = sum(cur[q] for q in shared)
    print(
        f"floor_diff r{prev_n}->r{cur_n}: {len(shared)} shared queries, "
        f"floor total {tot_prev:.1f}s -> {tot_cur:.1f}s "
        f"({tot_cur / tot_prev:.2f}x), {len(regressions)} regressed "
        f"(> {ABS_FLOOR_SECONDS}s and > {pct:.0f}%)"
    )
    new = sorted(set(cur) - set(prev))
    if new:
        print(
            f"new queries ({len(new)}): "
            + " ".join(f"{q.split('_', 1)[0]}={cur[q]:.2f}s" for q in new)
        )
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
