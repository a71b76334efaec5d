"""Strict local replica of the driver's correctness gate.

The round-1 verdict showed the driver's hasher renders a Spark DECIMAL as
'1234.40' where the same value on a double path renders '1234.4' — so the
robust rule is NO decimal columns on either side of the gate surface.  This
harness enforces that rule structurally (flags DecimalType Spark columns and
Decimal oracle values) and value-compares everything else exactly (floats by
repr, i.e. bit-identical).  Run as a script to sweep all registered queries:

    python -m tests.strict_gate [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime
from decimal import Decimal

import duckdb

from salesanalytics_etl_spark.schemas import DRIVER_TABLES


def run_oracle(sql: str, sf_dir: str):
    import os

    con = duckdb.connect()
    for t in DRIVER_TABLES:
        # driver testdata ships single parquet FILES; Spark-written probe
        # tables (tools/scale_probe.py) are DIRECTORIES of part files —
        # glob those so the oracle can gate at probe volumes too
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, Decimal):
        # Compare decimals through their double rendering: this is the
        # representation the driver's "double path" uses, so a Decimal
        # '1234.40' meeting a double 1234.4 compares equal here — the
        # no-decimal-columns rule (enforced separately) is what protects
        # the real gate.
        return repr(float(v))
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    if type(v).__module__ == "numpy":  # numpy scalars
        return _norm(v.item())
    return v


def _canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def strict_compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Return a list of problems (empty == green)."""
    problems = []
    from pyspark.sql.types import DecimalType

    for f in spark_df.schema.fields:
        if isinstance(f.dataType, DecimalType):
            problems.append(f"decimal column on gate surface: {f.name}")
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    o_cols, o_rows = run_oracle(oracle_sql, sf_dir)
    for i, c in enumerate(o_cols):
        if any(isinstance(r[i], Decimal) for r in o_rows[:50]):
            problems.append(f"decimal column on oracle surface: {c}")
    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: {sorted(s_cols)} vs {sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count: spark={len(s_rows)} oracle={len(o_rows)}")
        return problems
    sc, oc = _canon(s_cols, s_rows), _canon(o_cols, o_rows)
    bad = [(a, b) for a, b in zip(sc, oc) if a != b]
    if bad:
        problems.append(f"{len(bad)} row mismatches; first: {bad[0]}")
    return problems


def run_gate(spark, sf_dir: str, only: set[str] | None = None) -> int:
    """Sweep (a subset of) the oracle-backed surface; returns shell rc."""
    import __spark_entry__ as entry

    qs, oracles = entry.queries(), entry.oracle_sql()
    n_red = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        if sql is None:
            continue
        try:
            probs = strict_compare(fn(spark, sf_dir), sql, sf_dir)
        except Exception as e:  # noqa: BLE001
            probs = [f"exception: {e!r:.300}"]
        tag = "GREEN" if not probs else "RED"
        n_red += bool(probs)
        print(f"{tag} {name}" + (f" :: {probs}" if probs else ""), flush=True)
    print(f"{'ALL GREEN' if not n_red else f'{n_red} RED'}")
    return 1 if n_red else 0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from salesanalytics_etl_spark.session import get_spark

    return run_gate(get_spark(), sf_dir, only)


if __name__ == "__main__":
    raise SystemExit(main())
