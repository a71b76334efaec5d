"""Oracle-differential tests for the full query surface (SURVEY.md §5.2).

Mirrors the driver's gate: each ``queries()`` entry vs its ``oracle_sql()``
twin on sf0.001, order-insensitive.
"""

from __future__ import annotations

import pytest

from salesanalytics_etl_spark.plans import all_oracles, all_queries
from tests.strict_gate import strict_compare

QUERIES = all_queries()
ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    problems = strict_compare(df, ORACLES[name], sf_dir)
    assert not problems, problems


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_decimal_on_gate_surface(spark, sf_dir, name):
    """The driver's hasher renders Spark DECIMALs '1234.40' vs the double
    path's '1234.4' (round-1 verdict: all 16 red rows were exactly this),
    so the gate surface must never emit DecimalType — accumulate decimal,
    emit money_out (rounded double)."""
    from pyspark.sql.types import DecimalType

    schema = QUERIES[name](spark, sf_dir).schema
    bad = [f.name for f in schema.fields if isinstance(f.dataType, DecimalType)]
    assert not bad, f"{name} emits decimal columns: {bad}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"order_date", "total_sales"}
