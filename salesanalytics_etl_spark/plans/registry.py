"""Query registry — the engine's query surface.

Each query registers a Spark callable ``(spark, sf_dir) -> DataFrame`` plus
(when SQL-expressible) a DuckDB-ANSI oracle string over the same parquet
tables. The driver's correctness gate compares the two (row-count + schema +
order-insensitive value hash), so EVERY computed column is aliased to the
same name on both sides, monetary aggregates are summed as DECIMAL(18,2)
(exact, order-insensitive — immune to partitioning), and double-valued
derivations round identically.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = ""):
    """Decorator: add a query to the engine surface."""

    def wrap(fn: SparkQuery) -> SparkQuery:
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return wrap


def all_queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle is not None
    }


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import salesanalytics_etl_spark.plans.queries  # noqa: F401
    import salesanalytics_etl_spark.plans.extensions  # noqa: F401
