"""Scalar-function library (SURVEY.md §2.8 X1-X11).

Thin, composable Column helpers for the semantic gaps between T-SQL and
Spark SQL. Everything stays a Catalyst expression (whole-stage codegen);
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from salesanalytics_etl_spark.schemas import DEC182


def concat_tsql(*cols: Column | str, sep: str = " ") -> Column:
    """NULL-as-empty string concat — T-SQL ``CONCAT(a,' ',b)`` semantics.

    T-SQL CONCAT treats NULL args as '' (reference queries.sql:68); Spark's
    plain ``concat`` returns NULL if ANY arg is NULL (SURVEY.md §2.8 X6).
    ``concat_ws`` skips NULLs entirely (which also drops the separator), so
    for exact parity we coalesce each arg to '' and join with the separator.
    """
    parts = [F.coalesce(F.col(c) if isinstance(c, str) else c, F.lit("")) for c in cols]
    out = parts[0]
    for p in parts[1:]:
        out = F.concat(out, F.lit(sep), p)
    return out


def null_label(col: Column | str, label: str = "(NULL)") -> Column:
    """``ISNULL(x, '(NULL)')`` (reference queries.sql:82) → coalesce."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(c, F.lit(label))


def year_month(col: Column | str) -> Column:
    """``CONVERT(char(7), ts, 126)`` → 'YYYY-MM' (reference queries.sql:41)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, "yyyy-MM")


def safe_div(num: Column, den: Column, scale: int = 2) -> Column:
    """Guarded division: NULL when denominator is not > 0.

    Mirrors ``CASE WHEN Quantity > 0 THEN TotalPrice/Quantity END`` with a
    round to ``scale`` (reference queries.sql:141-143). ``otherwise`` is
    omitted → NULL, exactly the reference's ELSE NULL.

    Rounding is ``floor(x*10^s + 0.5)/10^s`` — NOT engine-native ROUND:
    the quotient is an arbitrary double, and on values like 21.40/8 =
    2.675 (stored 2.67499…) Spark's shortest-repr HALF_UP rounds UP while
    a scale-and-rint path rounds DOWN. The floor formula runs the same
    IEEE ops on the same input in any engine, so both sides agree by
    construction; the oracle twin must spell the identical formula.
    Positive-domain only (prices/quantities) — fine for the guarded
    ``den > 0`` branch with non-negative numerators.
    """
    mult = F.lit(float(10 ** scale))
    return F.when(den > 0, F.floor(num / den * mult + F.lit(0.5)) / mult)


def floor_round(col: Column, scale: int) -> Column:
    """Engine-portable round-half-up to ``scale`` decimals:
    ``floor(x*10^s + 0.5)/10^s`` — the general form of
    :func:`floor_cents` / :func:`safe_div`'s rounding.

    Use for ANY gate-surface double that can sit EXACTLY on a
    ``scale+1``-decimal midpoint — ratios of small integers (jaccard
    intersect/union, quality character ratios, dup-window rates,
    late-rates), quotients of decimal-grid sums — where engine-native
    ROUND diverges (Spark shortest-repr HALF_UP vs DuckDB rint-class;
    q104 lost 3 docs to this at sf0.1 in round 10). Values that cannot
    terminate (log/sqrt/cosine derivations) may keep native ROUND.
    Works on negatives too (rounds half toward +inf on both engines) —
    what matters for the gate is both engines running the SAME IEEE
    ops. The oracle twin must spell the identical formula.
    """
    m = F.lit(float(10 ** scale))
    return F.floor(col * m + F.lit(0.5)) / m


def floor_cents(col: Column) -> Column:
    """Round a non-negative double to cents via the engine-portable
    floor formula ``floor(x*100 + 0.5)/100.0`` — the same convention as
    :func:`safe_div` (see its docstring for why engine-native ROUND
    diverges across Spark/DuckDB on interpolated midpoints). Used by
    every percentile/interpolation query; the oracle twin must spell
    the identical formula."""
    return F.floor(col * F.lit(100.0) + F.lit(0.5)) / F.lit(100.0)


def money_out(col: Column | str, scale: int = 2) -> Column:
    """Terminal money cast for the gate surface: ROUND(CAST(x AS DOUBLE), s).

    Accumulate in DECIMAL (exact, order-insensitive — see :func:`dec182`),
    but EMIT double: the driver's hasher formats a Spark DECIMAL as
    ``1234.40`` while the DuckDB side renders the same value ``1234.4``,
    so any decimal column in a multi-row result hash-mismatches even when
    value-equal (round-1 verdict: 16/16 red rows were exactly this).
    Both engines cast the identical exact decimal to the same nearest
    double, and ROUND(x, s) of a value already on the s-decimal grid can't
    land near a tie — so the doubles match bit-for-bit. Apply to every
    money column in a final select, never to intermediate aggregates.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double"), scale)


def dec182(col: Column | str) -> Column:
    """Cast to DECIMAL(18,2) — the reference's money type (SURVEY.md §1.3).

    Summing DECIMAL instead of DOUBLE makes aggregates exact and
    order-insensitive, which is what lets Spark results hash-match the
    DuckDB oracle regardless of partitioning/merge order.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(DEC182)
