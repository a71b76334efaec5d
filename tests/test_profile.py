"""profile_columns — planted-case and shape tests.

The operator's contract: one row per profiled column, counts as SQL
aggregates would give them (NULLs out of distinct/min/max/top), typed
min/max (never lexicographic), deterministic modal tie-break on the
larger rendered string, and survival of empty / all-NULL inputs.
"""

import pytest
from pyspark.sql import functions as F

from salesanalytics_etl_spark.operators.profile import profile_columns


def _by_col(df):
    return {r.col_name: r.asDict() for r in df.collect()}


def test_profile_basic_counts_and_minmax(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "b", None), (2, None, 10.0), (10, "b", 2.5)],
        "k INT, s STRING, v DOUBLE",
    )
    got = _by_col(profile_columns(df))
    assert got["k"] == {
        "col_name": "k", "n_rows": 4, "n_nulls": 0, "n_distinct": 3,
        # typed min/max: 10 > 2 numerically even though '10' < '2'
        "min_value": "1", "max_value": "10",
        "top_value": "2", "top_count": 2,
    }
    assert got["s"]["n_nulls"] == 1
    assert got["s"]["n_distinct"] == 2
    assert got["s"]["top_value"] == "b"
    assert got["s"]["top_count"] == 2
    assert got["v"]["min_value"] == "2.5"
    assert got["v"]["max_value"] == "10.0"


def test_profile_modal_tie_breaks_on_larger_value(spark):
    df = spark.createDataFrame([("x",), ("y",), ("x",), ("y",)], ["c"])
    got = _by_col(profile_columns(df))
    assert (got["c"]["top_value"], got["c"]["top_count"]) == ("y", 2)


def test_profile_all_null_and_empty_columns_survive(spark):
    df = spark.createDataFrame([(None,), (None,)], "c STRING")
    got = _by_col(profile_columns(df))
    assert got["c"] == {
        "col_name": "c", "n_rows": 2, "n_nulls": 2, "n_distinct": 0,
        "min_value": None, "max_value": None,
        "top_value": None, "top_count": None,
    }
    empty = spark.createDataFrame([], "a INT, b STRING")
    got = _by_col(profile_columns(empty))
    assert set(got) == {"a", "b"}
    for c in ("a", "b"):
        assert (got[c]["n_rows"], got[c]["n_nulls"], got[c]["n_distinct"]) \
            == (0, 0, 0)
        assert got[c]["min_value"] is None and got[c]["top_value"] is None


def test_profile_custom_render_applies_to_values_and_minmax(spark):
    df = spark.createDataFrame(
        [(1.004,), (1.006,), (2.5,)], "v DOUBLE"
    )
    cents = lambda c: F.floor(c * F.lit(100.0) + F.lit(0.5)).cast("bigint")
    got = _by_col(profile_columns(df, renders={"v": cents}))
    # distinct over the RENDERED grid: 1.004→100, 1.006→101, 2.5→250
    assert got["v"]["n_distinct"] == 3
    assert got["v"]["min_value"] == "100"   # render applied to typed min
    assert got["v"]["max_value"] == "250"


def test_profile_column_subset_and_validation(spark):
    df = spark.createDataFrame([(1, "a")], ["k", "s"])
    assert profile_columns(df, columns=["s"]).count() == 1
    with pytest.raises(ValueError, match="not in input"):
        profile_columns(df, columns=["nope"])
    with pytest.raises(ValueError, match="no columns"):
        profile_columns(df, columns=[])
    with pytest.raises(ValueError, match="renders for"):
        profile_columns(df, columns=["k"], renders={"s": lambda c: c})


def test_profile_single_shuffle_over_data(spark):
    """The data-scaled stage must be ONE exchange: scan → stack →
    partial agg → exchange. Bounded-side joins are broadcast."""
    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("m")
    )
    plan = profile_columns(df)._jdf.queryExecution().executedPlan().toString()
    # the per-value shuffle + the two-phase top-k's bounded window are
    # expected; no SortMergeJoin anywhere (all joins broadcast)
    assert "SortMergeJoin" not in plan


def test_profile_rejects_quote_backtick_column_names(spark):
    import pytest

    from salesanalytics_etl_spark.operators.profile import profile_columns

    df = spark.range(3).selectExpr("id AS `it``s`", "id AS ok")
    with pytest.raises(ValueError, match="quotes/"):
        profile_columns(df)
    # the clean column alone still profiles
    assert profile_columns(df, ["ok"]).count() == 1
