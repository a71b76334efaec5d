"""Deletion-neighborhood edit-distance join (operators/linkage.py):
recall-1.0 typo linkage on planted cases; the oracle sweep hash-checks
q108 against the DuckDB brute force on real data."""

from __future__ import annotations

import pytest

from salesanalytics_etl_spark.operators.linkage import edit_distance_join


def _names(spark, names):
    return spark.createDataFrame([(n,) for n in names], "c_name string")


def _pairs(spark, names):
    return {
        (r.name_a, r.name_b)
        for r in edit_distance_join(
            _names(spark, names), "c_name", max_dist=1
        ).collect()
    }


def test_substitution_insertion_deletion_found(spark):
    got = _pairs(
        spark,
        [
            "Customer#001",
            "Customer#091",   # substitution (one char differs)
            "Customer#0011",  # insertion (one char added)
            "Customer#01",    # deletion (one char removed)
            "Totally#Other",
        ],
    )
    assert ("Customer#001", "Customer#091") in got
    assert ("Customer#001", "Customer#0011") in got
    assert ("Customer#001", "Customer#01") in got
    assert not any("Totally#Other" in p for pair in got for p in pair)


def test_distance_two_not_paired(spark):
    # two substitutions = lev 2 — must NOT appear at max_dist=1
    got = _pairs(spark, ["Customer#001", "Customer#992"])
    assert got == set()


def test_shared_prefix_does_not_cross_pair(spark):
    # every name shares a long literal prefix (the case that collapses
    # prefix blocking); only the true 1-edit pair may surface
    names = [f"Customer#00000000{i}" for i in range(10)] + ["Customer#0000000011"]
    got = _pairs(spark, names)
    # all single-digit-final pairs are lev 1 among themselves: C(10,2)=45
    within = {(a, b) for (a, b) in got if len(a) == len(b)}
    assert len(within) == 45
    # the 11-suffix name pairs only with names one edit away
    long_pairs = got - within
    assert all("Customer#0000000011" in p for p in long_pairs)


def test_duplicates_collapse_to_distinct_values(spark):
    got = _pairs(spark, ["AA", "AA", "AB"])
    assert got == {("AA", "AB")}


def test_depth_two_unsupported(spark):
    with pytest.raises(NotImplementedError):
        edit_distance_join(_names(spark, ["x"]), "c_name", max_dist=2)
