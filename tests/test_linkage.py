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


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_depth2_matches_brute_force(spark):
    """max_dist=2 must return EXACTLY the brute-force levenshtein<=2
    pairs (recall 1.0 and no extras) on a set exercising substitution x2,
    insert+delete, delete x2, and far-apart strings."""
    names = [
        "Customer#001",
        "Customer#092",    # two substitutions -> lev 2
        "Customer#0011",   # one insertion -> lev 1
        "Customer#01",     # one deletion -> lev 1
        "Custmer#0011",    # delete + insert vs #001 -> lev 2
        "Cstmr#001",       # three deletions -> lev 3 from #001
        "Totally#Other",
    ]
    got = {
        (r.name_a, r.name_b)
        for r in edit_distance_join(
            _names(spark, names), "c_name", max_dist=2
        ).collect()
    }
    want = {
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1:]
        if _lev(a, b) <= 2
    }
    want = {(min(a, b), max(a, b)) for a, b in want}
    assert got == want, (sorted(got - want), sorted(want - got))
    assert ("Customer#001", "Customer#092") in got  # lev-2 found
    assert not any("Cstmr#001" in p and "Customer#001" in p for p in got)


def test_depth2_refuses_quadratic_identifiers(spark):
    with pytest.raises(RuntimeError, match="quadratic|64"):
        edit_distance_join(_names(spark, ["x" * 100]), "c_name", max_dist=2)


def test_unsupported_depth_raises(spark):
    with pytest.raises(NotImplementedError):
        edit_distance_join(_names(spark, ["ab"]), "c_name", max_dist=3)


def test_depth2_matches_brute_force_random_corpus(spark):
    """Fixed-seed random corpus over a tiny alphabet (maximizes digit-
    shift coincidences and length mixing): depth-2 must equal brute
    force exactly — the randomized complement to the handcrafted cases."""
    import random

    rng = random.Random(42)
    names = list({
        "".join(rng.choice("abc1") for _ in range(rng.randint(1, 7)))
        for _ in range(60)
    })
    got = {
        (r.name_a, r.name_b)
        for r in edit_distance_join(
            _names(spark, names), "c_name", max_dist=2
        ).collect()
    }
    want = {
        (min(a, b), max(a, b))
        for i, a in enumerate(names)
        for b in names[i + 1:]
        if _lev(a, b) <= 2
    }
    assert got == want, (sorted(got - want)[:5], sorted(want - got)[:5])
    assert len(want) > 50  # the corpus actually exercises the join
