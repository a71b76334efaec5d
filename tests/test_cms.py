"""Count-min sketch (operators/sketches.py) and the hash-sampled
boilerplate estimator (operators/dedup.py) — the r13 monitor family's
operator-grain contracts: one-sided CMS error, SUM-mergeability of the
(i, b) counter grain, and the sampling estimator degenerating to the
exact q177 counts at mod=1."""

from __future__ import annotations

from pyspark.sql import functions as F


def _freq_rows(spark):
    # skewed key stream: key k appears k+1 times (k = 0..29)
    rows = [(k,) for k in range(30) for _ in range(k + 1)]
    return spark.createDataFrame(rows, "k BIGINT").select(
        F.xxhash64("k").bitwiseAND(F.lit((1 << 60) - 1)).alias("h"), "k"
    )


def test_cms_estimate_is_one_sided_and_tight_on_small_domain(spark):
    from salesanalytics_etl_spark.operators.sketches import (
        cms_build,
        cms_lookup,
    )

    data = _freq_rows(spark)
    cms = cms_build(data, "h")
    exact = data.groupBy("k", "h").agg(F.count(F.lit(1)).alias("n"))
    est = cms_lookup(exact, cms, "h")
    rows = est.select("k", "n", "dhat").collect()
    assert len(rows) == 30
    for r in rows:
        assert r.dhat >= r.n  # CMS never underestimates
    # 30 keys into 4x2048 buckets: collisions are essentially impossible,
    # so the estimate is EXACT here — any slack means a hashing bug
    assert all(r.dhat == r.n for r in rows)


def test_cms_counters_merge_by_sum(spark):
    """The (i, b) grain must be mergeable by SUM — shard sketches combine
    with the same groupBy (what a streaming maintenance job does)."""
    from salesanalytics_etl_spark.operators.sketches import cms_build

    data = _freq_rows(spark)
    a = data.filter(F.col("k") < 15)
    b = data.filter(F.col("k") >= 15)
    whole = sorted(map(tuple, cms_build(data, "h").collect()))
    merged = sorted(
        map(
            tuple,
            cms_build(a, "h")
            .unionByName(cms_build(b, "h"))
            .groupBy("i", "b")
            .agg(F.sum("c").alias("c"))
            .collect(),
        )
    )
    assert merged == whole


def test_cms_lookup_unseen_key_reads_zero_or_collision(spark):
    from salesanalytics_etl_spark.operators.sketches import (
        cms_build,
        cms_lookup,
    )

    data = _freq_rows(spark)
    cms = cms_build(data, "h")
    probe = spark.createDataFrame([(999999,)], "k BIGINT").select(
        F.xxhash64("k").bitwiseAND(F.lit((1 << 60) - 1)).alias("h")
    )
    got = cms_lookup(probe, cms, "h").collect()[0].dhat
    assert got >= 0  # one-sided; 0 unless it collides on every row


def test_sampled_boilerplate_mod1_equals_exact(spark):
    """mod=1 keeps every shingle — the estimator must then reproduce the
    exact q177 per-doc (n_shingles, n_common) counts verbatim."""
    from salesanalytics_etl_spark.operators.dedup import (
        md5_token_hash,
        sampled_shingle_boilerplate,
        shingle_rows,
    )

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox naps under the shady tree"),
            (3, "completely unrelated text about spark plans"),
        ],
        "doc_id BIGINT, text STRING",
    )
    sh = (
        shingle_rows(docs)
        .select("doc_id", md5_token_hash(F.col("sh")).alias("h"))
        .distinct()
    )
    edf = sh.groupBy("h").agg(F.count(F.lit(1)).alias("d"))
    exact = {
        r.doc_id: (r.n, r.c)
        for r in sh.join(edf, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("d") >= 2, 1).otherwise(0)).alias("c"),
        )
        .collect()
    }
    got = {
        r.doc_id: (r.n_sampled, r.n_common)
        for r in sampled_shingle_boilerplate(docs, mod=1).collect()
    }
    assert got == exact


def test_sampled_boilerplate_df_is_exact_for_kept_shingles(spark):
    """Sampling selects shingle IDENTITIES, so a kept shingle's
    doc-frequency equals its true df — shared shingles that survive the
    hash filter must count as common in EVERY doc containing them."""
    from salesanalytics_etl_spark.operators.dedup import (
        md5_token_hash,
        sampled_shingle_boilerplate,
        shingle_rows,
    )

    # two identical docs: every kept shingle has df=2, so n_common must
    # equal n_sampled exactly (no pair-level sampling loss)
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
        ],
        "doc_id BIGINT, text STRING",
    )
    rows = sampled_shingle_boilerplate(docs, mod=4).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.n_sampled > 0
        assert r.n_common == r.n_sampled
    # and the kept set is the deterministic h % 4 == 0 slice
    sh = (
        shingle_rows(docs)
        .select("doc_id", md5_token_hash(F.col("sh")).alias("h"))
        .distinct()
    )
    expected = (
        sh.filter(F.col("h") % 4 == 0).groupBy("doc_id").count().collect()
    )
    assert {r.doc_id: r["count"] for r in expected} == {
        r.doc_id: r.n_sampled for r in rows
    }
