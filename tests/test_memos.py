"""The three materialize-once memos (LSH banding, IVF cell assignment,
exact-top-k ground truth) must be value-transparent: cached results
byte-equal the uncached operator, keys distinguish different inputs,
and eviction is FIFO (oldest first — dict insertion order, never
popitem's LIFO, which would thrash the newest entry)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id BIGINT, text STRING"
    )


def test_banded_memo_value_transparent_and_keyed(spark):
    from salesanalytics_etl_spark.operators import dedup as D

    df1 = _docs(spark, ["hello world one", "hello world two"])
    df2 = _docs(spark, ["completely different corpus text"])
    plain = sorted(map(tuple, D._portable_banded(df1).collect()))
    cached = sorted(map(tuple, D._portable_banded_cached(df1).collect()))
    assert cached == plain
    # a second call returns the SAME checkpointed frame (no recompute)
    again = D._portable_banded_cached(df1)
    assert again is D._portable_banded_cached(df1)
    # different input -> different entry, not a stale hit
    other = sorted(map(tuple, D._portable_banded_cached(df2).collect()))
    assert other != cached


def test_assignment_memo_value_transparent(spark):
    from salesanalytics_etl_spark.operators import ivf as I

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.5]) for i in range(20)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    plain = sorted(
        map(tuple, I.portable_cell_assignment(emb, n_cells=4).collect())
    )
    cached = sorted(
        map(tuple, I.portable_cell_assignment_cached(emb, n_cells=4).collect())
    )
    assert cached == plain
    # n_cells participates in the key
    other = I.portable_cell_assignment_cached(emb, n_cells=2)
    assert other is not I.portable_cell_assignment_cached(emb, n_cells=4)


def test_bruteforce_memo_value_transparent(spark):
    from salesanalytics_etl_spark.operators import similarity as S

    emb = spark.createDataFrame(
        [(i, [float(i % 5), float(i % 3), 1.0]) for i in range(15)],
        "vec_id BIGINT, embedding ARRAY<FLOAT>",
    )
    q = emb.filter(F.col("vec_id") < 2)
    plain = sorted(
        map(tuple, S.cosine_topk_bruteforce(emb, q, k=3).collect())
    )
    cached = sorted(
        map(tuple, S.cosine_topk_bruteforce_cached(emb, q, k=3).collect())
    )
    assert cached == plain


def test_memo_eviction_is_fifo_oldest_first(spark):
    from salesanalytics_etl_spark.operators import dedup as D

    D._BANDED_MEMO.clear()
    frames = [_docs(spark, [f"corpus number {i} text"]) for i in range(6)]
    handles = [D._portable_banded_cached(f) for f in frames]
    assert len(D._BANDED_MEMO) == 4  # bounded
    # the two OLDEST entries were evicted; the newest four survive
    surviving = list(D._BANDED_MEMO.values())
    assert handles[0] not in surviving and handles[1] not in surviving
    for h in handles[2:]:
        assert h in surviving
    # an evicted input recomputes (fresh entry) without error
    re0 = D._portable_banded_cached(frames[0])
    assert re0 is not handles[0]
    D._BANDED_MEMO.clear()
