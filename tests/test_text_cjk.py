"""CJK tokenizer gate: every query whose oracle re-spells the tokenizer
must stay hash-identical to DuckDB on a corpus CONTAINING CJK text.

The driver testdata is pure Latin, so its gate cannot exercise the CJK
alternation in TOKEN_RE / the cjk_segment pre-pass — any drift between the
Spark spelling (operators/text.py) and the 20+ oracle re-spellings
(plans/extensions.py) would stay invisible there. This module closes that
hole: it injects mixed/pure CJK documents (Han, kana, Hangul, CJK
punctuation, mixed-script) into a copy of sf0.001 and runs the strict
gate over every tokenizer-consuming query.

Also pins the unit semantics: one CJK codepoint = one token, Latin text
byte-identical under cjk_segment, and the token-gated operators (quality,
packing, rebalance, mixture) see NONZERO tokens for CJK docs end-to-end.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from tests.strict_gate import strict_compare

# Docs chosen to hit every range of CJK_CP_RE plus the edge cases the
# segmentation must not mangle: CJK punctuation (NOT tokens), mixed
# script, whitespace-adjacent CJK, and a long pure-CJK run.
CJK_DOCS = [
    "机器学习模型需要大量高质量的训练数据。数据清洗和去重是关键步骤。",
    "日本語のテキストです。トークン化は文字単位で行われます。",
    "한국어 텍스트의 토큰 수를 세는 테스트입니다.",
    "Mixed script: the model 模型 trains on 数据 data 데이터 and ドキュメント docs.",
    "、。！？——standalone CJK punctuation with ascii words only",
    "重复 重复 重复 重复 重复 boilerplate 重复 重复 重复 重复",
    "深度學習（deep learning）是機器學習的分支，目標是讓電腦模擬人腦的神經網路。"
    "它使用多層的神經網路來學習資料的表示。訓練資料的品質決定模型的上限。",
]

# Every registered query whose Spark plan consumes the word tokenizer or
# token_count AND whose oracle re-spells it (see plans/extensions.py).
TOKENIZER_QUERIES = [
    "q22_docs_token_stats",
    "q23_docs_quality",
    "q24_docs_langid",
    "q26_simhash_neardup",
    "q47_docs_chunking",
    "q65_tfidf_top_terms",
    "q66_inverted_index",
    "q69_repetition_filter",
    "q70_benchmark_decontamination",
    "q71_sequence_packing",
    "q72_language_rebalance",
    "q75_curation_pipeline",
    "q81_bigram_merge_candidates",
    "q86_bm25_search",
    "q90_weighted_priority_sample",
    "q102_exact_jaccard_join",
    "q103_duplicate_spans",
    "q104_unigram_surprisal",
    "q105_cluster_representatives",
    "q106_token_budget_mixture",
    "q117_quality_threshold_calibration",
    "q118_fuzzy_decontamination",
    "q119_bigram_surprisal",
    "q120_source_kl_divergence",
]


@pytest.fixture(scope="module")
def cjk_sf_dir(tmp_path_factory) -> str:
    """A copy of sf0.001 whose documents table gains the CJK fixtures."""
    out = tmp_path_factory.mktemp("cjk_sf")
    for p in Path(SF_DIR).glob("*.parquet"):
        if p.stem != "documents":
            shutil.copy(p, out / p.name)
    con = duckdb.connect()
    rows = ",".join(
        f"({9_000_000 + i}, ?, 'zh', 'cjk_fixture')" for i in range(len(CJK_DOCS))
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')
          UNION ALL
          SELECT CAST(doc_id AS BIGINT), text, lang, source,
                 CAST(length(text) AS BIGINT) AS n_chars
          FROM (VALUES {rows}) v(doc_id, text, lang, source)
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """,
        CJK_DOCS,
    )
    con.close()
    return str(out)


@pytest.mark.parametrize("qname", TOKENIZER_QUERIES)
def test_cjk_gate(spark, cjk_sf_dir, qname):
    import __spark_entry__ as entry

    q = entry.queries()[qname]
    sql = entry.oracle_sql()[qname]
    problems = strict_compare(q(spark, cjk_sf_dir), sql, cjk_sf_dir)
    assert problems == [], problems


def test_token_count_cjk_unit(spark):
    from salesanalytics_etl_spark.operators.text import token_count, tokens

    df = spark.createDataFrame(
        [
            ("Hello 世界 world 你好嗎 ok", 8),
            ("日本語のテキストです", 10),
            ("한국어 텍스트 test123", 7),
            ("pure ascii text only", 4),
            ("", 0),
            ("、。！？", 0),  # CJK punctuation is NOT a token
        ],
        ["text", "expected"],
    )
    rows = df.select(
        "expected",
        token_count(F.col("text")).alias("n"),
        tokens(F.col("text")).alias("toks"),
    ).collect()
    for r in rows:
        assert r.n == r.expected, rows


def test_cjk_segment_latin_identity(spark):
    """cjk_segment must be byte-identity on non-CJK text — the invariant
    that keeps every pre-r8 Latin-corpus hash unchanged."""
    from salesanalytics_etl_spark.operators.text import cjk_segment

    texts = ["Hello, world!", "foo\tbar\nbaz", "émigré café £§µ", "123-456"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    out = df.select(
        F.sum((cjk_segment(F.col("text")) != F.col("text")).cast("int")).alias("d")
    ).collect()
    assert out[0].d == 0


def test_token_gated_ops_see_cjk(spark):
    """Quality / packing / rebalance must count CJK docs with nonzero
    tokens — the wrong-answer class the r7 verdict flagged (CJK silently
    zero-weighted or dropped by every token-gated operator)."""
    from salesanalytics_etl_spark.operators.curation import (
        language_rebalance,
        pack_sequences,
    )
    from salesanalytics_etl_spark.operators.text import quality_score

    df = spark.createDataFrame(
        [(i, t, "zh", "s") for i, t in enumerate(CJK_DOCS[:3])],
        ["doc_id", "text", "lang", "source"],
    )
    q = quality_score(df).collect()
    assert all(r.n_tokens > 0 for r in q), q

    packed = pack_sequences(df, window_tokens=16).collect()
    assert packed and sum(r.bin_tokens for r in packed) > 0, packed
    # per-codepoint tokens split the 3 docs across multiple 16-token bins
    # (zero-token CJK would have collapsed everything into bin 0)
    assert len(packed) > 1, packed

    reb = language_rebalance(df, budget_tokens=10**9).collect()
    (zh,) = [r for r in reb if r.lang == "zh"]
    assert zh.kept_tokens > 0 and zh.rate == 1.0, reb
