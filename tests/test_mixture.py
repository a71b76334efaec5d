"""Unit tests for q106 token-budget mixture planning semantics.

The oracle sweep hash-checks the full query; these tests pin the planning
arithmetic on planted inputs where the expected rates are computable by
hand: uniform-over-sources budget split, the 10000-bp cap for
under-budget sources, and the determinism of the md5-bucket membership.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from salesanalytics_etl_spark.plans.extensions import q106_token_budget_mixture


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "documents.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return str(tmp_path)


def test_rates_follow_budget_arithmetic(spark, tmp_path):
    # source A: 10 docs x 10 tokens = 100; source B: 2 docs x 10 = 20.
    # total = 120, budget = 60, per-source share = 30.
    # A: bp = 30*10000 // 100 = 3000. B: 30*10000 // 20 = 15000 -> cap 10000.
    rows = [(i, "w " * 10, "en", "A", 20) for i in range(10)]
    rows += [(100 + i, "w " * 10, "en", "B", 20) for i in range(2)]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in q106_token_budget_mixture(spark, sf_dir).collect()}
    assert out["A"]["n_tokens"] == 100 and out["A"]["sample_bp"] == 3000
    assert out["B"]["n_tokens"] == 20 and out["B"]["sample_bp"] == 10000
    # capped source keeps everything
    assert out["B"]["n_docs_sampled"] == 2
    assert out["B"]["n_tokens_sampled"] == 20
    # sampled tokens never exceed the source's own token count
    assert out["A"]["n_tokens_sampled"] <= 100


def test_membership_is_deterministic(spark, tmp_path):
    rows = [(i, "tok " * (1 + i % 7), "en", f"s{i % 3}", 1) for i in range(60)]
    sf_dir = _write_docs(spark, tmp_path, rows)
    a = sorted(map(tuple, q106_token_budget_mixture(spark, sf_dir).collect()))
    b = sorted(map(tuple, q106_token_budget_mixture(spark, sf_dir).collect()))
    assert a == b


def test_empty_source_tokens_guard(spark, tmp_path):
    # a source whose docs have zero tokens gets bp 0, not a div-by-zero
    rows = [(1, "real words here", "en", "A", 15), (2, "!!! ...", "en", "B", 7)]
    sf_dir = _write_docs(spark, tmp_path, rows)
    out = {r["source"]: r for r in q106_token_budget_mixture(spark, sf_dir).collect()}
    assert out["B"]["n_tokens"] == 0
    assert out["B"]["sample_bp"] == 0
    assert out["B"]["n_tokens_sampled"] == 0
