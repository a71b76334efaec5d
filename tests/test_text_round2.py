"""Round-2 text operators: TF-IDF, inverted index, PII redaction,
repetition signals — planted-case semantics on tiny frames."""

from __future__ import annotations

import hashlib

from salesanalytics_etl_spark.operators.text import (
    inverted_index,
    redact_pii,
    repetition_ratio,
    tfidf_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_tfidf_rare_term_wins(spark):
    # 'zebra' appears only in doc 1; 'common' is in every doc → idf 0
    df = _docs(
        spark,
        [
            (1, "common zebra common"),
            (2, "common common filler"),
            (3, "common filler filler"),
        ],
    )
    out = {
        (r.doc_id, r.term_rank): (r.term, r.tf, r.df)
        for r in tfidf_terms(df, top_n=2).collect()
    }
    assert out[(1, 1)] == ("zebra", 1, 1)
    # 'common' (df=3, idf=ln(1)=0) never outranks a df<3 term
    term, _, dfreq = out[(2, 1)]
    assert term == "filler" and dfreq == 2


def test_inverted_index_postings_sorted_capped(spark):
    rows = [(i, "alpha beta") for i in range(10)] + [(99, "beta")]
    out = {
        r.term: (r.df, r.postings)
        for r in inverted_index(
            _docs(spark, rows), min_df=5, max_postings=3
        ).collect()
    }
    assert out["alpha"] == (10, "0,1,2")  # capped at 3, ascending
    assert out["beta"][0] == 11
    # min_df filter: a term in 1 doc never appears
    one_off = inverted_index(_docs(spark, rows + [(100, "rare")]), min_df=5)
    assert one_off.filter("term = 'rare'").count() == 0


def test_redact_pii_counts_and_fingerprint(spark):
    text = "mail a@b.com and x.y+z@mail.co or call 555-1234 now"
    out = redact_pii(_docs(spark, [(1, text)])).first()
    assert out.n_emails == 2 and out.n_phones == 1
    expected = "mail [EMAIL] and [EMAIL] or call [PHONE] now"
    assert out.redacted_fp == hashlib.md5(expected.encode()).hexdigest()


def test_redact_pii_clean_text_unchanged(spark):
    text = "no pii here, just words and 123 numbers"
    out = redact_pii(_docs(spark, [(1, text)])).first()
    assert out.n_emails == 0 and out.n_phones == 0
    assert out.redacted_fp == hashlib.md5(text.encode()).hexdigest()


def test_repetition_ratio_flags_boilerplate(spark):
    df = _docs(
        spark,
        [
            (1, "spam spam spam spam"),  # 1 distinct / 4 tokens
            (2, "all words here differ"),  # 4 / 4
        ],
    )
    out = {r.doc_id: r for r in repetition_ratio(df).collect()}
    assert out[1].distinct_ratio == 0.25 and out[1].top_token_share == 1.0
    assert out[2].distinct_ratio == 1.0 and out[2].top_token_share == 0.25


def test_chunk_documents_no_phantom_chunks_for_empty_or_null(spark):
    """NULL and empty/whitespace-only texts must produce ZERO chunks —
    not a fabricated row with chunk_len 32 (NULL) or 1 ('')."""
    from salesanalytics_etl_spark.operators.text import chunk_documents

    rows = [(1, "one two three"), (2, None), (3, ""), (4, "   ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df).collect()
    assert {r.doc_id for r in out} == {1}
    assert out[0].chunk_len == 3


def test_redact_pii_phone_count_matches_placeholders(spark):
    """A phone-shaped substring inside an email is consumed by [EMAIL];
    n_phones must count what actually became [PHONE] placeholders."""
    from salesanalytics_etl_spark.operators.text import redact_pii

    rows = [
        (1, "reach me at a.555-12@bar.com ok"),       # phone inside email
        (2, "mail x@y.com or call 555-1234 today"),   # both, disjoint
    ]
    out = {
        r.doc_id: r
        for r in redact_pii(
            spark.createDataFrame(rows, ["doc_id", "text"])
        ).collect()
    }
    assert out[1].n_emails == 1 and out[1].n_phones == 0
    assert out[2].n_emails == 1 and out[2].n_phones == 1


def test_repetition_ratio_degenerate_docs(spark):
    """Empty/whitespace/NULL docs report n_tokens=0 and NULL ratios —
    never distinct_ratio=1.0 (the best-possible diversity score)."""
    from salesanalytics_etl_spark.operators.text import repetition_ratio

    rows = [(1, "a a b"), (2, ""), (3, "   "), (4, None)]
    out = {
        r.doc_id: r
        for r in repetition_ratio(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    assert out[1].n_tokens == 3 and out[1].distinct_ratio == 0.6667
    for d in (2, 3, 4):
        assert out[d].n_tokens == 0 and out[d].n_distinct == 0
        assert out[d].distinct_ratio is None
        assert out[d].top_token_share is None
