"""Text-analysis operators for large-scale training-data pipelines.

All pure Catalyst expressions (regexp_count / length / md5 / split) — no
Python UDFs, so they run inside whole-stage codegen and scale linearly with
input splits. Each has an exact DuckDB-SQL twin (registered in
plans/extensions.py) because both engines count non-overlapping regex
matches identically.

Design note (100 TB): these are embarrassingly parallel map-side ops over a
single scan of ``documents`` — no shuffle at all; column pruning reaches the
parquet reader, so only ``doc_id``/``text`` bytes are read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Token = maximal run of word characters (BPE-ish pre-tokenization boundary).
TOKEN_RE = "[A-Za-z0-9]+"
# Language-ID n-gram/stopword evidence. Deterministic, order-matters tie-break.
LANG_MARKERS: list[tuple[str, str]] = [
    ("en", r"\b(the|and|of|to|is|in)\b"),
    ("es", r"\b(el|la|los|las|de|que|y)\b"),
    ("fr", r"\b(le|la|les|des|et|est|une)\b"),
    ("de", r"\b(der|die|das|und|ist|nicht)\b"),
]
CJK_RE = "[一-鿿]"


def token_count(text: Column) -> Column:
    """Whitespace/punctuation-agnostic token count via regex matches."""
    return F.regexp_count(text, F.lit(TOKEN_RE))


def char_class_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc character-class profile used by quality scoring."""
    t = F.col(text_col)
    return df.select(
        "*",
        F.length(t).alias("n_chars_calc"),
        F.regexp_count(t, F.lit("[A-Za-z]")).alias("n_alpha"),
        F.regexp_count(t, F.lit("[0-9]")).alias("n_digit"),
        F.regexp_count(t, F.lit(r"[\s]")).alias("n_space"),
        token_count(t).alias("n_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality score in [0,1].

    Components (each a cheap codegen expression):
    - length band: docs between 64 and 8192 chars score 1, else 0
    - alpha ratio: fraction of alphabetic chars
    - mean token length band: 2..12 chars → 1, else 0
    Weighted 0.25/0.5/0.25, rounded to 4 decimals for cross-engine hash
    stability.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_alpha = F.regexp_count(t, F.lit("[A-Za-z]"))
    n_tokens = token_count(t)
    n_stop = F.regexp_count(
        F.lower(t), F.lit(r"\b(the|and|of|to|is|in|a|that|it|for)\b")
    )
    len_ok = F.when((n_chars >= 64) & (n_chars <= 8192), 1.0).otherwise(0.0)
    alpha_ratio = F.when(n_chars > 0, n_alpha.cast("double") / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(0.0)
    mean_tok = F.when(n_tokens > 0, n_alpha.cast("double") / n_tokens)
    tok_ok = F.when((mean_tok >= 2) & (mean_tok <= 12), 1.0).otherwise(0.0)
    score = F.round(0.25 * len_ok + 0.5 * alpha_ratio + 0.25 * tok_ok, 4)
    return df.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        score.alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """N-gram/stopword language-ID heuristic.

    CJK characters dominate → 'zh'; otherwise the language whose stopword
    regex hits most (ties broken by LANG_MARKERS order, then 'und' for
    zero evidence). Deterministic — the same counts are computable in ANSI
    SQL, so this has an exact oracle twin.
    """
    t = F.col(text_col)
    cjk = F.regexp_count(t, F.lit(CJK_RE))
    scores = [
        (lang, F.regexp_count(F.lower(t), F.lit(rx))) for lang, rx in LANG_MARKERS
    ]
    # argmax with first-wins tie-break: greatest(strictly later scores must
    # exceed earlier ones to win).
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang, s in scores:
        win = s > best_score
        best_lang = F.when(win, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(win, s).otherwise(best_score)
    pred = F.when(cjk > 0, F.lit("zh")).otherwise(
        F.when(best_score > 0, best_lang).otherwise(F.lit("und"))
    )
    return df.select("doc_id", pred.alias("lang_pred"))


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into overlapping fixed-token chunks — the standard
    context-window preparation for training pipelines.

    Pure array expressions: tokenize once, explode chunk start offsets
    (stride apart), slice the token array per chunk, re-join. One row in →
    ceil(n_tokens/stride) rows out, all inside codegen+generate operators;
    no Python.
    """
    toks = F.split(normalize_text(F.col(text_col)), r"\s+")
    base = df.select("doc_id", toks.alias("toks")).select(
        "doc_id",
        "toks",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("toks") - 1, F.lit(0)),
                F.lit(stride),
            )
        ).alias("start"),
    )
    return base.select(
        "doc_id",
        (F.col("start") / stride).cast("int").alias("chunk_id"),
        F.array_join(
            F.slice(F.col("toks"), F.col("start") + 1, chunk_tokens), " "
        ).alias("chunk_text"),
        F.least(F.size("toks") - F.col("start"), F.lit(chunk_tokens)).alias(
            "chunk_len"
        ),
    )


def normalize_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the normalized text.

    (The reference has no text ops; this is the training-data-pipeline
    extension surface — BASELINE.json north star.)
    """
    return df.select(
        "doc_id", F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    )
