"""Text analysis columns for training-data pipelines: token counts, quality
scoring, language-ID heuristic — all pure Catalyst expressions (JVM codegen,
SQL-oracle-able).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokenize

#: tiny public stopword profiles for the language-ID heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "se", "no"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "est", "en", "que"],
}


def token_count(text: Column) -> Column:
    return F.size(tokenize(F.lower(text)))


def stopword_ratio(text: Column, stopwords: list[str]) -> Column:
    toks = tokenize(F.lower(text))
    sw = F.array(*[F.lit(s) for s in stopwords])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def doc_stats(
    df: DataFrame, id_col: str, text_col: str, stopwords: list[str] | None = None
) -> DataFrame:
    """(id, n_chars, n_tokens, n_distinct_tokens, avg_token_len,
    stopword_ratio, alpha_ratio) — the quality-scoring feature row."""
    text = F.col(text_col)
    toks = tokenize(F.lower(text))
    n_tok = F.greatest(F.size(toks), F.lit(0))
    total_tok_len = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)
    )
    sw = stopwords if stopwords is not None else LANG_PROFILES["en"]
    return df.select(
        F.col(id_col),
        F.length(text).alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.round(
            total_tok_len.cast("double")
            / F.greatest(n_tok, F.lit(1)).cast("double"),
            6,
        ).alias("avg_token_len"),
        F.round(stopword_ratio(text, sw), 6).alias("stopword_ratio"),
        F.round(
            F.length(F.regexp_replace(F.lower(text), "[^a-z]", "")).cast("double")
            / F.greatest(F.length(text), F.lit(1)).cast("double"),
            6,
        ).alias("alpha_ratio"),
    )


def quality_score(df_stats: DataFrame) -> DataFrame:
    """Crude composite quality score in [0,1] from doc_stats output:
    favors mid-length docs with diverse tokens and sane alpha ratio."""
    length_ok = F.when(
        (F.col("n_tokens") >= 5) & (F.col("n_tokens") <= 5000), F.lit(1.0)
    ).otherwise(0.3)
    diversity = F.least(
        F.col("n_distinct_tokens").cast("double")
        / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double") * 2,
        F.lit(1.0),
    )
    return df_stats.withColumn(
        "quality",
        F.round(length_ok * 0.4 + diversity * 0.3 + F.col("alpha_ratio") * 0.3, 6),
    )


def quality_micros(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, quality_micros: bigint) — the quality composite quantized to
    integer micro-units, computed from UNROUNDED terms in one expression.

    This is the cross-engine-comparable form: ``round(x, 6)`` semantics
    diverge between engines when the double lands exactly on a 6th-decimal
    half (Spark rounds the decimal expansion HALF_UP via BigDecimal, DuckDB
    rounds the float) — observed on one sf0.01 row.  ``floor(q*1e6 + 0.5)``
    over identically-ordered IEEE-754 double arithmetic is bit-deterministic
    in both engines, and feeding unrounded terms removes the double-rounding
    layer that manufactured the tie.
    """
    text = F.col(text_col)
    toks = tokenize(F.lower(text))
    n_tok = F.size(toks)
    length_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(1.0)).otherwise(0.3)
    diversity = F.least(
        F.size(F.array_distinct(toks)).cast("double")
        / F.greatest(n_tok, F.lit(1)).cast("double") * 2,
        F.lit(1.0),
    )
    alpha = F.length(F.regexp_replace(F.lower(text), "[^a-z]", "")).cast(
        "double"
    ) / F.greatest(F.length(text), F.lit(1)).cast("double")
    q = length_ok * 0.4 + diversity * 0.3 + alpha * 0.3
    return df.select(
        F.col(id_col),
        F.floor(q * 1e6 + 0.5).cast("long").alias("quality_micros"),
    )


#: BPE-style pre-tokenizer approximation: letter runs, digit runs, and
#: punctuation runs, each optionally absorbing one leading space — the
#: GPT-2-family pre-token shape, simplified to the regex subset shared by
#: Java regex (Spark) and RE2 (DuckDB)
BPE_ISH_RE = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9\s]+"


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, ws_tokens, re_tokens, bpe_ish_tokens) — the three token-count
    conventions a training-data pipeline budgets with: whitespace split,
    the engine's alnum tokenizer, and a BPE-ish pre-token count (a cheap,
    SQL-portable proxy for real tokenizer-based length accounting)."""
    text = F.col(text_col)
    low = F.lower(text)
    ws = F.size(
        F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))
    )
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        F.size(tokenize(low)).cast("long").alias("re_tokens"),
        F.size(F.regexp_extract_all(low, F.lit(BPE_ISH_RE), 0))
        .cast("long")
        .alias("bpe_ish_tokens"),
    )


def language_id(text: Column) -> Column:
    """Heuristic language-ID: argmax stopword-hit ratio across profiles;
    'und' (undetermined) when nothing matches."""
    toks = tokenize(F.lower(text))
    scores = []
    for lang, words in LANG_PROFILES.items():
        sw = F.array(*[F.lit(s) for s in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))
