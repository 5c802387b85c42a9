"""Normalize / tokenize / shingle as Catalyst expressions (ops 2-4).

Reference semantics: ``lsh_hdc/preprocess.py::RegexTokenizer`` [L],
``lsh_hdc/__init__.py::Shingler.get_shingles`` [M] (SURVEY.md §2.1 ops 2-4,
§2.5.1): word shingles are tuples of ``span`` tokens at stride ``skip+1``
(skip-grams), optionally deduped (``unique``); texts shorter than one window
still emit a single whole-text shingle (``kmin>=1`` short-doc behavior —
the library was built for short social-media comments).

Design note (Spark-first): the reference runs these as per-item Python
functions.  Here they are pure Catalyst column expressions — lower/split/
transform/sequence — so the whole stage stays inside WholeStageCodegen with
zero Python involvement; that is strictly faster than an Arrow UDF hop and
satisfies the "vectorized, no per-row Python" requirement.  Pluggability
(the reference's ``tokenizer=``/``normalizer=`` ctor args) is preserved by
accepting replacement Column builders.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

#: token pattern shared with the DuckDB oracles — keep in sync with
#: __spark_entry__.py oracle_sql()
TOKEN_SPLIT_RE = "[^a-z0-9]+"

NormalizerFn = Callable[[Column], Column]
TokenizerFn = Callable[[Column], Column]


def normalize(text: Column) -> Column:
    """Default normalizer: lowercase (reference default is pass-through /
    HTML-strip; lowercasing matches its common cfg)."""
    return F.lower(text)


def tokenize(text: Column) -> Column:
    """Default tokenizer: split on non-alphanumeric runs, drop empties."""
    return F.filter(F.split(text, TOKEN_SPLIT_RE), lambda t: t != F.lit(""))


def word_shingles(
    text: Column,
    span: int = 3,
    skip: int = 0,
    unique: bool = True,
    kmin: int = 1,
    normalizer: NormalizerFn = normalize,
    tokenizer: TokenizerFn = tokenize,
) -> Column:
    """array<string> of word n-gram shingles, joined by single spaces.

    Window i covers tokens [i, i+stride, ..., i+(span-1)*stride] with
    stride = skip+1.  Shorter-than-window texts emit the whole token list
    as one shingle when kmin >= 1 (empty texts emit an empty array).
    """
    toks = tokenizer(normalizer(text))
    stride = skip + 1
    reach = (span - 1) * stride + 1  # tokens consumed by one window
    n = F.size(toks)

    window = F.transform(
        F.sequence(F.lit(0), n - F.lit(reach)),
        lambda i: F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(span - 1)),
                lambda j: F.element_at(toks, i + j * F.lit(stride) + 1),
            ),
        ),
    )
    short = (
        F.when(n > 0, F.array(F.concat_ws(" ", toks)))
        if kmin >= 1
        else F.array().cast("array<string>")
    )
    out = F.when(n >= reach, window).otherwise(short)
    out = F.coalesce(out, F.array().cast("array<string>"))
    return F.array_distinct(out) if unique else out


def char_shingles(
    text: Column,
    span: int = 4,
    skip: int = 0,
    unique: bool = True,
    kmin: int = 1,
    normalizer: NormalizerFn = normalize,
) -> Column:
    """array<string> of char n-gram shingles over the whitespace-collapsed,
    normalized text.  Window i takes chars [i, i+stride, ...,
    i+(span-1)*stride] with stride = skip+1 (contiguous substrings when
    skip = 0)."""
    s = F.trim(F.regexp_replace(normalizer(text), r"\s+", " "))
    n = F.length(s)
    stride = skip + 1
    reach = (span - 1) * stride + 1
    if skip == 0:
        window = F.transform(
            F.sequence(F.lit(1), n - F.lit(span - 1)),
            lambda i: F.substring(s, i, F.lit(span)),
        )
    else:
        window = F.transform(
            F.sequence(F.lit(1), n - F.lit(reach - 1)),
            lambda i: F.concat_ws(
                "",
                F.transform(
                    F.sequence(F.lit(0), F.lit(span - 1)),
                    lambda j: F.substring(s, i + j * F.lit(stride), F.lit(1)),
                ),
            ),
        )
    short = (
        F.when(n > 0, F.array(s)) if kmin >= 1 else F.array().cast("array<string>")
    )
    out = F.when(n >= reach, window).otherwise(short)
    out = F.coalesce(out, F.array().cast("array<string>"))
    return F.array_distinct(out) if unique else out


def shingles_for(cfg) -> Column:
    """Shingle column for a DedupConfig (binds cfg.text_col)."""
    text = F.col(cfg.text_col)
    if cfg.shingle_mode == "word":
        return word_shingles(
            text, span=cfg.span, skip=cfg.skip, unique=cfg.unique, kmin=cfg.kmin
        )
    return char_shingles(
        text, span=cfg.span, skip=cfg.skip, unique=cfg.unique, kmin=cfg.kmin
    )


def hashed_shingles(shingles: Column) -> Column:
    """array<bigint>: xxhash64 of each shingle (JVM-side, seed 42 = Spark's
    default).  Downstream stages (MinHash UDF, exact-Jaccard verify) operate
    on these 64-bit values instead of strings — smaller shuffles, cheaper
    set ops; collision odds at pair level are ~2^-64 per shingle pair."""
    return F.transform(shingles, lambda s: F.xxhash64(s))
