"""Shingler edge cases (SURVEY.md §5.2.1): windowing, skip-grams, unique,
short-doc fallback, unicode, empties — checked against literal expectations
and against the pure-Python oracle."""

import pytest
from pyspark.sql import functions as F

from lsh_hdc_spark.functions.text import char_shingles, word_shingles
from ref_oracle import char_shingles as oracle_char
from ref_oracle import shingles as oracle_word


def _run(spark, texts, col):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r.s for r in df.select(col.alias("s")).collect()]


CASES = [
    "the quick brown fox jumps over the lazy dog",
    "one two",
    "one",
    "",
    "a a a a a",
    "Héllo, Wörld! ünïcode-test here now",
    "x1 y2 z3 w4",
    "tab\tand\nnewline  double  space",
]


@pytest.mark.parametrize("span,skip,unique,kmin", [
    (3, 0, True, 1),
    (2, 0, True, 1),
    (3, 1, True, 1),
    (3, 0, False, 1),
    (4, 0, True, 0),
])
def test_word_shingles_match_oracle(spark, span, skip, unique, kmin):
    col = word_shingles(F.col("text"), span=span, skip=skip, unique=unique, kmin=kmin)
    got = _run(spark, CASES, col)
    want = [oracle_word(t, span=span, skip=skip, unique=unique, kmin=kmin) for t in CASES]
    assert got == want


def test_word_shingles_literals(spark):
    col = word_shingles(F.col("text"), span=3)
    got = _run(spark, ["the quick brown fox"], col)
    assert got == [["the quick brown", "quick brown fox"]]


def test_skip_gram_literal(spark):
    # span=2, skip=1 => tokens (0,2), (1,3), (2,4)...
    col = word_shingles(F.col("text"), span=2, skip=1)
    got = _run(spark, ["a b c d"], col)
    assert got == [["a c", "b d"]]


def test_short_doc_fallback(spark):
    col = word_shingles(F.col("text"), span=5, kmin=1)
    got = _run(spark, ["one two", ""], col)
    assert got == [["one two"], []]


def test_unique_dedups(spark):
    col = word_shingles(F.col("text"), span=1, unique=True)
    got = _run(spark, ["a b a b"], col)
    assert got == [["a", "b"]]


@pytest.mark.parametrize("span", [3, 5])
def test_char_shingles_match_oracle(spark, span):
    col = char_shingles(F.col("text"), span=span)
    got = _run(spark, CASES, col)
    want = [oracle_char(t, span=span) for t in CASES]
    assert got == want


def test_char_shingles_literal(spark):
    col = char_shingles(F.col("text"), span=4)
    got = _run(spark, ["AB cd"], col)
    assert got == [["ab c", "b cd"]]


def test_null_text_yields_empty(spark):
    df = spark.createDataFrame([(None,)], "text string")
    got = df.select(word_shingles(F.col("text")).alias("s")).collect()
    assert got[0].s == []


def test_char_skip_grams(spark):
    """char-mode skip-grams: window chars at stride skip+1 — Catalyst and
    batch-kernel paths agree with the literal expansion."""
    from lsh_hdc_spark.config import DedupConfig
    from lsh_hdc_spark.functions.sign import shingles_of

    cfg = DedupConfig(shingle_mode="char", span=3, skip=1)
    # "abcdef": stride 2, reach 5 -> windows at i=0,1: ace, bdf
    assert shingles_of("abcdef", cfg) == ["ace", "bdf"]
    assert shingles_of("abcd", cfg) == ["abcd"]  # short-doc fallback
    got = _run(
        spark,
        ["abcdef", "abcd", ""],
        char_shingles(F.col("text"), span=3, skip=1),
    )
    assert got == [["ace", "bdf"], ["abcd"], []]


def test_shingler_fuzz_word_and_char():
    """Hypothesis fuzz: the batch-kernel shingler (sign.py::shingles_of)
    agrees with the independent pure-python oracle on arbitrary unicode
    text across (span, skip) configs — word and char modes."""
    from hypothesis import given, settings, strategies as st

    from lsh_hdc_spark.config import DedupConfig
    from lsh_hdc_spark.functions.sign import shingles_of
    from ref_oracle import char_shingles as o_char
    from ref_oracle import shingles as o_word

    @given(
        st.text(max_size=120),
        st.integers(min_value=1, max_value=5),
        st.integers(min_value=0, max_value=2),
    )
    @settings(max_examples=300, deadline=None)
    def check(text, span, skip):
        wcfg = DedupConfig(span=span, skip=skip, width=4, bandwidth=1)
        assert shingles_of(text, wcfg) == o_word(text, span=span, skip=skip)
        if skip == 0:
            ccfg = DedupConfig(
                shingle_mode="char", span=span, width=4, bandwidth=1
            )
            assert shingles_of(text, ccfg) == o_char(text, span=span)

    check()
