"""Candidate pair generation + verification: tier policy (cold self-join /
salted hot anchors / drop-with-metric) and exact-Jaccard values."""

import pytest
from pyspark.sql import functions as F

from lsh_hdc_spark.config import DedupConfig
from lsh_hdc_spark.functions.sign import signed
from lsh_hdc_spark.operators.pairs import (
    band_key_rows,
    bucket_stats,
    candidate_pairs,
    verify_pairs,
)


def _signed_frame(spark, rows):
    """Hand-built 'signed' frame: (doc_id, shingles_h, sig, sketch, band_keys)."""
    return spark.createDataFrame(
        rows,
        "doc_id long, shingles_h array<bigint>, sig array<bigint>, "
        "sketch long, band_keys array<bigint>",
    )


def test_cold_pairs_within_bucket(spark):
    cfg = DedupConfig()
    s = _signed_frame(spark, [
        (1, [10, 11], [0], 0, [100]),
        (2, [10, 11], [0], 0, [100, 200]),
        (3, [10, 12], [0], 0, [200]),
        (4, [99], [0], 0, [300]),      # alone in its bucket
    ])
    got = {(r.src, r.dst) for r in candidate_pairs(s, cfg).collect()}
    assert got == {(1, 2), (2, 3)}


def test_pairs_deduped_across_bands(spark):
    cfg = DedupConfig()
    s = _signed_frame(spark, [
        (1, [10], [0], 0, [100, 200, 300]),
        (2, [10], [0], 0, [100, 200, 300]),
    ])
    pairs = candidate_pairs(s, cfg).collect()
    assert [(r.src, r.dst) for r in pairs] == [(1, 2)]


def test_hot_bucket_anchor_path_keeps_connectivity(spark):
    # bucket of 40 ids with pair_cap=8: anchor tier kicks in; every member
    # must still reach an anchor => component stays connected
    cfg = DedupConfig(pair_cap=8, anchor_fanout=3, salt_buckets=4)
    rows = [(i, [1, 2], [0], 0, [777]) for i in range(40)]
    s = _signed_frame(spark, rows)
    pairs = candidate_pairs(s, cfg).collect()
    n = len(pairs)
    # star topology: far fewer than 40*39/2=780 full pairs, at most fanout*40
    assert 0 < n <= cfg.anchor_fanout * 40
    touched = {x for r in pairs for x in (r.src, r.dst)}
    assert touched == set(range(40))  # nobody orphaned


def test_dropped_tier_is_counted_not_silent(spark):
    cfg = DedupConfig(pair_cap=2, drop_cap=5)
    rows = [(i, [1], [0], 0, [555]) for i in range(10)]  # bucket size 10 > drop_cap
    s = _signed_frame(spark, rows)
    assert candidate_pairs(s, cfg).count() == 0
    stats = {r.tier: r for r in bucket_stats(band_key_rows(s, cfg), cfg).collect()}
    assert stats["dropped"].n_buckets == 1
    assert stats["dropped"].n_rows == 10


def test_verify_pairs_jaccard_values(spark):
    cfg = DedupConfig(jaccard_threshold=0.5)
    s = _signed_frame(spark, [
        (1, [10, 11, 12, 13], [0], 0, [1]),
        (2, [10, 11, 12, 99], [0], 0, [1]),   # J = 3/5 = 0.6
        (3, [10, 50, 60, 70], [0], 0, [1]),   # J vs 1 = 1/7
    ])
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    got = {(r.src, r.dst): r.jaccard for r in verify_pairs(pairs, s, cfg).collect()}
    assert got == {(1, 2): pytest.approx(0.6)}


def test_sketch_prefilter_blocks_far_pairs(spark):
    cfg = DedupConfig(jaccard_threshold=0.0, sketch_bits=12, max_hamming=2)
    s = _signed_frame(spark, [
        (1, [10, 11], [0], 0b000000000000, [1]),
        (2, [10, 11], [0], 0b000000000011, [1]),  # hamming 2: passes
        (3, [10, 11], [0], 0b111100000000, [1]),  # hamming 4: blocked
    ])
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    got = {(r.src, r.dst) for r in verify_pairs(pairs, s, cfg).collect()}
    assert got == {(1, 2)}


def test_skewed_corpus_end_to_end(spark):
    """SURVEY §7.4.1 skew fixture through the REAL pipeline: thousands of
    docs sharing every band key (identical boilerplate text).  The salted-
    anchor tier must bound pair count at O(n * fanout) instead of O(n^2),
    preserve connectivity (ONE cluster), and surface the hot buckets in the
    tier census."""
    from lsh_hdc_spark.plans.pipeline import pipeline_stats, run_pipeline

    n = 3000
    boiler = (
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
        "eiusmod tempor incididunt ut labore et dolore magna aliqua"
    )
    df = spark.createDataFrame(
        [(i, boiler) for i in range(n)], "doc_id long, text string"
    )
    cfg = DedupConfig()
    assert cfg.pair_cap < n <= cfg.drop_cap  # the fixture hits the hot tier
    npairs = candidate_pairs(signed(df, cfg), cfg).count()
    assert 0 < npairs <= cfg.bands * cfg.anchor_fanout * n  # not O(n^2)
    stats = {r.tier: r for r in pipeline_stats(df, cfg).collect()}
    assert stats["hot_anchor"].n_buckets == cfg.bands
    assert stats["hot_anchor"].max_bucket == n
    labels = run_pipeline(df, cfg).collect()
    assert len({r.cluster_id for r in labels}) == 1  # connectivity preserved
    assert all(r.cluster_size == n for r in labels)


def test_band_key_rows_skips_empty(spark):
    cfg = DedupConfig()
    df = spark.createDataFrame([(1, ""), (2, "a b c d")], "doc_id long, text string")
    keys = band_key_rows(signed(df, cfg), cfg).collect()
    assert {r.doc_id for r in keys} == {2}
    assert len(keys) == cfg.bands
