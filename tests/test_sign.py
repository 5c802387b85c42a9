"""Signature-stage tests (SURVEY.md §5.2.2, porting test_lsh semantics):
statistical property tests on the MinHash estimator and banding curve, plus
exact parity of the Spark Arrow UDF against the pure-Python oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

import ref_oracle as O
from lsh_hdc_spark.config import DedupConfig, candidate_probability
from lsh_hdc_spark.functions.hashing import as_u64, hash_seeds
from lsh_hdc_spark.functions.sign import _band_keys, _minhash_matrix, signed
from fixtures_gen import sets_random


def _sig_matrix(sets: list[np.ndarray], width: int, seed: int) -> np.ndarray:
    lens = np.array([len(s) for s in sets])
    flat = as_u64(np.concatenate(sets).astype(np.int64))
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    return _minhash_matrix(flat, starts, hash_seeds(width, seed))


def test_minhash_agreement_estimates_jaccard():
    """mean(sig_a == sig_b) must be an unbiased Jaccard estimator: for 200
    set pairs with known overlap, the estimate stays inside a generous
    binomial envelope at width=256."""
    rng = np.random.default_rng(42)
    width = 256
    errs = []
    for _ in range(200):
        n_shared = int(rng.integers(1, 40))
        n_a = int(rng.integers(0, 30))
        n_b = int(rng.integers(0, 30))
        pool = rng.choice(10**9, size=n_shared + n_a + n_b, replace=False)
        a = pool[: n_shared + n_a]
        b = np.concatenate([pool[:n_shared], pool[n_shared + n_a :]])
        j_true = n_shared / (n_shared + n_a + n_b)
        sigs = _sig_matrix([a, b], width, seed=7)
        j_est = float((sigs[0] == sigs[1]).mean())
        errs.append(j_est - j_true)
        # single-pair binomial bound: 5 sigma
        assert abs(j_est - j_true) < 5 * np.sqrt(j_true * (1 - j_true) / width) + 1e-9
    # estimator is unbiased: mean error across pairs ~ 0
    assert abs(float(np.mean(errs))) < 0.01


def test_identical_sets_identical_sigs():
    a = np.array([1, 2, 3, 999], dtype=np.int64)
    s1 = _sig_matrix([a, a.copy()], 64, seed=3)
    assert (s1[0] == s1[1]).all()


def test_banding_collision_probability_matches_scurve():
    """P(>=1 shared band key) across many pairs at a fixed Jaccard must track
    1-(1-s^r)^b (SURVEY.md §2.5.3)."""
    rng = np.random.default_rng(11)
    width, r = 12, 3
    b = width // r
    n_pairs, hits = 400, 0
    j_target = 0.7  # |a|=|b|=51, intersection 42, union 60 => J=0.7
    for _ in range(n_pairs):
        pool = rng.choice(10**9, size=60, replace=False)
        a, bb = pool[:51], np.concatenate([pool[:42], pool[51:60]])
        sigs = _sig_matrix([a, bb], width, seed=int(rng.integers(1 << 30)))
        ka = _band_keys(sigs[:1], r, hash_seeds(b, 99))
        kb = _band_keys(sigs[1:], r, hash_seeds(b, 99))
        hits += int(bool(set(ka[0].tolist()) & set(kb[0].tolist())))
    expected = candidate_probability(j_target, r, b)
    se = np.sqrt(expected * (1 - expected) / n_pairs)
    assert abs(hits / n_pairs - expected) < 5 * se


def test_spark_udf_matches_oracle(spark):
    """End-to-end signature parity: Spark (xxhash64 -> Arrow UDF numpy)
    vs the oracle's pure-int pipeline, same config, same texts."""
    rows = [(i, " ".join(t)) for i, (sid, t, _) in enumerate(sets_random(20))]
    cfg = DedupConfig(width=12, bandwidth=3)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (list(r.sig), r.sketch, list(r.band_keys))
        for r in signed(df, cfg).collect()
    }
    for doc_id, text in rows:
        sh = O.shingles(text, span=cfg.span, skip=cfg.skip, unique=cfg.unique, kmin=cfg.kmin)
        hs = sorted(set(O.shingle_hashes(sh)))
        sig = O.minhash_sig(hs, cfg.width, cfg.seed)
        sig_signed = [v - (1 << 64) if v >= (1 << 63) else v for v in sig]
        keys = O.band_keys(sig, cfg.bandwidth, cfg.seed)
        keys_signed = [v - (1 << 64) if v >= (1 << 63) else v for v in keys]
        assert got[doc_id][0] == sig_signed, f"sig mismatch doc {doc_id}"
        assert got[doc_id][2] == keys_signed, f"band keys mismatch doc {doc_id}"


def test_empty_and_null_text_sign(spark):
    cfg = DedupConfig()
    df = spark.createDataFrame([(1, ""), (2, None), (3, "real text here ok")],
                               "doc_id long, text string")
    rows = {r.doc_id: r for r in signed(df, cfg).collect()}
    assert rows[1].sig is None and rows[1].band_keys is None
    assert rows[2].sig is None
    assert rows[3].sig is not None and len(rows[3].sig) == cfg.width
    assert len(rows[3].band_keys) == cfg.bands


def test_simhash_close_sets_close_hamming(spark):
    cfg = DedupConfig(signer="simhash", width=64, bandwidth=16)
    base = " ".join(f"tok{i}" for i in range(40))
    pert = base.replace("tok7", "zzz")
    rand = " ".join(f"other{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, pert), (3, rand)], "doc_id long, text string"
    )
    rows = {r.doc_id: r.sketch for r in signed(df, cfg).collect()}
    ham_near = bin((rows[1] ^ rows[2]) & ((1 << 64) - 1)).count("1")
    ham_far = bin((rows[1] ^ rows[3]) & ((1 << 64) - 1)).count("1")
    assert ham_near < ham_far
    assert ham_near <= 12


def test_sketch_is_parity_of_sig(spark):
    cfg = DedupConfig(width=12, bandwidth=3, sketch_bits=12)
    df = spark.createDataFrame([(1, "a b c d e f g h")], "doc_id long, text string")
    r = signed(df, cfg).collect()[0]
    expect = 0
    for k, v in enumerate(r.sig):
        expect |= (v & 1) << k
    assert r.sketch == expect


# ---- scheme 'b<m>' (op 8 variant: combinatorial band unions) ---------------

def test_scheme_b_config():
    from lsh_hdc_spark.config import candidate_probability_b

    cfg = DedupConfig(scheme="b2")
    assert cfg.scheme_kind == "b" and cfg.scheme_ramp == 2
    assert cfg.n_band_keys == 6  # C(4, 2)
    for bad in ("b", "b0", "b9", "c1", "bx"):
        with pytest.raises(ValueError):
            DedupConfig(scheme=bad)
    # m=1 degenerates to scheme 'a'; endpoints sane
    assert candidate_probability_b(0.7, 3, 4, 1) == pytest.approx(
        candidate_probability(0.7, 3, 4)
    )
    assert candidate_probability_b(1.0, 3, 4, 3) == pytest.approx(1.0)
    assert candidate_probability_b(0.0, 3, 4, 1) == 0.0
    # monotone: higher ramp => stricter
    assert candidate_probability_b(0.7, 3, 4, 3) < candidate_probability_b(
        0.7, 3, 4, 2
    )


def test_combo_keys_share_count():
    """Two items agreeing on exactly k of b base bands share exactly
    C(k, m) combo keys — the AND-OR contract at the matrix level."""
    import math

    from lsh_hdc_spark.functions.sign import _combo_keys

    b, m = 4, 2
    base = hash_seeds(b, 7)
    other = hash_seeds(b, 99)
    for k in range(b + 1):
        row2 = base.copy()
        row2[k:] = other[k:]  # agree on the first k bands only
        kk = _combo_keys(np.stack([base, row2]), m, seed=0)
        shared = len(set(kk[0].tolist()) & set(kk[1].tolist()))
        assert shared == math.comb(k, m), f"k={k}"


def test_scheme_b_pipeline_end_to_end(spark):
    """Identical texts always co-cluster under scheme 'b2' (all bands
    agree => all combos agree); unrelated texts stay apart."""
    from lsh_hdc_spark.plans.pipeline import run_pipeline

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "completely different content about query optimizers and joins"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.cluster_id for r in run_pipeline(df, DedupConfig(scheme="b2")).collect()}
    assert got[1] == got[2] != got[3]


def test_scheme_b_harness_config_recall_is_one(spark):
    """Premise audit for the dedup_clusters_scheme_b harness oracle: at the
    query's pinned config (scheme b2, width=24 -> 8 bands x 3 rows, parity
    verify threshold) the combinatorial banding surfaces EVERY exact pair
    at the parity threshold on the sf0.001 corpus — exact SQL is therefore
    a true oracle for the scheme-b pipeline."""
    from lsh_hdc_spark.operators.ngram_jaccard import exact_jaccard_pairs
    from lsh_hdc_spark.operators.pairs import candidate_pairs

    base = DedupConfig()
    cfg = base.with_(
        scheme="b2", width=24, jaccard_threshold=base.resolved_jaccard_threshold
    )
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = exact_jaccard_pairs(df, base, threshold=cfg.jaccard_threshold).select(
        "src", "dst"
    )
    cand = candidate_pairs(signed(df, cfg), cfg)
    assert exact.join(cand, ["src", "dst"], "left_anti").count() == 0
    assert exact.count() > 0
