"""Similarity search: exact top-k vs numpy brute force, and ANN recall on
planted high-similarity neighbors (random-hyperplane LSH targets the
high-cosine regime; on uniformly random vectors low recall is expected and
correct)."""

import numpy as np
import pytest

from lsh_hdc_spark.operators.knn import ann_bucket_stats, ann_topk, cosine_topk_bruteforce


def _planted(rng, n_base=150, dups=2, dim=32, noise=0.08):
    rows = []
    vid = 0
    for b in range(n_base):
        v = rng.normal(size=dim)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v], b))
        vid += 1
        for _ in range(dups):
            w = v + rng.normal(scale=noise, size=dim)
            w /= np.linalg.norm(w)
            rows.append((vid, [float(x) for x in w], b))
            vid += 1
    return rows


@pytest.fixture(scope="module")
def planted_df(spark):
    rows = _planted(np.random.default_rng(17))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label long"
    ).cache()


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.default_rng(3)
    m = rng.normal(size=(40, 16))
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(x) for x in m[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r.vec_id, r.rank): r.neighbor_id for r in cosine_topk_bruteforce(df, 3).collect()
    }
    # numpy: float32 cast to match Spark's array<float> storage
    m32 = m.astype(np.float32).astype(np.float64)
    m32 /= np.linalg.norm(m32, axis=1, keepdims=True)
    sims = m32 @ m32.T
    np.fill_diagonal(sims, -2)
    for i in range(40):
        order = sorted(range(40), key=lambda j: (-sims[i, j], j))[:3]
        for rank, j in enumerate(order, start=1):
            assert got[(i, rank)] == j, (i, rank)


def test_ann_recall_on_planted_neighbors(planted_df):
    k = 2
    exact = {
        (r.vec_id, r.neighbor_id) for r in cosine_topk_bruteforce(planted_df, k).collect()
    }
    approx = {
        (r.vec_id, r.neighbor_id) for r in ann_topk(planted_df, k).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"ANN recall {recall:.3f}"


def test_ann_groups_same_label(planted_df):
    # planted duplicates (cos ~0.99) must dominate top-k: neighbor labels
    # agree with query labels for the overwhelming majority
    labels = {r.vec_id: r.label for r in planted_df.collect()}
    hits = [
        labels[r.vec_id] == labels[r.neighbor_id]
        for r in ann_topk(planted_df, 2).collect()
    ]
    # bound reflects ANN recall (~0.9) on top of exact-neighbor label purity
    assert sum(hits) / len(hits) >= 0.85


# --------------------------------------------------------------------------
# IVF coarse-quantizer path
# --------------------------------------------------------------------------

def test_ivf_train_deterministic_unit_centroids(planted_df):
    from lsh_hdc_spark.operators.knn import ivf_train

    c1 = ivf_train(planted_df, n_lists=8, seed=7)
    c2 = ivf_train(planted_df, n_lists=8, seed=7)
    assert np.array_equal(c1, c2), "same (data, seed) must give identical centroids"
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0), "spherical: unit centroids"
    c3 = ivf_train(planted_df, n_lists=8, seed=8)
    assert not np.array_equal(c1, c3), "different seed should move the init"


def test_ivf_recall_on_planted_neighbors(planted_df):
    from lsh_hdc_spark.operators.knn import ann_topk_ivf

    k = 2
    exact = {
        (r.vec_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(planted_df, k).collect()
    }
    approx = {
        (r.vec_id, r.neighbor_id)
        for r in ann_topk_ivf(planted_df, k, n_lists=8, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"IVF recall {recall:.3f}"


def test_ivf_full_probe_equals_exact(planted_df):
    # nprobe = n_lists puts every vector in every probed list's candidate
    # set -> candidates are all pairs -> result must equal brute force
    from lsh_hdc_spark.operators.knn import ann_topk_ivf

    exact = sorted(
        (r.vec_id, r.rank, r.neighbor_id, r.cosine)
        for r in cosine_topk_bruteforce(planted_df, 2).collect()
    )
    full = sorted(
        (r.vec_id, r.rank, r.neighbor_id, r.cosine)
        for r in ann_topk_ivf(planted_df, 2, n_lists=4, nprobe=4).collect()
    )
    assert exact == full


def test_ivf_list_stats_census(planted_df):
    from lsh_hdc_spark.operators.knn import ivf_list_stats

    n = planted_df.count()
    rows = {r.tier: r for r in ivf_list_stats(
        planted_df, n_lists=8, nprobe=2, list_cap=10_000
    ).collect()}
    assert set(rows) <= {"singleton", "cold", "dropped"}
    assert "dropped" not in rows, "cap is far above any list at this scale"
    total = sum(r.n_rows for r in rows.values())
    assert total == 2 * n, "every vector probes exactly nprobe=2 lists"


def test_ivf_list_cap_drops_hot_lists(planted_df):
    # with list_cap=1 every list is hot -> zero candidates -> empty result
    from lsh_hdc_spark.operators.knn import ann_topk_ivf, ivf_list_stats

    out = ann_topk_ivf(planted_df, 2, n_lists=4, nprobe=2, list_cap=1)
    assert out.count() == 0
    stats = {r.tier: r for r in ivf_list_stats(
        planted_df, n_lists=4, nprobe=2, list_cap=1
    ).collect()}
    assert "dropped" in stats and stats["dropped"].n_rows == 2 * planted_df.count()
