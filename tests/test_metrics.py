"""Cluster-quality metrics (ops 16-19): hand-checked values, sklearn-doc
examples, degenerate cases, and the BASELINE dup-pair-recall gate (LSH
pipeline vs exact-Jaccard clusters)."""

import math

import pytest
from pyspark.sql import functions as F

from lsh_hdc_spark.config import DedupConfig
from lsh_hdc_spark.operators.clustering_metrics import (
    clustering_report,
    contingency,
    entropy_metrics,
    pair_confusion,
    pair_metrics,
)


def _frame(spark, true, pred):
    return spark.createDataFrame(
        [(i, t, p) for i, (t, p) in enumerate(zip(true, pred))],
        "id long, t string, p string",
    )


def _ref_entropy(true, pred):
    """Independent single-process reference: direct conditional-entropy
    formulation (vs the module's MI formulation)."""
    n = len(true)
    from collections import Counter

    ct = Counter(zip(true, pred))
    a = Counter(true)
    b = Counter(pred)
    h_c = -sum(c / n * math.log(c / n) for c in a.values())
    h_k = -sum(c / n * math.log(c / n) for c in b.values())
    h_c_given_k = -sum(
        c / n * math.log(c / b[p]) for (t, p), c in ct.items()
    )
    h_k_given_c = -sum(
        c / n * math.log(c / a[t]) for (t, p), c in ct.items()
    )
    h = 1.0 if h_c == 0 else 1.0 - h_c_given_k / h_c
    c = 1.0 if h_k == 0 else 1.0 - h_k_given_c / h_k
    v = 0.0 if h + c == 0 else 2 * h * c / (h + c)
    return h, c, v


TRUE = list("000111")
PRED = list("001122")


def test_pair_confusion_hand_computed(spark):
    pc = pair_confusion(_frame(spark, TRUE, PRED), "t", "p")
    # contingency: {0:{0:2,1:1}, 1:{1:1,2:2}}
    assert (pc.n_items, pc.tp, pc.fp, pc.fn, pc.tn) == (6, 2, 1, 4, 8)
    assert pc.total_pairs == 15


def test_pair_metrics_hand_computed(spark):
    m = pair_metrics(pair_confusion(_frame(spark, TRUE, PRED), "t", "p"))
    assert m["pair_precision"] == pytest.approx(2 / 3)
    assert m["pair_recall"] == pytest.approx(1 / 3)
    assert m["pair_f1"] == pytest.approx(4 / 9)
    assert m["rand_index"] == pytest.approx(2 / 3)
    # sklearn adjusted_rand_score doc example value
    assert m["adjusted_rand"] == pytest.approx(24 / 99)


def test_entropy_metrics_vs_reference(spark):
    got = entropy_metrics(_frame(spark, TRUE, PRED), "t", "p")
    h, c, v = _ref_entropy(TRUE, PRED)
    assert got["homogeneity"] == pytest.approx(h)
    assert got["completeness"] == pytest.approx(c)
    assert got["v_measure"] == pytest.approx(v)


def test_perfect_and_degenerate_labelings(spark):
    perfect = clustering_report(_frame(spark, TRUE, TRUE), "t", "p")
    for k in ("pair_precision", "pair_recall", "pair_f1", "adjusted_rand",
              "homogeneity", "completeness", "v_measure", "cohen_kappa"):
        assert perfect[k] == pytest.approx(1.0), k
    # everything in ONE predicted cluster: recall 1, homogeneity 0
    one = clustering_report(_frame(spark, TRUE, ["x"] * 6), "t", "p")
    assert one["pair_recall"] == pytest.approx(1.0)
    assert one["homogeneity"] == pytest.approx(0.0)
    assert one["completeness"] == pytest.approx(1.0)
    # all-singleton prediction: precision 1 (vacuous), completeness 0 side
    sing = clustering_report(_frame(spark, TRUE, [str(i) for i in range(6)]), "t", "p")
    assert sing["pair_precision"] == pytest.approx(1.0)
    assert sing["homogeneity"] == pytest.approx(1.0)


def test_contingency_counts(spark):
    ct = {
        (r["true"], r["pred"]): r["n"]
        for r in contingency(_frame(spark, TRUE, PRED), "t", "p").collect()
    }
    assert ct == {("0", "0"): 2, ("0", "1"): 1, ("1", "1"): 1, ("1", "2"): 2}


def test_pair_recall_gate_lsh_vs_exact(spark, documents):
    """BASELINE.json acceptance metric: dup-pair recall of the LSH pipeline
    against the exact-Jaccard clustering at the same config, >= 0.99
    (SURVEY.md §2.2 op 19, §6)."""
    from lsh_hdc_spark.operators.cc import connected_components
    from lsh_hdc_spark.operators.ngram_jaccard import exact_jaccard_pairs
    from lsh_hdc_spark.plans.pipeline import run_pipeline

    cfg = DedupConfig()
    pred = run_pipeline(documents, cfg).select(
        "doc_id", F.col("cluster_id").alias("pred")
    )
    edges = exact_jaccard_pairs(
        documents, cfg, threshold=cfg.resolved_jaccard_threshold
    ).select("src", "dst")
    exact = connected_components(edges).withColumnRenamed("id", "doc_id")
    truth = (
        documents.select("doc_id")
        .join(exact, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("true")
        )
    )
    both = truth.join(pred, "doc_id")
    m = pair_metrics(pair_confusion(both, "true", "pred"))
    assert m["pair_recall"] >= 0.99, m
    assert m["pair_precision"] >= 0.99, m


def test_entropy_micros_agrees_with_distributed(spark):
    from lsh_hdc_spark.operators.clustering_metrics import entropy_micros

    true = ["a", "a", "a", "b", "b", "c", "c", "c", "c"]
    pred = ["x", "x", "y", "y", "y", "z", "z", "x", "z"]
    df = _frame(spark, true, pred)
    m_dist = entropy_metrics(df, "t", "p")
    m_mic = entropy_micros(df, "t", "p")
    assert m_mic["n_items"] == len(true)
    for k_mic, k_dist in [("h_micros", "homogeneity"), ("c_micros", "completeness"),
                          ("v_micros", "v_measure"), ("nmi_micros", "nmi")]:
        assert abs(m_mic[k_mic] / 1e6 - m_dist[k_dist]) < 2e-6, (k_mic, m_mic, m_dist)


def test_entropy_micros_degenerate_single_cluster(spark):
    from lsh_hdc_spark.operators.clustering_metrics import entropy_micros

    df = _frame(spark, ["a"] * 5, ["x"] * 5)
    m = entropy_micros(df, "t", "p")
    # both entropies are 0 -> conventions: h = c = nmi = 1
    assert m["h_micros"] == m["c_micros"] == m["nmi_micros"] == 10**6


def test_entropy_metrics_null_labels_consistent_with_pair_confusion(spark):
    """NULL pred labels (min_support output) are a regular group in BOTH
    metric families (round-2 advice: the inner joins used to drop them)."""
    from lsh_hdc_spark.operators.clustering_metrics import entropy_micros

    df = spark.createDataFrame(
        [(0, "a", "x"), (1, "a", None), (2, "b", None), (3, "b", "y")],
        "id long, t string, p string",
    )
    m = entropy_metrics(df, "t", "p")
    # with NULL as its own cluster, MI > 0 here; the old inner-join bug
    # dropped the NULL cells, biasing MI low while H margins kept them
    sub = df.withColumn("p", F.coalesce("p", F.lit("__null__")))
    m_sentinel = entropy_metrics(sub, "t", "p")
    for k in ("homogeneity", "completeness", "v_measure", "nmi"):
        assert math.isclose(m[k], m_sentinel[k], rel_tol=1e-12), (k, m, m_sentinel)
    m_mic = entropy_micros(df, "t", "p")
    m_mic_sent = entropy_micros(sub, "t", "p")
    assert {k: v for k, v in m_mic.items()} == {k: v for k, v in m_mic_sent.items()}
