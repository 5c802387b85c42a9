"""Ranking / ROC operators (op 20): hand-computed AUC values (including
ties), ROC point monotonicity, AUL lift-curve properties."""

import pytest
from pyspark.sql import functions as F

from lsh_hdc_spark.operators.ranking import (
    aul_score,
    roc_auc,
    roc_auc_counts,
    roc_points,
)


def _scored(spark, pairs):
    return spark.createDataFrame(
        [(i, s, l) for i, (s, l) in enumerate(pairs)], "id long, score double, lab int"
    )


def test_auc_perfect_and_inverted(spark):
    perfect = _scored(spark, [(0.9, 1), (0.8, 1), (0.7, 0), (0.6, 0)])
    assert roc_auc(perfect, "score", "lab") == pytest.approx(1.0)
    inverted = _scored(spark, [(0.9, 0), (0.8, 0), (0.7, 1), (0.6, 1)])
    assert roc_auc(inverted, "score", "lab") == pytest.approx(0.0)


def test_auc_hand_computed_with_ties(spark):
    # pos scores {4, 2}, neg {3, 1}: pos-neg wins = (4>3)+(4>1)+(2>1) = 3 of 4
    df = _scored(spark, [(4.0, 1), (3.0, 0), (2.0, 1), (1.0, 0)])
    assert roc_auc(df, "score", "lab") == pytest.approx(0.75)
    # all tied: AUC = 0.5 by the tie correction
    tied = _scored(spark, [(5.0, 1), (5.0, 0), (5.0, 1), (5.0, 0)])
    u2, p, n = roc_auc_counts(tied, "score", "lab")
    assert (u2, p, n) == (4, 2, 2)  # 2U = 4 pairs, each worth 1/2
    assert roc_auc(tied, "score", "lab") == pytest.approx(0.5)


def test_auc_degenerate_single_class(spark):
    assert roc_auc(_scored(spark, [(1.0, 1), (2.0, 1)]), "score", "lab") == 0.5


def test_roc_points_monotone_ending_at_one(spark):
    df = _scored(spark, [(4.0, 1), (3.0, 0), (2.0, 1), (1.0, 0)])
    pts = roc_points(df, "score", "lab").orderBy(F.desc("threshold")).collect()
    tprs = [r.tpr for r in pts]
    fprs = [r.fpr for r in pts]
    assert tprs == sorted(tprs) and fprs == sorted(fprs)
    assert tprs[-1] == pytest.approx(1.0) and fprs[-1] == pytest.approx(1.0)
    assert (pts[0].tp, pts[0].fp) == (1, 0)  # top threshold catches the best pos


def _labeled(spark, assignments):
    return spark.createDataFrame(
        [(i, c) for i, c in enumerate(assignments)], "id long, cluster_id string"
    )


def test_aul_uniform_sizes_is_half(spark):
    singletons = _labeled(spark, [str(i) for i in range(8)])
    assert aul_score(singletons) == pytest.approx(0.5)
    equal_pairs = _labeled(spark, ["a", "a", "b", "b", "c", "c"])
    assert aul_score(equal_pairs) == pytest.approx(0.5)


def test_aul_rewards_concentration(spark):
    # one 10-cluster + 10 singletons: scanning the big cluster first covers
    # half the items with 1/11 of the clusters
    concentrated = _labeled(spark, ["big"] * 10 + [f"s{i}" for i in range(10)])
    a = aul_score(concentrated)
    # exact: 1/11*(0.25) + 10/11*(0.75)
    assert a == pytest.approx(1 / 11 * 0.25 + 10 / 11 * 0.75)
    assert a > 0.5
    # more concentration => higher AUL
    more = _labeled(spark, ["big"] * 15 + [f"s{i}" for i in range(5)])
    assert aul_score(more) > a


def test_aul_scale_free(spark):
    base = ["a"] * 4 + ["b", "c"]
    tripled = [x + suffix for suffix in ("1", "2", "3") for x in base]
    d1 = _labeled(spark, base)
    d3 = _labeled(spark, tripled)
    assert aul_score(d3) == pytest.approx(aul_score(d1))
