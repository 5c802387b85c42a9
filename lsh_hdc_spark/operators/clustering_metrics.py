"""Cluster-quality metrics (ops 16-19): contingency build, entropy scores
(homogeneity / completeness / V-measure, NMI), adjusted Rand, and the
pair-confusion family (precision / recall / F1 on duplicate pairs, Cohen's
kappa, Matthews correlation).

Reference semantics: ``lsh_hdc/metrics.py::ClusteringMetrics`` and
``::ConfusionMatrix2`` [M] (SURVEY.md §2.2) build an in-memory contingency
table over (true label, predicted cluster) and derive every score from it.
At 10^12 rows the pair sets explode quadratically, so nothing here ever
materializes pairs: every pair-level count is a polynomial of contingency
cell/margin counts (sum of C(nij,2) etc. — the standard pair-confusion
identity), which reduces to groupBy aggregations.  Only O(1) scalars reach
the driver (SURVEY.md §3.3).

Counting is done in DECIMAL(38,0): C(n,2) at n=10^12 is ~5*10^23, far past
LongType, and ANSI mode (the tested default) turns silent wraps into query
kills.  The driver-side finishing math uses Python ints (arbitrary
precision), so no precision is lost anywhere.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def contingency(df: DataFrame, true_col: str, pred_col: str) -> DataFrame:
    """(true, pred, n) cell counts — the distributed contingency table
    (op 16).  Mirrors ``ClusteringMetrics`` construction [M]."""
    return df.groupBy(
        F.col(true_col).alias("true"), F.col(pred_col).alias("pred")
    ).agg(F.count("*").alias("n"))


def _sum_c2_twice(counts: DataFrame, col: str = "n") -> int:
    """Sigma c*(c-1) over a count column, exact (decimal agg -> Python int).
    This is 2 * Sigma C(c,2); halving happens driver-side in exact ints."""
    d = F.col(col).cast(_DEC)
    row = counts.agg(
        F.coalesce(F.sum(d * (d - F.lit(1).cast(_DEC))), F.lit(0).cast(_DEC)).alias("s")
    ).collect()[0]
    return int(row["s"])


@dataclass(frozen=True)
class PairConfusion:
    """2x2 confusion over all item PAIRS: same/different true cluster x
    same/different predicted cluster (op 19, ``ConfusionMatrix2`` [M])."""

    n_items: int
    tp: int  # same true, same pred
    fp: int  # different true, same pred
    fn: int  # same true, different pred
    tn: int  # different true, different pred

    @property
    def total_pairs(self) -> int:
        return self.n_items * (self.n_items - 1) // 2


def pair_confusion(df: DataFrame, true_col: str, pred_col: str) -> PairConfusion:
    """Distributed pair-confusion counts: three aggregations over the
    contingency table, no pair materialization."""
    ct = contingency(df, true_col, pred_col).persist()
    try:
        tp2 = _sum_c2_twice(ct)
        a = ct.groupBy("true").agg(F.sum("n").alias("n"))
        b = ct.groupBy("pred").agg(F.sum("n").alias("n"))
        tpfn2 = _sum_c2_twice(a)
        tpfp2 = _sum_c2_twice(b)
        n = int(ct.agg(F.coalesce(F.sum("n"), F.lit(0))).collect()[0][0])
    finally:
        ct.unpersist()
    tp = tp2 // 2
    fn = tpfn2 // 2 - tp
    fp = tpfp2 // 2 - tp
    tn = n * (n - 1) // 2 - tp - fn - fp
    return PairConfusion(n_items=n, tp=tp, fp=fp, fn=fn, tn=tn)


def pair_metrics(pc: PairConfusion) -> dict[str, float]:
    """Scores derived from the pair confusion (ops 18-19): dup-pair
    precision/recall/F1 (the BASELINE recall>=0.99 gate metric), Rand,
    adjusted Rand, Cohen's kappa, Matthews correlation.  Exact-int
    numerators/denominators; one float division each."""
    tp, fp, fn, tn = pc.tp, pc.fp, pc.fn, pc.tn
    tot = tp + fp + fn + tn
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = 2 * tp / (2 * tp + fp + fn) if 2 * tp + fp + fn else 1.0
    rand = (tp + tn) / tot if tot else 1.0
    ari_den = (tp + fn) * (fn + tn) + (tp + fp) * (fp + tn)
    ari = 2 * (tp * tn - fn * fp) / ari_den if ari_den else 1.0
    # Cohen's kappa over the pair 2x2
    pe_num = (tp + fp) * (tp + fn) + (fn + tn) * (fp + tn)
    kappa_den = tot * tot - pe_num
    kappa = (tot * (tp + tn) - pe_num) / kappa_den if kappa_den else 1.0
    mcc_den2 = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    mcc = (tp * tn - fp * fn) / math.sqrt(mcc_den2) if mcc_den2 else 0.0
    return {
        "pair_precision": precision,
        "pair_recall": recall,
        "pair_f1": f1,
        "rand_index": rand,
        "adjusted_rand": ari,
        "cohen_kappa": kappa,
        "matthews_corr": mcc,
    }


def entropy_metrics(df: DataFrame, true_col: str, pred_col: str) -> dict[str, float]:
    """Homogeneity / completeness / V-measure and NMI (op 17), sklearn
    conventions (h = MI/H(true), c = MI/H(pred); both 1.0 when the
    respective entropy is 0).  Entropies and MI are distributed sums over
    the contingency and its margins; only scalars are collected."""
    ct = contingency(df, true_col, pred_col).persist()
    try:
        n = int(ct.agg(F.coalesce(F.sum("n"), F.lit(0))).collect()[0][0])
        if n == 0:
            return {
                "homogeneity": 1.0, "completeness": 1.0,
                "v_measure": 1.0, "nmi": 1.0,
            }
        a = ct.groupBy("true").agg(F.sum("n").alias("a"))
        b = ct.groupBy("pred").agg(F.sum("n").alias("b"))

        def _ent(counts: DataFrame, col: str) -> float:
            c = F.col(col).cast("double")
            s = counts.agg(F.sum(c * F.log(c)).alias("s")).collect()[0]["s"]
            # clamp: a single cluster gives H = 0 exactly in math but a
            # tiny negative in floats (ln(n) - n*ln(n)/n), which would
            # poison the sqrt below
            return max(math.log(n) - (s or 0.0) / n, 0.0)

        h_true = _ent(a, "a")
        h_pred = _ent(b, "b")
        j = ct.join(a, "true").join(b, "pred")
        nij = F.col("n").cast("double")
        mi_sum = j.agg(
            F.sum(
                nij
                * F.log(
                    F.lit(float(n))
                    * nij
                    / (F.col("a").cast("double") * F.col("b").cast("double"))
                )
            ).alias("s")
        ).collect()[0]["s"]
        mi = max((mi_sum or 0.0) / n, 0.0)
    finally:
        ct.unpersist()
    h = 1.0 if h_true == 0 else mi / h_true
    c = 1.0 if h_pred == 0 else mi / h_pred
    v = 0.0 if h + c == 0 else 2 * h * c / (h + c)
    denom = math.sqrt(h_true * h_pred)
    nmi = 1.0 if denom == 0 else mi / denom
    return {"homogeneity": h, "completeness": c, "v_measure": v, "nmi": nmi}


def clustering_report(df: DataFrame, true_col: str, pred_col: str) -> dict[str, float]:
    """Full score card: pair-confusion family + entropy family — the
    rebuild of the reference's ``ClusteringMetrics`` surface."""
    pc = pair_confusion(df, true_col, pred_col)
    out: dict[str, float] = {"n_items": float(pc.n_items)}
    out.update(pair_metrics(pc))
    out.update(entropy_metrics(df, true_col, pred_col))
    return out
