"""Ranking / ROC evaluation (op 20): rank-based scores over (score, label)
columns and over clusterings.

Reference semantics: ``lsh_hdc/ranking.py::RocCurve`` and
``::aul_score_from_clusters`` [M] (SURVEY.md §2.2 op 20 — outside the
acceptance gate).  The reference materializes sorted lists in memory; here
everything reduces to one aggregation over DISTINCT scores (tiny relative
to the data: the cumulative sums run over the distinct-score frame, not
the items), so the operators hold at 10^12 rows.

AUC uses the Mann-Whitney rank-sum identity with the standard tie
correction (ties contribute 1/2): doubling keeps every intermediate an
exact integer; only the final division is floating point — which makes the
value reproducible across engines (the SQL oracle mirrors it term for
term).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _score_census(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """(score, n_pos, n_neg) per distinct score value; label_col is boolean
    (or 0/1)."""
    lab = F.col(label_col).cast("int")
    return df.groupBy(F.col(score_col).alias("score")).agg(
        F.sum(lab).alias("n_pos"),
        F.sum(1 - lab).alias("n_neg"),
    )


def roc_auc_counts(df: DataFrame, score_col: str, label_col: str) -> tuple[int, int, int]:
    """(2U, P, N): doubled Mann-Whitney U statistic plus class counts —
    exact integers.  AUC = 2U / (2*P*N).

    2U = Sigma over distinct scores s (ascending) of
         n_pos(s) * (2 * n_neg_below(s) + n_neg(s)).
    """
    census = _score_census(df, score_col, label_col)
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    per = census.select(
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(w), F.lit(0)).alias("n_neg_below"),
    )
    row = per.agg(
        F.coalesce(
            F.sum(F.col("n_pos") * (2 * F.col("n_neg_below") + F.col("n_neg"))),
            F.lit(0),
        ).alias("u2"),
        F.coalesce(F.sum("n_pos"), F.lit(0)).alias("p"),
        F.coalesce(F.sum("n_neg"), F.lit(0)).alias("n"),
    ).collect()[0]
    return int(row["u2"]), int(row["p"]), int(row["n"])


def roc_auc(df: DataFrame, score_col: str, label_col: str) -> float:
    """Area under the ROC curve (ties count 1/2), driver scalar."""
    u2, p, n = roc_auc_counts(df, score_col, label_col)
    if p == 0 or n == 0:
        return 0.5
    return u2 / (2 * p * n)


def roc_points(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """(threshold, tp, fp, tpr, fpr) — one point per distinct score,
    descending threshold (predict positive when score >= threshold).
    Mirrors ``RocCurve`` [M]; the window runs over distinct scores only."""
    census = _score_census(df, score_col, label_col)
    w = Window.orderBy(F.desc("score")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = census.agg(
        F.sum("n_pos").alias("p"), F.sum("n_neg").alias("n")
    ).collect()[0]
    p, n = int(tot["p"]), int(tot["n"])
    return census.select(
        F.col("score").alias("threshold"),
        F.sum("n_pos").over(w).alias("tp"),
        F.sum("n_neg").over(w).alias("fp"),
    ).select(
        "threshold",
        "tp",
        "fp",
        (F.col("tp").cast("double") / F.lit(max(p, 1))).alias("tpr"),
        (F.col("fp").cast("double") / F.lit(max(n, 1))).alias("fpr"),
    )


def aul_counts(
    labels: DataFrame, cluster_col: str = "cluster_id"
) -> tuple[int, int, int]:
    """(a2, n_clusters, n_items): the AUL trapezoid area staged as ONE exact
    integer — AUL = a2 / (2 * n_clusters * n_items).

    Scanning distinct sizes descending with dx = n_c/C, dy = n_items/N,
    area = Σ dx*(y + dy/2) multiplies out to
    a2 = Σ n_c * (2 * items_in_larger_sizes + n_items_at_size): every
    intermediate is an integer, so the value is reproducible bit-for-bit
    across engines (the roc_auc_counts pattern; closes the VERDICT r3
    AUL-oracle item).  The aggregation runs over DISTINCT cluster sizes
    only — tiny at any corpus scale."""
    sizes = labels.groupBy(cluster_col).agg(F.count("*").alias("sz"))
    census = sizes.groupBy("sz").agg(F.count("*").alias("n_c"))
    per = census.select("sz", "n_c", (F.col("sz") * F.col("n_c")).alias("n_it"))
    w = Window.orderBy(F.desc("sz")).rowsBetween(Window.unboundedPreceding, -1)
    cum = per.select(
        "n_c",
        "n_it",
        F.coalesce(F.sum("n_it").over(w), F.lit(0)).alias("above"),
    )
    row = cum.agg(
        F.coalesce(
            F.sum(F.col("n_c") * (2 * F.col("above") + F.col("n_it"))), F.lit(0)
        ).alias("a2"),
        F.coalesce(F.sum("n_c"), F.lit(0)).alias("c"),
        F.coalesce(F.sum("n_it"), F.lit(0)).alias("n"),
    ).collect()[0]
    return int(row["a2"]), int(row["c"]), int(row["n"])


def aul_score(labels: DataFrame, cluster_col: str = "cluster_id") -> float:
    """Area under the lift curve of a clustering, scanned largest-cluster
    first — the unsupervised quality score of ``aul_score_from_clusters``
    [M]: clusters are ranked by size descending, x accumulates the fraction
    of CLUSTERS scanned, y the fraction of ITEMS covered; AUL is the
    trapezoidal area.

    A clustering that concentrates items into a few large clusters
    front-loads the curve (AUL -> 1); all-singletons (and any equal-size
    partition) gives the diagonal, AUL = 0.5.  Documented reconstruction:
    the reference module is unreadable (SURVEY.md §0), so the exact curve
    convention carries [M] confidence; the pinned behaviors (monotone in
    concentration, 0.5 for uniform sizes, scale-free) are pytest-asserted.

    Distributed shape: one groupBy(cluster) + one aggregation over DISTINCT
    sizes (the curve is linear between knees, one knee per distinct size,
    so the exact area needs only the tiny distinct-size census); the area
    is staged as an exact integer by aul_counts and divided once here.
    """
    a2, c, n = aul_counts(labels, cluster_col)
    if c == 0 or n == 0:
        return 0.5
    return a2 / (2 * c * n)
