"""Exact n-gram Jaccard similarity join (inverted-index style).

The reference computes exact resemblance only pairwise inside buckets; this
operator is the set-similarity-join generalization used for (a) DuckDB-
verifiable ground truth for the LSH pipeline and (b) exact n-gram-Jaccard
deduplication when the corpus is small enough to skip LSH.

Plan shape: explode distinct shingles -> self-equi-join on shingle
-> groupBy(pair).count() = |A∩B| (map-side partial agg) -> join per-doc set
sizes -> Jaccard filter.  Scale guard: `df_cap` drops shingles occurring in
more than df_cap documents before the join (a shingle shared by k docs
contributes k^2 join rows — the hot-band problem in another costume).
Dropping such shingles lowers computed Jaccard slightly for affected pairs;
it is OFF by default to keep exact semantics and MUST be reported when on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..functions.text import shingles_for


def shingle_rows(df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(id, shingle) — one row per distinct shingle per doc."""
    return df.select(
        F.col(cfg.id_col),
        F.explode(F.array_distinct(shingles_for(cfg))).alias("shingle"),
    )


def exact_jaccard_pairs(
    df: DataFrame,
    cfg: DedupConfig,
    threshold: float | None = None,
    df_cap: int | None = None,
) -> DataFrame:
    """(src, dst, inter, union, jaccard) for all pairs with exact shingle
    Jaccard >= threshold (default: cfg.resolved_jaccard_threshold)."""
    t = cfg.resolved_jaccard_threshold if threshold is None else threshold
    iid = cfg.id_col
    from ..micro import micro_rebound

    # dust-sized corpora run under a right-sized cloned session (micro.py);
    # this path is oracle-duty (exact all-pairs), so it is exercised at
    # small scale far more often than the banded pipeline
    df, _ = micro_rebound(df)
    sh = shingle_rows(df, cfg)

    if df_cap is not None:
        freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
        sh = sh.join(freq.where(F.col("df") <= df_cap), "shingle").drop("df")

    sizes = sh.groupBy(iid).agg(F.count("*").alias("set_size"))

    a = sh.select(F.col("shingle"), F.col(iid).alias("src"))
    b = sh.select(F.col("shingle"), F.col(iid).alias("dst"))
    inter = (
        a.join(b, "shingle")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed(iid, "src").withColumnRenamed("set_size", "sz_a"), "src")
        .join(sizes.withColumnRenamed(iid, "dst").withColumnRenamed("set_size", "sz_b"), "dst")
        .select(
            "src",
            "dst",
            "inter",
            (F.col("sz_a") + F.col("sz_b") - F.col("inter")).alias("union"),
        )
        .withColumn(
            "jaccard", F.col("inter").cast("double") / F.col("union").cast("double")
        )
    )
    return out.where(F.col("jaccard") >= F.lit(t))
