"""Similarity search over embedding columns.

Two paths:
 - ``cosine_topk``: exact brute-force top-k — the correctness baseline,
   O(n^2) pairs; only for modest n or as the verify stage.
 - ``ann_topk``: random-hyperplane LSH (SimHash for vectors, Charikar 2002)
   — bucket on band keys of the sign pattern, search within buckets only.
   The scale path: recall < 1 (tunable via bands/rows), cost ~ bucket sizes.

All arithmetic is JVM-side (zip_with/aggregate in whole-stage codegen);
vectors are cast to double so the fold order and precision are well-defined.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import hash_seeds, mix64


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def _normalized(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    v = F.col(vec_col).cast("array<double>")
    staged = df.select(F.col(id_col), v.alias("_v"), norm(v).alias("_n"))
    return staged.select(
        F.col(id_col),
        F.transform(F.col("_v"), lambda x: x / F.col("_n")).alias("_unit"),
    )


def cosine_topk(
    df: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, neighbor_id, cosine, rank): exact top-k cosine neighbors per
    vector (self excluded).  Brute force — O(n^2/2) similarity evaluations;
    at scale use ann_topk and verify a sample against this."""
    unit = _normalized(df, id_col, vec_col)
    a = unit.select(F.col(id_col).alias("vec_id"), F.col("_unit").alias("va"))
    b = unit.select(F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("vb"))
    sims = (
        a.join(b, F.col("vec_id") < F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", dot(F.col("va"), F.col("vb")).alias("cosine"))
    )
    both = sims.unionByName(
        sims.select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("vec_id").alias("neighbor_id"),
            "cosine",
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        both.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-Gaussian hyperplanes from the splitmix64 stream
    (Box-Muller over two uniform streams)."""
    n = dim * n_bits
    s1 = np.array(hash_seeds(n, seed), dtype=np.uint64)
    s2 = np.array(hash_seeds(n, seed ^ 0x5A5A5A5A), dtype=np.uint64)
    u1 = (mix64(s1).astype(np.float64) + 1.0) / 2.0**64  # (0,1]
    u2 = mix64(s2).astype(np.float64) / 2.0**64
    g = np.sqrt(-2.0 * np.log(u1)) * np.cos(2 * np.pi * u2)
    return g.reshape(n_bits, dim).tolist()


def ann_topk(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 16,
    bands: int = 4,
    seed: int = 0xA22,
    bucket_cap: int = 2000,
) -> DataFrame:
    """Approximate top-k cosine neighbors: random-hyperplane signature of
    n_bits, split into `bands` band keys; candidate pairs share >=1 band;
    exact cosine is computed only within buckets.  Buckets above bucket_cap
    are dropped (hot-bucket guard, same policy as the text pipeline)."""
    if n_bits % bands != 0:
        raise ValueError("bands must divide n_bits")
    rows_per_band = n_bits // bands
    dim = len(df.select(vec_col).first()[0])
    planes = _hyperplanes(dim, n_bits, seed)

    unit = _normalized(df, id_col, vec_col)
    bits = [
        F.when(dot(F.col("_unit"), F.array(*[F.lit(float(w)) for w in plane])) >= 0, 1)
        .otherwise(0)
        .alias(f"b{i}")
        for i, plane in enumerate(planes)
    ]
    sig = unit.select(F.col(id_col), "_unit", *bits)
    band_cols = []
    for bd in range(bands):
        parts = [F.col(f"b{bd * rows_per_band + j}") for j in range(rows_per_band)]
        band_cols.append(
            F.xxhash64(F.lit(bd), F.concat_ws(",", *[p.cast("string") for p in parts]))
        )
    keyed = sig.select(
        F.col(id_col), F.col("_unit"), F.explode(F.array(*band_cols)).alias("bkey")
    )
    sizes = keyed.groupBy("bkey").agg(F.count("*").alias("bs"))
    keyed = keyed.join(
        sizes.where((F.col("bs") >= 2) & (F.col("bs") <= bucket_cap)), "bkey"
    )
    a = keyed.select("bkey", F.col(id_col).alias("vec_id"), F.col("_unit").alias("va"))
    b = keyed.select(
        "bkey", F.col(id_col).alias("neighbor_id"), F.col("_unit").alias("vb")
    )
    cand = (
        a.join(b, "bkey")
        .where(F.col("vec_id") < F.col("neighbor_id"))
        .select("vec_id", "neighbor_id", "va", "vb")
        .dropDuplicates(["vec_id", "neighbor_id"])
        .select("vec_id", "neighbor_id", dot(F.col("va"), F.col("vb")).alias("cosine"))
    )
    both = cand.unionByName(
        cand.select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("vec_id").alias("neighbor_id"),
            "cosine",
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        both.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
