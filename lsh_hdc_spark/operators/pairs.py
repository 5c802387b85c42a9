"""Candidate pair generation + verification (ops 9-11, 25).

Reference semantics: ``lsh_hdc/cluster.py::Cluster.add_item`` inserts each
item into every band-key bucket and unions it with every co-bucketed peer
that passes the sketch filter (SURVEY.md §2.1 ops 9-10); exact-Jaccard
verification is promoted to a mandatory stage by BASELINE.json north_star.

Spark design: the in-memory bucket map becomes ``groupBy(band_key)`` — the
shuffle IS the bucket map.  Pair generation is a band-key self-join (pure
JVM, AQE skew-join eligible) with a three-tier hot-band policy
(BASELINE.json mandates salted repartitioning for hot bands):

 - bucket size <= pair_cap: full within-bucket pairing (self-join).
 - pair_cap < size <= drop_cap: *salted anchor* pairing — members are
   salted into `salt_buckets` sub-buckets, a per-(key, salt) partial min
   picks anchor candidates (two-phase salted aggregation; no single
   partition ever sees the whole hot bucket), the lowest `anchor_fanout`
   anchors per key are kept, and each member pairs with each anchor.
   Connectivity through the bucket is preserved (every member touches the
   same anchors) at O(size * fanout) instead of O(size^2) pairs; edges that
   exist only between two non-anchor members may be missed — acceptable
   because a band bucket this hot carries almost no precision signal.
 - size > drop_cap: the band key is dropped entirely and counted in the
   `hot_bands_dropped` metric (never silently — SURVEY.md §2.3 op 25).

All id comparisons order pairs canonically (src < dst) so output is
deterministic under any partitioning (SURVEY.md §2.5.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import DedupConfig


def band_key_rows(signed_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """(id, band_key) — one row per item per band; empty signatures emit
    no rows (explode of an empty/null array)."""
    return signed_df.select(
        F.col(cfg.id_col), F.explode("band_keys").alias("band_key")
    )


def bucket_stats(keys: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Per-tier bucket census: (tier, n_buckets, n_rows).  Feeds the stage
    metrics table; `dropped` tier > 0 must be surfaced, never hidden."""
    sizes = keys.groupBy("band_key").agg(F.count("*").alias("bucket_size"))
    tier = (
        F.when(F.col("bucket_size") < 2, F.lit("singleton"))
        .when(F.col("bucket_size") <= cfg.pair_cap, F.lit("cold"))
        .when(F.col("bucket_size") <= cfg.drop_cap, F.lit("hot_anchor"))
        .otherwise(F.lit("dropped"))
    )
    return (
        sizes.select(tier.alias("tier"), "bucket_size")
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("bucket_size").alias("n_rows"),
            F.max("bucket_size").alias("max_bucket"),
        )
    )


def candidate_pairs(signed_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Distinct candidate (src, dst) pairs with src < dst from shared band
    keys, under the tiered hot-band policy."""
    iid = cfg.id_col
    keys = band_key_rows(signed_df, cfg)

    # bucket_size via a window count over the band-key exchange: the keys
    # frame is shuffled by band_key exactly ONCE, and the self-join below
    # reuses that partitioning.  The previous groupBy + join-back shuffled
    # the keys twice (once into the aggregate, once into the join) and
    # added two stage barriers per query (guide §2.3/§2.4).  Skew posture
    # is unchanged: a degenerate band key lands in one partition either
    # way, the window is count-only (streaming over the sorted run), and
    # the hot/drop tiers bound what is done with it afterwards.
    #
    # The sized frame is then PINNED: it feeds both self-join sides and
    # the salted hot path, and DataFrame self-references re-evaluate their
    # subtree (runtime-verified: zero ReusedExchange, the explode+window
    # chain executed 3x).  localCheckpoint preserves the band_key hash
    # partitioning on 4.1.2, so the downstream joins/aggregations read the
    # materialized blocks with NO further exchange — measured 2.1x on the
    # 20k-clip label pipeline (construct 5.1-6.4 s -> 2.9-3.0 s).  At
    # corpus scale this trades 2+ extra shuffles of the keys table for
    # one local materialization + reads — the substring/audio fingerprint
    # pinning discipline (PLANS.md §9).
    keys = (
        keys.withColumn(
            "bucket_size", F.count("*").over(Window.partitionBy("band_key"))
        )
        .where(F.col("bucket_size") >= 2)
        .localCheckpoint(eager=False)
    )

    cold = keys.where(F.col("bucket_size") <= cfg.pair_cap).drop("bucket_size")
    hot = keys.where(
        (F.col("bucket_size") > cfg.pair_cap)
        & (F.col("bucket_size") <= cfg.drop_cap)
    ).drop("bucket_size")

    a = cold.select(F.col("band_key"), F.col(iid).alias("src"))
    b = cold.select(F.col("band_key"), F.col(iid).alias("dst"))
    pairs_cold = a.join(b, "band_key").where(F.col("src") < F.col("dst")).select(
        "src", "dst"
    )

    # --- salted anchor path for hot buckets --------------------------------
    hid = F.xxhash64(F.col(iid))  # deterministic anchor order, skew-free
    salted = hot.select(
        "band_key",
        F.col(iid),
        F.pmod(hid, F.lit(cfg.salt_buckets)).alias("salt"),
        hid.alias("h"),
    )
    partial_min = salted.groupBy("band_key", "salt").agg(
        F.min(F.struct(F.col("h"), F.col(iid).alias("aid"))).alias("m")
    )
    anchors = (
        partial_min.select("band_key", F.col("m.h").alias("h"), F.col("m.aid").alias("aid"))
        .withColumn(
            "rk",
            F.row_number().over(Window.partitionBy("band_key").orderBy("h", "aid")),
        )
        .where(F.col("rk") <= cfg.anchor_fanout)
        .select("band_key", "aid")
    )
    pairs_hot = (
        hot.join(anchors, "band_key")
        .where(F.col(iid) != F.col("aid"))
        .select(
            F.least(F.col(iid), F.col("aid")).alias("src"),
            F.greatest(F.col(iid), F.col("aid")).alias("dst"),
        )
    )

    return pairs_cold.unionByName(pairs_hot).distinct()


def verify_pairs(
    pairs: DataFrame, signed_df: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """Exact-Jaccard (and optional sketch-Hamming) verification of candidate
    pairs -> (src, dst, jaccard) edges.

    Jaccard is computed JVM-side on the hashed shingle arrays
    (array_intersect/size — whole-stage codegen); the optional b-bit sketch
    Hamming pre-filter (op 10) is bit_count(xor) <= max_hamming, mirroring
    ``lsh_hdc/__init__.py::hamming``.
    """
    iid = cfg.id_col
    # sketch rides the two fat array joins only when the Hamming pre-filter
    # is actually on — with sketch_bits=0 shuffling it is pure waste
    use_sketch = cfg.sketch_bits > 0
    side_cols = [F.col(iid), F.array_distinct("shingles_h").alias("sh")]
    if use_sketch:
        side_cols.append(F.col("sketch"))
    side = signed_df.select(*side_cols)
    left = side.select(
        F.col(iid).alias("src"),
        F.col("sh").alias("sh_a"),
        *([F.col("sketch").alias("sk_a")] if use_sketch else []),
    )
    right = side.select(
        F.col(iid).alias("dst"),
        F.col("sh").alias("sh_b"),
        *([F.col("sketch").alias("sk_b")] if use_sketch else []),
    )
    j = pairs.join(left, "src").join(right, "dst")
    if use_sketch:
        j = j.where(
            F.bit_count(F.col("sk_a").bitwiseXOR(F.col("sk_b"))) <= cfg.max_hamming
        )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = (inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")).alias(
        "jaccard"
    )
    return (
        j.select("src", "dst", jac)
        .where(F.col("jaccard") >= F.lit(cfg.resolved_jaccard_threshold))
    )
