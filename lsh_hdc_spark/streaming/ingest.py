"""Structured-Streaming incremental dedup ingest (streaming twin of op 14).

The batch pipeline (plans/pipeline.py) rebuilds clusters from scratch; this
module handles the production steady state instead: a corpus has already
been clustered, and new items arrive continuously.  Each micro-batch is

    sign (stateless mapInPandas — streaming-safe)
      -> in-batch candidate pairs + Jaccard verify + CC   (novel dup groups
         arriving together co-cluster immediately)
      -> band-key stream-static join against the signature INDEX of
         everything ingested so far
      -> exact-Jaccard verify vs the indexed shingle arrays
      -> per in-batch cluster: adopt the best-matching indexed cluster's
         label (max jaccard, ties to the smallest label), else keep the
         in-batch label
      -> append labels to the output table, append the batch's signatures
         to the index (so LATER batches can match THIS batch's items).

Semantics vs a full rebuild: attach is greedy — a new item can merge into
exactly one existing cluster, and two existing clusters are never merged by
a bridging arrival (that requires the periodic batch rebuild, which is the
documented compaction story; same trade as any streaming union-find).

Scale design (10^12-row index, SURVEY.md §4):
 - the heavy side of the stream-static join is the INDEX; store it
   partitioned/bucketed by band_key (Iceberg storage-partitioned join) so
   only the micro-batch side shuffles;
 - the index stores (id, shingles_h, sketch, band_keys) — no text, no
   bytes; payload columns never enter the stream plan;
 - exactly-once: the whole per-batch step runs inside foreachBatch under a
   checkpointLocation; label/index appends are idempotent per epoch for
   the parquet sink only if reruns of a failed epoch are compacted away —
   production should use a transactional table format (Iceberg) for both
   appends, which makes the epoch atomic;
 - backfill = the same code path under trigger(availableNow=True).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import DedupConfig
from ..functions.sign import signed
from ..operators.cc import assign_clusters
from ..operators.pairs import candidate_pairs, verify_pairs


@dataclass(frozen=True)
class StreamIndex:
    """On-disk state the stream attaches to: `sig_dir` holds the signature
    index (id, shingles_h, sketch, band_keys, cluster_id); `labels_dir`
    accumulates the output labels.  Both are plain parquet here (no Iceberg
    jar offline); the layout contract is append-only."""

    sig_dir: str
    labels_dir: str

    def exists(self, spark: SparkSession) -> bool:
        try:
            spark.read.parquet(self.sig_dir).schema
            return True
        except Exception:
            return False


def _best_index_match(
    s_new: DataFrame, idx: DataFrame, cfg: DedupConfig
) -> DataFrame:
    """(id, idx_cluster) — each new item's best-matching indexed cluster at
    jaccard >= threshold; at most one row per new id (max jaccard, ties to
    the smallest cluster label for determinism)."""
    iid = cfg.id_col
    new_keys = s_new.select(
        F.col(iid).alias("_nid"),
        F.array_distinct("shingles_h").alias("_nsh"),
        F.explode("band_keys").alias("band_key"),
    )
    idx_keys = idx.select(
        F.col("cluster_id").alias("_icluster"),
        F.array_distinct("shingles_h").alias("_ish"),
        F.explode("band_keys").alias("band_key"),
    )
    cand = new_keys.join(idx_keys, "band_key").drop("band_key")
    inter = F.size(F.array_intersect("_nsh", "_ish"))
    union = F.size("_nsh") + F.size("_ish") - inter
    jac = inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")
    scored = (
        cand.select("_nid", "_icluster", jac.alias("_jac"))
        .where(F.col("_jac") >= F.lit(cfg.resolved_jaccard_threshold))
        # a cluster is reachable through many members/bands — keep its best
        .groupBy("_nid", "_icluster")
        .agg(F.max("_jac").alias("_jac"))
    )
    w = Window.partitionBy("_nid").orderBy(F.desc("_jac"), F.asc("_icluster"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(F.col("_nid").alias(iid), F.col("_icluster").alias("idx_cluster"))
    )


def attach_batch(
    batch: DataFrame, cfg: DedupConfig, index: StreamIndex
) -> tuple[DataFrame, DataFrame]:
    """One micro-batch of incremental dedup: returns (labels, new_index_rows)
    where labels is (id, cluster_id) for every batch row and new_index_rows
    is the batch's signature rows (with final labels) to append to the
    index.  Pure batch-DataFrame logic so it is unit-testable outside a
    stream and reusable from foreachBatch."""
    spark = batch.sparkSession
    iid = cfg.id_col
    # localCheckpoint (not persist): the signed frame is read by the verify
    # joins, the index match, and the index append; eager materialization
    # computes it once and the blocks are released by the context cleaner
    # when the batch's frames go out of scope — no per-batch unpersist
    # bookkeeping to leak across a long-running stream
    s_new = signed(batch, cfg).localCheckpoint(eager=True)

    # in-batch clustering (novel duplicate groups arriving together)
    edges = verify_pairs(candidate_pairs(s_new, cfg), s_new, cfg).select("src", "dst")
    local = assign_clusters(batch.select(iid), edges, iid).select(
        iid, F.col("cluster_id").alias("local_cluster")
    )

    if index.exists(spark):
        idx = spark.read.parquet(index.sig_dir)
        best = _best_index_match(s_new, idx, cfg)
        # adopt per LOCAL cluster: any member match attaches the whole local
        # cluster; when members match different index clusters the smallest
        # label wins (deterministic; the clusters are NOT merged — greedy
        # semantics per the module docstring)
        adopt = (
            local.join(best, iid)
            .groupBy("local_cluster")
            .agg(F.min("idx_cluster").alias("idx_cluster"))
        )
        labels = local.join(adopt, "local_cluster", "left").select(
            iid,
            F.coalesce("idx_cluster", "local_cluster").alias("cluster_id"),
        )
    else:
        labels = local.select(iid, F.col("local_cluster").alias("cluster_id"))

    new_rows = s_new.join(labels, iid).select(
        iid, "shingles_h", "sketch", "band_keys", "cluster_id"
    )
    return labels, new_rows


def run_attach_stream(
    spark: SparkSession,
    source_dir: str,
    schema: str,
    cfg: DedupConfig,
    index: StreamIndex,
    checkpoint_dir: str,
    available_now: bool = True,
) -> None:
    """Run the incremental ingest over a parquet file stream and block until
    the trigger drains.  `checkpoint_dir` makes the stream resumable: a
    restart skips every file already committed (tested in
    tests/test_streaming.py).  availableNow=True is the backfill/batch-
    drain mode; pass False for a continuously-running micro-batch job."""

    def _per_batch(batch: DataFrame, epoch_id: int) -> None:
        labels, new_rows = attach_batch(batch, cfg, index)
        labels.withColumn("epoch", F.lit(epoch_id)).write.mode("append").parquet(
            index.labels_dir
        )
        new_rows.write.mode("append").parquet(index.sig_dir)

    reader = spark.readStream.schema(schema).parquet(source_dir)
    writer = reader.writeStream.foreachBatch(_per_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    trigger = {"availableNow": True} if available_now else {"processingTime": "10 seconds"}
    q = writer.trigger(**trigger).start()
    try:
        q.awaitTermination()
    finally:
        if q.isActive:
            q.stop()
