"""Stage checkpointing, per-partition lineage metrics, and resume (op 24).

The north rule requires every stage to write per-partition lineage and
signature/candidate/cluster-count metrics to catalog checkpoint tables so a
killed job resumes mid-pipeline (BASELINE.json north_star).

Offline substitute: **no Iceberg runtime jar exists in this sandbox**
(SURVEY.md §7.5), so ``CatalogIO`` is Parquet-directory-backed.  All table
I/O is isolated here: production swaps ``_write``/``_read`` to
``df.writeTo(name).using("iceberg")`` / ``spark.read.format("iceberg")``
plus a catalog config, with zero pipeline changes.

Lineage: each checkpoint table carries a ``_pid`` column = the shuffle
partition id of the task that produced the row; the stage's metrics table
records per-partition row counts from it, plus wall time and whether the
stage was recomputed or served from the checkpoint.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRICS_SCHEMA = (
    "run_id string, attempt string, stage string, partition_id int, "
    "rows long, wall_ms double, recomputed boolean"
)


class CatalogIO:
    """Minimal catalog: named tables in a base directory (Parquet offline;
    Iceberg in production — see module docstring)."""

    def __init__(self, spark: SparkSession, base_dir: str):
        self.spark = spark
        self.base_dir = base_dir

    def path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    def exists(self, name: str) -> bool:
        return os.path.exists(os.path.join(self.path(name), "_SUCCESS"))

    def write(self, df: DataFrame, name: str, mode: str = "overwrite") -> None:
        df.write.mode(mode).parquet(self.path(name))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))


class StageRunner:
    """Runs named pipeline stages with checkpoint/resume.

    ``stage(name, build)``: if the checkpoint table exists and resume is on,
    read it (recording recomputed=false); otherwise materialize ``build()``
    to the table (tagged with per-task partition ids) and record per-
    partition metrics.  The returned frame always comes from the table —
    every stage boundary is therefore also a lineage-truncation point.
    """

    def __init__(
        self,
        io: CatalogIO,
        run_id: str,
        resume: bool = True,
    ):
        self.io = io
        self.run_id = run_id
        self.resume = resume
        #: distinguishes this driver attempt's metric rows from earlier
        #: attempts of the same run_id in the append-only metrics table
        self.attempt = f"a{time.time_ns():x}"

    def _table(self, stage: str) -> str:
        return f"{self.run_id}/{stage}"

    def _record(self, stage: str, per_pid: list, wall_ms: float, recomputed: bool):
        rows = [
            (self.run_id, self.attempt, stage, int(pid), int(n), float(wall_ms), recomputed)
            for pid, n in per_pid
        ] or [(self.run_id, self.attempt, stage, -1, 0, float(wall_ms), recomputed)]
        mdf = self.io.spark.createDataFrame(rows, METRICS_SCHEMA)
        # one flat append-only table (NB: names starting with '_' are hidden
        # from Spark's file-source path filter — don't call it _metrics)
        self.io.write(mdf, f"{self.run_id}/metrics", mode="append")

    def stage(self, name: str, build: Callable[[], DataFrame]) -> DataFrame:
        table = self._table(name)
        if self.resume and self.io.exists(table):
            t0 = time.monotonic()
            out = self.io.read(table)
            self._record(name, [], (time.monotonic() - t0) * 1000, recomputed=False)
            return out.drop("_pid")
        t0 = time.monotonic()
        df = build().withColumn("_pid", F.spark_partition_id())
        self.io.write(df, table)
        wall_ms = (time.monotonic() - t0) * 1000
        written = self.io.read(table)
        per_pid = [
            (r["_pid"], r["n"])
            for r in written.groupBy("_pid").agg(F.count("*").alias("n")).collect()
        ]
        self._record(name, per_pid, wall_ms, recomputed=True)
        return written.drop("_pid")

    def metrics(self) -> DataFrame:
        return self.io.read(f"{self.run_id}/metrics")


def run_pipeline_resumable(
    spark: SparkSession,
    df: DataFrame,
    cfg,
    base_dir: str,
    run_id: str = "run0",
    resume: bool = True,
) -> tuple[DataFrame, StageRunner]:
    """Checkpointed flagship pipeline (SURVEY.md §4.3 resume points):

      S1 signed  -> S2 candidate pairs -> S3 verified edges
      -> S4 labels -> (caller writes/export final)

    Returns (labels, runner); runner.metrics() exposes the lineage rows.
    """
    from ..functions.sign import signed
    from ..operators.cc import assign_clusters
    from ..operators.pairs import bucket_stats, band_key_rows, candidate_pairs, verify_pairs

    io = CatalogIO(spark, base_dir)
    runner = StageRunner(io, run_id, resume=resume)

    base = (
        df.filter(F.expr(cfg.content_filter))
        if getattr(cfg, "content_filter", None)
        else df
    )
    s1 = runner.stage("signed", lambda: signed(base, cfg))
    runner.stage(
        "bucket_stats", lambda: bucket_stats(band_key_rows(s1, cfg), cfg)
    )
    s2 = runner.stage("pairs", lambda: candidate_pairs(s1, cfg))
    if cfg.substring_min_len:
        # substring-pass census rides next to the band census: hot winnow
        # buckets excluded from candidate gen must be counted, not silent
        from ..operators.substring import substring_bucket_stats

        runner.stage(
            "substring_bucket_stats",
            lambda: substring_bucket_stats(
                base, cfg.id_col, cfg.text_col, min_len=cfg.substring_min_len
            ),
        )

    def _edges() -> DataFrame:
        e = verify_pairs(s2, s1, cfg).select("src", "dst", "jaccard")
        if cfg.substring_min_len:
            from ..operators.substring import substring_pairs

            sub = substring_pairs(
                base, cfg.id_col, cfg.text_col, min_len=cfg.substring_min_len
            ).select("src", "dst", F.lit(1.0).alias("jaccard"))
            e = e.unionByName(sub)
        return e

    s3 = runner.stage("edges", _edges)
    s4 = runner.stage(
        "labels",
        lambda: assign_clusters(
            base.select(cfg.id_col), s3, cfg.id_col, cfg.min_support
        ),
    )
    if getattr(cfg, "content_filter", None):
        # excluded rows are part of the OUTPUT but not of any cluster
        s4 = df.select(cfg.id_col).join(s4, cfg.id_col, "left")
    return s4, runner
