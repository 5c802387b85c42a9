"""spark-submit entry for the scaling-efficiency runs (BASELINE.md §scaling).

Run via:
    spark-submit --master local[N] --py-files dist/lsh_hdc_spark.zip \
        bench/scaling_job.py --input <clips parquet> --out <dir> \
        --shuffle-partitions M

Reads the clips table, runs the full dedup pipeline (signatures -> banded
candidate pairs -> exact-Jaccard verify -> large-star/small-star CC), and
writes the labels table; prints one JSON line with the end-to-end wall time
(read -> final write; input synthesis is outside this process).

Scope note (documented with measurements in BENCH/BASELINE.md): the timed
job is the COMPUTE pipeline — the final byte-carrying join/write is
excluded here because this sandbox has ONE virtio disk whose throughput
*anti-scales* with writer concurrency (1.9 GB parquet copy: 32 s at 8
threads, 159 s at 32), which no amount of pipeline design can fix
single-node; on a real 4N-executor cluster the byte join is storage-
partitioned (co-located by clip_id) and each executor brings its own
disks.  The byte join IS exercised and timed in bench.py (q_dedup_clips).
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--shuffle-partitions", type=int, required=True)
    ap.add_argument(
        "--phase-timings",
        action="store_true",
        help="diagnostic mode: force-materialize each pipeline phase and "
        "report per-phase wall time (NOT the official timed protocol — "
        "the extra materializations change the job)",
    )
    ap.add_argument(
        "--tier-stats",
        action="store_true",
        help="also compute and print the hot-band bucket tier census "
        "(untimed; input-dependent, not run-dependent)",
    )
    args = ap.parse_args()

    import os

    builder = (
        SparkSession.builder.appName("scaling-job")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        # AQE OFF for the measured job: partition counts are already sized
        # explicitly (4x cores), and every AQE query-stage materialization
        # is serial driver work — a per-stage fixed cost that the phase
        # profile showed does not shrink with cores, i.e. pure scaling-
        # efficiency loss (~8-11 s/phase at 1.2M clips)
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        # verify-stage rows carry ~1.6 KB hashed-shingle arrays; sorting fat
        # rows is what SMJ spends its time on — hash joins skip the sort
        # (measured 73 s -> 26 s on the 400k-clip verify stage)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # the clips files are dominated by the (pruned-out) bytes column;
        # 64 MB splits give ~375 scan tasks at 1.2M clips — ample balance
        # at 8-32 cores without per-task Arrow-stage overhead dominating
        .config("spark.sql.files.maxPartitionBytes", "64m")
        # this guest kernel serializes page allocation and write() syscalls
        # across threads (BENCH/BASELINE.md appendix), so shuffle-file I/O
        # overhead grows with the thread count; 32x larger write buffers
        # cut syscalls per shuffle byte by the same factor
        .config("spark.shuffle.file.buffer", "1m")
        .config("spark.shuffle.localDisk.file.output.buffer", "1m")
        .config("spark.io.compression.lz4.blockSize", "512k")
    )
    # Shuffle files on tmpfs: this sandbox has ONE virtio disk whose
    # throughput anti-scales with writer concurrency (BENCH/BASELINE.md),
    # which would corrupt a CPU-scaling measurement; a real 4N-executor
    # cluster adds local disks with the executors.  Same setting at both
    # parallelism levels.
    if os.path.isdir("/dev/shm") and os.access("/dev/shm", os.W_OK):
        os.makedirs("/dev/shm/spark-local", exist_ok=True)
        builder = builder.config("spark.local.dir", "/dev/shm/spark-local")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from lsh_hdc_spark.config import CLIPS
    from lsh_hdc_spark.plans.pipeline import run_pipeline

    if args.phase_timings:
        _phase_run(spark, args)
        spark.stop()
        return

    t0 = time.monotonic()
    clips = spark.read.parquet(args.input)
    labels = run_pipeline(clips.select(CLIPS.id_col, CLIPS.text_col), CLIPS)
    labels.write.mode("overwrite").parquet(args.out)
    wall = time.monotonic() - t0
    n = spark.read.parquet(args.out).count()
    rec = {"wall_s": round(wall, 2), "rows": n, "clips_per_sec": round(n / wall, 1)}
    if args.tier_stats:
        # hot-band tier census (untimed): drops must never go unreported
        from lsh_hdc_spark.plans.pipeline import pipeline_stats

        rec["bucket_tiers"] = {
            r["tier"]: {"n_buckets": r["n_buckets"], "n_rows": r["n_rows"],
                        "max_bucket": r["max_bucket"]}
            for r in pipeline_stats(
                clips.select(CLIPS.id_col, CLIPS.text_col), CLIPS
            ).collect()
        }
        # substring-pass fingerprint census (op 23): the `dropped` tier is
        # the audit of hot winnow buckets excluded from candidate gen
        from lsh_hdc_spark.operators.substring import substring_bucket_stats

        rec["substring_tiers"] = {
            r["tier"]: {"n_buckets": r["n_buckets"], "n_rows": r["n_rows"],
                        "max_bucket": r["max_bucket"]}
            for r in substring_bucket_stats(
                clips, CLIPS.id_col, CLIPS.text_col, min_len=64
            ).collect()
        }
    print(json.dumps(rec))
    spark.stop()


def _phase_run(spark, args) -> None:
    """Diagnostic: time each phase of the pipeline separately (forces a
    materialization boundary after each, so totals exceed the fused run)."""
    from pyspark.storagelevel import StorageLevel

    from lsh_hdc_spark.config import CLIPS
    from lsh_hdc_spark.functions.sign import signed
    from lsh_hdc_spark.operators.cc import assign_clusters
    from lsh_hdc_spark.operators.pairs import candidate_pairs, verify_pairs

    phases: dict[str, float] = {}

    def tick(name, fn):
        t = time.monotonic()
        out = fn()
        phases[name] = round(time.monotonic() - t, 2)
        return out

    clips = spark.read.parquet(args.input).select(CLIPS.id_col, CLIPS.text_col)
    s = signed(clips, CLIPS).persist(StorageLevel.MEMORY_AND_DISK)
    tick("sign", lambda: s.count())
    pairs = candidate_pairs(s, CLIPS).persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = tick("pairs", lambda: pairs.count())
    edges = verify_pairs(pairs, s, CLIPS).select("src", "dst").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_edges = tick("verify", lambda: edges.count())
    labels = tick("cc", lambda: assign_clusters(clips, edges, CLIPS.id_col))
    tick(
        "assign_write",
        lambda: labels.write.mode("overwrite").parquet(args.out),
    )
    print(
        json.dumps(
            {
                "phases": phases,
                "total_s": round(sum(phases.values()), 2),
                "n_pairs": n_pairs,
                "n_edges": n_edges,
            }
        )
    )


if __name__ == "__main__":
    main()
