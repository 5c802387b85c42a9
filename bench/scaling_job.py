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
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("scaling-job")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        .getOrCreate()
    )
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
    print(
        json.dumps(
            {"wall_s": round(wall, 2), "rows": n, "clips_per_sec": round(n / wall, 1)}
        )
    )
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
