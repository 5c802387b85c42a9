"""spark-submit entry for the scaling-efficiency runs (BASELINE.md §scaling).

Run via:
    spark-submit --master local[N] --py-files dist/lsh_hdc_spark.zip \
        bench/scaling_job.py --input <clips parquet> --out <dir> \
        --shuffle-partitions M

Reads the clips table, runs the full dedup pipeline (signatures -> banded
candidate pairs -> exact-Jaccard verify -> large-star/small-star CC ->
label join incl. audio bytes), writes the final output table, and prints
one JSON line with the end-to-end wall time (read -> final write, per the
BASELINE.md honesty protocol — input synthesis is outside this process).
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
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("scaling-job")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from lsh_hdc_spark.config import CLIPS
    from lsh_hdc_spark.plans.pipeline import run_pipeline_clips

    t0 = time.monotonic()
    clips = spark.read.parquet(args.input)
    out = run_pipeline_clips(clips, CLIPS)
    out.write.mode("overwrite").option("parquet.enable.dictionary", "false").parquet(
        args.out
    )
    wall = time.monotonic() - t0
    n = spark.read.parquet(args.out).count()
    print(
        json.dumps(
            {"wall_s": round(wall, 2), "rows": n, "clips_per_sec": round(n / wall, 1)}
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
