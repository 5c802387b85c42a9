"""spark-submit CLI for the dedup pipeline (op 26).

    spark-submit --master <...> --py-files dist/lsh_hdc_spark.zip \
        lsh_hdc_spark/cli.py dedup \
        --input /path/clips_parquet --output /path/out \
        [--id-col clip_id --text-col transcript] \
        [--checkpoint-dir /path/warehouse --run-id run1 --no-resume] \
        [--span 3 --width 12 --bandwidth 3 --min-support 1] \
        [--substring-min-len 64] [--check-invariants]

Subcommands:
  dedup       run the pipeline, write the labeled output table
  invariants  verify transcript-equality + PCM SNR >= 30 dB between a
              source table and a pipeline output table
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql import SparkSession


def _session(shuffle_partitions: int | None) -> SparkSession:
    b = (
        SparkSession.builder.appName("lsh-hdc-spark")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
    )
    if shuffle_partitions:
        b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def cmd_dedup(args) -> None:
    from lsh_hdc_spark.config import DedupConfig
    from lsh_hdc_spark.plans.checkpoints import run_pipeline_resumable
    from lsh_hdc_spark.plans.pipeline import run_pipeline

    spark = _session(args.shuffle_partitions)
    cfg = DedupConfig(
        id_col=args.id_col,
        text_col=args.text_col,
        span=args.span,
        width=args.width,
        bandwidth=args.bandwidth,
        min_support=args.min_support,
        substring_min_len=args.substring_min_len,
    )
    t0 = time.monotonic()
    src = spark.read.parquet(args.input)
    narrow = src.select(cfg.id_col, cfg.text_col)
    if args.checkpoint_dir:
        labels, runner = run_pipeline_resumable(
            spark, narrow, cfg, args.checkpoint_dir,
            run_id=args.run_id, resume=not args.no_resume,
        )
    else:
        labels = run_pipeline(narrow, cfg)
    out = src.join(labels, cfg.id_col)
    out.write.mode("overwrite").option(
        "parquet.enable.dictionary", "false"  # blob columns: see bench.py
    ).parquet(args.output)
    wall = time.monotonic() - t0
    n = spark.read.parquet(args.output).count()
    rec = {"rows": n, "wall_s": round(wall, 2), "rows_per_sec": round(n / wall, 1)}
    if args.check_invariants:
        from lsh_hdc_spark.functions.audio import audio_invariants, invariant_violations

        viol = invariant_violations(
            audio_invariants(src, spark.read.parquet(args.output), cfg.id_col)
        )
        rec["invariant_violations"] = viol
    print(json.dumps(rec))


def cmd_invariants(args) -> None:
    from lsh_hdc_spark.functions.audio import audio_invariants, invariant_violations

    spark = _session(args.shuffle_partitions)
    src = spark.read.parquet(args.source)
    out = spark.read.parquet(args.output)
    inv = audio_invariants(src, out, args.id_col)
    print(json.dumps({"violations": invariant_violations(inv), "rows": inv.count()}))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="lsh_hdc_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("dedup")
    d.add_argument("--input", required=True)
    d.add_argument("--output", required=True)
    d.add_argument("--id-col", default="clip_id")
    d.add_argument("--text-col", default="transcript")
    d.add_argument("--span", type=int, default=3)
    d.add_argument("--width", type=int, default=12)
    d.add_argument("--bandwidth", type=int, default=3)
    d.add_argument("--min-support", type=int, default=1)
    d.add_argument("--substring-min-len", type=int, default=None)
    d.add_argument("--checkpoint-dir", default=None)
    d.add_argument("--run-id", default="run0")
    d.add_argument("--no-resume", action="store_true")
    d.add_argument("--shuffle-partitions", type=int, default=None)
    d.add_argument("--check-invariants", action="store_true")
    d.set_defaults(fn=cmd_dedup)

    i = sub.add_parser("invariants")
    i.add_argument("--source", required=True)
    i.add_argument("--output", required=True)
    i.add_argument("--id-col", default="clip_id")
    i.add_argument("--shuffle-partitions", type=int, default=None)
    i.set_defaults(fn=cmd_invariants)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
