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
  attach      run the incremental streaming attach over a parquet file
              stream (--mode text|audio|fused; default drains with
              availableNow, --continuous keeps a processingTime trigger)
  rebuild     offline compaction of a streaming index (--mode
              text|audio|fused): re-cluster the accumulated signatures /
              sketches and swap corrected labels in (refuses while the
              attach stream's lease is held)
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


def _stream_index(mode: str, base: str):
    from lsh_hdc_spark.streaming import FusedStreamIndex, StreamIndex

    if mode == "fused":
        return FusedStreamIndex.at(base)
    return StreamIndex(f"{base}/sig", f"{base}/labels", f"{base}/keys")


def cmd_attach(args) -> None:
    from lsh_hdc_spark.config import DedupConfig
    from lsh_hdc_spark.streaming import (
        run_attach_stream,
        run_audio_attach_stream,
        run_fused_attach_stream,
    )

    spark = _session(args.shuffle_partitions)
    cfg = DedupConfig(id_col=args.id_col, text_col=args.text_col)
    schema = spark.read.parquet(args.source).schema
    index = _stream_index(args.mode, args.index)
    t0 = time.monotonic()
    if args.mode == "text":
        run_attach_stream(
            spark, args.source, schema, cfg, index, args.checkpoint,
            available_now=not args.continuous,
        )
    elif args.mode == "audio":
        run_audio_attach_stream(
            spark, args.source, schema, index, args.checkpoint,
            id_col=args.id_col, available_now=not args.continuous,
        )
    else:
        run_fused_attach_stream(
            spark, args.source, schema, cfg, index, args.checkpoint,
            available_now=not args.continuous,
        )
    n = spark.read.parquet(index.labels_dir).count()
    print(json.dumps({"labeled_rows": n, "wall_s": round(time.monotonic() - t0, 2)}))


def cmd_rebuild(args) -> None:
    from lsh_hdc_spark.config import DedupConfig
    from lsh_hdc_spark.streaming import (
        rebuild_audio_index,
        rebuild_fused_index,
        rebuild_index,
    )

    spark = _session(args.shuffle_partitions)
    index = _stream_index(args.mode, args.index)
    cfg = DedupConfig(id_col=args.id_col, text_col=args.text_col)
    t0 = time.monotonic()
    if args.mode == "text":
        rebuild_index(spark, cfg, index)
    elif args.mode == "audio":
        rebuild_audio_index(spark, index, id_col=args.id_col)
    else:
        rebuild_fused_index(spark, cfg, index)
    n = spark.read.parquet(index.labels_dir).count()
    print(json.dumps({"labeled_rows": n, "wall_s": round(time.monotonic() - t0, 2)}))


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

    a = sub.add_parser("attach")
    a.add_argument("--mode", choices=["text", "audio", "fused"], default="fused")
    a.add_argument("--source", required=True)
    a.add_argument("--index", required=True)
    a.add_argument("--checkpoint", required=True)
    a.add_argument("--id-col", default="clip_id")
    a.add_argument("--text-col", default="transcript")
    a.add_argument("--continuous", action="store_true")
    a.add_argument("--shuffle-partitions", type=int, default=None)
    a.set_defaults(fn=cmd_attach)

    r = sub.add_parser("rebuild")
    r.add_argument("--mode", choices=["text", "audio", "fused"], default="fused")
    r.add_argument("--index", required=True)
    r.add_argument("--id-col", default="clip_id")
    r.add_argument("--text-col", default="transcript")
    r.add_argument("--shuffle-partitions", type=int, default=None)
    r.set_defaults(fn=cmd_rebuild)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
