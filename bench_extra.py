"""Extra benchmarks for optimization work (guide §1.4): noop-sink isolation
of each headline query and of its internal stages, plus explain capture.

NOT part of the driver contract — bench.py stays the frozen measurement.
Usage:
    python bench_extra.py stages        # per-stage noop timings
    python bench_extra.py explain       # write plans/r06/<q>_{before|after}.txt
    python bench_extra.py headline      # noop-sink timing of the 4 queries
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, BENCH_CLIPS (same as bench.py),
PLANS_TAG=before|after for explain output naming.
"""

from __future__ import annotations

import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_CLIPS = int(os.environ.get("BENCH_CLIPS", "20000"))
TAG = os.environ.get("PLANS_TAG", "before")


def _spark():
    from lsh_hdc_spark import get_spark

    return get_spark(cores=CPUS, app_name="bench_extra")


def _noop(df) -> float:
    t0 = time.monotonic()
    df.write.format("noop").mode("overwrite").save()
    return round(time.monotonic() - t0, 3)


def _clips_df(spark):
    clips_path = f"/tmp/bench_clips_{N_CLIPS}"
    if not os.path.exists(clips_path + "/_SUCCESS"):
        from lsh_hdc_spark.sources.clips import synth_clips

        synth_clips(spark, N_CLIPS, seed=42).write.mode("overwrite").option(
            "parquet.enable.dictionary", "false"
        ).parquet(clips_path)
    return spark.read.parquet(clips_path)


def _warm(spark):
    """Mirror bench.py's untimed warmup: JIT/worker spin-up + page cache."""
    from lsh_hdc_spark import DedupConfig
    from lsh_hdc_spark.plans.pipeline import run_pipeline

    run_pipeline(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        DedupConfig(),
    ).write.format("noop").mode("overwrite").save()
    _clips_df(spark).selectExpr(
        "sum(crc32(bytes))", "sum(length(transcript))"
    ).collect()
    spark.catalog.clearCache()


def cmd_stages() -> None:
    import json

    from pyspark.sql import functions as F

    from lsh_hdc_spark import DedupConfig
    from lsh_hdc_spark.config import CLIPS
    from lsh_hdc_spark.functions.sign import signed
    from lsh_hdc_spark.operators.knn import ann_topk
    from lsh_hdc_spark.operators.pairs import candidate_pairs, verify_pairs
    from lsh_hdc_spark.operators.substring import (
        substring_pairs,
        winnow_fingerprints,
    )
    from lsh_hdc_spark.plans.pipeline import run_pipeline, run_pipeline_clips

    spark = _spark()
    sc = spark.sparkContext
    _warm(spark)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    clips = _clips_df(spark)
    out: dict[str, float] = {}

    def run(name, thunk, repeat=2):
        best = float("inf")
        for _ in range(repeat):
            sc.setJobDescription(name)
            best = min(best, thunk())
            sc.setJobDescription(None)
            spark.catalog.clearCache()
        out[name] = best
        print(f"{name}: {best:.3f}s", flush=True)

    cfg = DedupConfig()
    from pyspark.storagelevel import StorageLevel

    # ---- docs pipeline stages ----
    run("docs.sign", lambda: _noop(signed(docs, cfg)))

    def _pairs():
        s = signed(docs, cfg).persist(StorageLevel.MEMORY_AND_DISK)
        t = _noop(candidate_pairs(s, cfg))
        s.unpersist()
        return t

    run("docs.pairs", _pairs)

    def _verify():
        s = signed(docs, cfg).persist(StorageLevel.MEMORY_AND_DISK)
        t = _noop(verify_pairs(candidate_pairs(s, cfg), s, cfg))
        s.unpersist()
        return t

    run("docs.verify", _verify)
    run("docs.full_pipeline", lambda: _noop(run_pipeline(docs, cfg)))

    # ---- clips stages ----
    run(
        "clips.labels_only",
        lambda: _noop(
            run_pipeline(clips.select("clip_id", "transcript"), CLIPS)
        ),
    )
    run("clips.full_join", lambda: _noop(run_pipeline_clips(clips, CLIPS)))

    def _clips_write():
        t0 = time.monotonic()
        run_pipeline_clips(clips, CLIPS).coalesce(8).write.mode(
            "overwrite"
        ).option("parquet.enable.dictionary", "false").parquet(
            f"/tmp/bx_out_{os.getpid()}/clips"
        )
        dt = time.monotonic() - t0
        os.sync()
        return round(dt, 3)

    run("clips.full_write", _clips_write)

    # ---- substring stages ----
    run(
        "substr.winnow",
        lambda: _noop(winnow_fingerprints(docs, "doc_id", "text", min_len=32)),
    )
    run(
        "substr.full",
        lambda: _noop(substring_pairs(docs, "doc_id", "text", min_len=32)),
    )

    # ---- ann ----
    run("ann.full", lambda: _noop(ann_topk(embs, k=5)))

    print(json.dumps(out))


def cmd_headline() -> None:
    import json

    from lsh_hdc_spark import DedupConfig
    from lsh_hdc_spark.config import CLIPS
    from lsh_hdc_spark.operators.knn import ann_topk
    from lsh_hdc_spark.operators.substring import substring_pairs
    from lsh_hdc_spark.plans.pipeline import run_pipeline, run_pipeline_clips

    spark = _spark()
    _warm(spark)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    clips = _clips_df(spark)
    out = {}
    for name, mk in [
        ("q_dedup_docs", lambda: run_pipeline(docs, DedupConfig())),
        ("q_dedup_clips", lambda: run_pipeline_clips(clips, CLIPS)),
        (
            "q_substring_docs",
            lambda: substring_pairs(docs, "doc_id", "text", min_len=32),
        ),
        ("q_ann_topk", lambda: ann_topk(embs, k=5)),
    ]:
        walls = []
        for _ in range(3):
            spark.sparkContext.setJobDescription(name)
            walls.append(_noop(mk()))
            spark.sparkContext.setJobDescription(None)
            spark.catalog.clearCache()
        out[name] = min(walls)
        print(f"{name}: {walls}", flush=True)
    print(json.dumps(out))


def cmd_explain() -> None:
    from lsh_hdc_spark import DedupConfig
    from lsh_hdc_spark.config import CLIPS
    from lsh_hdc_spark.operators.knn import ann_topk
    from lsh_hdc_spark.operators.substring import substring_pairs
    from lsh_hdc_spark.plans.pipeline import run_pipeline, run_pipeline_clips

    spark = _spark()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    clips = _clips_df(spark)
    os.makedirs("plans/r06", exist_ok=True)
    for name, mk in [
        ("q_dedup_docs", lambda: run_pipeline(docs, DedupConfig())),
        ("q_dedup_clips", lambda: run_pipeline_clips(clips, CLIPS)),
        (
            "q_substring_docs",
            lambda: substring_pairs(docs, "doc_id", "text", min_len=32),
        ),
        ("q_ann_topk", lambda: ann_topk(embs, k=5)),
    ]:
        df = mk()
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = f"plans/r06/{name}_{TAG}.txt"
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "stages"
    {"stages": cmd_stages, "explain": cmd_explain, "headline": cmd_headline}[
        cmd
    ]()
