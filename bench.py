"""Per-round benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
 "sf": ..., "clips_per_sec": ...}.

Headline queries:
  q_dedup_docs      — full LSH near-dup pipeline on the documents table
  q_dedup_clips     — end-to-end clips flow on a synthesized 20k-clip table
                      read from parquet (signatures -> pairs -> CC -> label
                      join incl. audio bytes -> write), the BASELINE.json
                      "clips/sec" metric
  q_substring_docs  — winnowing + suffix-array substring-duplicate pass
  q_ann_topk        — LSH approximate cosine top-5 over embeddings

The clips input is synthesized once per sf into a temp dir outside the
timed region (the metric times read->write, per BASELINE.md).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

N_CLIPS = int(os.environ.get("BENCH_CLIPS", "20000"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from lsh_hdc_spark import DedupConfig, get_spark
    from lsh_hdc_spark.config import CLIPS
    from lsh_hdc_spark.operators.knn import ann_topk
    from lsh_hdc_spark.operators.substring import substring_pairs
    from lsh_hdc_spark.plans.pipeline import run_pipeline, run_pipeline_clips
    from lsh_hdc_spark.sources.clips import synth_clips

    spark = get_spark(cores=cpus, app_name="bench")
    queries: dict[str, float] = {}
    out_base = f"/tmp/bench_out_{os.getpid()}"

    # ---- input prep (untimed): synthesize the clips table once ------------
    clips_path = f"/tmp/bench_clips_{N_CLIPS}"
    if not os.path.exists(clips_path + "/_SUCCESS"):
        # dictionary encoding on ~20KB binary values costs ~10x write time
        # for zero compression win — always off for blob columns
        synth_clips(spark, N_CLIPS, seed=42).write.mode("overwrite").option(
            "parquet.enable.dictionary", "false"
        ).parquet(clips_path)

    runs: dict[str, list[float]] = {}

    def timed(name, fn):
        # two runs per query; report the min (steady-state — local-mode
        # python-worker spin-up adds multi-second jitter to cold runs; both
        # raw values are recorded under "runs")
        for _ in range(2):
            t0 = time.monotonic()
            fn()
            runs.setdefault(name, []).append(round(time.monotonic() - t0, 3))
            # release caches/checkpoints between runs so pinned blocks don't
            # degrade the next query (fresh-run semantics)
            spark.catalog.clearCache()
        queries[name] = min(runs[name])

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    timed(
        "q_dedup_docs",
        lambda: run_pipeline(docs, DedupConfig())
        .write.mode("overwrite")
        .parquet(f"{out_base}/docs"),
    )

    def _clips_job():
        clips = spark.read.parquet(clips_path)
        run_pipeline_clips(clips, CLIPS).write.mode("overwrite").option(
            "parquet.enable.dictionary", "false"
        ).parquet(f"{out_base}/clips")

    timed("q_dedup_clips", _clips_job)

    timed(
        "q_substring_docs",
        lambda: substring_pairs(docs, "doc_id", "text", min_len=32)
        .write.mode("overwrite")
        .parquet(f"{out_base}/substr"),
    )

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed(
        "q_ann_topk",
        lambda: ann_topk(embs, k=5)
        .write.mode("overwrite")
        .parquet(f"{out_base}/ann"),
    )

    total = round(sum(queries.values()), 3)
    clips_per_sec = round(N_CLIPS / queries["q_dedup_clips"], 1)
    shutil.rmtree(out_base, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "end-to-end dedup wall time (4 headline queries)",
                "value": total,
                "unit": "sec",
                "queries": queries,
                "sf": float(sf),
                "n_clips": N_CLIPS,
                "clips_per_sec": clips_per_sec,
                "runs": runs,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
