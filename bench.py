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
import statistics
import sys
import time

N_CLIPS = int(os.environ.get("BENCH_CLIPS", "20000"))

#: a timed run is steal-contaminated above this (VERDICT r4 item 1): the
#: hypervisor episodes caught in round 4 showed up as multi-percent steal
#: while the quiet-host floor is ~0.01%, so 1% separates them cleanly
STEAL_PCT_MAX = 1.0
#: extra interleaved make-up rounds allowed when a query lacks clean runs
MAX_EXTRA_ROUNDS = 2
#: host-pressure canary contamination ratio: a run whose pre-run canary is
#: this much slower than the session's fastest canary ran under measurable
#: host pressure (see _canary) and is excluded from min/median like a
#: steal-contaminated run
CANARY_RATIO_MAX = 1.5


def _canary() -> float:
    """Milliseconds for a fixed single-threaded CPU+memory-bandwidth kernel.

    Round 5 found a second weather mode the steal counter cannot see:
    co-tenant pressure that slows runs 2-6x with steal ~0.01% and normal
    iowait (memory-bandwidth / CPU-frequency contention — e.g. a first
    kept round of 43.4 s vs a 7.2 s min at 0.038% steal).  This canary
    measures that pressure directly: an elementwise numpy pass over an
    8 MB array (too big for L2, so it exercises DRAM bandwidth) plus a
    small matmul (exercises sustained clocks), single-threaded, ~100 ms
    nominal.  Sampled immediately before AND after each timed run (scored
    as the max — pressure rising mid-run shows in the after-sample); a
    run whose canary exceeds CANARY_RATIO_MAX x the session minimum
    carries its contamination measurement instead of an inference."""
    import numpy as np

    a = np.arange(1_000_000, dtype=np.float64)  # 8 MB
    best = float("inf")
    # two passes, keep the faster: scheduling blips are one-shot while the
    # pressure mode this guards against lasts minutes (memory: steal
    # storms ~30+ min), so min-of-2 drops noise without hiding pressure
    for _ in range(2):
        m = np.random.default_rng(0).standard_normal((96, 96))
        t0 = time.monotonic()
        s = 0.0
        for _ in range(8):
            s += float(np.sin(a).sum())
            m = m @ m / np.abs(m).max()
        assert s == s and m[0, 0] == m[0, 0]
        best = min(best, (time.monotonic() - t0) * 1000.0)
    return best


def _cpu_ticks() -> list[int]:
    """First /proc/stat cpu line: user nice system idle iowait irq softirq
    steal (ticks since boot)."""
    with open("/proc/stat") as fh:
        v = fh.readline().split()[1:]
    return list(map(int, v[:8]))


def _timed(fn) -> tuple[float, float, float, float]:
    """Run fn and return (secs, steal_pct, sy_pct, iowait_pct) measured
    over exactly the run window, so an outlier carries its measured cause
    (hypervisor CPU steal / guest-kernel time / disk-stall iowait)
    instead of an inference."""
    a = _cpu_ticks()
    t0 = time.monotonic()
    fn()
    secs = time.monotonic() - t0
    b = _cpu_ticks()
    d = [y - x for x, y in zip(a, b)]
    tot = max(sum(d), 1)
    return (
        round(secs, 3),
        round(100 * d[7] / tot, 3),
        round(100 * d[2] / tot, 2),
        round(100 * d[4] / tot, 2),
    )


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

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def _clips_job():
        clips = spark.read.parquet(clips_path)
        # coalesce the byte-bearing tail to 8 tasks: the single virtio disk
        # anti-scales with concurrent writers (BENCH/BASELINE.md), so 8
        # writer tasks beat 32 (measured ~15% on the warm path).  Note
        # coalesce propagates back through the final label join, so the
        # byte-shuffling join stage ALSO runs at 8 tasks — intentional: it
        # is disk-I/O-bound on the same device (a repartition(8) instead
        # would add a full shuffle of the byte rows just to keep a
        # disk-bound join at 32 tasks).  Dedup compute stages above the
        # labels join keep full parallelism.
        run_pipeline_clips(clips, CLIPS).coalesce(8).write.mode(
            "overwrite"
        ).option("parquet.enable.dictionary", "false").parquet(
            f"{out_base}/clips"
        )

    jobs = [
        (
            "q_dedup_docs",
            lambda: run_pipeline(docs, DedupConfig())
            .write.mode("overwrite")
            .parquet(f"{out_base}/docs"),
        ),
        ("q_dedup_clips", _clips_job),
        (
            "q_substring_docs",
            lambda: substring_pairs(docs, "doc_id", "text", min_len=32)
            .write.mode("overwrite")
            .parquet(f"{out_base}/substr"),
        ),
        (
            "q_ann_topk",
            lambda: ann_topk(embs, k=5)
            .write.mode("overwrite")
            .parquet(f"{out_base}/ann"),
        ),
    ]

    # warmup (untimed): spins up the Python workers / JIT so the first timed
    # run of the first query is not charged multi-second cold-start jitter
    run_pipeline(
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
        DedupConfig(),
    ).write.mode("overwrite").parquet(f"{out_base}/warmup")
    # pre-warm the ~400 MB clips parquet into the page cache (untimed):
    # round-3's q_dedup_clips first run was 66.8 s vs 8.6 s warm — cold
    # virtio-disk reads, not compute (VERDICT r3 'what's wrong' item 3).
    # crc32 over the byte column forces every page to actually be read.
    spark.read.parquet(clips_path).selectExpr(
        "sum(crc32(bytes))", "sum(length(transcript))"
    ).collect()
    spark.catalog.clearCache()
    # two DISCARDED clips runs: even with a warm page cache the first two
    # byte-shuffling runs pay one-time costs (shuffle-dir creation, JIT of
    # the byte-join path, the kernel's dirty-writeback ramp on the virtio
    # disk) that made round 3's spread 8x — convergence to steady state
    # takes two passes (measured 19.8 / 6.4 / 6.2 with one warm-up);
    # steady-state is what the metric claims to measure
    for _ in range(2):
        _clips_job()
        spark.catalog.clearCache()
        os.sync()

    # INTERLEAVED rounds (A/B/C/D, A/B/C/D, ...): this host's throughput
    # drifts up to ~2x over tens of minutes — round 4 caught the cause in
    # the act: guest load-average 8-9 with 99% guest-idle and nonzero
    # vmstat steal time, i.e. the hypervisor giving our cycles to
    # co-tenant VMs.  Back-to-back runs of one query can land in one slow
    # window (round-2 recorded a 46.5 s outlier as half a 2-run sample);
    # interleaving spreads the weather across queries, and 4 rounds
    # (3 before round 4) make min-of-rounds robust to a multi-minute
    # steal episode.
    # Each run is annotated with the steal%/sy% measured over its own
    # window (VERDICT r4 item 1: make the protocol steal-aware).  Runs
    # with steal >= STEAL_PCT_MAX are KEPT in the trace but excluded from
    # the reported min/median; if a query ends up with < 2 clean runs,
    # up to MAX_EXTRA_ROUNDS make-up rounds re-run the affected queries.
    steal: dict[str, list[float]] = {}
    sy: dict[str, list[float]] = {}
    wa: dict[str, list[float]] = {}
    canary: dict[str, list[float]] = {}

    def _one_round(names: set[str] | None = None) -> None:
        for name, fn in jobs:
            if names is not None and name not in names:
                continue
            # canary sampled BEFORE AND AFTER, scored as the max: pressure
            # that rises mid-run shows in the after-sample (measured: a
            # 37 s clips outlier with a quiet 80 ms pre-canary whose
            # pressure episode was caught by the NEXT run's pre-canary)
            cn0 = _canary()
            secs, st, s, w = _timed(fn)
            # release caches/checkpoints and flush THIS run's dirty
            # writeback BEFORE the after-canary: a heavy-write query's own
            # background writeback would otherwise inflate cn1 and read as
            # host pressure (self-inflicted false exclusion)
            spark.catalog.clearCache()
            os.sync()
            cn1 = _canary()
            runs.setdefault(name, []).append(secs)
            steal.setdefault(name, []).append(st)
            sy.setdefault(name, []).append(s)
            wa.setdefault(name, []).append(w)
            canary.setdefault(name, []).append(round(max(cn0, cn1), 1))

    # CONVERGENCE-GATED warm-up (JMH-style, pre-registered): the first
    # timed passes of every query are systematically the slowest (JIT
    # depth, shuffle-path ramp, writeback churn) with steal ~0, and the
    # ramp does not last a FIXED number of rounds — round-5 sessions saw
    # the first kept round still 4-6x slow (clips 43.4 s / sy 60.8%) after
    # one discarded round, and again (37.4 s / sy 56%) after two.  So the
    # warm-up discards full interleaved rounds until every query's last
    # two walls agree within WARM_AGREE x (i.e. the measurement has
    # reached the steady state the metric claims), capped at
    # MAX_DISCARD_ROUNDS; the count used is published.
    WARM_AGREE = 1.3
    MAX_DISCARD_ROUNDS = 5
    discard_rounds = 0
    warmup_converged = False
    for i in range(MAX_DISCARD_ROUNDS):
        _one_round()
        discard_rounds += 1
        if i >= 1 and all(
            max(rs[-2:]) <= WARM_AGREE * min(rs[-2:]) for rs in runs.values()
        ):
            warmup_converged = True
            break
    for name in list(runs):
        runs[name].clear()
        steal[name].clear()
        sy[name].clear()
        wa[name].clear()
        canary[name].clear()
    for _ in range(4):
        _one_round()

    def _clean(name: str) -> list[float]:
        cmin = min(c for cs in canary.values() for c in cs)
        return [
            r
            for r, st, cn in zip(runs[name], steal[name], canary[name])
            if st < STEAL_PCT_MAX and cn <= CANARY_RATIO_MAX * cmin
        ]

    for _ in range(MAX_EXTRA_ROUNDS):
        lacking = {name for name, _ in jobs if len(_clean(name)) < 2}
        if not lacking:
            break
        _one_round(lacking)

    medians: dict[str, float] = {}
    kept: dict[str, int] = {}
    for name, _ in jobs:
        rs = _clean(name) or runs[name]  # all-contaminated: fall back, annotated
        kept[name] = len(_clean(name))
        queries[name] = min(rs)
        medians[name] = round(statistics.median(rs), 3)

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
                "runs_steal_pct": steal,
                "runs_sy_pct": sy,
                "runs_wa_pct": wa,
                "runs_canary_ms": canary,
                "steal_threshold_pct": STEAL_PCT_MAX,
                "canary_ratio_max": CANARY_RATIO_MAX,
                # converged=false means the cap was hit with the last two
                # warm-up walls still disagreeing > WARM_AGREE: the kept
                # rounds may have begun unconverged — steady state was
                # assumed there, not detected (read mins accordingly)
                "warmup_rounds_discarded": discard_rounds,
                "warmup_converged": warmup_converged,
                "clean_runs_kept": kept,
                "queries_median": medians,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
