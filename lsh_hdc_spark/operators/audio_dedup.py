"""Audio-axis near-duplicate detection (op 22 extension; the payload side
of the graft cell, BASELINE.json: pyspark x audio).

The transcript pipeline (plans/pipeline.py) finds near-dups by TEXT; this
module finds them by SOUND, with the same bucket -> verify -> connected-
components shape: a spectral-occupancy fingerprint buckets acoustically
identical clips, a pairwise decoded-PCM SNR pass verifies candidates
(>= 30 dB, the BASELINE.json per-row invariant threshold reused as the
duplicate criterion), and the shared CC operator labels clusters.

Fingerprint (stationary variant of the banded-spectrum fingerprints of
Haitsma & Kalker 2002, "A highly robust audio fingerprinting system"):

  - decode WAV -> int16 PCM (functions/audio.py offline codec);
  - one rfft over the whole clip, energy summed into N_BANDS equal-width
    frequency bands (clips here are stationary tone mixtures, so the
    time-framed sub-fingerprint stream of the paper collapses to one
    spectral profile; a production swap-in computes the framed stream and
    bands consecutive sub-fingerprints exactly like MinHash banding);
  - occupancy mask: band b is SET iff E[b] >= max(E) * 10^(THR_DB/10);
  - multi-probe on marginal bands: a band within +-MARGIN_DB/2 of the
    threshold is classified "marginal" and the clip emits one bucket key
    per marginal on/off combination (capped at 2^MAX_PROBE_BANDS keys).
    A near-dup whose additive noise nudges a band across the threshold
    therefore still collides with its original: for noise whose relative
    energy perturbation is << the margin, a band can cross between SET
    and CLEAR only by passing through the marginal zone, where BOTH
    variants are emitted — the same collision guarantee banding gives
    MinHash, without per-pair comparisons.

Bucket key = splitmix64 fold of (sr_hz, n_samples, mask): sample rate and
exact sample count are invariants of an additive-noise near-dup pair, so
they ride in the key for free discrimination (at 10^12 rows the length
term alone splits the keyspace ~10^4 ways before the mask's 2^32).

Scale shape (the 10^12-clip posture, mirroring PLANS.md §3 discipline):
the binary column crosses exactly TWO scans — the fingerprint pass and
one semi-join fetch of the DISTINCT candidate ids' bytes (pinned before
the two pair-join references, so neither join side re-scans the table);
the bucket shuffle carries (clip_id, key) only; candidate pairs are
generated per bucket under a size cap with a drop census (never
silently, op 25's clause).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.audio import decode_clip, snr_db
from ..functions.hashing import GOLDEN, as_i64, mix64
from .cc import assign_clusters

N_BANDS = 32
#: band is SET iff its energy is within 20 dB of the loudest band
THR_DB = -20.0
#: total width (dB) of the marginal zone straddling the threshold
MARGIN_DB = 6.0
#: probe at most 2^MAX_PROBE_BANDS keys per clip; excess marginal bands
#: fall back to their raw threshold classification (residual miss odds are
#: P(>MAX marginal bands) * P(raw flip), both tiny — see module docstring)
MAX_PROBE_BANDS = 4
#: buckets above this size are dropped from pair generation (with census)
BUCKET_CAP = 512


def _band_energies(pcm: np.ndarray) -> np.ndarray:
    """N_BANDS equal-width band energies of one clip's spectrum."""
    spec = np.abs(np.fft.rfft(pcm.astype(np.float64))) ** 2
    # drop DC, split the rest into N_BANDS nearly-equal slices
    spec = spec[1:]
    if spec.size < N_BANDS:
        spec = np.pad(spec, (0, N_BANDS - spec.size))
    edges = np.linspace(0, spec.size, N_BANDS + 1).astype(np.int64)
    return np.add.reduceat(spec, edges[:-1])


def _mask_keys(pcm: np.ndarray, sr_hz: int) -> np.ndarray:
    """uint64 bucket keys for one clip: base occupancy mask plus one key
    per marginal on/off combination (multi-probe)."""
    e = _band_energies(pcm)
    peak = float(e.max())
    if peak <= 0.0:  # digital silence: fingerprint carries length only
        masks = np.array([0], dtype=np.uint64)
    else:
        thr = peak * 10.0 ** (THR_DB / 10.0)
        half = 10.0 ** (MARGIN_DB / 20.0)  # +-MARGIN_DB/2 in power
        stable_set = e >= thr * half
        marginal = np.flatnonzero((e >= thr / half) & ~stable_set)
        base = np.uint64(0)
        for b in np.flatnonzero(stable_set):
            base |= np.uint64(1) << np.uint64(b)
        if marginal.size > MAX_PROBE_BANDS:
            # deterministic truncation by band index; dropped marginals
            # use their raw classification
            for b in marginal[MAX_PROBE_BANDS:]:
                if e[b] >= thr:
                    base |= np.uint64(1) << np.uint64(b)
            marginal = marginal[:MAX_PROBE_BANDS]
        m = marginal.size
        combos = np.arange(1 << m, dtype=np.uint64)
        masks = np.full(1 << m, base, dtype=np.uint64)
        for j, b in enumerate(marginal):
            masks |= ((combos >> np.uint64(j)) & np.uint64(1)) << np.uint64(b)
    n_samples = np.uint64(pcm.size)
    with np.errstate(over="ignore"):
        k = mix64(np.uint64(sr_hz) * GOLDEN + n_samples)
        return mix64(masks ^ k)


#: spectral-profile resolution for the streaming index's compact acoustic
#: sketch (audio_signatures).  128 bins of the power spectrum: fine enough
#: that unrelated tone mixtures are far apart (measured min relative-L1
#: distance 0.597 on the synth corpus) while -40 dB additive-noise
#: duplicates stay close (measured max 0.0018 over all 210 families).
SPEC_BINS = 128


def _spec_profile(pcm: np.ndarray) -> np.ndarray:
    """SPEC_BINS equal-width power-spectrum band energies — the compact
    verify surrogate the streaming audio index stores INSTEAD of PCM bytes
    (streaming/audio_ingest.py).  Same binning scheme as _band_energies at
    4x the resolution; DC dropped so silence maps to all-zero."""
    spec = np.abs(np.fft.rfft(pcm.astype(np.float64))) ** 2
    spec = spec[1:]
    if spec.size < SPEC_BINS:
        spec = np.pad(spec, (0, SPEC_BINS - spec.size))
    edges = np.linspace(0, spec.size, SPEC_BINS + 1).astype(np.int64)
    return np.add.reduceat(spec, edges[:-1])


def audio_signatures(clips: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """(id, keys: array<long>, spec: array<double>, n_samples: long) — one
    row per clip: the multi-probe bucket keys (_mask_keys) plus the
    SPEC_BINS-bin spectral profile, in ONE Arrow pass over the byte column.

    This is the audio twin of functions/sign.py::signed for the streaming
    path: everything the incremental index needs to match and verify future
    arrivals, with the payload bytes left behind (the index stores ~1 KB of
    sketch per clip, never audio).  Derived from lsh_hdc/sign.py [M]-level
    semantics the same way the text signatures are."""

    def _sig(batches):
        for pdf in batches:
            ids, keys, specs, nsamp = [], [], [], []
            for cid, data, sr, codec in zip(
                pdf[id_col], pdf["bytes"], pdf["sr_hz"], pdf["codec"]
            ):
                if data is None or len(data) == 0:
                    continue
                pcm, _ = decode_clip(bytes(data), str(codec))
                if pcm.size == 0:
                    continue
                ids.append(cid)
                keys.append(as_i64(_mask_keys(pcm, int(sr))))
                specs.append(_spec_profile(pcm))
                nsamp.append(pcm.size)
            # object dtype is load-bearing for the list columns: a batch
            # where EVERY clip was skipped (all-undecodable) yields empty
            # plain lists, which pandas infers as float64 — and Arrow
            # cannot convert an empty float64 column to list<int64>/
            # list<double> (crashes the whole job on one bad batch)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="object"),
                    "keys": pd.Series(keys, dtype="object"),
                    "spec": pd.Series(specs, dtype="object"),
                    "n_samples": np.asarray(nsamp, dtype=np.int64),
                }
            )

    return clips.select(id_col, "bytes", "sr_hz", "codec").mapInPandas(
        _sig, f"{id_col} string, keys array<long>, spec array<double>, n_samples long"
    )


def audio_fingerprints(
    clips: DataFrame, id_col: str = "clip_id"
) -> DataFrame:
    """(clip_id, key) — one row per emitted bucket key.  The one Arrow
    pass over the byte column on the fingerprint side; everything
    downstream of this frame shuffles ids and keys only."""

    def _fp(batches):
        for pdf in batches:
            ids: list[str] = []
            keys: list[np.ndarray] = []
            for cid, data, sr, codec in zip(
                pdf[id_col], pdf["bytes"], pdf["sr_hz"], pdf["codec"]
            ):
                if data is None or len(data) == 0:
                    continue
                pcm, _ = decode_clip(bytes(data), str(codec))
                if pcm.size == 0:
                    continue
                ks = _mask_keys(pcm, int(sr))
                ids.extend([cid] * ks.size)
                keys.append(ks)
            flat = (
                as_i64(np.concatenate(keys))
                if keys
                else np.empty(0, dtype=np.int64)
            )
            yield pd.DataFrame({id_col: ids, "key": flat})

    return clips.select(id_col, "bytes", "sr_hz", "codec").mapInPandas(
        _fp, f"{id_col} string, key long"
    )


def audio_candidate_pairs(
    fps: DataFrame, id_col: str = "clip_id", bucket_cap: int = BUCKET_CAP
) -> DataFrame:
    """(src, dst) distinct candidate pairs from shared bucket keys.
    Buckets above `bucket_cap` are excluded from pair generation — use
    audio_bucket_census to count what a cap drops (never silently).
    Pass a MATERIALIZED `fps` (audio_dedup_clusters checkpoints it) so
    the byte-scanning fingerprint pass is not re-run per self-join side."""
    # window-count bucket sizes over one key exchange (see
    # operators/pairs.py::candidate_pairs)
    from pyspark.sql import Window

    small = (
        fps.withColumn("n", F.count("*").over(Window.partitionBy("key")))
        .where((F.col("n") >= 2) & (F.col("n") <= bucket_cap))
        .drop("n")
    )
    a = small.select("key", F.col(id_col).alias("src"))
    b = small.select("key", F.col(id_col).alias("dst"))
    return (
        a.join(b, "key")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def audio_bucket_census(
    fps: DataFrame, bucket_cap: int = BUCKET_CAP
) -> DataFrame:
    """(tier, n_buckets, n_rows, max_bucket) — bucket-size accounting for
    the cap, same contract as the text path's hot-band census (op 25)."""
    sizes = fps.groupBy("key").agg(F.count("*").alias("n"))
    return (
        sizes.withColumn(
            "tier",
            F.when(F.col("n") == 1, F.lit("singleton"))
            .when(F.col("n") <= bucket_cap, F.lit("kept"))
            .otherwise(F.lit("dropped")),
        )
        .groupBy("tier")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("n").alias("n_rows"),
            F.max("n").alias("max_bucket"),
        )
    )


def audio_verify_pairs(
    clips: DataFrame,
    pairs: DataFrame,
    id_col: str = "clip_id",
    min_snr_db: float = 30.0,
) -> DataFrame:
    """(src, dst, snr_db) edges whose decoded-PCM SNR clears the
    duplicate threshold.  The bytes of the DISTINCT candidate ids are
    extracted with one semi-join scan, decoded ONCE per id, and pinned
    (localCheckpoint) before the two pair-join references — the candidate
    subset is the dup-rate fraction of the corpus, so at 10^12 rows this
    is the stage you spill to a checkpoint table rather than re-scanning
    the full byte column per join side (production: write it to a temp
    Iceberg table; the plan shape is identical).  SNR is directional
    (ref = src side) and -inf for length mismatches, so unequal-length
    clips never verify."""
    cand_ids = (
        pairs.select(F.col("src").alias(id_col))
        .unionByName(pairs.select(F.col("dst").alias(id_col)))
        .distinct()
    )

    def _decode(batches):
        for pdf in batches:
            ids, pcms = [], []
            for cid, data, codec in zip(pdf[id_col], pdf["bytes"], pdf["codec"]):
                pcm, _ = decode_clip(bytes(data), str(codec))
                ids.append(cid)
                pcms.append(pcm)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="object"),
                    "pcm": pd.Series(pcms, dtype="object"),
                }
            )

    # decode ONCE per distinct candidate id, in the same pinned pass that
    # extracts the candidate subset (VERDICT r5 item 4): the pair joins
    # then carry array<smallint> PCM — identical payload bytes to the WAV
    # blob (2 B/sample) — and the verify kernel is pure numpy on decoded
    # samples, so a clip appearing in k pairs costs one decode instead of
    # k+1 wave-parse passes.
    side = (
        clips.join(cand_ids, id_col, "left_semi")
        .select(id_col, "bytes", "codec")
        .mapInPandas(_decode, f"{id_col} string, pcm array<smallint>")
        .localCheckpoint(eager=True)
    )
    j = (
        pairs.join(
            side.select(F.col(id_col).alias("src"), F.col("pcm").alias("pcm_a")),
            "src",
        )
        .join(
            side.select(F.col(id_col).alias("dst"), F.col("pcm").alias("pcm_b")),
            "dst",
        )
    )

    def _snr(batches):
        for pdf in batches:
            vals = np.empty(len(pdf), dtype=np.float64)
            for i, (pa, pb) in enumerate(zip(pdf["pcm_a"], pdf["pcm_b"])):
                vals[i] = snr_db(
                    np.asarray(pa, dtype=np.int16), np.asarray(pb, dtype=np.int16)
                )
            out = pd.DataFrame(
                {"src": pdf["src"], "dst": pdf["dst"], "snr_db": vals}
            )
            yield out[out["snr_db"] >= min_snr_db]

    return j.mapInPandas(_snr, "src string, dst string, snr_db double")


def audio_dedup_edges(
    clips: DataFrame,
    id_col: str = "clip_id",
    min_snr_db: float = 30.0,
    bucket_cap: int = BUCKET_CAP,
) -> DataFrame:
    """(src, dst, snr_db) verified audio near-dup edges — the audio-axis
    twin of plans.pipeline.dedup_edges."""
    from ..micro import micro_rebound

    # dust-sized corpora run under a right-sized cloned session (micro.py)
    clips, _ = micro_rebound(clips)
    fps = audio_fingerprints(clips, id_col).localCheckpoint(eager=True)
    pairs = audio_candidate_pairs(fps, id_col, bucket_cap)
    return audio_verify_pairs(clips, pairs, id_col, min_snr_db)


def fused_dedup_clusters(
    clips: DataFrame,
    cfg=None,
    min_snr_db: float = 30.0,
    bucket_cap: int = BUCKET_CAP,
) -> DataFrame:
    """Cross-modal OR-fusion: a pair is a duplicate if the TRANSCRIPT
    pipeline (shingle/MinHash/LSH/Jaccard) verifies it OR the AUDIO
    pipeline (spectral fingerprint + SNR) does; one shared CC over the
    union edge set labels clusters — the same OR-merge shape the text
    pipeline uses for substring edges (plans/pipeline.py).

    This catches what either modality alone misses: re-voiced clips with
    identical transcripts (text edge, no audio edge) and re-transcribed /
    mis-transcribed clips with identical audio (audio edge, no text
    edge).  Both union sides shuffle (src, dst) ids only."""
    from ..config import CLIPS
    from ..micro import micro_rebound
    from ..plans.pipeline import _edges_with_persisted

    cfg = cfg or CLIPS
    # one micro session covers BOTH modalities' edge passes and the CC
    clips, _ = micro_rebound(clips)
    text_edges, s = _edges_with_persisted(clips, cfg)
    audio_edges = audio_dedup_edges(clips, cfg.id_col, min_snr_db, bucket_cap)
    edges = (
        text_edges.select("src", "dst")
        .unionByName(audio_edges.select("src", "dst"))
        .distinct()
    )
    labels = assign_clusters(clips.select(cfg.id_col), edges, cfg.id_col)
    s.unpersist()
    return labels


def audio_dedup_clusters(
    clips: DataFrame,
    id_col: str = "clip_id",
    min_snr_db: float = 30.0,
    bucket_cap: int = BUCKET_CAP,
    min_support: int = 1,
) -> DataFrame:
    """(clip_id, cluster_id, cluster_size) — full audio-axis dedup:
    fingerprint -> bucket pairs -> SNR verify -> connected components.
    Every input row is labeled; non-duplicates are singleton clusters of
    themselves (the text pipeline's labeling convention)."""
    from ..micro import micro_rebound

    # dust-sized corpora run under a right-sized cloned session (micro.py)
    clips, _ = micro_rebound(clips)
    # materialize the fingerprints once: ids+keys only (tiny vs bytes);
    # the candidate self-join and the census would otherwise re-run the
    # byte-scanning Arrow pass per reference
    fps = audio_fingerprints(clips, id_col).localCheckpoint(eager=True)
    pairs = audio_candidate_pairs(fps, id_col, bucket_cap)
    edges = audio_verify_pairs(clips, pairs, id_col, min_snr_db)
    return assign_clusters(
        clips.select(id_col), edges, id_col, min_support=min_support
    )
