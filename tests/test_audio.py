"""Clips synthesis + audio invariants (SURVEY.md §5.2.5): WAV round-trip,
SNR math, duplicate families co-cluster on transcripts, and the end-to-end
pipeline preserves bytes (SNR = inf) and transcripts."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lsh_hdc_spark.config import CLIPS
from lsh_hdc_spark.functions.audio import (
    audio_invariants,
    decode_clip,
    invariant_violations,
    pcm16_to_wav,
    snr_db,
    wav_to_pcm16,
)
from lsh_hdc_spark.plans.pipeline import run_pipeline_clips
from lsh_hdc_spark.sources.clips import synth_clips, true_family
from ref_oracle import dup_pairs

N = 240


@pytest.fixture(scope="module")
def clips(spark):
    return synth_clips(spark, N, seed=42).cache()


def test_wav_roundtrip():
    rng = np.random.default_rng(1)
    pcm = rng.integers(-32768, 32767, size=4000, dtype=np.int16)
    got, sr = wav_to_pcm16(pcm16_to_wav(pcm, 16000))
    assert sr == 16000
    assert (got == pcm).all()


def test_snr_math():
    ref = np.array([1000, -1000, 2000], dtype=np.int16)
    assert snr_db(ref, ref.copy()) == float("inf")
    noisy = ref + np.array([10, -10, 10], dtype=np.int16)
    v = snr_db(ref, noisy)
    assert 40 < v < 50  # amplitude ratio ~1e2 -> ~43-46 dB
    assert snr_db(ref, np.array([1, 2], dtype=np.int16)) == float("-inf")


def test_clips_schema_and_determinism(spark, clips):
    rows = clips.orderBy("clip_id").limit(5).collect()
    again = synth_clips(spark, N, seed=42).orderBy("clip_id").limit(5).collect()
    assert rows == again
    r = rows[0]
    pcm, sr = decode_clip(bytes(r.bytes), r.codec)
    assert sr == r.sr_hz
    assert len(pcm) == r.sr_hz * r.dur_ms // 1000
    assert r.codec == "pcm_s16le"


def test_duplicate_pcm_snr_around_40db(spark, clips):
    fam = clips.orderBy("clip_id").limit(4).collect()  # family 0: rows 0-3
    ref, _ = decode_clip(bytes(fam[0].bytes), "pcm_s16le")
    for dup in fam[1:]:
        out, _ = decode_clip(bytes(dup.bytes), "pcm_s16le")
        v = snr_db(ref, out)
        assert 30 <= v <= 50, v  # -40 dB planted noise + quantization


def test_nonpcm_codec_raises():
    with pytest.raises(NotImplementedError):
        decode_clip(b"\x00", "opus")


def test_pipeline_preserves_bytes_and_transcripts(spark, clips):
    out = run_pipeline_clips(clips)
    assert set(out.columns) >= {
        "clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript",
        "cluster_id", "cluster_size",
    }
    inv = audio_invariants(clips, out)
    assert invariant_violations(inv) == 0
    row = inv.first()
    assert row.snr_db == float("inf")  # untouched passthrough


def test_families_cocluster(spark, clips):
    labels = run_pipeline_clips(clips).select("clip_id", "cluster_id").collect()
    pred = {r.clip_id: r.cluster_id for r in labels}
    truth = {}
    for cid in pred:
        idx = int(cid.removeprefix("clip"))
        fam = true_family(idx, N)
        truth[cid] = fam if fam >= 0 else f"uniq_{cid}"
    tpairs, ppairs = dup_pairs(truth), dup_pairs(pred)
    tp = len(tpairs & ppairs)
    recall = tp / len(tpairs)
    precision = tp / len(ppairs) if ppairs else 1.0
    assert recall >= 0.85, recall
    assert precision >= 0.95, precision


def test_clips_from_documents_closed_form(spark):
    """Every attribute of the derived clips table — including the decoded
    PCM checksum — must follow the documented closed form, so the
    clips_pipeline SQL oracle is checking real arithmetic, not echoes."""
    from lsh_hdc_spark.functions.audio import with_pcm_stats
    from lsh_hdc_spark.sources.clips import clips_from_documents

    docs = spark.createDataFrame(
        [(7, "alpha beta gamma"), (10, "delta epsilon zeta"), (205, "x")],
        "doc_id long, text string",
    )
    rows = {
        r.clip_id: r
        for r in with_pcm_stats(clips_from_documents(docs)).collect()
    }
    assert set(rows) == {"clip00000007", "clip00000010", "clip00000205"}
    for did in (7, 10, 205):
        r = rows[f"clip{did:08d}"]
        sr = 8000 if did % 10 == 0 else 16000
        dur = 40 + did % 200
        n = sr * dur // 1000
        assert (r.sr_hz, r.dur_ms, r.n_samples) == (sr, dur, n)
        assert r.pcm_sum == sum((did + i) % 65536 - 32768 for i in range(n))
        # decode really reads the WAV bytes, not the metadata
        pcm, got_sr = wav_to_pcm16(bytes(r.bytes))
        assert got_sr == sr and pcm.size == n


def test_pcm_power_invariants_verdicts_vary(spark):
    """The SNR sweep in noisy_clip_pairs must produce BOTH verdicts, and
    the integer rule must agree with the float snr_db >= 30 rule."""
    from lsh_hdc_spark.functions.audio import pcm_power_invariants
    from lsh_hdc_spark.sources.clips import noisy_clip_pairs

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(16)], "doc_id long, text string"
    )
    rows = pcm_power_invariants(noisy_clip_pairs(docs)).collect()
    assert len(rows) == 16
    verdicts = {r.pcm_ok for r in rows}
    assert verdicts == {True, False}, verdicts
    for r in rows:
        float_ok = 10 * np.log10(r.p_sig / r.p_noise) >= 30 if r.p_noise else True
        assert r.pcm_ok == (r.p_sig >= 1000 * r.p_noise)
        assert r.pcm_ok == float_ok, (r.clip_id, r.p_sig, r.p_noise)
