"""Audio payload handling (op 22, SURVEY.md §2.3).

The dedup pipeline must carry `bytes: binary` untouched and the final output
must satisfy per-row invariants vs the source table (BASELINE.json
input_hint): decoded-PCM allclose at SNR >= 30 dB and transcript equality.

Decoding is stdlib-only (RIFF/WAVE PCM16 via ``wave``) because no codec
libraries exist offline; the `codec` column is carried for schema parity and
the decode step raises for non-PCM codecs (clearly-marked stub — a real
deployment plugs a codec library into ``decode_clip``).

Everything here is either a Catalyst expression (transcript equality) or a
vectorized batch kernel inside ``mapInPandas`` (PCM decode + SNR): no
per-row Python at the DataFrame API level.
"""

from __future__ import annotations

import io
import wave

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pcm16_to_wav(pcm: np.ndarray, sr_hz: int) -> bytes:
    """Serialize int16 mono PCM to a RIFF/WAVE container (stdlib only)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr_hz)
        w.writeframes(np.ascontiguousarray(pcm, dtype="<i2").tobytes())
    return buf.getvalue()


def wav_to_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """Parse a RIFF/WAVE PCM16 mono blob -> (int16 samples, sample rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2 or w.getnchannels() != 1:
            raise ValueError("expected PCM16 mono")
        sr = w.getframerate()
        raw = w.readframes(w.getnframes())
    return np.frombuffer(raw, dtype="<i2"), sr


def decode_clip(data: bytes, codec: str) -> tuple[np.ndarray, int]:
    """Decode a clip's bytes to PCM.  Offline stub: only pcm_s16le-in-WAV is
    implemented; other codecs raise (plug a codec lib here in production)."""
    if codec != "pcm_s16le":
        raise NotImplementedError(
            f"codec {codec!r}: only pcm_s16le WAV decode is available offline"
        )
    return wav_to_pcm16(data)


def snr_db(ref: np.ndarray, out: np.ndarray) -> float:
    """10*log10(sum(ref^2) / sum((ref-out)^2)); +inf for exact equality."""
    if ref.shape != out.shape:
        return float("-inf")
    ref_f = ref.astype(np.float64)
    noise = ref_f - out.astype(np.float64)
    p_sig = float((ref_f**2).sum())
    p_noise = float((noise**2).sum())
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_noise)


def audio_invariants(
    source: DataFrame, output: DataFrame, id_col: str = "clip_id"
) -> DataFrame:
    """(clip_id, transcript_equal, snr_db, pcm_ok): per-row invariant check
    between the source table and the pipeline's final output table.

    Join on id, then one mapInPandas pass decodes both byte columns and
    computes SNR batch-wise.  pcm_ok = SNR >= 30 dB (BASELINE.json:15).
    """
    s = source.select(
        F.col(id_col),
        F.col("bytes").alias("bytes_src"),
        F.col("codec").alias("codec_src"),
        F.col("transcript").alias("transcript_src"),
    )
    o = output.select(
        F.col(id_col),
        F.col("bytes").alias("bytes_out"),
        F.col("codec").alias("codec_out"),
        F.col("transcript").alias("transcript_out"),
    )
    j = s.join(o, id_col, "full").withColumn(
        "transcript_equal",
        F.col("transcript_src").eqNullSafe(F.col("transcript_out")),
    )

    def _snr(batches):
        for pdf in batches:
            snrs = np.empty(len(pdf), dtype=np.float64)
            for i, (bs, bo, cs) in enumerate(
                zip(pdf["bytes_src"], pdf["bytes_out"], pdf["codec_src"])
            ):
                if bs is None or bo is None:
                    snrs[i] = float("-inf")
                    continue
                ref, _ = decode_clip(bytes(bs), cs)
                out, _ = decode_clip(bytes(bo), cs)
                snrs[i] = snr_db(ref, out)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "transcript_equal": pdf["transcript_equal"],
                    "snr_db": snrs,
                }
            )

    schema = f"{id_col} string, transcript_equal boolean, snr_db double"
    res = j.select(id_col, "transcript_equal", "bytes_src", "bytes_out", "codec_src")
    return res.mapInPandas(_snr, schema).withColumn(
        "pcm_ok", F.col("snr_db") >= F.lit(30.0)
    )


def invariant_violations(inv: DataFrame) -> int:
    """Count of rows violating either invariant (0 = pass)."""
    return inv.where(~F.col("transcript_equal") | ~F.col("pcm_ok")).count()


def pcm_power_invariants(pairs: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """Exact-integer twin of audio_invariants: decode (bytes_src, bytes_out)
    and emit (id, p_sig, p_noise, pcm_ok) where p_sig = sum(ref^2) and
    p_noise = sum((ref-out)^2) are exact int64 sums, and pcm_ok applies the
    SNR >= 30 dB rule in integer form — 10*log10(ps/pn) >= 30  <=>
    ps >= 1000*pn — so no float ever enters the verdict and a SQL oracle
    can mirror it when the PCM follows a closed form (sources/clips.py::
    noisy_clip_pairs).  p_noise = 0 (bit-exact passthrough) is pcm_ok."""

    def _powers(batches):
        for pdf in batches:
            ps = np.empty(len(pdf), dtype=np.int64)
            pn = np.empty(len(pdf), dtype=np.int64)
            for i, (bs, bo, c) in enumerate(
                zip(pdf["bytes_src"], pdf["bytes_out"], pdf["codec"])
            ):
                ref, _ = decode_clip(bytes(bs), c)
                out, _ = decode_clip(bytes(bo), c)
                r = ref.astype(np.int64)
                d = r - out.astype(np.int64)
                ps[i] = int((r * r).sum())
                pn[i] = int((d * d).sum())
            yield pd.DataFrame({id_col: pdf[id_col], "p_sig": ps, "p_noise": pn})

    stats = pairs.select(id_col, "codec", "bytes_src", "bytes_out").mapInPandas(
        _powers, f"{id_col} string, p_sig long, p_noise long"
    )
    return stats.withColumn("pcm_ok", F.col("p_sig") >= 1000 * F.col("p_noise"))


def with_pcm_stats(df: DataFrame, id_col: str = "clip_id") -> DataFrame:
    """Append (n_samples, pcm_sum) decoded from each row's WAV bytes.

    One Arrow-batched mapInPandas pass over (id, bytes, codec) only — the
    stats are re-joined by id so untouched columns never cross the Python
    boundary.  pcm_sum is the exact int64 sum of the decoded samples: a
    cheap whole-signal checksum that an arithmetic oracle can mirror when
    the PCM is a known deterministic function of the row id (see
    sources/clips.py::clips_from_documents)."""

    def _stats(batches):
        for pdf in batches:
            n = np.empty(len(pdf), dtype=np.int64)
            s = np.empty(len(pdf), dtype=np.int64)
            for i, (b, c) in enumerate(zip(pdf["bytes"], pdf["codec"])):
                if b is None:
                    n[i], s[i] = 0, 0
                    continue
                pcm, _ = decode_clip(bytes(b), c)
                n[i] = pcm.size
                s[i] = int(pcm.astype(np.int64).sum())
            yield pd.DataFrame({id_col: pdf[id_col], "n_samples": n, "pcm_sum": s})

    id_type = df.schema[id_col].dataType.simpleString()
    stats = df.select(id_col, "bytes", "codec").mapInPandas(
        _stats, f"{id_col} {id_type}, n_samples long, pcm_sum long"
    )
    return df.join(stats, id_col)
