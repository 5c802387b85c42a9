"""Multimodal binary-column operators: decode / feature-extract / resize /
frame-sample over opaque ``binary`` payloads with typed metadata.

Design (graft spec "multimodal columns"): media rides through the engine as
``(id, media_bytes: binary, media_type: string, meta)`` — the SAME
heavy-payload discipline as clips.bytes (never enters a shuffle except the
final join; see plans/pipeline.py).  The Spark-side plumbing here — output
schemas, Arrow batch iteration, deterministic per-row behavior, byte
passthrough — is REAL and tested; the codec layer is pluggable because no
image/video library exists in this offline sandbox:

 - pass ``decoder=`` / ``resizer=`` / ``sampler=`` callables to use a real
   codec (PIL / ffmpeg / torchaudio ...) in production;
 - the default ``strict=False`` uses a clearly-marked DETERMINISTIC FAKE
   (seeded from the payload bytes) so pipelines, tests, and benchmarks can
   exercise the full distributed shape offline;
 - ``strict=True`` raises NotImplementedError exactly where the real codec
   belongs.

Audio is NOT stubbed: WAV/PCM decode + SNR invariants are fully implemented
in functions/audio.py (op 22).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .hashing import mix64

def _content_seed(payload: bytes) -> np.uint64:
    """Stable 64-bit content seed for the deterministic fakes: positional
    mix-fold over the first 4 KiB, plus the total length."""
    buf = payload[:4096]
    buf += b"\0" * ((-len(buf)) % 8)
    arr = (
        np.frombuffer(buf, dtype=np.uint64)
        if buf
        else np.zeros(1, dtype=np.uint64)
    )
    idx = np.arange(arr.size, dtype=np.uint64)
    h = np.bitwise_xor.reduce(mix64(arr ^ mix64(idx + np.uint64(0xABCD))))
    return mix64(h ^ np.uint64(len(payload)))


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake embedding: splitmix64 stream seeded by content.
    Stands in for a real encoder; replace via ``decoder=``."""
    seed = _content_seed(payload)
    idx = np.arange(dim, dtype=np.uint64)
    vals = mix64(idx * np.uint64(0x9E3779B97F4A7C15) ^ seed)
    return (vals.astype(np.float64) / 2.0**64).astype(np.float32)


def media_features(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "media_bytes",
    dim: int = 64,
    decoder: Callable[[bytes], np.ndarray] | None = None,
    strict: bool = False,
) -> DataFrame:
    """(id, features: array<float>) — one feature vector per media row,
    computed in Arrow batches (mapInPandas; bytes never leave the executor
    that scanned them).  ``decoder(payload) -> float32[dim]`` plugs in the
    real model/codec; offline default is the deterministic fake."""
    if strict and decoder is None:
        raise NotImplementedError(
            "no media decoder available offline — pass decoder= (e.g. a "
            "PIL/torch encode fn) or use strict=False for the "
            "deterministic fake"
        )
    dec = decoder or (lambda payload: _fake_features(payload, dim))
    id_t = df.schema[id_col].dataType.simpleString()

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            feats = [dec(bytes(b)) for b in pdf[bytes_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, bytes_col).mapInPandas(
        _map, f"{id_col} {id_t}, features array<float>"
    )


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "media_id",
    bytes_col: str = "media_bytes",
    resizer: Callable[[bytes, int, int], bytes] | None = None,
    strict: bool = False,
) -> DataFrame:
    """(id, media_bytes) with each payload re-encoded at width x height.
    Real image work needs ``resizer=``; offline fake is a deterministic
    truncate-or-pad to a size proportional to the target area (exercises
    the bytes-in/bytes-out plumbing and output sizing)."""
    if strict and resizer is None:
        raise NotImplementedError(
            "no image codec available offline — pass resizer= or use "
            "strict=False for the deterministic fake"
        )
    target = max(width * height, 1)
    rz = resizer or (
        lambda payload, w, h: (payload * (target // max(len(payload), 1) + 1))[:target]
    )
    id_t = df.schema[id_col].dataType.simpleString()

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            out = [rz(bytes(b), width, height) for b in pdf[bytes_col]]
            yield pd.DataFrame({id_col: pdf[id_col], bytes_col: out})

    return df.select(id_col, bytes_col).mapInPandas(
        _map, f"{id_col} {id_t}, {bytes_col} binary"
    )


def frame_sample(
    df: DataFrame,
    every_ms: int,
    id_col: str = "media_id",
    bytes_col: str = "media_bytes",
    dur_col: str = "dur_ms",
    sampler: Callable[[bytes, int], list[bytes]] | None = None,
    strict: bool = False,
) -> DataFrame:
    """(id, frame_idx, frame_bytes) — one row per sampled frame at a fixed
    period; the typical video fan-out shape (explode happens Python-side in
    the SAME Arrow batch, so frames land already distributed).  Real video
    work needs ``sampler(payload, n_frames)``; the offline fake slices the
    payload deterministically.

    Validation: ``every_ms >= 1`` is checked at plan-build time (a zero
    period would otherwise surface as an opaque ZeroDivisionError inside
    the Python worker), and NULL durations sample exactly one frame (same
    floor as a shorter-than-period clip)."""
    if every_ms < 1:
        raise ValueError(f"every_ms must be >= 1, got {every_ms}")
    if strict and sampler is None:
        raise NotImplementedError(
            "no video codec available offline — pass sampler= or use "
            "strict=False for the deterministic fake"
        )

    def _fake(payload: bytes, n: int) -> list[bytes]:
        step = max(len(payload) // max(n, 1), 1)
        return [payload[i * step : (i + 1) * step] for i in range(n)]

    smp = sampler or _fake
    id_t = df.schema[id_col].dataType.simpleString()

    def _map(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids, idxs, frames = [], [], []
            for rid, payload, dur in zip(
                pdf[id_col], pdf[bytes_col], pdf[dur_col]
            ):
                n = 1 if pd.isna(dur) else max(int(dur) // every_ms, 1)
                for i, fb in enumerate(smp(bytes(payload), n)):
                    ids.append(rid)
                    idxs.append(i)
                    frames.append(fb)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame_bytes": frames}
            )

    return df.select(id_col, bytes_col, dur_col).mapInPandas(
        _map, f"{id_col} {id_t}, frame_idx int, frame_bytes binary"
    )
