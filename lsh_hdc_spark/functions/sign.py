"""Signature stage (ops 5-8): MinHash / SimHash / b-bit sketch / LSH band keys.

Reference semantics: ``lsh_hdc/__init__.py::MinHashSignature.get_signature``,
``::MinHashSketchSignature``, ``::SimHashSignature``, ``::LSHC.hash``
(SURVEY.md §2.1 ops 5-8).  The reference computes these per item in Python;
here all four are fused into ONE vectorized pandas/Arrow UDF over the
JVM-hashed shingle arrays, so the whole signing stage costs a single
Python<->JVM Arrow hop per batch (SURVEY.md §3.1) and every inner operation
is a numpy uint64 kernel (no per-row Python — BASELINE.json input_hint).

Semantic contracts honored (SURVEY.md §2.5):
 - sig agreement mean(sig_a[k]==sig_b[k]) is an unbiased Jaccard estimator
   (property-tested in tests/test_sign.py);
 - band key = deterministic fold of one band's r signature values + band
   index; items are candidates iff some band agrees on all r rows;
 - empty shingle sets emit NO band keys (an empty set has Jaccard 0 with
   everything, so it can never be a candidate) and a NULL signature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DedupConfig
from .hashing import as_i64, as_u64, hash_seeds, mix64
from .text import hashed_shingles, shingles_for

_SIGN_SCHEMA = T.StructType(
    [
        T.StructField("sig", T.ArrayType(T.LongType()), True),
        T.StructField("sketch", T.LongType(), True),
        T.StructField("band_keys", T.ArrayType(T.LongType()), True),
    ]
)


def _ragged(hs: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Flatten a Series of int64 arrays -> (flat_u64, lens, starts)."""
    n = len(hs)
    lens = np.empty(n, dtype=np.int64)
    chunks = []
    for i, a in enumerate(hs):
        if a is None:
            lens[i] = 0
            continue
        a = np.asarray(a, dtype=np.int64)
        lens[i] = a.size
        if a.size:
            chunks.append(a)
    flat = (
        as_u64(np.concatenate(chunks)) if chunks else np.empty(0, dtype=np.uint64)
    )
    offsets = np.zeros(n, dtype=np.int64)
    np.cumsum(lens[:-1], out=offsets[1:]) if n > 1 else None
    return flat, lens, offsets


def _minhash_matrix(
    flat: np.ndarray, starts_nz: np.ndarray, kseeds: np.ndarray
) -> np.ndarray:
    """(n_nonempty, width) uint64 minhash matrix via column-min of the
    seeded splitmix64 family."""
    width = kseeds.size
    out = np.empty((starts_nz.size, width), dtype=np.uint64)
    pre = mix64(kseeds)  # one mix per seed, hoisted
    for k in range(width):
        hv = mix64(flat ^ pre[k])
        out[:, k] = np.minimum.reduceat(hv, starts_nz)
    return out


def _simhash_vec(
    flat: np.ndarray, starts_nz: np.ndarray, lens_nz: np.ndarray, bit_depth: int
) -> np.ndarray:
    """(n_nonempty,) uint64 simhash: majority vote per bit over feature
    hashes (Charikar 2002), unit weights."""
    bits = np.unpackbits(
        flat.view(np.uint8).reshape(flat.size, 8), axis=1, bitorder="little"
    )  # (N, 64) of 0/1
    counts = np.add.reduceat(bits, starts_nz, axis=0, dtype=np.int64)
    maj = 2 * counts >= lens_nz[:, None]  # (n, 64) bool majority vote
    if bit_depth < 64:
        maj[:, bit_depth:] = False
    packed = np.packbits(maj, axis=1, bitorder="little")  # (n, 8) bytes
    return np.ascontiguousarray(packed).view(np.uint64).reshape(-1)


def _band_keys(sig: np.ndarray, r: int, band_seeds: np.ndarray) -> np.ndarray:
    """(n, bands) uint64: fold each band's r rows with its band seed."""
    n, width = sig.shape
    b = width // r
    keys = np.empty((n, b), dtype=np.uint64)
    for j in range(b):
        z = np.full(n, band_seeds[j], dtype=np.uint64)
        for t in range(r):
            z = mix64(z ^ sig[:, j * r + t])
        keys[:, j] = z
    return keys


def _bit_slices(v: np.ndarray, r: int, b: int, band_seeds: np.ndarray) -> np.ndarray:
    """(n, b) uint64 band keys from r-bit slices of a 64-bit sketch."""
    keys = np.empty((v.size, b), dtype=np.uint64)
    mask = np.uint64((1 << r) - 1)
    for j in range(b):
        part = (v >> np.uint64(j * r)) & mask
        keys[:, j] = mix64(part ^ band_seeds[j])
    return keys


def sign_batch(hs: pd.Series, cfg: DedupConfig) -> pd.DataFrame:
    """Vectorized numpy core: Series of int64 shingle-hash arrays ->
    DataFrame(sig, sketch, band_keys).  Shared by the mapInPandas stage and
    by unit tests."""
    width, r, b = cfg.width, cfg.bandwidth, cfg.bands
    kseeds = hash_seeds(width, cfg.seed)
    band_seeds = hash_seeds(b, cfg.seed ^ 0xBA9D5EED)

    n = len(hs)
    flat, lens, offsets = _ragged(hs)
    nz = lens > 0
    starts_nz = offsets[nz]
    sig_col = np.empty(n, dtype=object)
    keys_col = np.empty(n, dtype=object)
    sketch_col = np.zeros(n, dtype=np.int64)

    if starts_nz.size:
        if cfg.signer == "minhash":
            sigm = _minhash_matrix(flat, starts_nz, kseeds)
            keys = _band_keys(sigm, r, band_seeds)
            nbits = min(width, 64)
            parity = (sigm[:, :nbits] & np.uint64(1)).astype(np.uint64)
            sketch = (parity << np.arange(nbits, dtype=np.uint64)[None, :]).sum(
                axis=1, dtype=np.uint64
            )
        else:  # simhash
            sh = _simhash_vec(flat, starts_nz, lens[nz], width)
            sigm = sh[:, None]
            keys = _bit_slices(sh, r, b, band_seeds)
            sketch = sh
        sig_i64 = as_i64(sigm.reshape(-1)).reshape(sigm.shape)
        keys_i64 = as_i64(keys.reshape(-1)).reshape(keys.shape)
        sk_i64 = as_i64(sketch)
        for row, i in enumerate(np.flatnonzero(nz)):
            sig_col[i] = sig_i64[row]
            keys_col[i] = keys_i64[row]
            sketch_col[i] = sk_i64[row]
    for i in np.flatnonzero(~nz):
        sig_col[i] = None
        keys_col[i] = None
    return pd.DataFrame({"sig": sig_col, "sketch": sketch_col, "band_keys": keys_col})


def signed(df: DataFrame, cfg: DedupConfig, shingles: Column | None = None) -> DataFrame:
    """id + hashed shingles + signature columns for a raw input frame.

    Output: (id_col, shingles_h: array<bigint>, sig, sketch, band_keys).
    The text column is dropped immediately after shingling and heavy payload
    columns (e.g. clips.bytes) are never selected — at 10^12-row scale the
    binary column must not enter any shuffle (SURVEY.md §4.2).

    Implementation note: the signing runs in ``mapInPandas`` (its own
    MapInPandas plan node) rather than a pandas_udf column expression:
    downstream ``explode(band_keys)`` would otherwise collapse the Python
    UDF into a Generate node, which Spark cannot evaluate (internal error
    observed on 4.1.2).  Cost is identical — one Arrow hop per batch.
    """
    sh = shingles if shingles is not None else shingles_for(cfg)
    base = df.select(F.col(cfg.id_col), hashed_shingles(sh).alias("shingles_h"))
    out_schema = T.StructType(
        list(base.schema.fields) + list(_SIGN_SCHEMA.fields)
    )

    def _map(batches):
        for pdf in batches:
            res = sign_batch(pdf["shingles_h"], cfg)
            yield pd.concat(
                [pdf.reset_index(drop=True), res.reset_index(drop=True)], axis=1
            )

    return base.mapInPandas(_map, out_schema)
