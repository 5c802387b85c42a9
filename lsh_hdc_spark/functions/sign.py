"""Signature stage (ops 2-8): shingle hashing + MinHash / SimHash / b-bit
sketch / LSH band keys, fused into ONE vectorized Arrow stage.

Reference semantics: ``lsh_hdc/__init__.py::Shingler.get_shingles``,
``::MinHashSignature.get_signature``, ``::MinHashSketchSignature``,
``::SimHashSignature``, ``::LSHC.hash`` (SURVEY.md §2.1 ops 2-8).  The
reference computes these per item in Python; here the whole chain runs in
one ``mapInPandas`` pass per batch: tokenize/shingle in CPython (regex +
list ops — linear, C-backed), then EVERYTHING numeric as numpy uint64
kernels over one flat concatenated array (polynomial shingle hashing,
seeded-minima MinHash, bit-majority SimHash, band-key folds).

Why not Catalyst expressions for shingling: Spark's higher-order functions
(transform/filter lambdas) evaluate interpreted, outside whole-stage
codegen, and re-evaluate the tokenization per lambda call — measured ~45 s
for 20k short docs vs ~2 s for this path.  The Catalyst shingle expressions
remain in functions/text.py for the SQL-oracle-checked queries.

Semantic contracts honored (SURVEY.md §2.5):
 - shingle hash = mix64(polynomial(codepoints)) — reproduced exactly by the
   pure-int test oracle (tests/ref_oracle.py::shingle_hash);
 - sig agreement mean(sig_a[k]==sig_b[k]) is an unbiased Jaccard estimator
   (property-tested in tests/test_sign.py);
 - band key = deterministic fold of one band's r signature values + band
   index; items are candidates iff some band agrees on all r rows;
 - empty shingle sets emit NO band keys (an empty set has Jaccard 0 with
   everything, so it can never be a candidate) and a NULL signature.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import DedupConfig
from .hashing import as_i64, hash_seeds, mix64
from .text import TOKEN_SPLIT_RE

_TOKEN_RE = re.compile(TOKEN_SPLIT_RE)
_WS_RE = re.compile(r"\s+")
POLY_BASE = 1000003  # shared with the oracle's element_hash
#: fold seed for combining token hashes into a word-shingle hash — shared
#: with the oracle's shingle_hash
FOLD_SEED = np.uint64(0x51C1E5EED)

_SIGN_SCHEMA = T.StructType(
    [
        T.StructField("shingles_h", T.ArrayType(T.LongType()), True),
        T.StructField("sig", T.ArrayType(T.LongType()), True),
        T.StructField("sketch", T.LongType(), True),
        T.StructField("band_keys", T.ArrayType(T.LongType()), True),
    ]
)


def shingles_of(text: str | None, cfg: DedupConfig) -> list[str]:
    """Python shingler (ops 2-4), exactly mirroring functions/text.py's
    Catalyst expressions (tested equal in test_sign.py)."""
    if not text:
        return []
    if cfg.shingle_mode == "word":
        toks = [t for t in _TOKEN_RE.split(text.lower()) if t]
        stride = cfg.skip + 1
        reach = (cfg.span - 1) * stride + 1
        if len(toks) >= reach:
            out = [
                " ".join(toks[i + j * stride] for j in range(cfg.span))
                for i in range(len(toks) - reach + 1)
            ]
        elif toks and cfg.kmin >= 1:
            out = [" ".join(toks)]
        else:
            out = []
    else:
        s = _WS_RE.sub(" ", text.lower()).strip()
        stride = cfg.skip + 1
        reach = (cfg.span - 1) * stride + 1
        if len(s) >= reach:
            out = [
                "".join(s[i + j * stride] for j in range(cfg.span))
                for i in range(len(s) - reach + 1)
            ]
        elif s and cfg.kmin >= 1:
            out = [s]
        else:
            out = []
    if cfg.unique:
        return list(dict.fromkeys(out))
    return out


def poly_hash_flat(shingles: list[str]) -> np.ndarray:
    """uint64 hash per shingle: mix64 of the polynomial codepoint hash
    h(s) = sum_i ord(s[i]) * BASE^(len-1-i) mod 2^64 — one vectorized pass
    over the concatenation of ALL shingles in the batch."""
    if not shingles:
        return np.empty(0, dtype=np.uint64)
    big = "".join(shingles)
    codes = np.frombuffer(big.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    lens = np.fromiter(map(len, shingles), dtype=np.int64, count=len(shingles))
    ends = np.cumsum(lens)
    starts = ends - lens
    seg = np.repeat(np.arange(lens.size), lens)
    exps = ends[seg] - 1 - np.arange(codes.size)
    with np.errstate(over="ignore"):
        ptable = np.multiply.accumulate(
            np.full(max(int(lens.max()), 1), POLY_BASE, dtype=np.uint64)
        )
        ptable = np.concatenate([[np.uint64(1)], ptable[:-1]])
        prod = codes * ptable[exps]
        # reduceat needs non-empty segments; shingles are never empty strings
        h = np.add.reduceat(prod, starts)
    return mix64(h)


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


def _combo_keys(keys: np.ndarray, m: int, seed: int) -> np.ndarray:
    """Scheme 'b<m>' (op 8 variant): (n, C(b, m)) uint64 keys, one per
    m-subset of the b base bands.  The fold z = mix64(z ^ key_j) is
    ORDER-DEPENDENT; determinism holds because itertools.combinations
    yields each subset's members in one fixed (ascending) order for every
    item — do not reorder the fold.  Two items share a combo key iff all m
    member bands agree, so candidacy <=> >= m of the b bands agree (AND-OR
    amplification; see config.candidate_probability_b)."""
    from itertools import combinations

    n, b = keys.shape
    combos = list(combinations(range(b), m))
    cseeds = hash_seeds(len(combos), seed ^ 0xC0B05EED)
    out = np.empty((n, len(combos)), dtype=np.uint64)
    for ci, combo in enumerate(combos):
        z = np.full(n, cseeds[ci], dtype=np.uint64)
        for j in combo:
            z = mix64(z ^ keys[:, j])
        out[:, ci] = z
    return out


def _seg_arange(counts: np.ndarray) -> np.ndarray:
    """[0..c0-1, 0..c1-1, ...] for segment sizes `counts`."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    ends = np.cumsum(counts)
    return np.arange(total, dtype=np.int64) - np.repeat(ends - counts, counts)


def word_shingle_hashes(texts: pd.Series, cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    """(flat_u64, per-doc shingle counts) for word mode.

    Token-level hashing: factorize all batch tokens (C speed), hash each
    DISTINCT token once (poly+mix64), then fold the span token hashes of
    each window with FOLD_SEED.  Compared to hashing shingle STRINGS
    character-wise this moves ~25x less memory (the former was measured
    memory-bandwidth-bound: zero core scaling on 200-token docs).
    Duplicate shingles are NOT deduped here — MinHash minima and the
    array_distinct-based Jaccard verify are insensitive to multiplicity.
    """
    stride = cfg.skip + 1
    span = cfg.span
    reach = (span - 1) * stride + 1
    tok_lists = [
        [t for t in _TOKEN_RE.split(x.lower()) if t] if x else [] for x in texts
    ]
    ntok = np.fromiter(map(len, tok_lists), dtype=np.int64, count=len(tok_lists))
    flat_toks = [t for lst in tok_lists for t in lst]
    if not flat_toks:
        return np.empty(0, dtype=np.uint64), np.zeros(len(texts), dtype=np.int64)
    codes, uniques = pd.factorize(np.asarray(flat_toks, dtype=object))
    th = poly_hash_flat(list(uniques))[codes]  # (n_tokens,) uint64

    doc_start = np.cumsum(ntok) - ntok
    full = ntok >= reach
    nwin = np.where(full, ntok - reach + 1, np.where(ntok > 0, int(cfg.kmin >= 1), 0))
    out = np.empty(int(nwin.sum()), dtype=np.uint64)
    out_start = np.cumsum(nwin) - nwin

    # vectorized fold for full-window docs
    nw_full = nwin[full]
    if nw_full.size:
        starts = np.repeat(doc_start[full], nw_full) + _seg_arange(nw_full)
        z = np.full(starts.size, FOLD_SEED, dtype=np.uint64)
        for j in range(span):
            z = mix64(z ^ th[starts + j * stride])
        pos = np.repeat(out_start[full], nw_full) + _seg_arange(nw_full)
        out[pos] = z
    # short docs (kmin fallback): one shingle = fold over ALL tokens
    for d in np.flatnonzero(~full & (nwin > 0)):
        z = FOLD_SEED
        for t in th[doc_start[d] : doc_start[d] + ntok[d]]:
            z = mix64(z ^ t)
        out[out_start[d]] = z
    return out, nwin


def _dedup_segments(
    flat: np.ndarray, lens: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Per-segment unique of flat hash values (sorted within segment);
    returns (flat', lens')."""
    if flat.size == 0:
        return flat, lens
    seg = np.repeat(np.arange(lens.size), lens)
    order = np.lexsort((flat, seg))
    fs, ss = flat[order], seg[order]
    keep = np.ones(fs.size, dtype=bool)
    keep[1:] = (fs[1:] != fs[:-1]) | (ss[1:] != ss[:-1])
    return fs[keep], np.bincount(ss[keep], minlength=lens.size).astype(np.int64)


def char_shingle_hashes(texts: pd.Series, cfg: DedupConfig) -> tuple[np.ndarray, np.ndarray]:
    """(flat_u64, per-doc shingle counts) for char mode: poly+mix64 of each
    shingle substring (distinct per doc when cfg.unique)."""
    sh_lists = [shingles_of(t, cfg) for t in texts]
    lens = np.fromiter(map(len, sh_lists), dtype=np.int64, count=len(sh_lists))
    all_sh = [s for lst in sh_lists for s in lst]
    return poly_hash_flat(all_sh), lens


def sign_batch_texts(texts: pd.Series, cfg: DedupConfig) -> pd.DataFrame:
    """Batch kernel: Series of raw texts -> DataFrame(shingles_h, sig,
    sketch, band_keys).  Shared by the mapInPandas stage and unit tests."""
    width, r, b = cfg.width, cfg.bandwidth, cfg.bands
    kseeds = hash_seeds(width, cfg.seed)
    band_seeds = hash_seeds(b, cfg.seed ^ 0xBA9D5EED)

    n = len(texts)
    if cfg.shingle_mode == "word":
        flat, lens = word_shingle_hashes(texts, cfg)
        if cfg.unique and cfg.signer == "simhash":
            # word_shingle_hashes keeps duplicate shingles (harmless for
            # MinHash minima and the array_distinct Jaccard verify), but
            # SimHash's bit-majority vote counts multiplicity — honor
            # cfg.unique here so word mode matches shingles_of and char mode
            flat, lens = _dedup_segments(flat, lens)
    else:
        flat, lens = char_shingle_hashes(texts, cfg)
    offsets = np.zeros(n, dtype=np.int64)
    if n > 1:
        np.cumsum(lens[:-1], out=offsets[1:])
    nz = lens > 0
    starts_nz = offsets[nz]

    sig_col = np.empty(n, dtype=object)
    keys_col = np.empty(n, dtype=object)
    sh_col = np.empty(n, dtype=object)
    sketch_col = np.zeros(n, dtype=np.int64)

    flat_i64 = as_i64(flat)
    bounds = np.concatenate([offsets, [int(lens.sum())]]) if n else offsets
    for i in range(n):
        sh_col[i] = flat_i64[bounds[i] : bounds[i + 1]] if lens[i] else None

    if starts_nz.size:
        if cfg.signer == "minhash":
            sigm = _minhash_matrix(flat, starts_nz, kseeds)
            keys = _band_keys(sigm, r, band_seeds)
            # sketch width follows cfg.sketch_bits when the Hamming
            # pre-filter is enabled (op 10), so max_hamming is applied over
            # exactly the configured bit count; otherwise use the full
            # signature (informational column only)
            nbits = min(cfg.sketch_bits or width, width, 64)
            parity = (sigm[:, :nbits] & np.uint64(1)).astype(np.uint64)
            sketch = (parity << np.arange(nbits, dtype=np.uint64)[None, :]).sum(
                axis=1, dtype=np.uint64
            )
        else:  # simhash
            sh = _simhash_vec(flat, starts_nz, lens[nz], width)
            sigm = sh[:, None]
            keys = _bit_slices(sh, r, b, band_seeds)
            sketch = sh
        if cfg.scheme_kind == "b":
            keys = _combo_keys(keys, cfg.scheme_ramp, cfg.seed)
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
    return pd.DataFrame(
        {
            "shingles_h": sh_col,
            "sig": sig_col,
            "sketch": sketch_col,
            "band_keys": keys_col,
        }
    )


def signed(df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """id + hashed shingles + signature columns for a raw input frame.

    Output: (id_col, shingles_h: array<bigint>, sig, sketch, band_keys).
    The text column is consumed inside the stage and heavy payload columns
    (e.g. clips.bytes) are never selected — at 10^12-row scale the binary
    column must not enter any shuffle (SURVEY.md §4.2).

    Implementation notes: one ``mapInPandas`` pass (own plan node — a
    pandas_udf column expression consumed by explode() hits a Catalyst
    Generate internal error on 4.1.2, and Catalyst higher-order functions
    evaluate interpreted and would dominate the stage cost; see module
    docstring).
    """
    base = df.select(F.col(cfg.id_col), F.col(cfg.text_col))
    out_schema = T.StructType(
        [base.schema[cfg.id_col]] + list(_SIGN_SCHEMA.fields)
    )

    def _map(batches):
        for pdf in batches:
            res = sign_batch_texts(pdf[cfg.text_col], cfg)
            res.insert(0, cfg.id_col, pdf[cfg.id_col].reset_index(drop=True))
            yield res

    return base.mapInPandas(_map, out_schema)
