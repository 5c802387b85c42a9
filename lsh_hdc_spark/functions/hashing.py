"""Deterministic vectorized 64-bit hashing (numpy, uint64 wraparound).

All randomness in the pipeline flows from explicit integer seeds through the
splitmix64 finalizer — never Python's builtin ``hash()`` (PYTHONHASHSEED
trap, SURVEY.md §7.4.4) and never ``Date.now``-style nondeterminism. The
reference used CityHash/MetroHash bindings; byte-level hash parity is
explicitly NOT required (SURVEY.md §2.4 "Hash-function parity caveat") —
any uniform 64-bit family gives distribution-equivalent MinHash collision
statistics. splitmix64 (Steele et al., public domain; the Java 8
SplittableRandom finalizer) is used because it vectorizes to 6 numpy ops.
"""

from __future__ import annotations

import numpy as np

GOLDEN: np.uint64 = np.uint64(0x9E3779B97F4A7C15)
_M1: np.uint64 = np.uint64(0xBF58476D1CE4E5B9)
_M2: np.uint64 = np.uint64(0x94D049BB133111EB)


def mix64(z: np.ndarray | np.uint64) -> np.ndarray | np.uint64:
    """splitmix64 finalizer; input/output uint64 (arrays or scalars).
    uint64 multiply wraparound is intentional (mod-2^64 arithmetic)."""
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        return z ^ (z >> np.uint64(31))


def hash_seeds(n: int, seed: int) -> np.ndarray:
    """n independent uint64 stream seeds derived from one integer seed."""
    ks = np.arange(1, n + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return mix64(np.uint64(seed & 0xFFFFFFFFFFFFFFFF) + ks * GOLDEN)


def as_u64(a: np.ndarray) -> np.ndarray:
    """Reinterpret int64 (e.g. Spark xxhash64 output) as uint64."""
    return np.ascontiguousarray(a, dtype=np.int64).view(np.uint64)


def as_i64(a: np.ndarray) -> np.ndarray:
    """Reinterpret uint64 back to int64 for Spark LongType columns."""
    return np.ascontiguousarray(a, dtype=np.uint64).view(np.int64)


def hash_u64_seeded(values: np.ndarray, seed: np.uint64) -> np.ndarray:
    """One member of the hash family: h_seed(x) = mix64(x ^ mix64(seed))."""
    return mix64(as_u64(values) ^ mix64(seed))
