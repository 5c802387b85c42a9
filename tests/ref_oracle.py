"""Single-process reference oracle for parity tests (SURVEY.md §5.4).

``/root/reference`` is empty in this sandbox (SURVEY.md §0), so parity is
checked against this ~250-line, dependency-free reimplementation of the
reference pipeline semantics (lsh_hdc ops 2-13, SURVEY.md §2.5): eager,
in-memory, defaultdict bucket map + union-find — exactly the shape of
``lsh_hdc/cluster.py::Cluster.add_item`` / ``get_clusters`` [M].

It is deliberately an INDEPENDENT implementation: pure-Python integer math
(no numpy), its own splitmix64 and XXH64 (public-domain algorithms), its own
union-find.  A bug in either side shows up as a parity mismatch; shared code
would hide it.  If the real reference repo ever mounts, regenerate goldens
from it instead and diff against this oracle (SURVEY.md §0.4).
"""

from __future__ import annotations

import re
from collections import defaultdict

MASK = (1 << 64) - 1

# ---------------------------------------------------------------------------
# XXH64 (Collet, public domain) — must match Spark's xxhash64(str, seed=42)
# ---------------------------------------------------------------------------
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK


def _round(acc: int, inp: int) -> int:
    return (_rotl((acc + inp * _P2) & MASK, 31) * _P1) & MASK


def _merge(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """XXH64, returned as a signed int64 (Spark LongType convention)."""
    n, i = len(data), 0
    if n >= 32:
        v1, v2 = (seed + _P1 + _P2) & MASK, (seed + _P2) & MASK
        v3, v4 = seed & MASK, (seed - _P1) & MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & MASK
        for v in (v1, v2, v3, v4):
            h = _merge(h, v)
    else:
        h = (seed + _P5) & MASK
    h = (h + n) & MASK
    while i + 8 <= n:
        h = (_rotl(h ^ _round(0, int.from_bytes(data[i : i + 8], "little")), 27) * _P1 + _P4) & MASK
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ ((int.from_bytes(data[i : i + 4], "little") * _P1) & MASK), 23) * _P2 + _P3) & MASK
        i += 4
    while i < n:
        h = (_rotl(h ^ ((data[i] * _P5) & MASK), 11) * _P1) & MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & MASK
    h ^= h >> 29
    h = (h * _P3) & MASK
    h ^= h >> 32
    return h - (1 << 64) if h >= (1 << 63) else h


# ---------------------------------------------------------------------------
# splitmix64 family (pure-int reimplementation of functions/hashing.py)
# ---------------------------------------------------------------------------
_GOLD = 0x9E3779B97F4A7C15
_M1 = 0xBF58476D1CE4E5B9
_M2 = 0x94D049BB133111EB


def mix64(z: int) -> int:
    z &= MASK
    z = ((z ^ (z >> 30)) * _M1) & MASK
    z = ((z ^ (z >> 27)) * _M2) & MASK
    return z ^ (z >> 31)


def hash_seeds(n: int, seed: int) -> list[int]:
    return [mix64((seed & MASK) + k * _GOLD) for k in range(1, n + 1)]


# ---------------------------------------------------------------------------
# Ops 2-4: normalize / tokenize / shingle (mirrors Shingler.get_shingles)
# ---------------------------------------------------------------------------
_TOKEN_RE = re.compile(r"[^a-z0-9]+")


def tokenize(text: str) -> list[str]:
    return [t for t in _TOKEN_RE.split(text.lower()) if t]


def shingles(
    text: str, span: int = 3, skip: int = 0, unique: bool = True, kmin: int = 1
) -> list[str]:
    toks = tokenize(text or "")
    stride = skip + 1
    reach = (span - 1) * stride + 1
    if len(toks) >= reach:
        out = [
            " ".join(toks[i + j * stride] for j in range(span))
            for i in range(len(toks) - reach + 1)
        ]
    elif toks and kmin >= 1:
        out = [" ".join(toks)]
    else:
        out = []
    if unique:
        seen, res = set(), []
        for s in out:
            if s not in seen:
                seen.add(s)
                res.append(s)
        return res
    return out


def char_shingles(text: str, span: int = 4, unique: bool = True, kmin: int = 1) -> list[str]:
    s = re.sub(r"\s+", " ", (text or "").lower()).strip()
    if len(s) >= span:
        out = [s[i : i + span] for i in range(len(s) - span + 1)]
    elif s and kmin >= 1:
        out = [s]
    else:
        out = []
    if unique:
        return list(dict.fromkeys(out))
    return out


# ---------------------------------------------------------------------------
# Ops 5-8: signatures and band keys
# ---------------------------------------------------------------------------
_FOLD_SEED = 0x51C1E5EED  # shared with functions/sign.py::FOLD_SEED


def element_hash_u(s: str) -> int:
    """mix64 of the polynomial codepoint hash (unsigned) — matches
    functions/sign.py::poly_hash_flat."""
    h = 0
    for ch in s:
        h = (h * 1000003 + ord(ch)) & MASK
    return mix64(h)


def shingle_hash(s: str, mode: str = "word") -> int:
    """Signed int64 shingle hash matching the pipeline: word mode folds the
    token hashes with the fold seed (functions/sign.py::word_shingle_hashes);
    char mode hashes the whole substring."""
    if mode == "word":
        z = _FOLD_SEED
        for tok in s.split(" "):
            z = mix64(z ^ element_hash_u(tok))
    else:
        z = element_hash_u(s)
    return z - (1 << 64) if z >= (1 << 63) else z


def shingle_hashes(sh: list[str], mode: str = "word") -> list[int]:
    return [shingle_hash(s, mode) for s in sh]


def minhash_sig(hashes: list[int], width: int, seed: int) -> list[int] | None:
    if not hashes:
        return None
    hs_u = [h & MASK for h in hashes]
    return [min(mix64(h ^ mix64(ks)) for h in hs_u) for ks in hash_seeds(width, seed)]


def band_keys(sig: list[int], bandwidth: int, seed: int) -> list[int]:
    b = len(sig) // bandwidth
    bseeds = hash_seeds(b, (seed ^ 0xBA9D5EED) & MASK)
    keys = []
    for j in range(b):
        z = bseeds[j]
        for t in range(bandwidth):
            z = mix64(z ^ (sig[j * bandwidth + t] & MASK))
        keys.append(z)
    return keys


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


# ---------------------------------------------------------------------------
# Ops 9-13: bucket map + union-find clustering (mirrors Cluster)
# ---------------------------------------------------------------------------
class UnionFind:
    def __init__(self):
        self.parent: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p != x:
            self.parent[x] = p = self.find(p)
        return p

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def cluster(
    items: list[tuple],
    span: int = 3,
    skip: int = 0,
    unique: bool = True,
    kmin: int = 1,
    width: int = 12,
    bandwidth: int = 3,
    seed: int = 0x5EED_1E5B,
    jaccard_threshold: float | None = None,
    min_support: int = 1,
    mode: str = "word",
    char_span: int = 4,
) -> dict:
    """items: [(id, text)] -> {id: cluster_id} with cluster_id = component
    min id; clusters below min_support map to None.

    Eager single-process flow mirroring HDClustering.clusters_from_iter:
    every pair sharing >=1 band key is verified by exact Jaccard on the
    shingle-hash sets, surviving pairs are unioned.
    """
    if jaccard_threshold is None:
        b = width // bandwidth
        jaccard_threshold = (1.0 / b) ** (1.0 / bandwidth)

    sets: dict = {}
    buckets: dict[int, set] = defaultdict(set)
    uf = UnionFind()
    keys_of: dict = {}
    for iid, text in items:
        if mode == "word":
            sh = shingles(text, span=span, skip=skip, unique=unique, kmin=kmin)
        else:
            sh = char_shingles(text, span=char_span, unique=unique, kmin=kmin)
        hs = set(shingle_hashes(sh, mode))
        sets[iid] = hs
        sig = minhash_sig(sorted(hs), width, seed)
        keys_of[iid] = band_keys(sig, bandwidth, seed) if sig else []

    for iid, _ in items:
        uf.find(iid)
        for key in keys_of[iid]:
            for peer in buckets[key]:
                if jaccard(sets[iid], sets[peer]) >= jaccard_threshold:
                    uf.union(iid, peer)
            buckets[key].add(iid)

    labels = {iid: uf.find(iid) for iid, _ in items}
    if min_support > 1:
        from collections import Counter

        sizes = Counter(labels.values())
        labels = {
            i: (c if sizes[c] >= min_support else None) for i, c in labels.items()
        }
    return labels


def dup_pairs(labels: dict) -> set[tuple]:
    """All unordered co-clustered pairs of a labeling (cluster_id None/
    singleton excluded)."""
    groups = defaultdict(list)
    for i, c in labels.items():
        if c is not None:
            groups[c].append(i)
    out = set()
    for members in groups.values():
        members.sort()
        for x in range(len(members)):
            for y in range(x + 1, len(members)):
                out.add((members[x], members[y]))
    return out


def pair_recall(predicted: dict, reference: dict) -> tuple[float, float]:
    """(recall, precision) of predicted dup-pairs vs reference dup-pairs."""
    p, r = dup_pairs(predicted), dup_pairs(reference)
    if not r:
        return 1.0, 1.0 if not p else 0.0
    tp = len(p & r)
    recall = tp / len(r)
    precision = tp / len(p) if p else 1.0
    return recall, precision
