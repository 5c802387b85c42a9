"""Pipeline configuration.

``DedupConfig`` is the Spark-native equivalent of the cfg dict accepted by
the reference's high-level pipeline (``lsh_hdc/cluster.py::HDClustering`` —
see SURVEY.md §2.1 op 14): shingler options (span/skip/unique/kmin,
word|char mode), signer selection (minhash|simhash) + signature width,
LSH banding (bandwidth = rows per band, scheme), optional b-bit sketch
filter, exact-Jaccard verification threshold, and min_support.  Extra
fields (`pair_cap`, `anchor_fanout`, `drop_cap`, `salt_buckets`) configure
the scale path (salted/capped hot-band handling, SURVEY.md §2.3 op 25)
which has no reference counterpart because the reference is single-process.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace


def get_threshold(r: int, b: int) -> float:
    """Approximate Jaccard similarity at which the banding S-curve crosses
    50% candidate probability: t ≈ (1/b)^(1/r).

    Mirrors ``lsh_hdc/__init__.py::get_threshold`` [M] (MMDS ch.3 banding
    analysis).
    """
    if r <= 0 or b <= 0:
        raise ValueError("rows per band and band count must be positive")
    return (1.0 / b) ** (1.0 / r)


def get_bandwidth(width: int, threshold: float) -> int:
    """Pick rows-per-band r (a divisor of ``width``) whose banding threshold
    (1/b)^(1/r) with b = width/r is closest to ``threshold``.

    Mirrors ``lsh_hdc/__init__.py::get_bandwidth`` [M].
    """
    if width <= 0:
        raise ValueError("width must be positive")
    best_r, best_err = 1, math.inf
    for r in range(1, width + 1):
        if width % r != 0:
            continue
        b = width // r
        err = abs(get_threshold(r, b) - threshold)
        if err < best_err:
            best_r, best_err = r, err
    return best_r


def candidate_probability(s: float, r: int, b: int) -> float:
    """P(two items with Jaccard s share >=1 band) = 1 - (1 - s^r)^b."""
    return 1.0 - (1.0 - s**r) ** b


def candidate_probability_b(s: float, r: int, b: int, m: int) -> float:
    """Scheme 'b<m>' candidate probability: keys are all C(b, m)
    combinations of the b disjoint bands, and a combination matches iff ALL
    its m bands agree — so candidacy <=> at least m of the b independent
    bands agree: P = P(Binomial(b, s^r) >= m).  m=1 degenerates to scheme
    'a'.  Raising m steepens the S-curve toward precision (AND-OR
    amplification, MMDS ch.3)."""
    p = s**r
    return sum(
        math.comb(b, k) * p**k * (1.0 - p) ** (b - k) for k in range(m, b + 1)
    )


@dataclass(frozen=True)
class DedupConfig:
    """Configuration for the near-duplicate clustering pipeline.

    Defaults follow the provisional parity config pinned in FIXTURES.md
    (span=3 word shingles, width=12, bandwidth=3 => 4 bands x 3 rows,
    scheme 'a', no sketch filter, min_support=1).
    """

    # ---- column bindings -------------------------------------------------
    id_col: str = "doc_id"
    text_col: str = "text"

    # ---- shingler (ops 2-4) ---------------------------------------------
    shingle_mode: str = "word"  # "word" | "char"
    span: int = 3               # n-gram window (tokens or chars)
    skip: int = 0               # skip-gram stride - 1 (0 = contiguous)
    unique: bool = True         # dedup shingles per doc
    kmin: int = 1               # short docs still emit >=1 shingle (whole doc)

    # ---- signer (ops 5-7) -------------------------------------------------
    signer: str = "minhash"     # "minhash" | "simhash"
    width: int = 12             # minhash functions, or simhash bit depth (<=64)

    # ---- LSH banding (op 8) ----------------------------------------------
    bandwidth: int = 3          # rows per band (r)
    #: 'a' = disjoint contiguous bands (one key per band); 'b<m>' = one key
    #: per m-subset of the bands, matching iff all m agree (candidate <=>
    #: >= m bands agree) — the reference's combinatorial recall/precision
    #: shaping scheme ``lsh_hdc/__init__.py::LSHC`` scheme 'b<ramp>' [M],
    #: reconstructed as standard AND-OR amplification (exact ramp
    #: semantics unreadable, SURVEY.md §0; the implemented contract is
    #: documented and property-tested)
    scheme: str = "a"

    # ---- sketch filter (ops 6, 10) ----------------------------------------
    #: b-bit MinHash sketch width; 0 disables the Hamming pre-filter.  When
    #: > 0, the sketch packs the parity bit of the first `sketch_bits`
    #: signature rows and `max_hamming` is applied over exactly that many
    #: bits (requires sketch_bits <= min(width, 64)).
    sketch_bits: int = 0
    max_hamming: int = 3

    # ---- content filter (op 15) --------------------------------------------
    #: SQL boolean expression deciding whether a row participates in
    #: clustering at all (reference: ``HDClustering(content_filter=...)``
    #: [M]).  Rows failing it never reach signing; they appear in the
    #: output with NULL cluster_id/cluster_size.  None = everything
    #: participates.
    content_filter: str | None = None

    # ---- verification + clustering (ops 11-13) ----------------------------
    jaccard_threshold: float | None = None  # None -> get_threshold(r, b)
    min_support: int = 1

    # ---- substring pass (op 23) --------------------------------------------
    #: when set, doc pairs sharing an exact common substring of this length
    #: are OR-merged into the edge list before clustering (catches near-
    #: containment that shingle-Jaccard misses); None disables the pass
    substring_min_len: int | None = None

    # ---- determinism -------------------------------------------------------
    seed: int = 0x5EED_1E5B

    # ---- scale path (op 25): hot-band policy -------------------------------
    pair_cap: int = 512         # bucket size above which full pair-gen stops
    anchor_fanout: int = 4      # anchors per hot bucket (star fallback)
    drop_cap: int = 100_000     # bucket size above which the band is dropped
    salt_buckets: int = 16      # salt fanout for hot-bucket repartitioning

    def __post_init__(self) -> None:
        if self.shingle_mode not in ("word", "char"):
            raise ValueError(f"shingle_mode must be word|char, got {self.shingle_mode}")
        if self.signer not in ("minhash", "simhash"):
            raise ValueError(f"signer must be minhash|simhash, got {self.signer}")
        if self.scheme_kind not in ("a", "b"):
            raise ValueError(f"scheme must be 'a' or 'b<m>', got {self.scheme!r}")
        if self.scheme_kind == "b":
            m = self.scheme_ramp
            if m < 1:
                raise ValueError("scheme 'b' needs a ramp, e.g. 'b2'")
            if m > self.width // self.bandwidth:
                raise ValueError(
                    f"scheme ramp {m} cannot exceed the band count "
                    f"{self.width // self.bandwidth}"
                )
        if self.signer == "simhash" and self.width > 64:
            raise ValueError("simhash bit depth must be <= 64")
        if not 0 <= self.sketch_bits <= 64:
            raise ValueError("sketch_bits must be in [0, 64]")
        if self.sketch_bits > self.width:
            raise ValueError(
                f"sketch_bits {self.sketch_bits} cannot exceed signature "
                f"width {self.width}"
            )
        if self.width % self.bandwidth != 0:
            raise ValueError(
                f"bandwidth (rows per band) {self.bandwidth} must divide "
                f"signature width {self.width}"
            )
        if self.span < 1 or self.skip < 0:
            raise ValueError("span >= 1 and skip >= 0 required")

    # ---- derived -----------------------------------------------------------
    @property
    def bands(self) -> int:
        return self.width // self.bandwidth

    @property
    def scheme_kind(self) -> str:
        return self.scheme[:1]

    @property
    def scheme_ramp(self) -> int:
        """m for scheme 'b<m>' (0 for scheme 'a')."""
        if self.scheme_kind != "b":
            return 0
        try:
            return int(self.scheme[1:])
        except ValueError:
            return -1

    @property
    def n_band_keys(self) -> int:
        """Band keys emitted per item: b for scheme 'a', C(b, m) for 'b<m>'."""
        if self.scheme_kind == "b":
            return math.comb(self.bands, self.scheme_ramp)
        return self.bands

    @property
    def resolved_jaccard_threshold(self) -> float:
        if self.jaccard_threshold is not None:
            return self.jaccard_threshold
        return get_threshold(self.bandwidth, self.bands)

    def with_(self, **kw) -> "DedupConfig":
        return replace(self, **kw)


#: Provisional reference-parity config (FIXTURES.md; SURVEY.md §5.3) for the
#: `documents` flagship input.
PARITY = DedupConfig()

#: Config bound to the production `clips` schema (BASELINE.json input_hint).
CLIPS = DedupConfig(id_col="clip_id", text_col="transcript")
