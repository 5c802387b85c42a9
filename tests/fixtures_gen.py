"""Deterministic fixture generators (FIXTURES.md corpora B/C/D).

Every generator is a pure function of its seed (numpy PCG64); same seed =>
byte-identical fixtures.  No wall-clock, no builtin hash().
"""

from __future__ import annotations

import numpy as np

VOCAB = [f"tok{i:02d}" for i in range(64)]
_ZIPF_P = np.array([1.0 / (i + 1) for i in range(64)])
_ZIPF_P /= _ZIPF_P.sum()


def _draw_tokens(rng: np.random.Generator, n: int) -> list[str]:
    return [VOCAB[i] for i in rng.choice(64, size=n, p=_ZIPF_P)]


def docs_labeled(
    n_families: int = 60, n_singletons: int = 180, seed: int = 42
) -> list[tuple[str, str, int]]:
    """Corpus B (FIXTURES.md): [(id, content, family)] — near-dup families
    plus noise singletons (family = -1).

    Perturbations per (family, k), cycling: swap one token / delete one /
    duplicate one / append 1-2 / identical copy — the short-comment dup
    semantics the reference's test_cluster fixture exercises [M].
    """
    rng = np.random.default_rng(seed)
    rows: list[tuple[str, str, int]] = []
    counter = 0

    def nid() -> str:
        nonlocal counter
        counter += 1
        return f"d{counter:05d}"

    for fam in range(n_families):
        length = int(rng.integers(18, 40))
        toks = _draw_tokens(rng, length)
        rows.append((nid(), " ".join(toks), fam))
        for k in range(int(rng.integers(2, 7))):
            p = list(toks)
            op = k % 5
            pos = int(rng.integers(0, len(p)))
            if op == 0:  # swap one token for a random other
                p[pos] = VOCAB[int(rng.integers(0, 64))]
            elif op == 1:  # delete one
                del p[pos]
            elif op == 2:  # duplicate one
                p.insert(pos, p[pos])
            elif op == 3:  # append 1-2
                p.extend(_draw_tokens(rng, int(rng.integers(1, 3))))
            # op == 4: identical copy
            rows.append((nid(), " ".join(p), fam))

    for _ in range(n_singletons):
        length = int(rng.integers(5, 40))
        rows.append((nid(), " ".join(_draw_tokens(rng, length)), -1))
    return rows


def sets_random(
    n_orig: int = 100, set_size: int = 10, universe: int = 1000, seed: int = 7
) -> list[tuple[str, list[str], str | None]]:
    """Corpus C (FIXTURES.md): [(sid, elems, is_dup_of)] — originals plus
    one-element-perturbed copies (test_lsh semantics [M])."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_orig):
        elems = [f"e{x}" for x in rng.choice(universe, size=set_size, replace=False)]
        sid = f"s{i:04d}"
        rows.append((sid, elems, None))
        dup = list(elems)
        dup[int(rng.integers(0, set_size))] = f"e{int(rng.integers(universe, universe * 2))}"
        rows.append((f"{sid}_d1", dup, sid))
    return rows


def substr_docs(
    n_pairs: int = 30, n_noise: int = 60, overlap: int = 96, seed: int = 13
) -> list[tuple[str, str, str | None]]:
    """Corpus D (FIXTURES.md): [(id, text, contains_id)] — containment pairs
    with long unique flanks (near-zero shingle Jaccard by construction) that
    only a substring pass can catch."""
    rng = np.random.default_rng(seed)
    alphabet = np.array(list("abcdefghijklmnopqrstuvwxyz "))

    def rand_text(n: int) -> str:
        return "".join(rng.choice(alphabet, size=n))

    rows = []
    for i in range(n_pairs):
        core = rand_text(overlap)
        a = f"p{i:03d}a"
        rows.append((a, rand_text(400) + core + rand_text(400), None))
        rows.append((f"p{i:03d}b", rand_text(350) + core + rand_text(450), a))
    for i in range(n_noise):
        rows.append((f"n{i:03d}", rand_text(int(rng.integers(200, 900))), None))
    return rows
