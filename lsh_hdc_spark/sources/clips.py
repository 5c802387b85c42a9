"""Deterministic synthesizer for the production `clips` table shape
(BASELINE.json input_hint):

    clips(clip_id: string, bytes: binary, sr_hz: int, dur_ms: int,
          codec: string, transcript: string)

FIXTURES.md §A semantics: duplicate families share perturbed transcripts and
the duplicates' PCM is the family original's PCM plus deterministic -40 dB
noise (keeps pairs acoustically "same" while exercising the SNR math).

Generation is DISTRIBUTED (spark.range -> mapInPandas) and a pure function
of (seed, row index): every member's PCM is derivable from its family seed
alone, so a duplicate can be synthesized without seeing the original's row —
no shuffle, no driver-side loop, scales to any n.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..functions.audio import pcm16_to_wav

CLIPS_SCHEMA = (
    "clip_id string, bytes binary, sr_hz int, dur_ms int, "
    "codec string, transcript string"
)

_VOCAB = [f"tok{i:02d}" for i in range(64)]
FAMILY_SIZE = 4  # 1 original + 3 near-duplicates
DUP_FRACTION = 0.7  # fraction of rows that belong to families


#: (min, max) transcript length in tokens; override for workloads with
#: longer speech segments (scaling runs use ~real-transcript lengths)
TRANSCRIPT_TOKENS = (18, 40)
DUR_MS_RANGE = (200, 1000)


def _family_pcm(rng: np.random.Generator, sr_hz: int, dur_ms: int) -> np.ndarray:
    """2-4 summed sine tones, amplitude 0.5, int16."""
    n = sr_hz * dur_ms // 1000
    t = np.arange(n, dtype=np.float64) / sr_hz
    n_tones = int(rng.integers(2, 5))
    sig = np.zeros(n)
    for _ in range(n_tones):
        f = float(rng.uniform(80.0, min(4000.0, sr_hz / 2 - 100)))
        ph = float(rng.uniform(0, 2 * np.pi))
        sig += np.sin(2 * np.pi * f * t + ph)
    sig *= 0.5 / n_tones
    return np.clip(sig * 32767, -32768, 32767).astype(np.int16)


def _family_transcript(
    rng: np.random.Generator,
    tokens: tuple[int, int] = TRANSCRIPT_TOKENS,
    vocab_size: int = 64,
) -> list[str]:
    length = int(rng.integers(tokens[0], tokens[1]))
    if vocab_size == 64:  # default corpus: Zipf over the fixed small vocab
        probs = 1.0 / np.arange(1, 65)
        probs /= probs.sum()
        return [_VOCAB[i] for i in rng.choice(64, size=length, p=probs)]
    # large vocabs (scaling corpora): uniform draw, negligible accidental
    # shingle overlap between unrelated docs
    return [f"tok{i:05d}" for i in rng.integers(0, vocab_size, size=length)]


def _perturb(
    toks: list[str], k: int, rng: np.random.Generator, vocab_size: int = 64
) -> list[str]:
    p = list(toks)
    op = k % 4
    pos = int(rng.integers(0, len(p)))
    if op == 0:
        i = int(rng.integers(0, vocab_size))
        p[pos] = _VOCAB[i] if vocab_size == 64 else f"tok{i:05d}"
    elif op == 1:
        del p[pos]
    elif op == 2:
        p.insert(pos, p[pos])
    # op == 3: identical copy
    return p


def _synth_row(
    i: int,
    n_family_rows: int,
    seed: int,
    tokens: tuple[int, int] = TRANSCRIPT_TOKENS,
    dur_range: tuple[int, int] = DUR_MS_RANGE,
    vocab_size: int = 64,
) -> tuple:
    if i < n_family_rows:
        fam, k = divmod(i, FAMILY_SIZE)
        fam_rng = np.random.default_rng([seed, fam])
        sr = 16000 if fam_rng.random() < 0.9 else 8000
        dur = int(fam_rng.integers(*dur_range))
        pcm = _family_pcm(fam_rng, sr, dur)
        toks = _family_transcript(fam_rng, tokens, vocab_size)
        if k > 0:  # duplicate: original PCM + deterministic -40 dB noise
            m_rng = np.random.default_rng([seed, fam, k])
            rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))) or 1.0
            noise = m_rng.normal(0.0, rms * 10 ** (-40 / 20), size=pcm.size)
            pcm = np.clip(pcm.astype(np.float64) + noise, -32768, 32767).astype(
                np.int16
            )
            toks = _perturb(toks, k - 1, m_rng, vocab_size)
    else:  # singleton
        s_rng = np.random.default_rng([seed, 0x5150, i])
        sr = 16000 if s_rng.random() < 0.9 else 8000
        dur = int(s_rng.integers(*dur_range))
        pcm = _family_pcm(s_rng, sr, dur)
        toks = _family_transcript(s_rng, tokens, vocab_size)
    return (
        f"clip{i:08d}",
        pcm16_to_wav(pcm, sr),
        sr,
        dur,
        "pcm_s16le",
        " ".join(toks),
    )


def synth_clips(
    spark: SparkSession,
    n: int,
    seed: int = 42,
    partitions: int | None = None,
    tokens: tuple[int, int] = TRANSCRIPT_TOKENS,
    dur_range: tuple[int, int] = DUR_MS_RANGE,
    vocab_size: int = 64,
) -> DataFrame:
    """Distributed deterministic clips table of n rows.

    ~DUP_FRACTION of rows form FAMILY_SIZE-member near-duplicate families
    (family id = row_index // FAMILY_SIZE); the rest are singletons.
    `tokens` / `dur_range` / `vocab_size` size the transcripts and audio.
    """
    n_family_rows = (int(n * DUP_FRACTION) // FAMILY_SIZE) * FAMILY_SIZE
    base = spark.range(0, n, numPartitions=partitions)

    def _gen(batches):
        for pdf in batches:
            rows = [
                _synth_row(int(i), n_family_rows, seed, tokens, dur_range, vocab_size)
                for i in pdf["id"]
            ]
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"],
            )

    return base.mapInPandas(_gen, CLIPS_SCHEMA)


def clips_from_documents(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Derive a clips table (BASELINE.json input_hint shape) from a text
    corpus, with every non-binary attribute an ARITHMETIC function of the
    id so a SQL oracle can recompute it:

        clip_id    = printf('clip%08d', id)
        sr_hz      = 8000 if id % 10 == 0 else 16000
        dur_ms     = 40 + (id % 200)
        pcm[i]     = ((id + i) % 65536) - 32768,  i < sr_hz*dur_ms//1000
        bytes      = RIFF/WAVE PCM16 encoding of pcm
        transcript = the document's text

    The PCM samples themselves follow the closed form, so after the bytes
    ride through the pipeline a decode pass (audio.with_pcm_stats) yields
    n_samples/pcm_sum values that DuckDB can verify without ever touching
    the binary — the harness's value check then covers the full WAV
    encode -> prune -> join -> decode path."""

    def _gen(batches):
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                did = int(did)
                sr = 8000 if did % 10 == 0 else 16000
                dur = 40 + (did % 200)
                n = sr * dur // 1000
                pcm = ((did + np.arange(n, dtype=np.int64)) % 65536 - 32768).astype(
                    np.int16
                )
                rows.append(
                    (f"clip{did:08d}", pcm16_to_wav(pcm, sr), sr, dur, "pcm_s16le", text)
                )
            yield pd.DataFrame(
                rows,
                columns=["clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"],
            )

    return docs.select(id_col, text_col).mapInPandas(_gen, CLIPS_SCHEMA)


def noisy_clip_pairs(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(clip_id, codec, bytes_src, bytes_out) pairs whose PCM and additive
    noise both follow a closed form, for exact-arithmetic SNR oracles:

        a_i = ((id + i) % 32768) - 16384              (reference signal)
        n_i = (((id + 3*i) % 64) - 32) * 4^(id % 4)   (noise, amp by id)
        out = a + n                                    (|out| <= 18432, no clip)

    The per-id amplitude multiplier 4^(id % 4) sweeps the pair across the
    30 dB acceptance boundary (~54 / 42 / 30 / 18 dB), so a downstream
    pcm_ok verdict VARIES by row instead of being vacuously true.  Both
    power sums are integer-exact functions of the id, mirrorable in SQL."""

    def _gen(batches):
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                sr = 8000 if did % 10 == 0 else 16000
                dur = 40 + (did % 200)
                n = sr * dur // 1000
                i = np.arange(n, dtype=np.int64)
                a = ((did + i) % 32768 - 16384).astype(np.int64)
                nz = ((did + 3 * i) % 64 - 32) * (4 ** (did % 4))
                rows.append(
                    (
                        f"clip{did:08d}",
                        "pcm_s16le",
                        pcm16_to_wav(a.astype(np.int16), sr),
                        pcm16_to_wav((a + nz).astype(np.int16), sr),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["clip_id", "codec", "bytes_src", "bytes_out"]
            )

    return docs.select(id_col).mapInPandas(
        _gen, "clip_id string, codec string, bytes_src binary, bytes_out binary"
    )


def true_family(clip_index: int, n: int) -> int:
    """Ground-truth family of a synthesized clip (for recall tests):
    families get their id, singletons get -1."""
    n_family_rows = (int(n * DUP_FRACTION) // FAMILY_SIZE) * FAMILY_SIZE
    return clip_index // FAMILY_SIZE if clip_index < n_family_rows else -1
