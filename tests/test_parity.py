"""Reference-parity gate (BASELINE.md: dup-pair recall >= 0.99).

The Spark pipeline and the single-process oracle (tests/ref_oracle.py —
the stand-in for the absent reference repo, SURVEY.md §5.4) run the SAME
config on the same corpora; recall is computed on co-clustered pairs.
Because both sides pin the same public hash constructions (XXH64 seed 42 for
shingles, splitmix64 family for minhash/bands — verified bit-equal in
test_hashing.py/test_sign.py), candidate generation is identical and recall
is expected to be exactly 1.0; the 0.99 bar allows for tie-breaking noise.
"""

import pytest

import ref_oracle as O
from fixtures_gen import docs_labeled
from lsh_hdc_spark.config import DedupConfig
from lsh_hdc_spark.plans.pipeline import run_pipeline


def _spark_labels(spark, rows, cfg):
    df = spark.createDataFrame(rows, f"{cfg.id_col} string, {cfg.text_col} string")
    return {r[0]: r[1] for r in run_pipeline(df, cfg).select(cfg.id_col, "cluster_id").collect()}


def _oracle_labels(rows, cfg):
    return O.cluster(
        rows,
        span=cfg.span, skip=cfg.skip, unique=cfg.unique, kmin=cfg.kmin,
        width=cfg.width, bandwidth=cfg.bandwidth, seed=cfg.seed,
        jaccard_threshold=cfg.resolved_jaccard_threshold,
        min_support=cfg.min_support,
    )


def test_parity_on_labeled_corpus(spark):
    cfg = DedupConfig(id_col="id", text_col="content")
    rows = [(rid, text) for rid, text, _ in docs_labeled(n_families=40, n_singletons=120)]
    ours = _spark_labels(spark, rows, cfg)
    ref = _oracle_labels(rows, cfg)
    recall, precision = O.pair_recall(ours, ref)
    assert recall >= 0.99, f"dup-pair recall {recall:.4f} vs reference"
    assert precision >= 0.99, f"dup-pair precision {precision:.4f} vs reference"


def test_parity_on_driver_documents(spark, documents):
    """Parity on the driver's real table (planted near-dups, SURVEY.md §E)."""
    cfg = DedupConfig()
    rows = [(str(r.doc_id), r.text) for r in documents.select("doc_id", "text").collect()]
    df_rows = [(rid, text) for rid, text in rows]
    ours = _spark_labels(spark, [(rid, t) for rid, t in df_rows],
                         DedupConfig(id_col="doc_id", text_col="text"))
    ref = _oracle_labels(df_rows, cfg)
    recall, precision = O.pair_recall(ours, ref)
    assert recall >= 0.99, f"recall {recall:.4f}"
    assert precision >= 0.99, f"precision {precision:.4f}"


def test_parity_holds_for_char_mode(spark):
    cfg = DedupConfig(id_col="id", text_col="content", shingle_mode="char", span=5)
    rows = [(rid, text) for rid, text, _ in docs_labeled(n_families=15, n_singletons=40, seed=9)]
    ours = _spark_labels(spark, rows, cfg)
    ref = O.cluster(rows, mode="char", char_span=5, width=cfg.width,
                    bandwidth=cfg.bandwidth, seed=cfg.seed,
                    jaccard_threshold=cfg.resolved_jaccard_threshold)
    recall, precision = O.pair_recall(ours, ref)
    assert recall >= 0.99 and precision >= 0.99, (recall, precision)
