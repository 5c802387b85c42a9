"""Structured-Streaming incremental ingest (streaming twin of op 14):
attach semantics, within-batch clustering, cross-batch index growth, and
checkpoint-based resume (the north rule's "resumable" requirement applied
to the steady-state ingest path)."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from lsh_hdc_spark.config import DedupConfig
from lsh_hdc_spark.plans.pipeline import run_pipeline
from lsh_hdc_spark.streaming import StreamIndex, attach_batch, run_attach_stream

CFG = DedupConfig()

BASE = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bend"),
    (3, "completely unrelated text about distributed stream processing engines"),
]
SCHEMA = "doc_id long, text string"


@pytest.fixture()
def tmpdirs(tmp_path):
    d = {
        "sig": str(tmp_path / "sig"),
        "labels": str(tmp_path / "labels"),
        "src": str(tmp_path / "src"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    os.makedirs(d["src"])
    return d


def _seed_index(spark, index):
    """Cluster the base corpus with the batch pipeline and seed the index."""
    base = spark.createDataFrame(BASE, SCHEMA)
    labels = run_pipeline(base, CFG)
    from lsh_hdc_spark.functions.sign import signed

    signed(base, CFG).join(labels.select("doc_id", "cluster_id"), "doc_id").select(
        "doc_id", "shingles_h", "sketch", "band_keys", "cluster_id"
    ).write.parquet(index.sig_dir)
    return {r.doc_id: r.cluster_id for r in labels.collect()}


def test_attach_batch_semantics(spark, tmpdirs):
    index = StreamIndex(tmpdirs["sig"], tmpdirs["labels"])
    base_labels = _seed_index(spark, index)
    assert base_labels[1] == base_labels[2] == 1  # sanity: near-dups co-cluster

    batch = spark.createDataFrame(
        [
            # near-dup of docs 1/2 -> must adopt their existing cluster
            (10, "the quick brown fox jumps over the lazy dog near the river bank"),
            # novel pair arriving together -> must co-cluster as a NEW cluster
            (11, "a brand new recurring boilerplate paragraph shared by two items"),
            (12, "a brand new recurring boilerplate paragraph shared by two items"),
            # novel singleton -> itself
            (13, "nothing like anything else in the corpus or this batch at all"),
        ],
        SCHEMA,
    )
    labels, new_rows = attach_batch(batch, CFG, index)
    got = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert got[10] == base_labels[1]
    assert got[11] == got[12] == 11
    assert got[13] == 13
    # index rows carry the FINAL labels so later batches attach transitively
    idx_labels = {r.doc_id: r.cluster_id for r in new_rows.collect()}
    assert idx_labels == got


def test_attach_batch_empty_index(spark, tmpdirs):
    index = StreamIndex(tmpdirs["sig"], tmpdirs["labels"])
    batch = spark.createDataFrame(BASE, SCHEMA)
    labels, _ = attach_batch(batch, CFG, index)
    got = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert got[1] == got[2] == 1 and got[3] == 3


def test_stream_resume_skips_committed_files(spark, tmpdirs):
    index = StreamIndex(tmpdirs["sig"], tmpdirs["labels"])
    _seed_index(spark, index)

    f1 = spark.createDataFrame(
        [(20, "the quick brown fox jumps over the lazy dog near the river bank")],
        SCHEMA,
    )
    f1.coalesce(1).write.parquet(tmpdirs["src"] + "/f1")
    # the file-stream source needs files directly under source_dir
    for part in os.listdir(tmpdirs["src"] + "/f1"):
        if part.endswith(".parquet"):
            shutil.move(f"{tmpdirs['src']}/f1/{part}", f"{tmpdirs['src']}/a.parquet")
    shutil.rmtree(tmpdirs["src"] + "/f1")

    run_attach_stream(spark, tmpdirs["src"], SCHEMA, CFG, index, tmpdirs["ckpt"])
    out1 = spark.read.parquet(index.labels_dir)
    assert out1.count() == 1
    assert out1.collect()[0].cluster_id == 1  # attached to the seeded cluster

    # second file: near-dup of the STREAMED doc 20 -> transitive attach via
    # the grown index; restart with the same checkpoint must not re-ingest a.parquet
    f2 = spark.createDataFrame(
        [(21, "the quick brown fox jumps over the lazy dog near the river bank")],
        SCHEMA,
    )
    f2.coalesce(1).write.parquet(tmpdirs["src"] + "/f2")
    for part in os.listdir(tmpdirs["src"] + "/f2"):
        if part.endswith(".parquet"):
            shutil.move(f"{tmpdirs['src']}/f2/{part}", f"{tmpdirs['src']}/b.parquet")
    shutil.rmtree(tmpdirs["src"] + "/f2")

    run_attach_stream(spark, tmpdirs["src"], SCHEMA, CFG, index, tmpdirs["ckpt"])
    out2 = spark.read.parquet(index.labels_dir).orderBy("doc_id").collect()
    assert [r.doc_id for r in out2] == [20, 21]  # no duplicate ingest of doc 20
    assert out2[1].cluster_id == 1  # transitive: 21 -> 20 -> cluster 1
    # distinct epochs prove the second run processed only the new file
    assert len({r.epoch for r in out2}) == 2
