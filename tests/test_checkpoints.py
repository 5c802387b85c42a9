"""Resume tests (SURVEY.md §5.2.6): stage tables are written with lineage
metrics; a re-run serves finished stages from checkpoints (recomputed=false)
and produces identical final output; a partial run resumes mid-pipeline."""

import shutil

import pytest
from pyspark.sql import functions as F

from lsh_hdc_spark.config import DedupConfig
from lsh_hdc_spark.plans.checkpoints import CatalogIO, StageRunner, run_pipeline_resumable

CFG = DedupConfig()


@pytest.fixture()
def base(tmp_path):
    return str(tmp_path / "warehouse")


def test_full_run_then_resume_identical(spark, documents, base):
    labels1, r1 = run_pipeline_resumable(spark, documents, CFG, base, run_id="r")
    out1 = sorted(map(tuple, labels1.collect()))

    # all stages computed on first run
    m1 = r1.metrics()
    assert m1.where(~F.col("recomputed")).count() == 0

    labels2, r2 = run_pipeline_resumable(spark, documents, CFG, base, run_id="r")
    out2 = sorted(map(tuple, labels2.collect()))
    assert out1 == out2
    # second run served every stage from checkpoints
    m2 = r2.metrics().where(F.col("attempt") == r2.attempt)
    assert m2.where(F.col("recomputed")).count() == 0
    assert m2.where(~F.col("recomputed")).count() >= 5


def test_partial_resume_recomputes_only_missing(spark, documents, base):
    _, r1 = run_pipeline_resumable(spark, documents, CFG, base, run_id="p")
    io = CatalogIO(spark, base)
    # simulate a crash after 'pairs': later stage tables lost
    shutil.rmtree(io.path("p/edges"))
    shutil.rmtree(io.path("p/labels"))

    labels, r2 = run_pipeline_resumable(spark, documents, CFG, base, run_id="p")
    assert labels.count() == documents.count()
    mrows = r2.metrics().where(F.col("attempt") == r2.attempt).collect()
    by_stage = {}
    for r in mrows:
        by_stage.setdefault(r.stage, set()).add(r.recomputed)
    assert by_stage["signed"] == {False}
    assert by_stage["pairs"] == {False}
    assert by_stage["edges"] == {True}
    assert by_stage["labels"] == {True}


def test_per_partition_lineage_rows(spark, documents, base):
    _, runner = run_pipeline_resumable(
        spark, documents.repartition(4), CFG, base, run_id="l"
    )
    m = runner.metrics().where(
        (F.col("stage") == "signed") & (F.col("attempt") == runner.attempt)
    )
    rows = m.collect()
    assert all(r.run_id == "l" for r in rows)
    # per-partition counts sum to the table size
    total = sum(r.rows for r in rows if r.recomputed)
    assert total == documents.count()
    assert {r.partition_id for r in rows if r.recomputed} >= {0, 1}


def test_resume_off_always_recomputes(spark, documents, base):
    run_pipeline_resumable(spark, documents, CFG, base, run_id="n")
    _, r2 = run_pipeline_resumable(
        spark, documents, CFG, base, run_id="n", resume=False
    )
    m2 = r2.metrics().where(F.col("attempt") == r2.attempt)
    assert m2.where(~F.col("recomputed")).count() == 0


def test_substring_census_stage_written(spark, documents, base):
    """With the substring pass enabled, the resumable pipeline writes a
    substring_bucket_stats stage (never-drop-silently: the census is part
    of the run's lineage tables, queryable after the fact)."""
    cfg = CFG.with_(substring_min_len=32)
    labels, runner = run_pipeline_resumable(
        spark, documents, cfg, base, run_id="sub"
    )
    assert labels.count() == documents.count()
    io = CatalogIO(spark, base)
    census = io.read("sub/substring_bucket_stats")
    tiers = {r["tier"] for r in census.collect()}
    assert tiers <= {"singleton", "cold", "dropped"} and tiers
    stages = {r["stage"] for r in runner.metrics().collect()}
    assert "substring_bucket_stats" in stages
