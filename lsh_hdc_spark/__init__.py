"""lsh_hdc_spark — PySpark-native near-duplicate detection & clustering.

From-scratch reimplementation of the capabilities of escherba/lsh-hdc
(MinHash/LSH high-dimensional clustering) as idiomatic Spark DataFrame
dataflow; see SURVEY.md for the operator-by-operator mapping.
"""

from .config import (
    DedupConfig,
    candidate_probability,
    candidate_probability_b,
    get_bandwidth,
    get_threshold,
)
from .operators.clustering_metrics import (
    clustering_report,
    contingency,
    entropy_metrics,
    pair_confusion,
    pair_metrics,
)
from .operators.ranking import aul_score, roc_auc, roc_points
from .plans.pipeline import cluster_rollup, dedup_edges, run_pipeline
from .session import get_spark
from .streaming import StreamIndex, attach_batch, run_attach_stream

__all__ = [
    "DedupConfig",
    "get_bandwidth",
    "get_threshold",
    "candidate_probability",
    "candidate_probability_b",
    "run_pipeline",
    "dedup_edges",
    "cluster_rollup",
    "get_spark",
    "contingency",
    "pair_confusion",
    "pair_metrics",
    "entropy_metrics",
    "clustering_report",
    "roc_auc",
    "roc_points",
    "aul_score",
    "StreamIndex",
    "attach_batch",
    "run_attach_stream",
]

__version__ = "0.1.0"
