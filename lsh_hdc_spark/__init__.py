"""lsh_hdc_spark — PySpark-native near-duplicate detection & clustering.

From-scratch reimplementation of the capabilities of escherba/lsh-hdc
(MinHash/LSH high-dimensional clustering) as idiomatic Spark DataFrame
dataflow; see SURVEY.md for the operator-by-operator mapping.
"""

from .config import DedupConfig, candidate_probability, get_bandwidth, get_threshold
from .plans.pipeline import cluster_rollup, dedup_edges, run_pipeline
from .session import get_spark

__all__ = [
    "DedupConfig",
    "get_bandwidth",
    "get_threshold",
    "candidate_probability",
    "run_pipeline",
    "dedup_edges",
    "cluster_rollup",
    "get_spark",
]

__version__ = "0.1.0"
