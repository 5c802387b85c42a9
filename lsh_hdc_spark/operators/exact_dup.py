"""Exact deduplication by content fingerprint (hash-groupBy).

Not in the reference (its whole point is NEAR-dup), but any 100 TB training
pipeline runs exact dedup first: it is a single map + shuffle-on-digest and
removes the easy mass before the LSH stage sees it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def fingerprint(text: Column, normalized: bool = True) -> Column:
    """md5 hex digest of the (optionally whitespace/case-normalized) text."""
    if normalized:
        text = F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))
    return F.md5(text)


def with_fingerprint(
    df: DataFrame, id_col: str, text_col: str, normalized: bool = True
) -> DataFrame:
    return df.select(
        F.col(id_col), fingerprint(F.col(text_col), normalized).alias("fingerprint")
    )


def exact_dup_groups(
    df: DataFrame, id_col: str, text_col: str, normalized: bool = True
) -> DataFrame:
    """(fingerprint, n_docs, keeper, dup_ids): groups of byte-identical
    (normalized) texts; `keeper` is the minimum id, `dup_ids` the rest."""
    fp = with_fingerprint(df, id_col, text_col, normalized)
    return (
        fp.groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min(id_col).alias("keeper"),
            F.sort_array(F.collect_list(id_col)).alias("all_ids"),
        )
        .where(F.col("n_docs") >= 2)
        .select(
            "fingerprint",
            "n_docs",
            "keeper",
            F.slice("all_ids", 2, F.size("all_ids") - 1).alias("dup_ids"),
        )
    )
