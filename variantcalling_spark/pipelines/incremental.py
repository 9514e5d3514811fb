"""Incremental aggregate maintenance (materialized-view merge law).

At 100 TB the corpus-level stats tables (per-source counts, token
sums, extremes) cannot be recomputed per ingest; they are maintained
incrementally: aggregate the DELTA alone, then merge with the stored
aggregate by the algebraic combine of each measure (counts/sums add,
min/max fold, avg re-derives from sum/count). This module gives the
build and merge halves; q169 value-proves the merge law against a
full-recompute oracle, and the pytest round-trips the stored side
through parquet (the real deployment shape: read stored, merge delta,
overwrite).

Only works for algebraic measures (the same property map-side combine
relies on); holistic measures (exact medians) route to the two-phase
forms (`operators/ordered.py::weighted_quantile_bucketed`) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_source_stats(docs: DataFrame) -> DataFrame:
    """Per-source stats table: (source, n_docs, sum_tokens, min_tokens,
    max_tokens). All measures algebraic — mergeable by ``merge_source_stats``."""
    return (
        docs.select(
            "source", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("sum_tokens"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


def merge_source_stats(stored: DataFrame, delta: DataFrame) -> DataFrame:
    """Algebraic merge of two stats tables: counts/sums add, extremes
    fold — never touches the underlying documents. Sources present in
    only one side pass through (full outer union semantics)."""
    return (
        stored.unionByName(delta)
        .groupBy("source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_tokens").alias("sum_tokens"),
            F.min("min_tokens").alias("min_tokens"),
            F.max("max_tokens").alias("max_tokens"),
        )
    )
