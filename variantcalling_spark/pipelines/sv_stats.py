"""sv_stats_collect pipeline (SURVEY.md §2.4 pivot family, §3).

Reference flow (`ugvc/pipelines/sv_stats_collect.py`): PASS filter ->
length binning (`pd.cut`, :12-13,39-44) -> (svtype x bin) matrix with
reindex to the FIXED label domain (:48-52) -> per-label metric loops.
Spark: CASE-ladder bin + groupBy count, then a generated full-domain
table LEFT JOIN so absent combinations appear as zeros in one pass.
"""

from __future__ import annotations

from itertools import product

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def binned_type_matrix(
    df: DataFrame,
    spark: SparkSession,
    type_col: str,
    bin_expr,
    type_domain: list[str],
    bin_domain: list[str],
) -> DataFrame:
    """Counts per (type, bin) reindexed to the full fixed domain."""
    counts = (
        df.select(F.col(type_col).alias("sv_type"), bin_expr.alias("len_bin"))
        .groupBy("sv_type", "len_bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    domain = spark.createDataFrame(
        list(product(type_domain, bin_domain)), "sv_type string, len_bin string"
    )
    return (
        domain.join(counts, ["sv_type", "len_bin"], "left")
        .select("sv_type", "len_bin", F.coalesce("n", F.lit(0)).alias("n"))
    )
