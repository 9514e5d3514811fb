"""BED / Picard interval_list sources and sinks -> canonical interval
table (SURVEY.md §1.1 D2): (chrom string, start long, end long[, name]).

Replaces `parse_intervals_file` (`coverage_analysis.py:780-786`), the
interval_list->BED conversion (`coverage_analysis.py:860-899` — skip
header lines, select/shift columns), and `BedWriter` (`gvcf_bed.py:30`)
with `spark.read.csv` + typed schema — splittable, pushdown-capable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

BED_SCHEMA = StructType(
    [
        StructField("chrom", StringType()),
        StructField("start", LongType()),
        StructField("end", LongType()),
        StructField("name", StringType()),
    ]
)


def read_bed(spark: SparkSession, path: str) -> DataFrame:
    """Read BED (tab-separated, half-open [start, end)); tolerates the
    optional 4th name column and `track`/`browser`/`#` header lines."""
    df = spark.read.csv(path, sep="\t", schema=BED_SCHEMA, mode="PERMISSIVE")
    return df.where(
        F.col("start").isNotNull()
        & ~F.coalesce(F.col("chrom").startswith("#"), F.lit(False))
        & ~F.col("chrom").isin("track", "browser")
    )


def read_interval_list(spark: SparkSession, path: str) -> DataFrame:
    """Picard interval_list -> interval table: skip `@`-prefixed SAM
    header lines; 1-based closed [start, end] converts to half-open
    0-based (start-1, end) — `_intervals_to_bed`
    (`coverage_analysis.py:860-899`)."""
    lines = spark.read.text(path).where(~F.col("value").startswith("@"))
    f = F.split(F.col("value"), "\t")
    return lines.select(
        F.element_at(f, 1).alias("chrom"),
        (F.element_at(f, 2).cast("long") - 1).alias("start"),
        F.element_at(f, 3).cast("long").alias("end"),
        F.element_at(f, 5).alias("name"),
    )


def to_bed_lines(df: DataFrame, with_name: bool = False) -> DataFrame:
    """Interval table -> BED text lines (`value` column), the BED sink
    (`gvcf_bed.py:65-68`, awk vcf_to_bed `training_set_consistency_
    check.py:66-72`)."""
    cols = [F.col("chrom"), F.col("start").cast("string"), F.col("end").cast("string")]
    if with_name:
        cols.append(F.coalesce(F.col("name"), F.lit(".")))
    return df.select(F.concat_ws("\t", *cols).alias("value"))
