"""GFF3 gene-annotation text source -> typed feature columns.

The gene-model annotations variant pipelines consume (VEP/snpEff-class
consequence calling — q336/q339 run on a synthesized broadcast model)
ship as GFF3/GTF text. This source closes that ingest boundary the way
``sources/reads.py`` does for SAM: a splittable line source
(``spark.read.text`` or any constructed line column) parsed by pure
JVM expressions — tab split, typed casts, and the ``key=value;``
attribute grammar as a ``str_to_map`` (no UDF anywhere).

GFF3 spec essentials handled: ``#`` comment/pragma lines skipped,
1-based inclusive [start, end], ``.`` as the null marker for
score/strand/phase, URL-style attribute separators (``;`` pairs,
``=`` key/value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GFF_COLUMNS = (
    "seqid", "source", "ftype", "start", "end",
    "score", "strand", "phase", "attributes",
)


def read_gff_flat(spark: SparkSession, path: str) -> DataFrame:
    """Read GFF3 text lines into typed feature columns."""
    return parse_gff_lines(spark.read.text(path))


def parse_gff_lines(lines: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse a DataFrame of GFF3 lines (any line source). Malformed /
    short lines parse to NULLs via ``try_element_at`` (the
    conjunct-order lesson of ``parse_sam_lines``) and fall out of any
    typed filter. ``attributes`` lands as a MAP<STRING,STRING> via
    ``str_to_map`` so downstream lookups are pure column ops
    (``attributes['ID']``, ``attributes['Parent']``)."""
    rows = lines.where(~F.col(value_col).startswith("#"))
    f = F.split(F.col(value_col), "\t")

    def fld(i):
        return F.try_element_at(f, F.lit(i))

    def nullable(col):
        return F.when(col == ".", F.lit(None).cast("string")).otherwise(col)

    return rows.select(
        fld(1).alias("seqid"),
        fld(2).alias("source"),
        fld(3).alias("ftype"),
        fld(4).cast("bigint").alias("start"),
        fld(5).cast("bigint").alias("end"),
        nullable(fld(6)).cast("double").alias("score"),
        nullable(fld(7)).alias("strand"),
        nullable(fld(8)).cast("int").alias("phase"),
        F.expr(
            f"str_to_map(try_element_at(split({value_col}, '\\t'), 9), ';', '=')"
        ).alias("attributes"),
    )
