"""VCF text source/sink: distributed parse of VCF-format lines into the
canonical variant table, and serialization back to VCF lines.

Replaces the reference's pysam-based `get_vcf_df` ingestion (call sites
`run_no_gt_report.py:307-312`, `sv_stats_collect.py:34-36`) and its
record-rewrite sinks (`correct_genotypes_by_imputation.py:311-356`,
`compress_gvcf.py:123,214`) with a pure DataFrame path:

- `spark.read.text` splits by line across partitions (splittable for
  uncompressed / bgzip-recompressed inputs), so a 100 TB VCF parses with
  full parallelism — no per-record Python iterator.
- Fixed columns become typed columns; ALT becomes `alleles`
  array<string> with REF at index 0 (the reference's tuple convention,
  `run_no_gt_report.py:98-99`); INFO becomes map<string,string> via
  `str_to_map` (the escape hatch for unknown fields, SURVEY.md §1.3);
  per-sample FORMAT fields become a map as well.
- Null semantics: '.' in POS/QUAL/ID/FILTER maps to NULL, matching
  pysam's missing-value convention.

All expressions are built-in (JVM, codegen) — no UDFs in the parse path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

VCF_FIXED = ("chrom", "pos", "id", "ref", "alleles", "qual", "filter", "info")


def _null_dot(c: Column) -> Column:
    return F.when(c == ".", F.lit(None)).otherwise(c)


def read_vcf(spark: SparkSession, path: str, sample_format: bool = True) -> DataFrame:
    """Parse VCF text into the canonical variant table (SURVEY.md §1.1 D1).

    Returns columns: chrom string, pos long, id string, ref string,
    alleles array<string> (REF first, then ALTs), qual double,
    filter string, info map<string,string>, and — when ``sample_format``
    and a sample column exists — fmt map<string,string> for the first
    sample.
    """
    lines = spark.read.text(path)
    data = lines.where(~F.col("value").startswith("#"))
    f = F.split(F.col("value"), "\t")
    alts = F.when(
        F.element_at(f, 5) == ".", F.array().cast("array<string>")
    ).otherwise(F.split(F.element_at(f, 5), ","))
    cols = [
        F.element_at(f, 1).alias("chrom"),
        F.element_at(f, 2).cast("long").alias("pos"),
        _null_dot(F.element_at(f, 3)).alias("id"),
        F.element_at(f, 4).alias("ref"),
        F.concat(F.array(F.element_at(f, 4)), alts).alias("alleles"),
        _null_dot(F.element_at(f, 6)).cast("double").alias("qual"),
        _null_dot(F.element_at(f, 7)).alias("filter"),
        F.when(
            F.element_at(f, 8) == ".", F.create_map().cast("map<string,string>")
        )
        .otherwise(F.str_to_map(F.element_at(f, 8), F.lit(";"), F.lit("=")))
        .alias("info"),
    ]
    if sample_format:
        fmt = F.when(
            F.size(f) >= 10,
            F.map_from_arrays(
                F.split(F.element_at(f, 9), ":"), F.split(F.element_at(f, 10), ":")
            ),
        ).alias("fmt")
        cols.append(fmt)
    return data.select(cols)


def vcf_header(contigs: list[str] | None = None, sample: str | None = None) -> str:
    head = ["##fileformat=VCFv4.2"]
    for c in contigs or []:
        head.append(f"##contig=<ID={c}>")
    fixed = "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
    if sample:
        fixed += f"\tFORMAT\t{sample}"
    head.append(fixed)
    return "\n".join(head)


def to_vcf_lines(df: DataFrame) -> DataFrame:
    """Serialize the canonical variant table back to VCF body lines
    (single `value` string column, ordered by caller). The inverse of
    ``read_vcf`` for the fixed + INFO columns; the record-rewrite VCF
    sinks of the reference (`compress_gvcf.py:214`) become
    transform -> to_vcf_lines -> write.text.
    """
    dot = F.lit(".")
    info_str = F.when(F.size("info") == 0, dot).otherwise(
        F.concat_ws(
            ";",
            F.transform(
                F.map_entries(F.col("info")),
                lambda e: F.concat_ws("=", e["key"], e["value"]),
            ),
        )
    )
    alt_str = F.when(F.size("alleles") <= 1, dot).otherwise(
        F.concat_ws(",", F.slice(F.col("alleles"), 2, F.greatest(F.size("alleles") - 1, F.lit(1))))
    )
    return df.select(
        F.concat_ws(
            "\t",
            F.col("chrom"),
            F.col("pos").cast("string"),
            F.coalesce(F.col("id"), dot),
            F.col("ref"),
            alt_str,
            F.coalesce(F.col("qual").cast("string"), dot),
            F.coalesce(F.col("filter"), dot),
            info_str,
        ).alias("value")
    )
