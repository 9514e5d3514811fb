"""VCF record-rewrite pipelines over the text source layer — the
row-streaming mutation family of the reference (SURVEY.md §1.3:
`compress_gvcf.py:132-212`, `convert_haploid_regions.py:95-99`,
`correct_genotypes_by_imputation.py:317-354`) re-expressed as
read_vcf -> columnar transform -> to_vcf_lines, fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from variantcalling_spark.functions.genotypes import haploid_pl
from variantcalling_spark.sources.vcf import read_vcf, to_vcf_lines


def parse_format_arrays(df: DataFrame) -> DataFrame:
    """Lift the FORMAT map into typed array columns (GT, PL ints)."""
    return df.withColumn(
        "pl",
        F.transform(
            F.split(F.element_at("fmt", "PL"), ","), lambda x: x.cast("int")
        ),
    ).withColumn(
        "gt",
        F.transform(
            F.split(F.regexp_replace(F.element_at("fmt", "GT"), r"\|", "/"), "/"),
            lambda x: x.cast("int"),
        ),
    )


def convert_haploid_regions(
    vcf_df: DataFrame, regions: DataFrame
) -> DataFrame:
    """Diploid->haploid conversion inside the given regions
    (`convert_haploid_regions.py`): a broadcast range join marks rows in
    haploid regions; marked biallelic rows get the haploid PL/GT/GQ
    (functions.genotypes.haploid_pl); others pass through unchanged.

    regions: (chrom, start, end) half-open. Returns the variant table
    with haploid_gt/haploid_gq columns and rewritten fmt summary.
    """
    r = regions.select(
        F.col("chrom").alias("r_chrom"),
        F.col("start").alias("r_start"),
        F.col("end").alias("r_end"),
    )
    joined = vcf_df.join(
        F.broadcast(r),
        (vcf_df["chrom"] == F.col("r_chrom"))
        & (vcf_df["pos"] > F.col("r_start"))
        & (vcf_df["pos"] <= F.col("r_end")),
        "left",
    ).withColumn("in_region", F.col("r_chrom").isNotNull()).drop(
        "r_chrom", "r_start", "r_end"
    )
    h = haploid_pl(F.col("pl"))
    return (
        joined.withColumn(
            "haploid_gt", F.when(F.col("in_region"), h["gt"])
        )
        .withColumn("haploid_gq", F.when(F.col("in_region"), h["gq"]))
        .withColumn(
            "info",
            F.when(
                F.col("in_region"),
                F.map_concat(
                    F.col("info"), F.create_map(F.lit("HAPLOID"), F.lit("1"))
                ),
            ).otherwise(F.col("info")),
        )
    )


def rewrite_vcf(spark, in_path: str, out_df_to_lines=None) -> DataFrame:
    """read VCF text -> canonical table (typed arrays) ready for any
    columnar rewrite; pair with ``to_vcf_lines`` for the sink side."""
    df = read_vcf(spark, in_path)
    return parse_format_arrays(df)


__all__ = [
    "convert_haploid_regions",
    "parse_format_arrays",
    "rewrite_vcf",
    "to_vcf_lines",
]
