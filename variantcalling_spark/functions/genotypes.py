"""Genotype / PL array functions (SURVEY.md §2.8 domain-specific family).

The reference stores genotypes and Phred-scaled likelihoods as Python
tuples inside cells; here they are first-class ``ArrayType`` columns with
higher-order functions — the single biggest data-model upgrade (SURVEY.md
§1.2). VCF genotype ordering: diploid genotype (j,k), j<=k, sits at PL
index k*(k+1)/2 + j (used at `correct_genotypes_by_imputation.py:227`,
pinned `test/unit/pipelines/test_correct_genotypes_by_imputation.py:8-44`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def genotype_index(j: Column, k: Column) -> Column:
    """PL index of diploid genotype (j, k) with j <= k."""
    return (k * (k + 1) / 2 + j).cast("int")


def genotype_ordering(spark: SparkSession, max_alleles: int = 8) -> DataFrame:
    """Lookup table (n_alleles, pl_index, allele_1, allele_2) for every
    diploid genotype layout up to ``max_alleles`` — the generated-table
    replacement for the reference's `genotype_ordering` function; join it
    instead of computing per row.
    """
    n = spark.range(2, max_alleles + 1).withColumnRenamed("id", "n_alleles")
    k = n.select("n_alleles", F.explode(F.sequence(F.lit(0), F.col("n_alleles") - 1)).alias("allele_2"))
    jk = k.select(
        "n_alleles",
        "allele_2",
        F.explode(F.sequence(F.lit(0), F.col("allele_2"))).alias("allele_1"),
    )
    return jk.select(
        "n_alleles",
        genotype_index(F.col("allele_1"), F.col("allele_2")).alias("pl_index"),
        "allele_1",
        "allele_2",
    )


def pl_compress3(pl: Column, n_alleles: Column) -> Column:
    """Compress a multi-allele PL array to 3 values [ref/ref, ref/alt, alt/alt].

    Min-reduces the VCF PL layout: index 0 is (0,0); genotypes (0,k) for
    k>=1 sit at k*(k+1)/2; all remaining indices are non-ref pairs.
    Re-expresses `get_compressed_pl_into_3_values` (`compress_gvcf.py:
    28-60`, golden `test/unit/joint/test_compress_gvcf.py:13-22`) as
    higher-order array expressions — no UDF.
    """
    ks = F.sequence(F.lit(1), n_alleles - 1)
    het_ref = F.array_min(
        F.transform(ks, lambda k: F.element_at(pl, (k * (k + 1) / 2).cast("int") + 1))
    )
    non_ref = F.array_min(
        F.flatten(
            F.transform(
                ks,
                lambda k: F.transform(
                    F.sequence(F.lit(1), k),
                    lambda j: F.element_at(pl, (k * (k + 1) / 2 + j).cast("int") + 1),
                ),
            )
        )
    )
    return F.array(F.element_at(pl, 1), het_ref, non_ref)


def classify_genotype_error(gt_truth_1: Column, gt_truth_2: Column,
                            gt_call_1: Column, gt_call_2: Column) -> Column:
    """Genotype-error taxonomy for diploid calls.

    Re-expresses the set-algebra classifier `report_data_loader.py:
    106-126` (consumed by the error-type aggregate `report_utils.py:
    459-463`): TP (same allele multiset), NOISE (no shared alt),
    HOM_TO_HET / HET_TO_HOM (zygosity flips sharing an allele),
    WRONG_ALLELE (same zygosity, shared allele, different set).
    """
    t_hom = gt_truth_1 == gt_truth_2
    c_hom = gt_call_1 == gt_call_2
    same_set = (
        F.least(gt_truth_1, gt_truth_2) == F.least(gt_call_1, gt_call_2)
    ) & (F.greatest(gt_truth_1, gt_truth_2) == F.greatest(gt_call_1, gt_call_2))
    shares = (
        (gt_call_1 == gt_truth_1)
        | (gt_call_1 == gt_truth_2)
        | (gt_call_2 == gt_truth_1)
        | (gt_call_2 == gt_truth_2)
    )
    return (
        F.when(same_set, "TP")
        .when(~shares, "NOISE")
        .when(t_hom & ~c_hom, "HOM_TO_HET")
        .when(~t_hom & c_hom, "HET_TO_HOM")
        .otherwise("WRONG_ALLELE")
    )
