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


def haploid_pl(pl: Column) -> Column:
    """Diploid-to-haploid PL conversion for a biallelic record.

    Keeps only the homozygous candidates [PL(0/0), PL(1/1)], renormalized
    so the minimum is 0 — `convert_to_haploid` (`convert_haploid_regions.
    py:38-70`). Returns struct(pl: array<int>, gt: int, gq: int); GT is
    the argmin candidate, GQ the distance to the rejected one (capped 99).
    """
    rr = F.element_at(pl, 1)
    aa = F.element_at(pl, 3)
    m = F.least(rr, aa)
    return F.struct(
        F.array((rr - m).cast("int"), (aa - m).cast("int")).alias("pl"),
        F.when(rr <= aa, F.lit(0)).otherwise(F.lit(1)).cast("int").alias("gt"),
        F.least(F.greatest(rr, aa) - m, F.lit(99)).cast("int").alias("gq"),
    )


def imputation_reweighted_pl(pl: Column, ds: Column) -> Column:
    """Imputation-prior PL rescale for a biallelic diploid record.

    Re-expresses `modify_stats_with_imp` + `_convert_ds_to_genotype_
    imputation_priors` (`correct_genotypes_by_imputation.py:189-251`):
    the imputed alt-dosage DS in [0,2] becomes Hardy-Weinberg genotype
    priors [(1-d)^2, 2d(1-d), d^2] with d = DS/2; the prior is applied in
    Phred space (posterior_pl = pl - 10*log10(prior)) and renormalized to
    min 0. DS is clamped away from {0,2} so the prior never hits log(0) —
    matching the reference's epsilon guard on missing/degenerate dosages
    (`correct_genotypes_by_imputation.py:200-202`). Returns
    struct(pl: array<double> rounded to 4 dp, gt_index: int).
    """
    d = F.least(F.greatest(ds / 2.0, F.lit(0.0005)), F.lit(0.9995))
    priors = F.array((1 - d) * (1 - d), 2 * d * (1 - d), d * d)
    post = F.zip_with(pl, priors, lambda x, p: x - 10.0 * F.log10(p))
    m = F.array_min(post)
    norm = F.transform(post, lambda x: F.round(x - m, 4))
    return F.struct(
        norm.alias("pl"),
        (F.array_position(norm, F.array_min(norm)) - 1).cast("int").alias("gt_index"),
    )


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
