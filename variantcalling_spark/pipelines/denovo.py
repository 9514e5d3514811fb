"""De-novo variant refinement: trio (child/mother/father) join +
denovo-quality recalculation.

Re-expresses `ugvc/joint/denovo_refinement.py`: the parental column join
on (chrom, pos) with column namespacing (`:31-35,54`), the min-aggregated
annotate-back of pair quality (`:96-99`), and the conditional denovo
quality `np.where` (`:56-58`) — as one declarative plan: two left joins
with aliased columns + CASE expressions. Partitioning by chrom keeps the
trio join shuffle-local at genome scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def refine_denovo(
    child: DataFrame, mother: DataFrame, father: DataFrame, keys=("chrom", "pos")
) -> DataFrame:
    """Join trio callsets and flag/score de-novo candidates.

    Inputs share the schema (chrom, pos, gt1 int, gt2 int, gq double).
    Output: child rows + mother_/father_ namespaced columns, an
    `is_denovo` flag (child carries an alt allele absent from both
    parents) and `denovo_qual` = min of the three genotype qualities for
    flagged rows (the reference's pair-quality minimum), else null.
    """
    keys = list(keys)
    m = mother.select(
        *keys,
        F.col("gt1").alias("mother_gt1"),
        F.col("gt2").alias("mother_gt2"),
        F.col("gq").alias("mother_gq"),
    )
    f = father.select(
        *keys,
        F.col("gt1").alias("father_gt1"),
        F.col("gt2").alias("father_gt2"),
        F.col("gq").alias("father_gq"),
    )
    # pre-aggregate duplicate parent records per site (annotate-back join
    # discipline: one row per key before the left join)
    m = m.groupBy(keys).agg(
        F.min("mother_gt1").alias("mother_gt1"),
        F.min("mother_gt2").alias("mother_gt2"),
        F.min("mother_gq").alias("mother_gq"),
    )
    f = f.groupBy(keys).agg(
        F.min("father_gt1").alias("father_gt1"),
        F.min("father_gt2").alias("father_gt2"),
        F.min("father_gq").alias("father_gq"),
    )
    j = child.join(m, keys, "left").join(f, keys, "left")
    child_alt = F.greatest(F.col("gt1"), F.col("gt2"))
    in_mother = (child_alt == F.col("mother_gt1")) | (child_alt == F.col("mother_gt2"))
    in_father = (child_alt == F.col("father_gt1")) | (child_alt == F.col("father_gt2"))
    is_denovo = (
        (child_alt > 0)
        & F.col("mother_gq").isNotNull()
        & F.col("father_gq").isNotNull()
        & ~F.coalesce(in_mother, F.lit(False))
        & ~F.coalesce(in_father, F.lit(False))
    )
    return j.withColumn("is_denovo", is_denovo).withColumn(
        "denovo_qual",
        F.when(
            is_denovo, F.least(F.col("gq"), F.col("mother_gq"), F.col("father_gq"))
        ),
    )
