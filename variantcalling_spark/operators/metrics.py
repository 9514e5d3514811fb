"""Concordance metrics: confusion aggregates and PR curves (SURVEY.md §2.4, §2.5).

Re-expresses the reference's accuracy machinery —
`ugvc/reports/report_utils.py:449-505` and the scalar kernels in
`ugvc/utils/stats_utils.py:76-210` (pinned by
`test/unit/utils/test_stats_utils.py`) — as single-pass DataFrame plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def confusion_counts(df: DataFrame, label_col: str, group_cols: list[str] | None = None) -> DataFrame:
    """tp/fp/fn counts + precision/recall/F1 per group.

    `report_utils.py:449-468` + `stats_utils.get_precision/get_recall/get_f1`
    (`stats_utils.py:76-138`). One `sum(when(...))` pass; the scalar math
    is exact-int division (deterministic doubles).
    """
    group_cols = group_cols or []
    base = df.groupBy(*group_cols).agg(
        F.count(F.when(F.col(label_col) == "tp", 1)).alias("tp"),
        F.count(F.when(F.col(label_col) == "fp", 1)).alias("fp"),
        F.count(F.when(F.col(label_col) == "fn", 1)).alias("fn"),
    )
    precision = F.col("tp") / (F.col("tp") + F.col("fp")).cast("double")
    recall = F.col("tp") / (F.col("tp") + F.col("fn")).cast("double")
    f1 = 2 * precision * recall / (precision + recall)
    return base.select(*group_cols, "tp", "fp", "fn",
                       precision.alias("precision"),
                       recall.alias("recall"),
                       f1.alias("f1"))


def pr_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Precision/recall curve over score thresholds (cumulative windows).

    Re-expresses `report_utils.py:493-505`: sort by score descending,
    running tp/fp counts give precision/recall at each threshold
    ("call everything with score >= t positive"). FNs at a threshold =
    ground-truth positives not yet called = total_tp - cum_tp + base_fn.

    Rows are pre-aggregated per distinct score so the curve is
    deterministic under ties (the reference's row-wise cumsum is
    order-dependent within a tied score; grouping by threshold is the
    well-defined variant). Scales as one shuffle + one window pass.
    """
    group_cols = group_cols or []
    per_score = df.groupBy(*group_cols, score_col).agg(
        F.count(F.when(F.col(label_col) == "tp", 1)).alias("n_tp"),
        F.count(F.when(F.col(label_col) == "fp", 1)).alias("n_fp"),
    )
    w_cum = (
        W.partitionBy(*group_cols)
        .orderBy(F.desc(score_col))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_all = W.partitionBy(*group_cols) if group_cols else W.partitionBy(F.lit(1))
    cum = (
        per_score.withColumn("cum_tp", F.sum("n_tp").over(w_cum))
        .withColumn("cum_fp", F.sum("n_fp").over(w_cum))
        .withColumn("tot_tp", F.sum("n_tp").over(w_all))
    )
    # a leading threshold bucket can hold only fn rows -> cum_tp+cum_fp=0;
    # precision is undefined (NULL) there, not a division error
    precision = F.when(
        (F.col("cum_tp") + F.col("cum_fp")) > 0,
        F.col("cum_tp") / (F.col("cum_tp") + F.col("cum_fp")).cast("double"),
    )
    recall = F.when(F.col("tot_tp") > 0, F.col("cum_tp") / F.col("tot_tp").cast("double"))
    f1 = 2 * precision * recall / (precision + recall)
    return cum.select(
        *group_cols,
        F.col(score_col).alias("threshold"),
        "cum_tp",
        "cum_fp",
        (F.col("tot_tp") - F.col("cum_tp")).alias("cum_fn"),
        precision.alias("precision"),
        recall.alias("recall"),
        F.when(F.col("cum_tp") > 0, f1).otherwise(F.lit(0.0)).alias("f1"),
    )
