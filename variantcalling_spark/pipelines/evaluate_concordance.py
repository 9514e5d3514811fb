"""evaluate_concordance pipeline (SURVEY.md §3.2).

Reference flow (`ugvc/pipelines/evaluate_concordance.py:71-108`):
keyed scan -> score defaulting -> classify-column selection ->
accuracy metrics per category -> recall/precision curve -> keyed sinks.
Here: one composed DataFrame program over the concordance table family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from variantcalling_spark.operators.metrics import confusion_counts, pr_curve


def evaluate_concordance(
    df: DataFrame,
    classify_col: str = "classify",
    score_col: str = "score",
    category_col: str = "category",
    default_score: float = 1.0,
) -> dict[str, DataFrame]:
    """Run the concordance evaluation; returns the keyed result tables.

    - score defaulting mirrors `evaluate_concordance.py:89-97` (missing
      tree_score fabricated as a constant);
    - `optimal_recall_precision` = per-category confusion + P/R/F1
      (`report_utils.py:206-222, 449-468`);
    - `recall_precision_curve` = threshold sweep (`report_utils.py:
      493-505`) as a cumulative window.
    """
    prepared = df.withColumn(
        score_col, F.coalesce(F.col(score_col), F.lit(default_score))
    )
    metrics = confusion_counts(prepared, classify_col, [category_col])
    # ML tree scores live in [0, 1]: 1/64-wide buckets keep the two-level
    # cumsum partitioned even for continuous scores
    curve = pr_curve(
        prepared, score_col, classify_col, [category_col], bucket_width=1 / 64
    )
    return {
        "optimal_recall_precision": metrics,
        "recall_precision_curve": curve,
    }
