"""Variant-filtering model train/score on Spark ML.

The reference trains sklearn/xgboost classifiers over concordance
features and applies them as a `tree_score` column used by every
downstream threshold/PR operator (`docs/filter_variants_pipeline.md`,
`docs/train_models_pipeline.md`, `lpr/train_lib_prep_recalibration_
model.py:131-139`, score consumption `evaluate_concordance.py:89-97`).

Spark-first replacement: a `pyspark.ml` Pipeline (VectorAssembler +
LogisticRegression). Training is a distributed treeAggregate job;
scoring is a single map-side transform — no collect, no Python-per-row.
Model persistence uses Spark ML's native save/load (the pickle-sink
replacement, SURVEY.md §2.1). For externally-trained models, the same
scoring surface can wrap `predict_batch_udf` around any pickled
predictor; that path is intentionally out of the correctness-checked
core (external-tool integration point, SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_filtering_model(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    max_iter: int = 20,
) -> PipelineModel:
    """Fit assembler + logistic regression on (features, 0/1 label)."""
    assembler = VectorAssembler(inputCols=list(feature_cols), outputCol="features")
    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        maxIter=max_iter,
        regParam=0.01,
        standardization=True,
    )
    return Pipeline(stages=[assembler, lr]).fit(df)


def score_with_model(model: PipelineModel, df: DataFrame, score_col: str = "tree_score") -> DataFrame:
    """Apply the model; emit P(class=1) as ``score_col`` (the reference's
    `tree_score`) plus the hard `prediction`."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    p1 = F.element_at(vector_to_array(F.col("probability")), 2)
    return scored.withColumn(score_col, p1).drop("features", "rawPrediction", "probability")
