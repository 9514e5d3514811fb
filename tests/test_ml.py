"""Spark ML filtering-model surface: train/score/persist round-trip."""

from __future__ import annotations

from pyspark.sql import functions as F

from variantcalling_spark.ml import score_with_model, train_filtering_model


def _training_frame(spark):
    df = spark.range(0, 2000).select(
        (F.col("id") % 97 / 97.0).alias("f1"),
        (F.col("id") % 31 / 31.0).alias("f2"),
    )
    return df.withColumn(
        "label", F.when(F.col("f1") + F.col("f2") > 1.0, 1.0).otherwise(0.0)
    )


def test_train_score_recovers_separable_rule(spark):
    df = _training_frame(spark)
    model = train_filtering_model(df, ["f1", "f2"], max_iter=25)
    scored = score_with_model(model, df)
    acc = scored.where(F.col("prediction") == F.col("label")).count() / df.count()
    assert acc > 0.95
    # tree_score is a calibrated probability, monotone with the rule
    means = dict(
        scored.groupBy("label").agg(F.avg("tree_score").alias("m")).collect()
    )
    assert means[1.0] > 0.6 > means[0.0]


def test_model_save_load_round_trip(spark, tmp_path):
    from pyspark.ml import PipelineModel

    df = _training_frame(spark)
    model = train_filtering_model(df, ["f1", "f2"], max_iter=5)
    path = str(tmp_path / "model")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    a = score_with_model(model, df).agg(F.sum("prediction")).first()[0]
    b = score_with_model(loaded, df).agg(F.sum("prediction")).first()[0]
    assert a == b


def test_q89_scored_aggregate_is_pinned(spark):
    """The q89 literal VALUES oracle depends on run-to-run reproducible
    training: fixed synthetic input + fixed 8-partition layout must give
    exactly the pinned rounded aggregates (verified on local[8] and
    local[32] session shapes)."""
    from variantcalling_spark.queries.pipelines_q import q89_ml_filter_score

    rows = [tuple(r) for r in q89_ml_filter_score(spark, None).collect()]
    assert rows == [(0, 921, 0.219, 0.127), (1, 3079, 0.898, 0.926)]
