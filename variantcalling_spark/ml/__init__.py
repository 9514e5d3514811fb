from variantcalling_spark.ml.filtering import (  # noqa: F401
    score_with_model,
    train_filtering_model,
)
