"""Streaming conformal-coverage monitor: per-micro-batch empirical
coverage of the split-conformal intervals against the stored
calibration artifact (the streaming face of q331, and the second
``foreachBatch`` exemplar beside ``psi_monitor`` — the r6 ROADMAP
lead "streaming conformal monitor" closed in r7).

Production shape: the calibration artifact (per-series train-fold
mean, finite-sample-corrected conformal quantile q_hat, and the
calibration count) is computed ONCE offline on held-out folds and
stored; each serving micro-batch scores its events against the stored
(mu, q_hat) and appends per-series (n, n_hit, coverage) to a
monitoring sink. Coverage drifting below the nominal 90% is the alarm
that the score distribution moved and the intervals no longer hold —
the deployment check conformal prediction exists to provide.

``foreachBatch`` is right here for the same reason as the PSI monitor:
each batch's coverage is an independent full batch plan (broadcast
join + conditional aggregate); no streaming state carries over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

ALPHA_NUM, ALPHA_DEN = 9, 10  # nominal coverage 0.9, kept integer-exact


def calibration_artifact(events: DataFrame) -> DataFrame:
    """(event_type, mu, q_hat, n_cal) from deterministic folds — the
    q331 construction (fold 0 trains the per-series mean predictor,
    fold 1 calibrates |y - mu| scores, q_hat = the ceil(0.9(n+1))-th
    smallest score). Written once at calibration time."""
    from variantcalling_spark.operators.dedup import portable_string_hash
    from variantcalling_spark.queries._helpers import dec

    labeled = events.select(
        "event_type",
        F.col("value").alias("v"),
        (portable_string_hash(F.col("event_id").cast("string")) % 3).alias("fold"),
    )
    trainmean = (
        labeled.where(F.col("fold") == 0)
        .groupBy("event_type")
        .agg(
            F.round(F.sum(dec("v")).cast("double") / F.count(F.lit(1)), 6).alias(
                "mu"
            )
        )
    )
    cal = (
        labeled.where(F.col("fold") == 1)
        .join(F.broadcast(trainmean), "event_type")
        .select(
            "event_type", F.round(F.abs(F.col("v") - F.col("mu")), 6).alias("s")
        )
    )
    wcal = W.partitionBy("event_type").orderBy("s")
    calrk = cal.select(
        "event_type",
        "s",
        F.row_number().over(wcal).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).alias("n_cal"),
    )
    qhat = calrk.where(
        F.col("rn")
        == F.ceil(
            F.lit(ALPHA_NUM) * (F.col("n_cal") + 1) / F.lit(ALPHA_DEN)
        ).cast("bigint")
    ).select(
        "event_type",
        F.col("n_cal").cast("bigint").alias("n_cal"),
        F.col("s").alias("q_hat"),
    )
    # LEFT join + q_hat -> +inf for series whose calibration fold is too
    # small for the rank to exist (n_cal < ceil(0.9(n+1)) needs n_cal>=9):
    # the conformal convention is a vacuous interval (always covers), not
    # silently dropping the series from monitoring. n_cal counts what the
    # fold actually had (0 if the series never hit fold 1).
    n_cal_all = (
        labeled.where(F.col("fold") == 1)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_cal_obs"))
    )
    return (
        trainmean.join(n_cal_all, "event_type", "left")
        .join(qhat.drop("n_cal"), "event_type", "left")
        .select(
            "event_type",
            "mu",
            F.coalesce(F.col("q_hat"), F.lit(float("inf"))).alias("q_hat"),
            F.coalesce(F.col("n_cal_obs"), F.lit(0)).alias("n_cal"),
        )
    )


def batch_coverage(batch: DataFrame, artifact: DataFrame) -> DataFrame:
    """Per-series coverage of one batch against the stored artifact:
    (event_type, n, n_hit, coverage). A plain batch plan — callable
    from ``foreachBatch`` or any batch context (the stream==batch pin
    compares exactly these rows)."""
    scored = batch.join(F.broadcast(artifact), "event_type").select(
        "event_type",
        F.when(
            F.round(F.abs(F.col("value") - F.col("mu")), 6) <= F.col("q_hat"), 1
        )
        .otherwise(0)
        .alias("hit"),
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("hit").cast("bigint").alias("n_hit"),
        F.round(F.sum("hit") / F.count(F.lit(1)).cast("double"), 6).alias(
            "coverage"
        ),
    )


def monitor_stream(stream_events: DataFrame, artifact: DataFrame, sink: list):
    """Attach the coverage monitor to an event stream: every
    micro-batch appends ``(batch_id, event_type, n, n_hit, coverage)``
    rows to ``sink`` (a production deployment writes a monitoring
    table). Returns the started StreamingQuery."""

    def step(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        for r in batch_coverage(batch, artifact).collect():
            sink.append((batch_id, r.event_type, r.n, r.n_hit, r.coverage))

    return (
        stream_events.writeStream.outputMode("append")
        .foreachBatch(step)
        .start()
    )
