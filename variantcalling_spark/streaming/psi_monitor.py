"""Streaming drift monitor: per-micro-batch PSI against a stored
corpus histogram (the streaming face of q161, and the repo's
``foreachBatch`` exemplar).

Production shape: the corpus histogram is computed once at corpus
build (10 fixed-width token-count bins, the q161 binning) and stored;
each ingest micro-batch folds to its own 10-bin histogram and the
population-stability index against the stored distribution is appended
to a monitoring sink. ``foreachBatch`` is the right tool because the
per-batch computation is a full batch plan (joins, aggregates,
arbitrary sinks) that streaming-native aggregation state cannot
express — and each batch's PSI is independent, so no state carries
over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PSI_BINS = 10
PSI_WIDTH = 8


def _bin_expr():
    return (
        F.least(
            F.size(F.split("text", " ")) / F.lit(PSI_WIDTH), F.lit(PSI_BINS - 1)
        )
        .cast("bigint")
        .alias("bin")
    )


def corpus_histogram(docs: DataFrame) -> DataFrame:
    """(bin, n_old) for the stored corpus — written once at build."""
    return docs.select(_bin_expr()).groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_old")
    )


def batch_psi(batch: DataFrame, hist: DataFrame) -> float:
    """Laplace-smoothed PSI of one batch against the stored histogram
    (q161's per-bin formula, folded to the scalar a monitor alerts on).
    Runs as a plain batch plan — callable from ``foreachBatch`` or any
    batch context."""
    spark = batch.sparkSession
    nc = batch.select(_bin_expr()).groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    bins = spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    t_old = hist.agg(F.sum("n_old")).collect()[0][0] or 0
    t_new = batch.count()
    B = PSI_BINS
    no = F.coalesce("n_old", F.lit(0).cast("bigint"))
    nn = F.coalesce("n_new", F.lit(0).cast("bigint"))
    row = (
        bins.join(hist, "bin", "left")
        .join(nc, "bin", "left")
        .select(
            (
                (
                    (no + 1) / F.lit(float(t_old + B))
                    - (nn + 1) / F.lit(float(t_new + B))
                )
                * F.log(
                    ((no + 1) * (t_new + B))
                    / ((nn + 1) * (t_old + B)).cast("double")
                )
            ).alias("c")
        )
        .agg(F.round(F.sum("c"), 6).alias("psi"))
        .collect()[0]
    )
    return float(row.psi)


def monitor_stream(stream_docs: DataFrame, hist: DataFrame, sink: list):
    """Attach the PSI monitor to a document stream: every micro-batch
    appends ``(batch_id, n_docs, psi)`` to ``sink`` (a list here; a
    production deployment writes a monitoring table instead). Returns
    the started StreamingQuery."""

    def step(batch: DataFrame, batch_id: int) -> None:
        n = batch.count()
        if n:
            sink.append((batch_id, n, batch_psi(batch, hist)))

    return (
        stream_docs.writeStream.outputMode("append")
        .foreachBatch(step)
        .start()
    )
