"""Structured Streaming surface over the events table.

The reference is batch-only (SURVEY.md §2.9) — its "incremental" mode is
per-chromosome sharding — so streaming is an engine capability beyond
parity. The transformations below are plain DataFrame functions applied
identically to batch frames and streams (the Structured Streaming
contract): tests drive them through a real file stream with a memory
sink and assert stream==batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_event_time(df: DataFrame, ts_us_col: str = "ts_us") -> DataFrame:
    """Attach a proper event-time column from integer microseconds."""
    return df.withColumn("event_time", F.timestamp_micros(F.col(ts_us_col)))


def tumbling_counts(df: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling event-time window counts/sums per event type."""
    return (
        df.groupBy(F.window("event_time", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("value_sum"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
            "value_sum",
        )
    )


def sliding_counts(df: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding event-time windows (each event lands in width/slide windows)."""
    return (
        df.groupBy(F.window("event_time", width, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n",
        )
    )


def session_windows(df: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Per-user session windows with an inactivity gap."""
    return (
        df.groupBy(F.session_window("event_time", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("value_sum"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "user_id",
            "n_events",
            "value_sum",
        )
    )


def stream_events_from_dir(spark, path: str, schema) -> DataFrame:
    """File-source stream with watermark, ready for the window aggs."""
    raw = spark.readStream.schema(schema).parquet(path)
    return raw.withWatermark("event_time", "1 hour")


def view_purchase_joins(views: DataFrame, purchases: DataFrame, horizon: str = "1 hour") -> DataFrame:
    """Stream-stream inner join: each view matched to the same user's
    purchases within ``horizon`` AFTER the view.

    The time-range condition on the event-time columns is what lets
    Structured Streaming bound and expire join state (with watermarks on
    both inputs); the identical function on batch frames is a plain
    range join. State per key is O(events within horizon), independent
    of stream length — the property that keeps this runnable forever.
    """
    v = views.select(
        "user_id",
        F.col("event_time").alias("view_time"),
        F.col("ts_us").alias("view_ts_us"),
    )
    p = purchases.select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_time").alias("purchase_time"),
        F.col("ts_us").alias("purchase_ts_us"),
        F.col("value").alias("purchase_value"),
    )
    cond = (
        (v["user_id"] == p["p_user_id"])
        & (p["purchase_time"] >= v["view_time"])
        & (p["purchase_time"] <= v["view_time"] + F.expr(f"INTERVAL {horizon}"))
    )
    return v.join(p, cond).select(
        "user_id", "view_ts_us", "purchase_ts_us", "purchase_value"
    )


def dedup_events(df: DataFrame, *, within_watermark: bool = False) -> DataFrame:
    """Exactly-once event dedup on the unique event key.

    Batch: plain dropDuplicates. Streaming: dropDuplicatesWithinWatermark
    keeps state only for the watermark horizon — the unbounded-state-safe
    form of streaming dedup (duplicates are assumed to arrive within the
    lateness bound, the usual at-least-once-delivery contract).
    """
    if within_watermark:
        return df.dropDuplicatesWithinWatermark(["event_id"])
    return df.dropDuplicates(["event_id"])


def segment_revenue(events: DataFrame, dim: DataFrame, width: str = "1 hour") -> DataFrame:
    """Stream-static enrichment: join the (possibly streaming) event
    feed to a static dimension on user_id, then windowed revenue per
    market segment. The static side broadcasts — in streaming mode Spark
    re-plans the static relation each micro-batch, so dimension updates
    between batches are picked up without restarting the query, and the
    stream side never shuffles for the join. Purchase-only filter sits
    BEFORE the join so the state/exchange carries the selective subset."""
    purchases = events.where(F.col("event_type") == "purchase")
    enriched = purchases.join(F.broadcast(dim), "user_id")
    return (
        enriched.groupBy(F.window("event_time", width).alias("w"), "segment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("revenue"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "segment",
            "n",
            "revenue",
        )
    )
