"""Structured Streaming: the same window transformations driven by a real
file stream (memory sink) must equal their batch results."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from variantcalling_spark.queries.intervals import events_points
from variantcalling_spark.streaming.events import (
    tumbling_counts,
    with_event_time,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_dir(spark):
    """Materialize events (with proper event_time) as a small parquet dir
    the file-stream source can ingest."""
    tmp = tempfile.mkdtemp(prefix="stream_events_")
    ev = with_event_time(events_points(spark, SF)).select(
        "event_id", "user_id", "event_type", "value", "event_time"
    )
    ev.coalesce(2).write.mode("overwrite").parquet(tmp)
    return tmp


def test_stream_equals_batch_tumbling(spark, event_dir):
    batch_df = spark.read.parquet(event_dir)
    expected = {
        (r.window_start_us, r.event_type): (r.n, r.value_sum)
        for r in tumbling_counts(batch_df).collect()
    }

    stream = (
        spark.readStream.schema(batch_df.schema)
        .parquet(event_dir)
        .withWatermark("event_time", "1 hour")
    )
    q = (
        tumbling_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start_us, r.event_type): (r.n, r.value_sum)
            for r in spark.sql("SELECT * FROM tumbling_out").collect()
        }
    finally:
        q.stop()
    assert got == expected
    assert len(got) > 100


def test_stream_incremental_append(spark, event_dir):
    """Feeding the same files through a fresh stream twice (restart) is
    idempotent in complete mode — the aggregation state rebuilds."""
    batch_df = spark.read.parquet(event_dir)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .parquet(event_dir)
        .withWatermark("event_time", "1 hour")
    )
    q = (
        tumbling_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("tumbling_out2")
        .start()
    )
    try:
        q.processAllAvailable()
        n1 = spark.sql("SELECT count(*) AS n FROM tumbling_out2").collect()[0].n
    finally:
        q.stop()
    assert n1 > 0
