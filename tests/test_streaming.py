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


def test_stateful_stream_equals_batch(spark, event_dir):
    from variantcalling_spark.streaming.stateful import (
        _fold,
        user_activity_batch,
        user_activity_stateful,
    )

    batch_df = spark.read.parquet(event_dir).withColumn(
        "ts_us", F.unix_micros("event_time")
    )
    expected = {
        r.user_id: (r.first_us, r.last_us, r.n, r.max_gap_us)
        for r in user_activity_batch(batch_df).collect()
    }

    stream = (
        spark.readStream.schema(batch_df.drop("ts_us").schema)
        .parquet(event_dir)
        .withColumn("ts_us", F.unix_micros("event_time"))
    )
    q = (
        user_activity_stateful(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM stateful_out").collect()
    finally:
        q.stop()
    # update mode appends one row per user per micro-batch; the final
    # emission per user must equal the batch fold
    got = {}
    for r in rows:
        got[r.user_id] = (r.first_us, r.last_us, r.n, r.max_gap_us)
    assert got == expected


def test_fold_incremental_equals_full():
    from variantcalling_spark.streaming.stateful import _fold

    ts = [10, 20, 30, 50, 60, 90]
    full = _fold(None, ts)
    # same events split across three time-ordered "micro-batches" (the
    # watermarked-stream arrival assumption): incremental == full fold
    s = _fold(None, ts[:2])
    s = _fold(s, ts[2:4])
    s = _fold(s, ts[4:])
    assert s == full
