"""Event-time window aggregations — the batch face of the streaming
surface (the identical transformations run under Structured Streaming in
variantcalling_spark/streaming/events.py; tests prove stream == batch).

Window starts are emitted as integer epoch-microseconds so both engines
hash identically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from variantcalling_spark.queries import query
from variantcalling_spark.queries.intervals import events_points
from variantcalling_spark.streaming.events import (
    dedup_events,
    session_windows,
    sliding_counts,
    tumbling_counts,
    view_purchase_joins,
    with_event_time,
)

HOUR_US = 3_600_000_000
HALF_US = 1_800_000_000


@query(
    "q80_tumbling_window",
    oracle=f"""
SELECT (epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS window_start_us,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
""",
)
def q80_tumbling_window(spark, sf_dir):
    """Tumbling event-time windows (1h) per event type — the Structured
    Streaming windowed agg (guide §Structured Streaming) run in batch;
    the same function is driven by a file stream in tests."""
    ev = with_event_time(events_points(spark, sf_dir))
    return tumbling_counts(ev, "1 hour")


@query(
    "q81_sliding_window",
    oracle=f"""
WITH slid AS (
  SELECT event_type,
         (epoch_us(ts) // {HALF_US} - k) * {HALF_US} AS window_start_us
  FROM events, unnest([0, 1]) t(k)
)
SELECT window_start_us, event_type, COUNT(*) AS n
FROM slid GROUP BY 1, 2
""",
)
def q81_sliding_window(spark, sf_dir):
    """Sliding windows (1h width, 30m slide): every event belongs to two
    windows; Spark's window() expansion vs the oracle's explicit
    2-window unnest must agree exactly."""
    ev = with_event_time(events_points(spark, sf_dir))
    return sliding_counts(ev, "1 hour", "30 minutes")


@query(
    "q82_session_window",
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS ts_us, value FROM events
),
flagged AS (
  SELECT user_id, ts_us, value,
         CASE WHEN ts_us - LAG(ts_us) OVER w > {HALF_US}
                   OR LAG(ts_us) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
),
sess AS (
  SELECT user_id, ts_us, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
  FROM flagged
)
SELECT MIN(ts_us) AS session_start_us,
       user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
FROM sess GROUP BY user_id, session_id
""",
)
def q82_session_window(spark, sf_dir):
    """Per-user session windows (30m inactivity gap).

    Spark side: native `session_window` aggregation (the streaming
    sessionization operator). Oracle: the classic lag -> cumsum
    gaps-and-islands — proving the two formulations equivalent.
    """
    ev = with_event_time(events_points(spark, sf_dir))
    return session_windows(ev, "30 minutes")


@query(
    "q83_stream_stream_join",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_type, value, epoch_us(ts) AS ts_us FROM events
),
v AS (SELECT user_id, ts_us AS view_ts_us FROM e WHERE event_type = 'view'),
p AS (
  SELECT user_id, ts_us AS purchase_ts_us, value AS purchase_value
  FROM e WHERE event_type = 'purchase'
)
SELECT v.user_id, v.view_ts_us, p.purchase_ts_us, p.purchase_value
FROM v JOIN p ON v.user_id = p.user_id
             AND p.purchase_ts_us >= v.view_ts_us
             AND p.purchase_ts_us <= v.view_ts_us + {HOUR_US}
""",
)
def q83_stream_stream_join(spark, sf_dir):
    """View-to-purchase attribution within a 1h horizon — the
    stream-stream interval join (watermark-bounded state in streaming;
    tests/test_streaming.py proves stream == batch on this function)."""
    ev = with_event_time(events_points(spark, sf_dir))
    views = ev.where(F.col("event_type") == "view")
    purchases = ev.where(F.col("event_type") == "purchase")
    return view_purchase_joins(views, purchases, "1 hour")


@query(
    "q84_streaming_dedup",
    oracle="""
WITH doubled AS (
  SELECT * FROM events UNION ALL SELECT * FROM events
)
SELECT DISTINCT event_id, user_id, event_type, value, epoch_us(ts) AS ts_us
FROM doubled
""",
)
def q84_streaming_dedup(spark, sf_dir):
    """At-least-once delivery dedup: a doubled event feed collapsed back
    to exactly-once on the unique event key. Batch face of
    dropDuplicatesWithinWatermark (the watermark-bounded streaming form
    is exercised against a real duplicated file stream in
    tests/test_streaming.py)."""
    ev = events_points(spark, sf_dir).select(
        "event_id", "user_id", "event_type", "value", "ts_us"
    )
    doubled = ev.unionByName(ev)
    return dedup_events(doubled)


@query(
    "q120_stream_static_enrich",
    oracle=f"""
SELECT (epoch_us(e.ts) // {HOUR_US}) * {HOUR_US} AS window_start_us,
       c.c_mktsegment AS segment,
       COUNT(*) AS n,
       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM events e JOIN customer c ON e.user_id = c.c_custkey
WHERE e.event_type = 'purchase'
GROUP BY 1, 2
""",
)
def q120_stream_static_enrich(spark, sf_dir):
    """Stream-static enrichment join: the purchase stream joined to the
    static customer dimension (broadcast — the stream side never
    shuffles for the join, and streaming re-plans the static relation
    each micro-batch so dimension updates land without a restart), then
    1h windowed revenue per market segment. The missing member of the
    streaming-join family (q83 covers stream-stream); stream == batch
    equality of this exact function is proven against a real file stream
    in tests/test_streaming.py."""
    from variantcalling_spark.sources import load_table
    from variantcalling_spark.streaming.events import segment_revenue

    ev = with_event_time(events_points(spark, sf_dir))
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    return segment_revenue(ev, dim, "1 hour")
