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
from variantcalling_spark.sources import load_table
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


# Weekly micro-batch grain for the r9 monitor replay faces: the sf0.01
# events span 5 calendar weeks, so the replay drives 5 "micro-batches".
_WK = "ts_ns DIV 86400000000000 DIV 7"


@query(
    "q471_srm_stream",
    oracle="""
WITH a AS (
  SELECT (epoch_ns(ts) // 86400000000000) // 7 AS wk,
         CAST(SUM(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_control,
         CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_treat
  FROM events GROUP BY 1
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY wk) - 1 AS INT) AS batch_ord,
       n_control, n_treat,
       ROUND(POW(n_control - (n_control + n_treat) * 0.5, 2)
               / ((n_control + n_treat) * 0.5)
             + POW(n_treat - (n_control + n_treat) * 0.5, 2)
               / ((n_control + n_treat) * 0.5), 6) AS chi2,
       CASE WHEN POW(n_control - (n_control + n_treat) * 0.5, 2)
                   / ((n_control + n_treat) * 0.5)
                 + POW(n_treat - (n_control + n_treat) * 0.5, 2)
                   / ((n_control + n_treat) * 0.5) > 3.841459
            THEN 1 ELSE 0 END AS srm_flag
FROM a
""",
)
def q471_srm_stream(spark, sf_dir):
    """STREAMING SRM GATE, batch replay (the r8 ROADMAP lead "streaming
    SRM monitor" — the foreachBatch face lives in
    streaming/srm_monitor.py with a stream==batch pin; THIS is its
    deterministic batch face: events arrive in weekly chunks, the
    micro-batches, and each batch emits its own assignment chi-square
    and alpha=0.05 flag). Per-batch INDEPENDENT by design — a
    mid-experiment assignment bug fires in its own batch instead of
    being averaged away by history (q457's per-day argument, moved to
    ingest time).

    Scale shape: per batch ONE map-side-combinable conditional
    aggregate; the gate is a projection on two counts."""
    from variantcalling_spark.streaming.srm_monitor import batch_srm

    ev = load_table(spark, sf_dir, "events").withColumn("wk", F.expr(_WK))
    weeks = sorted(r.wk for r in ev.select("wk").distinct().collect())
    rows = []
    for i, wk in enumerate(weeks):
        nc, nt, chi2, flag = batch_srm(ev.where(F.col("wk") == wk))
        rows.append((i, nc, nt, chi2, flag))
    return spark.createDataFrame(
        rows,
        "batch_ord int, n_control bigint, n_treat bigint,"
        " chi2 double, srm_flag int",
    )


@query(
    "q472_heavy_changers_stream",
    oracle="""
WITH ev AS (
  SELECT (epoch_ns(ts) // 86400000000000) // 7 AS wk,
         CAST(user_id % 100 AS BIGINT) AS key
  FROM events
),
wks AS (
  SELECT wk, CAST(ROW_NUMBER() OVER (ORDER BY wk) - 1 AS INT) AS b
  FROM (SELECT DISTINCT wk FROM ev)
),
counts AS (
  SELECT w.b, key, CAST(COUNT(*) AS BIGINT) AS n
  FROM ev JOIN wks w USING (wk) GROUP BY w.b, key
),
shifted AS (SELECT b + 1 AS b, key, n FROM counts),
joined AS (
  SELECT COALESCE(c.b, p.b) AS b, COALESCE(c.key, p.key) AS key,
         CAST(COALESCE(p.n, 0) AS BIGINT) AS n_prev,
         CAST(COALESCE(c.n, 0) AS BIGINT) AS n_cur
  FROM counts c FULL OUTER JOIN shifted p
    ON c.b = p.b AND c.key = p.key
  WHERE COALESCE(c.b, p.b) <= (SELECT MAX(b) FROM counts)
),
scored AS (
  SELECT b, key, n_prev, n_cur,
         CAST(ABS(n_cur - n_prev) AS BIGINT) AS abs_change,
         ROUND((n_cur - n_prev) / (n_prev + 1.0), 6) + 0.0 AS rel_change
  FROM joined
)
SELECT CAST(b AS INT) AS batch_ord,
       CAST(rnk AS INT) AS rnk,
       key, n_prev, n_cur, abs_change, rel_change
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY b ORDER BY abs_change DESC, key) AS rnk
  FROM scored
) WHERE rnk <= 5
""",
)
def q472_heavy_changers_stream(spark, sf_dir):
    """STREAMING HEAVY CHANGERS, batch replay (the r8 ROADMAP lead —
    the foreachBatch face lives in streaming/heavy_changers.py with a
    stream==batch pin; THIS is its deterministic batch face: events
    arrive in weekly chunks and each batch emits its top-5 |delta|
    keys vs the PREVIOUS batch's counts, the first batch against an
    all-zero baseline). q447 answers 'what moved between the two
    halves' offline; this is the same alert computed while the data
    streams in, with the carried state bounded by the KEY DOMAIN (a
    production deployment swaps exact counts for the q228 count-min
    sketch when keys are unbounded).

    Scale shape: per batch ONE combinable aggregate + a full-outer
    join over the bounded key domain + a TakeOrdered head; state
    lineage is truncated per batch (localCheckpoint)."""
    from variantcalling_spark.streaming.heavy_changers import (
        key_counts,
        top_changers,
    )

    ev = load_table(spark, sf_dir, "events").withColumn("wk", F.expr(_WK))
    weeks = sorted(r.wk for r in ev.select("wk").distinct().collect())
    prev = None
    rows = []
    for i, wk in enumerate(weeks):
        cur = key_counts(ev.where(F.col("wk") == wk)).localCheckpoint()
        for rnk, key, n_prev, n_cur, abs_c, rel_c in top_changers(cur, prev):
            rows.append((i, rnk, key, n_prev, n_cur, abs_c, rel_c))
        prev = cur
    return spark.createDataFrame(
        rows,
        "batch_ord int, rnk int, key bigint, n_prev bigint, n_cur bigint,"
        " abs_change bigint, rel_change double",
    )
