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


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a 1h watermark: an event arriving
    after its window's watermark has passed must not reopen the window."""
    import time as _time

    from variantcalling_spark.streaming.events import tumbling_counts

    base = 1_700_000_000_000_000  # us
    hour = 3_600_000_000
    d = str(tmp_path / "stream_in")
    schema = "event_id long, user_id long, event_type string, value double, ts_us long"

    def mk(rows, name):
        df = spark.createDataFrame(rows, schema).withColumn(
            "event_time", F.timestamp_micros(F.col("ts_us"))
        )
        df.coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)  # distinct file mod times -> deterministic batch order

    # batch 1: two events in window W0, one at +2h (advances watermark to +1h)
    mk(
        [
            (1, 1, "click", 1.0, base + 10),
            (2, 1, "click", 1.0, base + 20),
            (3, 1, "click", 1.0, base + 2 * hour),
        ],
        "b1",
    )

    batch_schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .parquet(d)
        .withWatermark("event_time", "1 hour")
    )
    q = (
        tumbling_counts(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("late_out")
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1 processed; watermark -> +1h
        # batch 2: a LATE event for W0 (watermark already >= W0 end)
        mk([(4, 1, "click", 1.0, base + 30)], "b2")
        q.processAllAvailable()
        rows = {r.window_start_us: r.n for r in spark.sql("SELECT * FROM late_out").collect()}
    finally:
        q.stop()
    w0 = (base // hour) * hour
    # W0 finalized with the 2 on-time events; the late 4th was dropped
    assert rows.get(w0) == 2


def test_stream_stream_join_equals_batch(spark, event_dir):
    """Watermarked stream-stream interval join == the same function on
    batch frames."""
    from variantcalling_spark.streaming.events import view_purchase_joins

    batch_df = spark.read.parquet(event_dir).withColumn(
        "ts_us", F.unix_micros("event_time")
    )
    views_b = batch_df.where(F.col("event_type") == "view")
    purch_b = batch_df.where(F.col("event_type") == "purchase")
    expected = {
        (r.user_id, r.view_ts_us, r.purchase_ts_us)
        for r in view_purchase_joins(views_b, purch_b).collect()
    }
    assert expected, "batch join must find at least one attribution pair"

    def side(event_type):
        return (
            spark.readStream.schema(batch_df.drop("ts_us").schema)
            .parquet(event_dir)
            .withColumn("ts_us", F.unix_micros("event_time"))
            .where(F.col("event_type") == event_type)
            .withWatermark("event_time", "2 hours")
        )

    q = (
        view_purchase_joins(side("view"), side("purchase"))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ssj_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.user_id, r.view_ts_us, r.purchase_ts_us)
            for r in spark.sql("SELECT * FROM ssj_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a duplicate arriving in a LATER
    micro-batch (within the watermark) is suppressed."""
    import time as _time

    from variantcalling_spark.streaming.events import dedup_events

    base = 1_700_000_000_000_000
    d = str(tmp_path / "dedup_in")
    schema = "event_id long, user_id long, event_type string, value double, ts_us long"

    def mk(rows):
        df = spark.createDataFrame(rows, schema).withColumn(
            "event_time", F.timestamp_micros(F.col("ts_us"))
        )
        df.coalesce(1).write.mode("append").parquet(d)
        _time.sleep(1.1)

    mk([(1, 1, "click", 1.0, base + 10), (2, 1, "click", 1.0, base + 20)])

    batch_schema = spark.read.parquet(d).schema
    stream = (
        spark.readStream.schema(batch_schema)
        .parquet(d)
        .withWatermark("event_time", "1 hour")
    )
    q = (
        dedup_events(stream, within_watermark=True)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        # micro-batch 2 re-delivers event 1 (a retry) plus a new event 3
        mk([(1, 1, "click", 1.0, base + 10), (3, 1, "click", 1.0, base + 30)])
        q.processAllAvailable()
        ids = sorted(r.event_id for r in spark.sql("SELECT * FROM dedup_out").collect())
    finally:
        q.stop()
    assert ids == [1, 2, 3], f"duplicate not suppressed: {ids}"


def test_rocksdb_state_store_provider(spark, tmp_path):
    """The production state-store config must actually run a stateful
    streaming aggregation in this environment (RocksDB provider ships
    with Spark; set per-query via the checkpoint's SQL conf)."""
    from pyspark.sql import functions as F

    from variantcalling_spark.session import streaming_state_configs

    cfgs = streaming_state_configs("rocksdb")
    assert "RocksDBStateStoreProvider" in cfgs["spark.sql.streaming.stateStore.providerClass"]
    old = {k: spark.conf.get(k, None) for k in cfgs}
    for k, v in cfgs.items():
        spark.conf.set(k, v)
    try:
        df = (
            spark.readStream.format("rate").option("rowsPerSecond", "500").load()
        )
        agg = (
            df.withWatermark("timestamp", "1 second")
            .groupBy(F.window("timestamp", "1 second"))
            .count()
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("rocksdb_smoke")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .start()
        )
        import time

        # rate source never drains — poll the sink instead of
        # processAllAvailable (which would wait forever)
        deadline = time.time() + 60
        rows = 0
        while time.time() < deadline:
            rows = spark.sql("SELECT count(*) FROM rocksdb_smoke").collect()[0][0]
            if rows > 0:
                break
            time.sleep(0.5)
        q.stop()
        assert rows > 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    import pytest

    with pytest.raises(ValueError):
        streaming_state_configs("bogus")


def test_stream_static_join_equals_batch(spark, event_dir):
    """segment_revenue (stream-static broadcast enrichment) driven by a
    real file stream must equal its batch result — the q120 function,
    unchanged, with the static dimension a plain batch DataFrame."""
    from variantcalling_spark.sources import load_table
    from variantcalling_spark.streaming.events import segment_revenue

    batch_df = spark.read.parquet(event_dir)
    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    expected = {
        (r.window_start_us, r.segment): (r.n, r.revenue)
        for r in segment_revenue(batch_df, dim).collect()
    }
    assert expected, "batch side must produce rows"

    stream = (
        spark.readStream.schema(batch_df.schema)
        .parquet(event_dir)
        .withWatermark("event_time", "1 hour")
    )
    q = (
        segment_revenue(stream, dim)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("enrich_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.window_start_us, r.segment): (r.n, r.revenue)
            for r in spark.sql("SELECT * FROM enrich_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_streaming_ingest_dedup_candidates(spark, tmp_path):
    """Dedup-at-ingest: a document STREAM maps through the shuffle-free
    rowwise MinHash projection and probes the static corpus band index
    with a stateless stream-static join — append mode, zero streaming
    state — and must discover exactly the batch path's candidates."""
    from variantcalling_spark.operators.dedup import (
        portable_band_candidates_between,
        portable_minhash_signatures,
        rowwise_minhash_signatures,
        shingles,
    )
    from variantcalling_spark.sources import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    # new batch: near-copies (first word dropped) of every 5th doc
    new = docs.where(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
    )
    new_dir = str(tmp_path / "incoming")
    new.coalesce(2).write.mode("overwrite").parquet(new_dir)

    old_sigs = portable_minhash_signatures(shingles(docs, n=3)).persist()
    batch = {
        (r.doc_new, r.doc_old)
        for r in portable_band_candidates_between(
            rowwise_minhash_signatures(spark.read.parquet(new_dir), n=3), old_sigs
        ).collect()
    }
    assert batch, "near-copies must collide with their sources"

    stream = spark.readStream.schema("doc_id long, text string").parquet(new_dir)
    q = (
        portable_band_candidates_between(
            rowwise_minhash_signatures(stream, n=3), old_sigs
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ingest_dedup")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.doc_new, r.doc_old)
            for r in spark.sql("SELECT * FROM ingest_dedup").collect()
        }
    finally:
        q.stop()
    assert got == batch


def test_streaming_ingest_dedup_probe_equals_batch(spark, tmp_path):
    """Round-5 lead: q122's incremental dedup as a REAL readStream
    probing a stored band index. The corpus index is built once and
    written to parquet; near-copy + genuinely-new documents arrive as
    two parquet files (two micro-batches); the stream maps through the
    rowwise signature projection (stateless), equi-joins the static
    index, and Jaccard-verifies with carried shingle arrays. The memory
    sink must equal the identical batch computation pair-for-pair, and
    every near-copy must be caught while reversed docs match nothing."""
    from variantcalling_spark.streaming.ingest_dedup import (
        build_band_index,
        streaming_dedup_probe,
    )

    docs = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "text")
    )
    idx_dir = str(tmp_path / "band_index")
    build_band_index(docs).write.mode("overwrite").parquet(idx_dir)
    index = spark.read.parquet(idx_dir)

    near = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
    )
    fresh = docs.where(F.col("doc_id") % 10 == 5).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.reverse(F.col("text")).alias("text"),
    )
    in_dir = str(tmp_path / "ingest_in")
    near.coalesce(1).write.mode("append").parquet(in_dir)
    fresh.coalesce(1).write.mode("append").parquet(in_dir)

    new_batch = spark.read.parquet(in_dir)
    expected = {
        (r.doc_new, r.doc_old, r.jaccard)
        for r in streaming_dedup_probe(new_batch, index).collect()
    }
    n_near = near.count()
    assert len({p[0] for p in expected}) == n_near, "every near-copy caught"
    assert not any(p[0] >= 300000 for p in expected), "reversed docs match nothing"

    stream = spark.readStream.schema(new_batch.schema).parquet(in_dir)
    q = (
        streaming_dedup_probe(stream, index)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("ingest_dedup_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.doc_new, r.doc_old, r.jaccard)
            for r in spark.sql("SELECT * FROM ingest_dedup_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_streaming_psi_monitor_foreachbatch(spark, tmp_path):
    """foreachBatch drift monitor: two parquet files arrive as two
    micro-batches (maxFilesPerTrigger=1); each batch's PSI against the
    stored corpus histogram must equal the same function computed in
    plain batch mode over that file — and the drifted batch (reversed
    half-length docs) must score strictly higher drift than the
    same-distribution batch."""
    import time as _time

    from variantcalling_spark.streaming.psi_monitor import (
        batch_psi,
        corpus_histogram,
        monitor_stream,
    )

    docs = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "text")
    )
    hist = corpus_histogram(docs)
    hist_dir = str(tmp_path / "hist")
    hist.write.mode("overwrite").parquet(hist_dir)
    hist = spark.read.parquet(hist_dir)

    same = docs.where(F.col("doc_id") % 7 == 0)
    drifted = docs.where(F.col("doc_id") % 7 == 3).select(
        "doc_id",
        F.expr("substr(text, 1, CAST(length(text) / 2 AS INT))").alias("text"),
    )
    in_dir = str(tmp_path / "psi_in")
    same.coalesce(1).write.mode("append").parquet(in_dir)
    _time.sleep(1.1)
    drifted.coalesce(1).write.mode("append").parquet(in_dir)

    expected = {
        (same.count(), batch_psi(same, hist)),
        (drifted.count(), batch_psi(drifted, hist)),
    }

    sink: list = []
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = monitor_stream(stream, hist, sink)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert {(n, psi) for _bid, n, psi in sink} == expected
    assert len(sink) == 2
    psi_same = batch_psi(same, hist)
    psi_drift = batch_psi(drifted, hist)
    assert psi_drift > psi_same


def test_stream_session_window_equals_batch(spark, event_dir):
    """Native session windows (F.session_window, 30-min gap) driven by a
    real file stream must equal the batch session aggregation — the
    streaming face of the sessionization family (q82's gaps-and-islands
    semantics, expressed with Spark's built-in session windows). One
    microbatch + update mode => the memory sink holds exactly the final
    session states."""
    batch_df = spark.read.parquet(event_dir)

    def sessions(df):
        return df.groupBy(
            F.session_window("event_time", "30 minutes").alias("sw"),
            "user_id",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("value_sum"),
        ).select(
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "user_id",
            "n",
            "value_sum",
        )

    expected = {
        (r.session_start, r.user_id): (r.session_end, r.n, r.value_sum)
        for r in sessions(batch_df).collect()
    }
    assert len(expected) > 50

    stream = (
        spark.readStream.schema(batch_df.schema)
        .parquet(event_dir)
        .withWatermark("event_time", "1 hour")
    )
    q = (
        sessions(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("session_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.session_start, r.user_id): (r.session_end, r.n, r.value_sum)
            for r in spark.sql("SELECT * FROM session_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_streaming_sketch_maintenance_equals_batch(spark, event_dir):
    """Sketch states are commutative monoids (SCALE.md round-6 note),
    so they maintain incrementally under streaming aggregation: HLL
    registers (MAX-merge) and count-min cells (SUM-merge) built by a
    file stream must equal the batch build, register for register."""
    from variantcalling_spark.operators.dedup import portable_string_hash

    batch_df = spark.read.parquet(event_dir)

    def hll_registers(df):
        hv = df.select(
            portable_string_hash(F.col("event_id").cast("string")).alias("h")
        )
        return hv.select(
            (F.col("h") % 64).alias("bucket"),
            F.when(F.expr("h DIV 64") == 0, F.lit(26))
            .otherwise((25 - F.floor(F.log2(F.expr("h DIV 64")))).cast("int"))
            .alias("rho"),
        ).groupBy("bucket").agg(F.max("rho").alias("reg"))

    expected = {r.bucket: r.reg for r in hll_registers(batch_df).collect()}
    assert len(expected) == 64  # every register populated at this size

    stream = spark.readStream.schema(batch_df.schema).parquet(event_dir)
    q = (
        hll_registers(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_out")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.bucket: r.reg for r in spark.sql("SELECT * FROM hll_out").collect()
        }
    finally:
        q.stop()
    assert got == expected


def test_streaming_conformal_monitor_foreachbatch(spark, tmp_path):
    """foreachBatch conformal-coverage monitor (q331's streaming face):
    two parquet files arrive as two micro-batches; each batch's
    per-series coverage rows must equal the same function computed in
    plain batch mode over that file — and a shifted batch (values
    pushed outside the calibrated band) must cover strictly less than
    the in-distribution batch."""
    import time as _time

    from variantcalling_spark.streaming.conformal_monitor import (
        batch_coverage,
        calibration_artifact,
        monitor_stream,
    )

    ev = spark.read.parquet(os.path.join(SF, "events.parquet")).select(
        "event_id", "event_type", "value"
    )
    artifact = calibration_artifact(ev)
    art_dir = str(tmp_path / "artifact")
    artifact.write.mode("overwrite").parquet(art_dir)
    artifact = spark.read.parquet(art_dir)

    same = ev.where(F.col("event_id") % 5 == 0)
    shifted = ev.where(F.col("event_id") % 5 == 2).select(
        "event_id", "event_type", (F.col("value") * 50 + 1000).alias("value")
    )
    in_dir = str(tmp_path / "conf_in")
    same.coalesce(1).write.mode("append").parquet(in_dir)
    _time.sleep(1.1)
    shifted.coalesce(1).write.mode("append").parquet(in_dir)

    def rows(df):
        return {
            (r.event_type, r.n, r.n_hit, r.coverage)
            for r in batch_coverage(df, artifact).collect()
        }

    expected = rows(same) | rows(shifted)

    sink: list = []
    stream = (
        spark.readStream.schema(same.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = monitor_stream(stream, artifact, sink)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert {(et, n, h, c) for _bid, et, n, h, c in sink} == expected
    # the monitor separates healthy from broken serving
    cov_same = sum(r[3] for r in rows(same)) / max(len(rows(same)), 1)
    cov_shift = sum(r[3] for r in rows(shifted)) / max(len(rows(shifted)), 1)
    assert cov_shift < cov_same


def test_streaming_page_hinkley_stateful(spark, tmp_path):
    """applyInPandasWithState Page-Hinkley: the per-series PH state
    carried across two time-ordered micro-batches must END equal to
    the batch fold over the full history AND to the q382 kernel's
    final per-series row — the path-dependent recursion survives the
    batch boundary exactly."""
    import time as _time

    from variantcalling_spark.queries import all_queries
    from variantcalling_spark.streaming.ph_monitor import (
        ph_monitor_batch,
        ph_monitor_stateful,
    )

    from variantcalling_spark.sources import load_table

    ev = load_table(spark, SF, "events")
    daily = (
        ev.withColumn("day", F.expr("ts_ns DIV 86400000000000"))
        .groupBy("event_type", "day")
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("m")
        )
    )
    rel = daily.select(
        F.col("event_type").alias("series"),
        F.row_number()
        .over(
            __import__("pyspark.sql.window", fromlist=["Window"]).Window
            .partitionBy("event_type").orderBy("day")
        )
        .cast("long")
        .alias("t"),
        "m",
    )
    in_dir = str(tmp_path / "ph_in")
    rel.where(F.col("t") <= 15).coalesce(1).write.mode("append").parquet(in_dir)
    _time.sleep(1.1)
    rel.where(F.col("t") > 15).coalesce(1).write.mode("append").parquet(in_dir)

    stream = (
        spark.readStream.schema(rel.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = (
        ph_monitor_stateful(stream)
        .writeStream.format("memory")
        .queryName("ph_state")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # last emitted row per series == final state
    final = {
        r.series: (r.n, r.ph_m, r.excess, r.alarm)
        for r in spark.sql(
            "SELECT * FROM ph_state"
        ).orderBy("n").collect()  # update mode: larger n supersedes
    }
    batch = {
        r.series: (r.n, r.ph_m, r.excess, r.alarm)
        for r in ph_monitor_batch(rel).collect()
    }
    assert final == batch and final
    # and the q382 kernel's last row per series agrees on the statistic
    q382 = all_queries()["q382_page_hinkley"].fn(spark, SF)
    last = {
        r.event_type: (r.t, round(r.ph_m, 6), round(r.excess, 6))
        for r in q382.orderBy("t").collect()
    }
    for series, (n, m, excess, _a) in batch.items():
        t, m6, e6 = last[series]
        assert t == n
        assert round(m, 6) == m6 and round(excess, 6) == e6, series


def test_streaming_coverage_selector_equals_batch(spark, tmp_path):
    """Streaming max-coverage sieve (q422's foreachBatch face): four
    doc_id-range chunk files arrive as four micro-batches
    (maxFilesPerTrigger=1, written in mtime order); the selector's
    ledger must equal the sequential batch replay of select_from_batch
    over the same chunks — covered state carried identically — and the
    min-gain sieve must have rejected at least one slot (else the
    threshold is vacuous and the test measures nothing)."""
    import time as _time

    from variantcalling_spark.streaming.coverage_selector import (
        doc_bigrams,
        select_from_batch,
        select_stream,
    )

    docs = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "text")
        .where(F.col("doc_id") < 200)
    )
    per_batch, min_gain = 2, 60
    in_dir = str(tmp_path / "cov_in")
    chunks = []
    for c in range(4):
        chunk = docs.where(
            (F.col("doc_id") >= c * 50) & (F.col("doc_id") < (c + 1) * 50)
        )
        chunks.append(chunk)
        chunk.coalesce(1).write.mode("append").parquet(in_dir)
        _time.sleep(1.1)

    expected = []
    covered = None
    for c, chunk in enumerate(chunks):
        picks, covered = select_from_batch(
            doc_bigrams(chunk), covered, per_batch=per_batch, min_gain=min_gain
        )
        for slot, doc_id, gain, total in picks:
            expected.append((c, slot, doc_id, gain, total))

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q, state = select_stream(stream, per_batch=per_batch, min_gain=min_gain)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert state.selected == expected
    assert 0 < len(expected) < 8  # sieve bound AND threshold binding


def test_streaming_srm_monitor_equals_batch(spark, tmp_path):
    """foreachBatch SRM gate (q471's streaming face): two weekly event
    files arrive as two micro-batches; each batch's (n_control,
    n_treat, chi2, flag) must equal batch_srm computed in plain batch
    mode over that file — and a PLANTED skewed batch (treatment rows
    dropped) must trip the alpha=0.05 flag while the balanced batch
    does not."""
    import time as _time

    from variantcalling_spark.sources import load_table
    from variantcalling_spark.streaming.srm_monitor import (
        batch_srm,
        monitor_stream,
    )

    ev = load_table(spark, SF, "events").select("event_id", "user_id")
    balanced = ev.where(F.col("event_id") % 3 == 0)
    # planted SRM: drop ~90% of the treatment arm
    skewed = ev.where(F.col("event_id") % 3 == 1).where(
        (F.col("user_id") % 2 == 0) | (F.col("user_id") % 23 == 1)
    )
    in_dir = str(tmp_path / "srm_in")
    balanced.coalesce(1).write.mode("append").parquet(in_dir)
    _time.sleep(1.1)
    skewed.coalesce(1).write.mode("append").parquet(in_dir)

    expected = {batch_srm(balanced), batch_srm(skewed)}

    sink: list = []
    stream = (
        spark.readStream.schema(balanced.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q = monitor_stream(stream, sink)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert {row[1:] for row in sink} == expected
    assert len(sink) == 2
    assert batch_srm(balanced)[3] == 0
    assert batch_srm(skewed)[3] == 1


def test_streaming_heavy_changers_equals_batch(spark, tmp_path):
    """foreachBatch heavy-changers monitor (q472's streaming face):
    three event files arrive IN ORDER as three micro-batches; the
    alert ledger must equal the same key_counts/top_changers chain
    replayed in plain batch mode (first batch vs the zero baseline,
    each later batch vs its predecessor)."""
    import time as _time

    from variantcalling_spark.sources import load_table
    from variantcalling_spark.streaming.heavy_changers import (
        key_counts,
        monitor_stream,
        top_changers,
    )

    ev = load_table(spark, SF, "events").select("event_id", "user_id")
    chunks = [ev.where(F.col("event_id") % 3 == i) for i in range(3)]
    in_dir = str(tmp_path / "hc_in")
    for c in chunks:
        c.coalesce(1).write.mode("append").parquet(in_dir)
        _time.sleep(1.1)

    expected = []
    prev = None
    for i, c in enumerate(chunks):
        cur = key_counts(c).localCheckpoint()
        for row in top_changers(cur, prev):
            expected.append((i, *row))
        prev = cur

    stream = (
        spark.readStream.schema(chunks[0].schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    q, state = monitor_stream(stream)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert state.alerts == expected
    assert len({b for b, *_ in state.alerts}) == 3


def test_streaming_semantic_ingest_equals_batch(spark, tmp_path):
    """Semantic dedup-at-ingest (q482's streaming face): an embedding
    STREAM maps through the stateless hyperplane-band signature and
    probes the static corpus index with a stream-static join — and
    must emit exactly the batch path's verified pairs. Planted
    structure: +200000 exact copies MUST match their sources (cosine
    ~1), +300000 negated vectors must match NOTHING."""
    from pyspark.sql import functions as F2

    from variantcalling_spark.operators.similarity import _quantize
    from variantcalling_spark.sources import load_table
    from variantcalling_spark.streaming.semantic_ingest import (
        build_semantic_index,
        streaming_semantic_probe,
    )

    emb = load_table(spark, SF, "embeddings")
    q = emb.select("vec_id", _quantize(F2.col("embedding")).alias("v"))
    new = (
        q.where(F2.col("vec_id") % 20 == 0)
        .select((F2.col("vec_id") + 200000).alias("vec_id"), "v")
        .unionByName(
            q.where(F2.col("vec_id") % 7 == 0).select(
                (F2.col("vec_id") + 300000).alias("vec_id"),
                F2.transform("v", lambda x: -x).alias("v"),
            )
        )
    )
    new_dir = str(tmp_path / "vec_incoming")
    new.coalesce(2).write.mode("overwrite").parquet(new_dir)
    index = build_semantic_index(q).persist()

    batch = {
        (r.vec_new, r.vec_old)
        for r in streaming_semantic_probe(
            spark.read.parquet(new_dir), index
        ).collect()
    }
    assert batch, "exact copies must match their sources"
    assert all(v < 300000 for v, _ in batch), "negated vectors match nothing"
    copies = {v for v, _ in batch if v >= 200000}
    assert copies == {
        r.vec_id for r in new.where(F2.col("vec_id") < 300000).collect()
    }

    stream = spark.readStream.schema(new.schema).parquet(new_dir)
    sq = (
        streaming_semantic_probe(stream, index)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("semantic_ingest")
        .start()
    )
    try:
        sq.processAllAvailable()
        got = {
            (r.vec_new, r.vec_old)
            for r in spark.sql("SELECT * FROM semantic_ingest").collect()
        }
    finally:
        sq.stop()
    assert got == batch


def test_streaming_winnowing_ingest_equals_batch(spark, tmp_path):
    """Winnowing dedup-at-ingest (q493's streaming face): a document
    STREAM computes scan-local rowwise fingerprints per micro-batch
    (foreachBatch — the probe aggregates, so each batch runs as an
    independent batch plan) and probes the static df-capped index;
    the union over batches must equal the one-shot batch replay.
    Also pins rowwise == windowed fingerprint equality on real docs."""
    from pyspark.sql import functions as F2

    from variantcalling_spark.operators.dedup import (
        rowwise_winnowing_fingerprints,
        winnowing_fingerprints,
    )
    from variantcalling_spark.sources import load_table
    from variantcalling_spark.streaming.winnowing_ingest import (
        build_fingerprint_index,
        ingest_stream,
        streaming_fingerprint_probe,
    )

    docs = load_table(spark, SF, "documents").select("doc_id", "text")

    # the rowwise (stream-legal) operator IS the windowed one
    a = set(map(tuple, winnowing_fingerprints(docs).collect()))
    b = set(map(tuple, rowwise_winnowing_fingerprints(docs).collect()))
    assert a == b

    batch = docs.where(F2.col("doc_id") % 20 == 0).select(
        (F2.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    new_dir = str(tmp_path / "docs_incoming")
    batch.coalesce(2).write.mode("overwrite").parquet(new_dir)
    index = build_fingerprint_index(docs).persist()

    want = {
        (r.new_id, r.old_id, r.n_shared, r.containment)
        for r in streaming_fingerprint_probe(
            spark.read.parquet(new_dir), index
        ).collect()
    }
    assert want, "exact copies must be flagged"
    # every planted copy matches its SOURCE at containment exactly 1.0
    # (other >=0.5 corpus matches are legitimate extras)
    n_ids = {r.doc_id for r in batch.select("doc_id").collect()}
    assert {n for (n, o, _, c) in want if o == n - 200000 and c == 1.0} == n_ids

    sink: list = []
    sq = ingest_stream(
        spark.readStream.schema(batch.schema).parquet(new_dir), index, sink
    )
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()
    got = {(n, o, s, c) for (_, n, o, s, c) in sink}
    assert got == want


def test_winnowing_probe_counts_distinct_hashes_not_positions(spark):
    """Regression (r9 advice): a new doc that internally REPEATS a
    >=w+n-1-word passage emits the same fingerprint hash at multiple
    positions. The probe must count DISTINCT hashes (matching the q493
    oracle's SELECT DISTINCT and q498's batch probe), not positions —
    before the fix both n_fp_new and n_shared were inflated on exactly
    this doc shape."""
    from pyspark.sql import functions as F2

    from variantcalling_spark.operators.dedup import winnowing_fingerprints
    from variantcalling_spark.streaming.winnowing_ingest import (
        build_fingerprint_index,
        streaming_fingerprint_probe,
    )

    passage = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = spark.createDataFrame(
        [(1, passage + " iota kappa"), (2, "unrelated words entirely here now")],
        "doc_id long, text string",
    )
    # new doc repeats the passage three times -> same hashes, many positions
    new = spark.createDataFrame(
        [(100, " ".join([passage] * 3))], "doc_id long, text string"
    )
    index = build_fingerprint_index(corpus)
    got = {
        (r.new_id, r.old_id, r.n_shared, r.n_fp_new)
        for r in streaming_fingerprint_probe(new, index, threshold=0.0).collect()
    }
    # independent expectation from DISTINCT hash sets
    fp_new = (
        winnowing_fingerprints(new)
        .select(F2.col("doc_id").alias("new_id"), "h")
        .distinct()
    )
    sizes = {r.new_id: r.n for r in fp_new.groupBy("new_id").agg(F2.count("*").alias("n")).collect()}
    shared = {
        (r.new_id, r.old_id): r.n
        for r in fp_new.join(index.select(F2.col("doc_id").alias("old_id"), "h"), "h")
        .groupBy("new_id", "old_id")
        .agg(F2.count("*").alias("n"))
        .collect()
    }
    want = {(n, o, s, sizes[n]) for (n, o), s in shared.items()}
    assert got == want
    # and the repeated doc's distinct-fingerprint count is strictly
    # below its position count (the inflation the fix removes)
    n_positions = winnowing_fingerprints(new).count()
    assert sizes[100] < n_positions


def test_streaming_graph_ingest_equals_rebuild(spark, tmp_path):
    """Streaming kNN-graph maintenance (q502's stateful face): vectors
    arriving over MULTIPLE micro-batches, each merged into carried
    (graph, stored) state with localCheckpoint per batch — the final
    graph must equal the FULL REBUILD over everything ingested,
    bit-for-bit (static band keys + the top-k merge property, applied
    inductively)."""
    from pyspark.sql import functions as F2

    from variantcalling_spark.operators.similarity import _quantize, knn_graph
    from variantcalling_spark.sources import load_table
    from variantcalling_spark.streaming.graph_ingest import (
        graph_ingest_stream,
        keyed_vectors,
    )

    emb = load_table(spark, SF, "embeddings")
    q = emb.select("vec_id", _quantize(F2.col("embedding")).alias("v"))
    old = q.where(F2.col("vec_id") % 3 != 0)
    arriving = q.where(F2.col("vec_id") % 3 == 0)

    new_dir = str(tmp_path / "vec_stream")
    # several files -> several micro-batches (order is irrelevant to
    # the final state: the merge is a commutative top-k refinement)
    arriving.repartition(3).write.mode("overwrite").parquet(new_dir)

    init_stored = keyed_vectors(old)
    init_graph = (
        knn_graph(
            old.select("vec_id", (F2.transform("v", lambda x: x / 100000.0)).alias("embedding")),
            k=3,
            prefix_bits=6,
        ).select("vec_id", "neighbor_id", "cosine")
    )
    state: dict = {}
    sq = graph_ingest_stream(
        spark.readStream.schema(arriving.schema).option("maxFilesPerTrigger", 1).parquet(new_dir),
        init_stored,
        init_graph,
        state,
    )
    try:
        sq.processAllAvailable()
    finally:
        sq.stop()

    got = {
        (r.vec_id, r.neighbor_id, round(r.cosine, 9))
        for r in state["graph"].collect()
    }
    want = {
        (r.vec_id, r.neighbor_id, round(r.cosine, 9))
        for r in knn_graph(
            q.select("vec_id", F2.transform("v", lambda x: x / 100000.0).alias("embedding")),
            k=3,
            prefix_bits=6,
        ).select("vec_id", "neighbor_id", "cosine").collect()
    }
    assert got == want


def test_ingest_dedup_planner_mode_default_equality(spark):
    """Planner-driven ingest (r11): a target recall that plans exactly
    the shipped 8-band dial must reproduce the default probe output
    bit-for-bit with a signature sized to b*r, and a higher target must
    widen the signature (more bands) while keeping every verified pair
    (verified pairs are exact-Jaccard-gated, so extra bands can only
    add discoveries, never change a pair's score)."""
    from variantcalling_spark.operators.dedup import (
        planned_minhash_bands_for_recall,
    )
    from variantcalling_spark.streaming.ingest_dedup import (
        build_band_index,
        streaming_dedup_probe,
    )

    docs = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select("doc_id", "text")
    )
    near = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
    )
    assert planned_minhash_bands_for_recall(0.6, 0.67, 4) == 8
    default = {
        (r.doc_new, r.doc_old, r.jaccard)
        for r in streaming_dedup_probe(near, build_band_index(docs)).collect()
    }
    planned = {
        (r.doc_new, r.doc_old, r.jaccard)
        for r in streaming_dedup_probe(
            near,
            build_band_index(docs, threshold=0.6, target_recall=0.67),
            threshold=0.6,
            target_recall=0.67,
        ).collect()
    }
    assert planned == default and len(default) > 0
    wider = {
        (r.doc_new, r.doc_old, r.jaccard)
        for r in streaming_dedup_probe(
            near,
            build_band_index(docs, threshold=0.6, target_recall=0.9, rows_per_band=2),
            threshold=0.6,
            target_recall=0.9,
            rows_per_band=2,
        ).collect()
    }
    assert default <= wider


def test_tws_activity_equals_classic_and_batch(spark, event_dir):
    """Spark 4 transformWithStateInPandas port (streaming/tws_activity):
    the SAME kernel on the next-gen typed-state API must emit, per
    user, exactly what the classic applyInPandasWithState operator and
    the batch applyInPandas fold produce. Runs under the RocksDB
    provider (required by transformWithState; also the production
    config from session.streaming_state_configs).

    ENV-GATED like the pyBigWig cross-check: transformWithState's
    Python state server speaks protobuf, and pyspark only declares
    protobuf under the optional [connect] extra — absent here. The
    operator is complete against the public API; this pin activates
    the moment the environment ships google.protobuf."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState state server requires protobuf "
        "(pyspark[connect] extra; not shipped in this environment)",
    )
    import pyspark.sql.functions as F

    from variantcalling_spark.session import streaming_state_configs
    from variantcalling_spark.streaming.stateful import user_activity_batch
    from variantcalling_spark.streaming.tws_activity import user_activity_tws

    batch_df = spark.read.parquet(event_dir).withColumn(
        "ts_us", F.unix_micros("event_time")
    )
    expected = {
        r.user_id: (r.first_us, r.last_us, r.n, r.max_gap_us)
        for r in user_activity_batch(batch_df).collect()
    }

    old = {
        k: spark.conf.get(k, None) for k in streaming_state_configs()
    }
    for k, v in streaming_state_configs().items():
        spark.conf.set(k, v)
    try:
        stream = (
            spark.readStream.schema(batch_df.drop("ts_us").schema)
            .parquet(event_dir)
            .withColumn("ts_us", F.unix_micros("event_time"))
        )
        q = (
            user_activity_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_out")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM tws_out").collect()
        finally:
            q.stop()
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    got = {}
    for r in rows:  # update mode: last emission per user wins
        got[r.user_id] = (r.first_us, r.last_us, r.n, r.max_gap_us)
    assert got == expected


def test_streaming_bm25_probe_equals_batch(spark):
    """Retrieval-at-ingest (streaming/retrieval_probe): a query stream
    probing the static BM25 index emits bit-identical (query, doc)
    scores to the batch run of the same function — explode +
    stream-static joins + one keyed aggregation, DECIMAL partials.
    Also cross-checks the shared formula: a single-query probe with
    q116's four terms reproduces _bm25_doc_scores row-for-row."""
    from variantcalling_spark.queries.text import BM25_TERMS, _bm25_doc_scores
    from variantcalling_spark.sources import load_table
    from variantcalling_spark.streaming.retrieval_probe import (
        build_bm25_index,
        streaming_bm25_probe,
    )

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    postings, doclen, stats = build_bm25_index(docs)
    postings = postings.cache()

    queries = spark.createDataFrame(
        [
            (1, list(BM25_TERMS)),
            (2, ["table", "sort", "merge"]),
            (3, ["zzz_not_in_corpus"]),
            (4, ["spark", "spark", "value"]),  # dup term folds once
        ],
        "query_id int, terms array<string>",
    )
    want = {
        (r.query_id, r.doc_id): (r.n_terms, r.score)
        for r in streaming_bm25_probe(queries, postings, doclen, stats).collect()
    }
    assert want  # non-degenerate
    assert not any(q == 3 for q, _ in want)  # OOV query matches nothing

    # q116 formula parity: probe with q116's term set == its scorer
    bm = {
        r.doc_id: (r.n_terms, r.score) for r in _bm25_doc_scores(docs).collect()
    }
    probe1 = {
        r.doc_id: (r.n_terms, r.score)
        for r in streaming_bm25_probe(
            queries.where("query_id = 1"), postings, doclen, stats
        ).collect()
    }
    assert probe1 == bm

    qdir = tempfile.mkdtemp(prefix="stream_queries_")
    queries.coalesce(1).write.mode("overwrite").parquet(qdir)
    stream = spark.readStream.schema(queries.schema).parquet(qdir)
    q = (
        streaming_bm25_probe(stream, postings, doclen, stats)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("bm25_probe_out")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM bm25_probe_out").collect()
    finally:
        q.stop()
    got = {}
    for r in rows:  # update mode: last emission per key wins
        got[(r.query_id, r.doc_id)] = (r.n_terms, r.score)
    assert got == want
