"""Winnowing dedup-at-ingest: a document stream probing a stored
fingerprint index — the EXACT-SUBSTRING-guarantee member of the
ingest-dedup family (``ingest_dedup.py`` = MinHash/probabilistic,
``semantic_ingest.py`` = embedding cosine; this one inherits winnowing's
detection guarantee: any shared run of >= w+n-1 words WILL collide).

Production shape for continuous corpus growth:
- corpus build time: ``winnowing_fingerprints`` over the corpus ->
  parquet index of (doc_id, h), stop-listed at df <= df_cap (the q451
  lesson: discovery must be frequency-bounded from day one);
- ingest time: each arriving batch computes its fingerprints with the
  ROWWISE operator (one scan-local array expression per doc — legal in
  a streaming projection, zero shuffle, pinned output-identical to the
  windowed batch operator in tests) and equi-joins the static index on
  h; containment n_shared / |fp_new| >= threshold flags the new doc.

Zero streaming state — batches are independent; new x new dedup is the
q486 self-join face, run at compaction. The static side re-plans per
micro-batch, so a refreshed index lands without a stream restart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from variantcalling_spark.operators.dedup import (
    rowwise_winnowing_fingerprints,
    winnowing_fingerprints,
)


def build_fingerprint_index(
    docs: DataFrame, n: int = 3, w: int = 4, df_cap: int = 100
) -> DataFrame:
    """Corpus-side winnowing index: distinct (doc_id, h) with
    fingerprints shared by more than ``df_cap`` docs stop-listed.
    Written once at corpus build."""
    fp = winnowing_fingerprints(docs, n=n, w=w).select("doc_id", "h").distinct()
    dfh = fp.groupBy("h").agg(F.count(F.lit(1)).alias("ndocs"))
    return fp.join(dfh.where(F.col("ndocs") <= df_cap), "h").select("doc_id", "h")


def streaming_fingerprint_probe(
    new_docs: DataFrame,
    index: DataFrame,
    threshold: float = 0.5,
    n: int = 3,
    w: int = 4,
) -> DataFrame:
    """Probe a document batch against the stored index. Returns
    (new_id, old_id, n_shared, n_fp_new, containment) for containment
    >= threshold. The fingerprint projection is scan-local per row,
    but the shared-count fold is an aggregation — so the stream face
    runs this per micro-batch inside ``foreachBatch``
    (``ingest_stream``), where each batch is an independent plain
    batch plan (the srm_monitor/heavy_changers discipline)."""
    # .distinct() is load-bearing: the rowwise operator emits one row per
    # fingerprint POSITION, so a doc that internally repeats a >=w+n-1-word
    # passage re-emits the same h — without the dedup both n_fp_new and
    # n_shared count positions while the q493 oracle (and q498's batch
    # probe / build_fingerprint_index) count DISTINCT hashes.
    fp_new = (
        rowwise_winnowing_fingerprints(new_docs, n=n, w=w)
        .select(F.col("doc_id").alias("new_id"), "h")
        .distinct()
    )
    sizes = fp_new.groupBy("new_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_fp_new")
    )
    hits = (
        fp_new.join(index.select(F.col("doc_id").alias("old_id"), "h"), "h")
        .groupBy("new_id", "old_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
    )
    return (
        hits.join(sizes, "new_id")
        .withColumn(
            "containment",
            F.round(F.col("n_shared") / F.col("n_fp_new").cast("double"), 6),
        )
        .where(F.col("containment") >= threshold)
    )


def ingest_stream(
    stream_docs: DataFrame,
    index: DataFrame,
    sink: list,
    threshold: float = 0.5,
    n: int = 3,
    w: int = 4,
):
    """Attach the winnowing probe to a document stream: every
    micro-batch's flagged (new_id, old_id, n_shared, n_fp_new,
    containment) rows are appended to ``sink`` (a list here;
    production writes a quarantine table). Per-batch independent —
    no carried state. Returns the started StreamingQuery."""

    def step(batch: DataFrame, batch_id: int) -> None:
        rows = streaming_fingerprint_probe(
            batch, index, threshold=threshold, n=n, w=w
        ).collect()
        sink.extend(
            (int(batch_id), r.new_id, r.old_id, int(r.n_shared), float(r.containment))
            for r in rows
        )

    return (
        stream_docs.writeStream.outputMode("append").foreachBatch(step).start()
    )
