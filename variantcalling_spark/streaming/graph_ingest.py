"""Streaming kNN-graph maintenance: the q502 incremental merge applied
per micro-batch — the GRAPH member of the ingest-face family
(``ingest_dedup`` text, ``semantic_ingest`` embeddings, ``winnowing_
ingest`` fingerprints; this one maintains the kNN graph SemDeDup /
mutual-proximity / LPA all consume).

Unlike the other faces this one is STATEFUL across batches — the graph
evolves — so each ``foreachBatch`` step merges the arriving vectors
into the carried (graph, bucketed-relation) state and the new state is
``localCheckpoint``-ed: the lineage is CUT every batch instead of
growing a union chain over expired micro-batch sources (the r8 ADVICE
lesson on ``coverage_selector``; production writes the state to a
catalog table, which this models).

Correctness contract (pinned in tests): after any sequence of batches,
the carried graph EQUALS the full rebuild over everything ingested —
exactly, not approximately — because band keys are static and
top-k(A u B) == top-k(topk(A) u B) (the q502 argument, applied
inductively batch over batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from variantcalling_spark.operators.similarity import (
    _band_slices_arrow,
    _cosine_prenorm_arrow,
    _dot,
)


def keyed_vectors(vecs: DataFrame, prefix_bits: int = 6) -> DataFrame:
    """(vec_id, v, bucket, norm) over QUANTIZED vectors (column ``v``)
    — the stored relation the graph state rides."""
    bucket = _band_slices_arrow(prefix_bits, 1)
    return vecs.select(
        "vec_id",
        "v",
        F.element_at(bucket(F.col("v")), 1).alias("bucket"),
        F.sqrt(_dot(F.col("v"), F.col("v")).cast("double")).alias("norm"),
    )


def merge_batch(
    graph: DataFrame, stored: DataFrame, batch_keyed: DataFrame, k: int = 3
) -> tuple[DataFrame, DataFrame]:
    """One incremental step: score (batch x (stored u batch)) in-bucket
    pairs BOTH directions, merge into the carried graph, return the
    (new_graph, new_stored) state pair. Exactly q502's plan shape."""
    uni = stored.unionByName(batch_keyed)
    n, u = batch_keyed.alias("n"), uni.alias("u")
    probe = (
        n.join(
            u,
            (F.col("n.bucket") == F.col("u.bucket"))
            & (F.col("n.vec_id") != F.col("u.vec_id")),
        )
        .select(
            F.col("n.vec_id").alias("vec_id"),
            F.col("u.vec_id").alias("neighbor_id"),
            _cosine_prenorm_arrow()(
                F.col("n.v"), F.col("u.v"), F.col("n.norm"), F.col("u.norm")
            ).alias("cosine"),
        )
    )
    both = probe.unionByName(
        probe.select(
            F.col("neighbor_id").alias("vec_id"),
            F.col("vec_id").alias("neighbor_id"),
            "cosine",
        )
    ).where(F.col("vec_id") != F.col("neighbor_id"))
    w = W.partitionBy("vec_id").orderBy(F.desc("cosine"), "neighbor_id")
    new_graph = (
        graph.unionByName(both)
        .groupBy("vec_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cosine")
    )
    return new_graph, uni


def graph_ingest_stream(
    stream_vecs: DataFrame,
    initial_stored: DataFrame,
    initial_graph: DataFrame,
    state: dict,
    k: int = 3,
    prefix_bits: int = 6,
):
    """Attach incremental graph maintenance to a quantized-vector
    stream. ``state`` carries {'graph': DataFrame, 'stored':
    DataFrame}; each micro-batch merges and localCheckpoints both (cut
    lineage — durable-table stand-in). Returns the StreamingQuery."""
    state["graph"] = initial_graph.localCheckpoint(eager=True)
    state["stored"] = initial_stored.localCheckpoint(eager=True)

    def step(batch: DataFrame, batch_id: int) -> None:
        if not batch.head(1):
            return
        bk = keyed_vectors(batch, prefix_bits=prefix_bits)
        g, s = merge_batch(state["graph"], state["stored"], bk, k=k)
        state["graph"] = g.localCheckpoint(eager=True)
        state["stored"] = s.localCheckpoint(eager=True)

    return (
        stream_vecs.writeStream.outputMode("append").foreachBatch(step).start()
    )
