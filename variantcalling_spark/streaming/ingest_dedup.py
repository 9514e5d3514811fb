"""Dedup-at-ingest: a document stream probing a stored LSH band index.

The production shape for continuous corpus growth (reference:
`ugvc/pipelines/` batch-dedup reruns re-read the whole corpus; here the
corpus is touched ONCE to build the index, then each ingested batch
costs O(|batch| + collisions)):

- corpus build time: `rowwise_minhash_signatures` over the corpus →
  parquet "band index" (signatures only, text discarded);
- ingest time: the document stream maps through the SAME signature
  projection (pure per-row array algebra — no explode, no groupBy, so
  Structured Streaming runs it stateless), probes the static index with
  an equi-join on (band, bucket), and verifies survivors with exact
  Jaccard on the carried shingle arrays.

Zero streaming state, zero stream-side shuffle beyond the join exchange;
the static side re-plans per micro-batch, so a refreshed index lands
without a stream restart (same property q120 relies on for its
dimension join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from variantcalling_spark.operators.dedup import (
    planned_minhash_bands_for_recall,
    portable_band_candidates_between,
    rowwise_minhash_signatures,
)


def _ingest_plan(
    threshold: float, target_recall: float | None, rows_per_band: int
) -> tuple[int, int]:
    """(num_hashes, num_bands) for the ingest face. ``target_recall``
    switches on the PLANNER-DRIVEN mode (the r11 MinHash mirror of
    q514's cosine face): the band count comes from
    ``planned_minhash_bands_for_recall`` and the signature is sized to
    exactly b*r hashes — state the recall you need, not the band
    count. The default keeps the shipped 32-hash / 8-band dial, and a
    target whose plan lands on 8 bands is pinned output-identical to
    it in tests. Index build and probe MUST share the same plan; pass
    the same (threshold, target_recall, rows_per_band) to both."""
    if target_recall is None:
        return 32, 8
    b = planned_minhash_bands_for_recall(threshold, target_recall, rows_per_band)
    return b * rows_per_band, b


def build_band_index(
    docs: DataFrame,
    threshold: float = 0.6,
    target_recall: float | None = None,
    rows_per_band: int = 4,
) -> DataFrame:
    """Corpus-side index: (doc_id, signature, sh_set). Written once to
    parquet at corpus build; the text column never travels further.
    With ``target_recall`` the signature width is planner-chosen (see
    ``_ingest_plan``) — the index bakes in the recall floor."""
    num_hashes, _ = _ingest_plan(threshold, target_recall, rows_per_band)
    return rowwise_minhash_signatures(
        docs, n=3, num_hashes=num_hashes, include_shingles=True
    )


def streaming_dedup_probe(
    new_docs: DataFrame,
    index: DataFrame,
    threshold: float = 0.6,
    target_recall: float | None = None,
    rows_per_band: int = 4,
) -> DataFrame:
    """Probe a (possibly streaming) document batch against the stored
    index. Returns verified near-duplicate pairs
    (doc_new, doc_old, jaccard) with exact Jaccard >= threshold.
    ``target_recall`` selects the planner-driven (b, r) — it must match
    the value the index was built with (``_ingest_plan``).

    Works identically on a batch or streaming ``new_docs`` — the whole
    chain is projections + one stream-static equi-join + one static
    join to the old shingle sets, so stream == batch equality holds
    bit-for-bit (pinned in tests/test_streaming.py)."""
    num_hashes, num_bands = _ingest_plan(threshold, target_recall, rows_per_band)
    new_t = rowwise_minhash_signatures(
        new_docs, n=3, num_hashes=num_hashes, include_shingles=True
    )
    cands = portable_band_candidates_between(
        new_t.select("doc_id", "signature", F.col("sh_set").alias("set_new")),
        index.select("doc_id", "signature"),
        num_bands=num_bands,
        rows_per_band=rows_per_band,
        carry_new=("set_new",),
    )
    return (
        cands.join(
            index.select(
                F.col("doc_id").alias("doc_old"), F.col("sh_set").alias("set_old")
            ),
            "doc_old",
        )
        .select(
            "doc_new",
            "doc_old",
            F.size("set_new").alias("n_new"),
            F.size("set_old").alias("n_old"),
            F.size(F.array_intersect("set_new", "set_old")).alias("n_shared"),
        )
        .withColumn(
            "jaccard", F.col("n_shared") / (F.col("n_new") + F.col("n_old") - F.col("n_shared"))
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_new", "doc_old", F.round("jaccard", 6).alias("jaccard"))
    )
