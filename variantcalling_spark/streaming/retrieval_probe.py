"""Retrieval-at-ingest: a QUERY stream probing a static BM25 index.

The RAG-serving sibling of the ingest-dedup faces (MinHash
`ingest_dedup`, cosine `semantic_ingest`, winnowing
`winnowing_ingest` probe with DOCUMENTS; this face probes with
QUERIES): the corpus is scanned once at index-build time into three
small relations — postings (term, doc, tf), document lengths, and the
corpus stats scalar — and each arriving query batch then costs
O(|batch terms| + matched postings):

- build time: ``build_bm25_index`` folds the corpus to
  (postings, doclen, stats) parquet-ready frames; the text column
  never travels further.
- query time: the query stream EXPLODES its term array (stateless
  projection), equi-joins the postings on term (stream-static; the
  static side re-plans per micro-batch, so a refreshed index lands
  without a stream restart), and folds per-(query, doc) BM25 partial
  scores in a streaming aggregation — Structured Streaming's standard
  keyed-state sum, 'update' output mode emitting refreshed scores as
  late term matches arrive.

Same-formula contract: the per-(doc, term) score expression is
byte-identical to ``queries/text.py::_bm25_doc_scores`` (k1=1.2,
b=0.75, the q116/q530 scoring subtree), with per-term partials
DECIMAL-cast so the doc-level sum is term-order independent — which is
exactly what makes stream == batch equality bit-for-bit instead of
approximate (pinned in tests/test_streaming.py).

Scale shape: the stream side never shuffles the corpus — postings are
term-bucketed and join on the exploded query terms; the only stateful
piece is the (query_id, doc_id) running-sum state, bounded by matched
postings per in-flight query, evictable by watermark in a deployment
that bounds query lifetime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_bm25_index(docs: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """One corpus scan -> (postings, doclen, stats).

    postings: (w, doc_id, tf) for EVERY term (the full inverted index
    — unlike q116's pushed-down four-term probe, an index serves
    arbitrary future queries); doclen: (doc_id, dl); stats: one row
    (n_docs, avgdl)."""
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    postings = toks.groupBy("w", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    doclen = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("int").alias("dl")
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size(F.split("text", " ")).cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    return postings, doclen, stats


def streaming_bm25_probe(
    queries: DataFrame,
    postings: DataFrame,
    doclen: DataFrame,
    stats: DataFrame,
) -> DataFrame:
    """Score a (possibly streaming) batch of queries
    (query_id, terms array<string>) against the static index. Returns
    (query_id, doc_id, n_terms, score) — one row per (query, matched
    doc), score = the q116 BM25 sum over the query's matched terms.

    Works identically on a batch or streaming ``queries`` frame: the
    chain is explode -> stream-static joins -> one keyed aggregation,
    so stream == batch holds bit-for-bit (DECIMAL partials)."""
    qt = queries.select(
        "query_id", F.explode("terms").alias("w")
    ).dropDuplicates(["query_id", "w"])
    df_per_term = postings.groupBy("w").agg(
        F.count(F.lit(1)).alias("df")
    )
    scored = (
        qt.join(postings, "w")
        .join(F.broadcast(df_per_term), "w")
        .join(doclen, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "query_id",
            "doc_id",
            (
                F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
                * (F.col("tf") * 2.2)
                / (
                    F.col("tf")
                    + 1.2 * (0.25 + 0.75 * F.col("dl") / F.col("avgdl"))
                )
            )
            .cast("decimal(18,12)")
            .alias("s"),
        )
    )
    return scored.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_terms"),
        F.round(F.sum("s").cast("double"), 6).alias("score"),
    )


from variantcalling_spark._serde import register_module_by_value

register_module_by_value(__name__)
