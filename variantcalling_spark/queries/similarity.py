"""Similarity-search queries over the embeddings table (array<float>)."""

from __future__ import annotations

from pyspark.sql import functions as F

from variantcalling_spark.operators.similarity import QUANT, cosine_topk, lsh_cosine_topk
from variantcalling_spark.queries import query
from variantcalling_spark.sources import load_table


@query(
    "q68_cosine_topk",
    oracle=f"""
WITH q AS (
  SELECT vec_id AS query_id,
         list_transform(embedding, x -> CAST(ROUND(x * {QUANT}) AS BIGINT)) AS qv
  FROM embeddings WHERE vec_id < 5
),
c AS (
  SELECT vec_id AS cand_id,
         list_transform(embedding, x -> CAST(ROUND(x * {QUANT}) AS BIGINT)) AS cv
  FROM embeddings
),
scored AS (
  SELECT query_id, cand_id,
         list_dot_product(qv, cv)
           / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))) AS cosine
  FROM q, c WHERE query_id <> cand_id
)
SELECT query_id, cand_id, cosine, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, cand_id) AS INT) AS rank
  FROM scored
) WHERE rank <= 3
""",
)
def q68_cosine_topk(spark, sf_dir):
    """Brute-force exact cosine top-k over the embedding column.

    The ANN baseline: broadcast the query set, score all candidates with
    integer-quantized dot products (order-independent => engine-exact),
    rank per query with id tie-break. The candidate table never shuffles.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return cosine_topk(queries, emb, k=3)


@query("q69_lsh_ann", oracle=None)
def q69_lsh_ann(spark, sf_dir):
    """Approximate cosine top-k via random-hyperplane LSH bucketing +
    exact rerank within buckets — the linear-scaling ANN path (recall
    vs the exact baseline measured in tests/test_dedup_similarity.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    return lsh_cosine_topk(queries, emb, k=3, n_planes=16, prefix_bits=6)


@query("q71_ivf_ann", oracle=None)
def q71_ivf_ann(spark, sf_dir):
    """IVF approximate nearest neighbors: Spark ML KMeans coarse
    quantizer -> cell assignment -> nprobe-cell exact cosine rerank.
    The classic disk-friendly ANN layout (cells are partition-prunable
    at 100 TB). Iterative KMeans training is non-SQL -> weak check;
    recall vs the exact baseline is pinned in tests."""
    from variantcalling_spark.operators.similarity import ivf_cosine_topk, ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    centroids, indexed = ivf_index(emb, n_centroids=8)
    queries = emb.where(F.col("vec_id") < 5)
    return ivf_cosine_topk(queries, indexed, centroids, k=3, nprobe=3)
