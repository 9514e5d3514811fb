"""Similarity search over embedding columns (array<float>).

Brute-force exact cosine top-k as the baseline; random-hyperplane LSH
bucketing as the scale path (candidate discovery linear in corpus size,
exact rerank only within buckets).

Exactness convention: embeddings are quantized to integers
(round(x * QUANT)) before the dot product, making every sum
order-independent (products stay far below 2^53) — the same cross-engine
determinism trick the DECIMAL aggregates use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

QUANT = 100_000


def _quantize(col):
    return F.transform(col, lambda x: F.round(x * QUANT).cast("bigint"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest candidates.

    Broadcast the (small) query set against the full candidate table:
    the candidate scan never shuffles; ranking shuffles only
    (n_queries x n_candidates) scored pairs. Deterministic: integer dot
    products, id tie-break.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _quantize(F.col(vec_col)).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).alias("cand_id"), _quantize(F.col(vec_col)).alias("cv")
    )
    pairs = c.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("cand_id"))
    scored = pairs.select(
        "query_id",
        "cand_id",
        (
            _dot(F.col("qv"), F.col("cv"))
            / (
                F.sqrt(_dot(F.col("qv"), F.col("qv")).cast("double"))
                * F.sqrt(_dot(F.col("cv"), F.col("cv")).cast("double"))
            )
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def hyperplane_signature(
    df: DataFrame,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-of-projection LSH signature (one bit per pseudo-random plane).

    Plane components are deterministic +-1 derived from xxhash64(plane,
    dim-index): cosine-similar vectors agree on most signs. No stored
    plane matrix — the "randomness" is recomputed from the hash, so the
    operator ships nothing to executors.
    """
    dims = F.sequence(F.lit(0), F.size(F.col(vec_col)) - 1)
    bit = lambda p: (  # noqa: E731
        F.when(
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.transform(
                        dims,
                        lambda i: F.when(
                            F.xxhash64(F.lit(p), i).bitwiseAND(F.lit(1)) == 1, 1.0
                        ).otherwise(-1.0),
                    ),
                    lambda x, s: x * s,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            > 0,
            F.lit(2**p).cast("bigint"),
        ).otherwise(F.lit(0).cast("bigint"))
    )
    sig = None
    for p in range(n_planes):
        sig = bit(p) if sig is None else sig + bit(p)
    return df.select(F.col(id_col).alias("vec_id"), sig.alias("lsh_sig"))


def lsh_cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 3,
    n_planes: int = 16,
    prefix_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: bucket by LSH signature prefix, exact
    rerank within buckets. Recall < 1 by construction; the bucket join is
    an equi-join that scales linearly (IVF-style candidate pruning)."""
    mask = (1 << prefix_bits) - 1
    qs = hyperplane_signature(queries, n_planes, id_col, vec_col).select(
        F.col("vec_id").alias("query_id"), (F.col("lsh_sig").bitwiseAND(F.lit(mask))).alias("bucket")
    )
    cs = hyperplane_signature(candidates, n_planes, id_col, vec_col).select(
        F.col("vec_id").alias("cand_id"), (F.col("lsh_sig").bitwiseAND(F.lit(mask))).alias("bucket")
    )
    cand_pairs = qs.join(cs, "bucket").where(F.col("query_id") != F.col("cand_id"))
    qv = queries.select(F.col(id_col).alias("query_id"), _quantize(F.col(vec_col)).alias("qv"))
    cv = candidates.select(F.col(id_col).alias("cand_id"), _quantize(F.col(vec_col)).alias("cv"))
    scored = (
        cand_pairs.join(F.broadcast(qv), "query_id")
        .join(cv, "cand_id")
        .select(
            "query_id",
            "cand_id",
            (
                _dot(F.col("qv"), F.col("cv"))
                / (
                    F.sqrt(_dot(F.col("qv"), F.col("qv")).cast("double"))
                    * F.sqrt(_dot(F.col("cv"), F.col("cv")).cast("double"))
                )
            ).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def ivf_index(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
):
    """Build an IVF (inverted-file) index: KMeans coarse quantizer +
    per-vector cell assignment.

    Returns (centroids_df, assigned_df). ``centroids_df`` is tiny
    (n_centroids rows — always broadcast); ``assigned_df`` is the corpus
    with a ``centroid_id`` cell key, the partition-pruning key for
    searches. Training is Spark ML KMeans (distributed, seeded).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    vecs = emb.select(
        F.col(id_col).alias("__id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_centroids, seed=seed, maxIter=20).fit(vecs)
    assigned = model.transform(vecs).select(
        F.col("__id").alias(id_col), F.col("prediction").alias("centroid_id")
    )
    spark = emb.sparkSession
    centroids_df = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "centroid_id int, centroid array<double>",
    )
    return centroids_df, emb.join(assigned, id_col)


def ivf_cosine_topk(
    queries: DataFrame,
    indexed: DataFrame,
    centroids_df: DataFrame,
    k: int = 3,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: route each query to its ``nprobe`` nearest centroids,
    exact cosine only within those cells, top-k per query.

    Scale shape: the centroid table broadcasts; the candidate side is
    filtered by ``centroid_id`` BEFORE any scoring (cell pruning) — cost
    is |queries| x (corpus / n_centroids) x nprobe instead of
    |queries| x corpus. Recall vs the exact baseline is tunable with
    nprobe (pinned in tests).
    """
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    q_cells = (
        qv.crossJoin(F.broadcast(centroids_df))
        .select(
            "query_id",
            "qv",
            "centroid_id",
            F.aggregate(
                F.zip_with(
                    F.col("qv"), F.col("centroid"), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("dist2"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy("dist2", "centroid_id")
            ),
        )
        .where(F.col("rk") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    cands = indexed.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        "centroid_id",
    )
    pairs = cands.join(F.broadcast(q_cells), "centroid_id").where(
        F.col("query_id") != F.col("cand_id")
    )
    scored = pairs.select(
        "query_id",
        "cand_id",
        (
            dot(F.col("qv"), F.col("cv"))
            / (
                F.sqrt(dot(F.col("qv"), F.col("qv")))
                * F.sqrt(dot(F.col("cv"), F.col("cv")))
            )
        ).alias("cosine"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )
