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


def _plane_signs(n_planes: int, max_dims: int) -> list[list[float]]:
    """Deterministic +-1 plane matrix, one row per vector dimension.

    splitmix64-style integer mix of (dim, plane) — seeded, identical on
    every executor, no RNG state to ship.
    """
    rows = []
    for d in range(max_dims):
        row = []
        for p in range(n_planes):
            z = (d * 0x9E3779B97F4A7C15 + p * 0xBF58476D1CE4E5B9 + 1) & (2**64 - 1)
            z ^= z >> 31
            z = (z * 0x94D049BB133111EB) & (2**64 - 1)
            z ^= z >> 29
            row.append(1.0 if z & 1 else -1.0)
        rows.append(row)
    return rows


def _projection_sums(vec, n_planes: int, max_dims: int = 96):
    """Array of n_planes signed projections of ``vec``, in ONE fold:
    each element contributes x_i * signs_i (literal +-1 plane matrix)
    to an n_planes-wide running-sum array. One aggregate expression
    instead of n_planes separate folds — the plan stays small and
    whole-stage-codegen-friendly."""
    planes = F.expr(
        "array("
        + ",".join(
            "array(" + ",".join(f"{s}D" for s in row) + ")"
            for row in _plane_signs(n_planes, max_dims)
        )
        + ")"
    )
    prods = F.zip_with(
        vec,
        F.slice(planes, 1, F.size(vec)),
        lambda x, ps: F.transform(ps, lambda s: s * x),
    )
    return F.aggregate(
        prods,
        F.array_repeat(F.lit(0.0), n_planes),
        lambda acc, v: F.zip_with(acc, v, lambda a, b: a + b),
    )


def _sign_bits(sums, offset: int, n_bits: int):
    """Pack sign bits ``offset .. offset+n_bits-1`` of a projection-sum
    array into a bigint (n_bits <= 63)."""
    powers = F.expr("array(" + ",".join(f"{2**p}L" for p in range(n_bits)) + ")")
    return F.aggregate(
        F.zip_with(
            F.slice(sums, offset + 1, n_bits),
            powers,
            lambda s, pw: F.when(s > 0, pw).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def hyperplane_signature(
    df: DataFrame,
    n_planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_dims: int = 96,
) -> DataFrame:
    """Sign-of-projection LSH signature (one bit per pseudo-random plane,
    n_planes <= 63), packed into one bigint."""
    sums = _projection_sums(F.col(vec_col), n_planes, max_dims)
    return df.select(
        F.col(id_col).alias("vec_id"), _sign_bits(sums, 0, n_planes).alias("lsh_sig")
    )


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
    an equi-join that scales linearly (IVF-style candidate pruning).

    The signature is computed over the QUANTIZED vector: projections of
    integers against the ±1 plane literal are integer-valued doubles —
    order-independent, so buckets (and hence the whole result) are
    engine-exact and oracle-checkable, not just statistically similar.
    """
    mask = (1 << prefix_bits) - 1
    qv = queries.select(F.col(id_col).alias("query_id"), _quantize(F.col(vec_col)).alias("qv"))
    cv = candidates.select(F.col(id_col).alias("cand_id"), _quantize(F.col(vec_col)).alias("cv"))
    qs = hyperplane_signature(qv, n_planes, "query_id", "qv").select(
        F.col("vec_id").alias("query_id"), (F.col("lsh_sig").bitwiseAND(F.lit(mask))).alias("bucket")
    )
    cs = hyperplane_signature(cv, n_planes, "cand_id", "cv").select(
        F.col("vec_id").alias("cand_id"), (F.col("lsh_sig").bitwiseAND(F.lit(mask))).alias("bucket")
    )
    cand_pairs = qs.join(cs, "bucket").where(F.col("query_id") != F.col("cand_id"))
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


def cosine_near_dup_pairs(
    vecs: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: every (id_a < id_b)
    pair with cosine >= threshold.

    Expects integer-quantized vectors (see ``QUANT``) so the dot products
    are order-independent and engine-exact. This is the all-pairs oracle
    baseline — O(n^2) by definition; the linear-scaling discovery path is
    ``banded_near_dup_pairs`` (same verified output on near-dup-heavy
    corpora, recall pinned in tests).
    """
    a = vecs.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = vecs.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    cosine = _dot(F.col("va"), F.col("vb")) / (
        F.sqrt(_dot(F.col("va"), F.col("va")).cast("double"))
        * F.sqrt(_dot(F.col("vb"), F.col("vb")).cast("double"))
    )
    return (
        pairs.select("id_a", "id_b", cosine.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def banded_near_dup_pairs(
    vecs: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 32,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Embedding near-dup discovery at scale: random-hyperplane signature
    -> banded bucket self-join (candidates collide on >= 1 band) -> exact
    cosine verification of candidates only.

    The MinHash-LSH shape (operators/dedup.py) applied to the cosine
    metric: discovery cost is linear in corpus size, precision is exact
    (every emitted pair re-scored), recall is the banding probability
    (1-(1-p^r)^b, p = 1 - theta/pi) — pinned vs the exact baseline in
    tests/test_dedup_similarity.py. Band width r = n_planes/n_bands
    controls the random-collision rate (~pairs/2^r per band): 8-bit
    bands keep the verify set ~16x smaller than 4-bit bands at the same
    recall for high-cosine duplicates.
    """
    bits_per_band = n_planes // n_bands
    # materialize the projection fold once, THEN slice bands off it —
    # embedding it in each band struct would re-run the fold per band.
    # The vector rides along so verification needs no second corpus scan.
    bands = (
        vecs.select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("v"),
            # each vector's norm computed ONCE here — recomputing the
            # two self-dots per collision row would triple the per-pair
            # arithmetic in the hot verify loop
            F.sqrt(
                _dot(F.col(vec_col), F.col(vec_col)).cast("double")
            ).alias("norm"),
            _projection_sums(F.col(vec_col), n_planes).alias("sums"),
        )
        .select(
            "vec_id",
            "v",
            "norm",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            _sign_bits(
                                F.col("sums"), b * bits_per_band, bits_per_band
                            ).alias("slice"),
                        )
                        for b in range(n_bands)
                    ]
                )
            ).alias("bb"),
        )
        .select("vec_id", "v", "norm", "bb.band", "bb.slice")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cosine = _dot(F.col("a.v"), F.col("b.v")) / (
        F.col("a.norm") * F.col("b.norm")
    )
    # score at candidate discovery (cosine is identical on every band a
    # pair collides in, so distinct() after scoring dedups exactly)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            cosine.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
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
