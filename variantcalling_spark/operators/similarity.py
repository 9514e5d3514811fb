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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from variantcalling_spark._persist import lineage_cut, managed_persist

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
        _cosine_arrow()(F.col("qv"), F.col("cv")).alias("cosine"),
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


def _int_matrix(vals, idx) -> "np.ndarray":
    """Stack equal-length quantized vectors into an int64 matrix.

    The module contract is integer-quantized vectors (``QUANT``): a
    silent ``astype(int64)`` on float embeddings would truncate toward
    zero and produce wrong cosines with no warning, so floating inputs
    are rejected loudly instead — quantize upstream first.
    """
    mat = np.vstack([np.asarray(vals[i]) for i in idx])
    if mat.dtype.kind == "f":
        raise TypeError(
            "similarity kernels expect integer-quantized vectors (QUANT); "
            f"got floating dtype {mat.dtype} — quantize embeddings upstream"
        )
    return mat.astype(np.int64, copy=False)


def _projection_sums_arrow(n_planes: int, max_dims: int = 96):
    """Arrow-vectorized twin of ``_projection_sums``: one numpy int64
    matmul per batch instead of an interpreted O(dims x n_planes)
    expression fold per row.

    Bit-identical to the fold: inputs are quantized integers and the
    plane matrix is +-1, so every partial sum is an integer far below
    2^53 — int64 matmul followed by a float64 cast reproduces the
    fold's double values exactly (pinned in tests). This is the hot
    signature stage of the LSH paths; the sign-bit packing that follows
    stays a (cheap, O(n_planes)) codegen expression.
    """
    from pyspark.sql.functions import pandas_udf

    planes = np.asarray(_plane_signs(n_planes, max_dims), dtype=np.int64)

    @pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        vals = v.to_numpy()
        n = len(vals)
        out = np.empty(n, dtype=object)
        if n == 0:
            return pd.Series(out)
        lens = np.fromiter(
            (len(x) if x is not None else -1 for x in vals), dtype=np.int64, count=n
        )
        for length in np.unique(lens):
            idx = np.nonzero(lens == length)[0]
            if length < 0 or length > planes.shape[0]:
                continue  # null / over-max_dims vectors stay null (fold parity)
            if length == 0:
                zero = np.zeros(n_planes, dtype=np.float64)
                for i in idx:
                    out[i] = zero
                continue
            mat = _int_matrix(vals, idx)
            sums = (mat @ planes[:length]).astype(np.float64)
            for j, i in enumerate(idx):
                out[i] = sums[j]
        return pd.Series(out)

    return proj


def _band_slices_arrow(n_planes: int, n_bands: int, max_dims: int = 96):
    """Arrow-vectorized signature + band packing in one pass: project the
    quantized vector onto ``n_planes`` hyperplanes (int64 matmul) and
    pack the sign bits into ``n_bands`` bigint band slices. Equivalent to
    ``_sign_bits`` over ``_projection_sums`` (strict ``> 0`` sign, LSB =
    first plane of the band) but one numpy pass per batch instead of an
    interpreted fold per row per band."""
    from pyspark.sql.functions import pandas_udf

    planes = np.asarray(_plane_signs(n_planes, max_dims), dtype=np.int64)
    bits_per_band = n_planes // n_bands
    powers = (1 << np.arange(bits_per_band, dtype=np.int64))

    @pandas_udf("array<bigint>")
    def slices(v: pd.Series) -> pd.Series:
        vals = v.to_numpy()
        n = len(vals)
        out = np.empty(n, dtype=object)
        if n == 0:
            return pd.Series(out)
        lens = np.fromiter(
            (len(x) if x is not None else -1 for x in vals), dtype=np.int64, count=n
        )
        for length in np.unique(lens):
            idx = np.nonzero(lens == length)[0]
            if length < 0 or length > planes.shape[0]:
                continue  # null / over-max_dims vectors stay null (fold parity)
            if length == 0:
                zero = np.zeros(n_bands, dtype=np.int64)
                for i in idx:
                    out[i] = zero
                continue
            mat = _int_matrix(vals, idx)
            bits = (mat @ planes[:length]) > 0  # rows x n_planes
            packed = bits.reshape(len(idx), n_bands, bits_per_band) @ powers
            for j, i in enumerate(idx):
                out[i] = packed[j]
        return pd.Series(out)

    return slices


def _cosine_arrow():
    """Arrow-vectorized exact cosine between two quantized int64 vectors.

    Bit-identical to ``_dot(a,b) / (sqrt(_dot(a,a)) * sqrt(_dot(b,b)))``:
    int64 dot products are exact (|x| <= ~2e6, dims <= 96 keeps products
    far below 2^63 and the value below 2^53), and the float64 division
    matches Spark's bigint->double semantics.

    Zero-norm contract: a zero-norm vector (all dims quantize to 0)
    yields SQL NULL, not NaN — 0/0 produces NaN in the numpy buffer and
    the ``Float64`` conversion masks it to NA. NULL sorts LAST in desc
    ordering where the expression fold's NaN sorted FIRST; this is the
    intended behavior (a direction-less vector should never win top-k),
    and the testdata has no zero-norm embeddings post-quantization
    (asserted in tests), so oracle parity is unaffected."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        n = len(a)
        out = np.full(n, np.nan, dtype=np.float64)
        if n == 0:
            return pd.Series(out)
        av, bv = a.to_numpy(), b.to_numpy()
        # null or length-mismatched pairs stay null — the behavior of the
        # zip_with/aggregate fold this replaces (null-padded products
        # propagate to a NULL cosine)
        la = np.fromiter(
            (len(x) if x is not None else -1 for x in av), dtype=np.int64, count=n
        )
        lb = np.fromiter(
            (len(x) if x is not None else -1 for x in bv), dtype=np.int64, count=n
        )
        ok = (la == lb) & (la > 0)
        for length in np.unique(la[ok]):
            idx = np.nonzero(ok & (la == length))[0]
            x = _int_matrix(av, idx)
            y = _int_matrix(bv, idx)
            dot = np.einsum("ij,ij->i", x, y).astype(np.float64)
            nx = np.sqrt(np.einsum("ij,ij->i", x, x).astype(np.float64))
            ny = np.sqrt(np.einsum("ij,ij->i", y, y).astype(np.float64))
            out[idx] = dot / (nx * ny)
        res = pd.Series(pd.array(out, dtype="Float64"))
        res[~ok] = pd.NA  # real NULLs, not NaN (NaN sorts above all doubles)
        return res

    return cos


def _cosine_prenorm_arrow():
    """Like ``_cosine_arrow`` but with both norms precomputed upstream
    (the banded verify loop computes each vector's norm once, not per
    collision pair)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series, na: pd.Series, nb: pd.Series) -> pd.Series:
        n = len(a)
        out = np.full(n, np.nan, dtype=np.float64)
        if n == 0:
            return pd.Series(out)
        av, bv = a.to_numpy(), b.to_numpy()
        nav = na.to_numpy(dtype=np.float64, na_value=np.nan)
        nbv = nb.to_numpy(dtype=np.float64, na_value=np.nan)
        la = np.fromiter(
            (len(x) if x is not None else -1 for x in av), dtype=np.int64, count=n
        )
        lb = np.fromiter(
            (len(x) if x is not None else -1 for x in bv), dtype=np.int64, count=n
        )
        ok = (la == lb) & (la > 0)
        for length in np.unique(la[ok]):
            idx = np.nonzero(ok & (la == length))[0]
            x = _int_matrix(av, idx)
            y = _int_matrix(bv, idx)
            dot = np.einsum("ij,ij->i", x, y).astype(np.float64)
            out[idx] = dot / (nav[idx] * nbv[idx])
        res = pd.Series(pd.array(out, dtype="Float64"))
        res[~ok] = pd.NA  # real NULLs, not NaN (NaN sorts above all doubles)
        return res

    return cos


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
    sums = _projection_sums_arrow(n_planes, max_dims)(F.col(vec_col))
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
    qv = queries.select(F.col(id_col).alias("query_id"), _quantize(F.col(vec_col)).alias("qv"))
    cv = candidates.select(F.col(id_col).alias("cand_id"), _quantize(F.col(vec_col)).alias("cv"))
    # the bucket key is the low ``prefix_bits`` sign bits of the
    # signature; plane p's signs are independent of n_planes (the
    # splitmix mix is per (dim, plane)), so only those planes need
    # computing — exactly what the DuckDB oracle does
    bucket = _band_slices_arrow(prefix_bits, 1)
    qs = qv.select("query_id", F.element_at(bucket(F.col("qv")), 1).alias("bucket"))
    cs = cv.select("cand_id", F.element_at(bucket(F.col("cv")), 1).alias("bucket"))
    cand_pairs = qs.join(cs, "bucket").where(F.col("query_id") != F.col("cand_id"))
    scored = (
        cand_pairs.join(F.broadcast(qv), "query_id")
        .join(cv, "cand_id")
        .select(
            "query_id",
            "cand_id",
            _cosine_arrow()(F.col("qv"), F.col("cv")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def multiband_cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    n_bands: int = 12,
    band_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-band (OR-amplified) LSH ANN: candidates collide with the
    query in ANY of ``n_bands`` independent ``band_bits``-bit sign
    bands; the union is deduped and exactly re-ranked. The standard
    recall dial ``lsh_cosine_topk``'s single prefix bucket lacks —
    P(candidate) = 1 − (1 − p^r)^b instead of p^r — added in r7 after
    the q217 harness measured the single-band path at recall@10 ≈ 0.07
    on sf0.1 (near-random neighborhoods; SCALE.md records the curve).

    Scale shape: band keys are one Arrow pass over quantized vectors;
    each band joins as an equi-join on (band_ix, key); the dedup is one
    shuffle over collision pairs (expected |queries| x corpus x
    (1-(1-2^-r)^b) rows); re-ranking broadcasts only the bounded query
    side. Engine-exact (integer projections, full tie-breaks).
    """
    n_planes = n_bands * band_bits
    qv = queries.select(
        F.col(id_col).alias("query_id"), _quantize(F.col(vec_col)).alias("qv")
    )
    cv = candidates.select(
        F.col(id_col).alias("cand_id"), _quantize(F.col(vec_col)).alias("cv")
    )
    sl = _band_slices_arrow(n_planes, n_bands)
    qs = qv.select(
        "query_id", F.posexplode(sl(F.col("qv"))).alias("band_ix", "key")
    )
    cs = cv.select(
        "cand_id", F.posexplode(sl(F.col("cv"))).alias("band_ix", "key")
    )
    cand = (
        qs.join(cs, ["band_ix", "key"])
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "cand_id")
        .select(
            "query_id",
            "cand_id",
            _cosine_arrow()(F.col("qv"), F.col("cv")).alias("cosine"),
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
    return (
        pairs.select(
            "id_a",
            "id_b",
            _cosine_arrow()(F.col("va"), F.col("vb")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def semantic_band_index(
    vecs: DataFrame,
    n_planes: int = 32,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """Hyperplane-band signature INDEX over quantized vectors:
    (vec_id, v, norm, slices) — the stored artifact under
    ``banded_near_dup_pairs`` (self-join face) and
    ``semantic_band_probe_between`` (incremental-ingest face). At
    corpus build this relation is written to parquet once (signatures
    + the vector for verify); each ingested batch then probes it
    without re-touching the corpus."""
    return vecs.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("v"),
        F.sqrt(
            _dot(F.col(vec_col), F.col(vec_col)).cast("double")
        ).alias("norm"),
        _band_slices_arrow(n_planes, n_bands)(F.col(vec_col)).alias("slices"),
    )


def semantic_band_probe_between(
    new_sig: DataFrame, old_sig: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Asymmetric semantic near-dup probe: a NEW batch's signatures
    against a stored corpus index (both from ``semantic_band_index``)
    — the q122 incremental-ingest shape on the COSINE metric. Each
    (new, old) candidate is emitted from its first colliding band only
    (the carried-slice-array filter of ``banded_near_dup_pairs``), then
    exact-cosine verified. Cost per ingest: O(|batch| + collisions);
    the corpus vectors are only read through the stored index.
    Returns (vec_new, vec_old, cosine). New x new pairs are out of
    scope (run the self-join face on the batch for those)."""
    n = new_sig.select(
        F.col("vec_id").alias("vec_new"),
        F.col("v").alias("vn"),
        F.col("norm").alias("norm_n"),
        F.col("slices").alias("slices_n"),
        F.posexplode("slices").alias("band", "slice"),
    ).alias("n")
    o = old_sig.select(
        F.col("vec_id").alias("vec_old"),
        F.col("v").alias("vo"),
        F.col("norm").alias("norm_o"),
        F.col("slices").alias("slices_o"),
        F.posexplode("slices").alias("band", "slice"),
    ).alias("o")
    first_collision = F.forall(
        F.zip_with(
            F.slice(F.col("n.slices_n"), 1, F.col("n.band")),
            F.slice(F.col("o.slices_o"), 1, F.col("o.band")),
            lambda x, y: x != y,
        ),
        lambda differs: differs,
    )
    return (
        n.join(
            o,
            (F.col("n.band") == F.col("o.band"))
            & (F.col("n.slice") == F.col("o.slice")),
        )
        .where(first_collision)
        .select(
            "vec_new",
            "vec_old",
            _cosine_prenorm_arrow()(
                F.col("n.vn"), F.col("o.vo"), F.col("n.norm_n"), F.col("o.norm_o")
            ).alias("cosine"),
        )
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
    # one Arrow pass computes the projection matmul AND packs all band
    # slices; the vector, its (once-computed) norm, and the full slice
    # array ride the explode so verification needs no second corpus scan.
    # The signature table is persisted BEFORE the self-join: both join
    # sides are the same subplan differing only by alias, and without
    # the persist each side re-runs the Arrow signature UDF over the
    # whole corpus (no ReusedExchange across a broadcast/shuffle split) —
    # one corpus-sized cache, half the signature compute, at any scale.
    sig = semantic_band_index(
        vecs, n_planes=n_planes, n_bands=n_bands, id_col=id_col, vec_col=vec_col
    ).transform(managed_persist)
    bands = sig.select(
        "vec_id",
        "v",
        "norm",
        "slices",
        F.posexplode("slices").alias("band", "slice"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    # A pair colliding in k bands would be discovered k times; keep only
    # the FIRST colliding band (all earlier band slices differ — a cheap
    # codegen filter over the carried slice arrays). Each surviving pair
    # is therefore unique BEFORE the Arrow cosine runs — no redundant
    # scoring, and no distinct() re-shuffle after — which is what keeps
    # the verify stage linear in |candidate pairs| at corpus scale.
    first_collision = F.forall(
        F.zip_with(
            F.slice(F.col("a.slices"), 1, F.col("a.band")),
            F.slice(F.col("b.slices"), 1, F.col("b.band")),
            lambda x, y: x != y,
        ),
        lambda differs: differs,
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .where(first_collision)
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            _cosine_prenorm_arrow()(
                F.col("a.v"), F.col("b.v"), F.col("a.norm"), F.col("b.norm")
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def adaptive_band_bits(n_rows: int, floor_bits: int = 8, extra_bits: int = 2) -> int:
    """The band-width scale rule made executable: ``bits = max(floor,
    ceil(log2 n) + extra)``.

    Random (non-duplicate) pairs collide in a band with probability
    ~1/2^bits, so the expected random-candidate count is ~n^2/2^bits per
    band. Setting bits ~ log2(n) + c pins that to ~n/2^c — the verify
    stage stays LINEAR in corpus size as the corpus grows, which is the
    whole point of banding. q74 fixes bits=8 (the small-corpus point,
    value-oracled); this rule is what a 100 TB deployment runs, where n
    is known from table statistics.
    """
    import math

    return max(floor_bits, math.ceil(math.log2(max(n_rows, 2))) + extra_bits)


def planned_bands_for_recall(
    threshold: float,
    target_recall: float,
    bits: int,
    max_bands: int = 16,
) -> int:
    """The q497 planner loop CLOSED for the hyperplane-banding family:
    pick the number of OR-ed bands needed so a true pair sitting AT
    ``threshold`` cosine is discovered with probability >=
    ``target_recall``, given ``bits`` sign-planes per band.

    Hyperplane LSH S-curve (Charikar 2002 SimHash bound, the cosine
    twin of q495's validated MinHash 1-(1-j^r)^b): one sign bit agrees
    with probability p = 1 - theta/pi, a band collides iff all its
    bits agree (p^bits), and b OR-ed bands discover with
    1 - (1-p^bits)^b. Solving for b:

        b = ceil( ln(1 - target) / ln(1 - p^bits) )

    Pairs ABOVE the threshold have strictly higher p, so the target is
    a floor over the whole true-pair set — the planner prices the
    WORST true pair, the same conservative stance as q497's grid
    (which maximizes predicted recall subject to an fp-rate cap).
    ``max_bands`` caps signature cost; hitting it means the requested
    (threshold, recall, bits) point needs narrower bands, not more of
    them — the caller sees the cap as an explicit ValueError rather
    than a silent recall shortfall.
    """
    import math

    if not (0.0 < target_recall < 1.0):
        raise ValueError("target_recall must be in (0, 1)")
    p = 1.0 - math.acos(max(-1.0, min(1.0, threshold))) / math.pi
    per_band = p**bits
    if per_band <= 0.0:
        raise ValueError("per-band collision probability underflowed; lower bits")
    b = max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - per_band)))
    if b > max_bands:
        raise ValueError(
            f"target recall {target_recall} at threshold {threshold} needs "
            f"{b} bands of {bits} bits (> max_bands={max_bands}); "
            "use fewer bits per band or relax the target"
        )
    return b


def plan_bits_and_bands(
    threshold: float,
    target_recall: float,
    n_rows: int,
    max_bands: int = 16,
    min_bits: int = 4,
) -> tuple[int, int]:
    """Joint (bits, bands) planning (r10 ADVICE): the adaptive band
    width grows as log2(n), so at large n the per-band collision
    probability p^bits collapses and NO band count <= ``max_bands``
    reaches the recall target — a planner that can only add bands
    raises for virtually any realistic target on a 1M+ corpus. This
    planner instead narrows the bands: start at
    ``adaptive_band_bits(n_rows)`` and shed one bit at a time until
    ``planned_bands_for_recall`` fits ``max_bands``.

    Narrower bands admit more random candidates (~n^2/2^bits per
    band), so narrowing happens ONLY as far as the recall floor
    demands — the candidate-cost increase is the explicit, minimal
    price of an aggressive (threshold, recall) point at scale, not a
    silent recall shortfall and not a hard error. ``min_bits`` bounds
    the verify-stage blowup; a point infeasible even there raises.
    Returns ``(bits, n_bands)``.
    """
    if not (0.0 < target_recall < 1.0):
        raise ValueError("target_recall must be in (0, 1)")
    bits = adaptive_band_bits(n_rows)
    while bits > min_bits:
        try:
            return bits, planned_bands_for_recall(
                threshold, target_recall, bits, max_bands
            )
        except ValueError:
            bits -= 1
    return min_bits, planned_bands_for_recall(
        threshold, target_recall, min_bits, max_bands
    )


def adaptive_banded_near_dup_pairs(
    vecs: DataFrame,
    threshold: float = 0.9,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "v",
    n_rows: int | None = None,
    target_recall: float | None = None,
) -> DataFrame:
    """``banded_near_dup_pairs`` with the band width chosen from the
    corpus size (``adaptive_band_bits``), the way AQE chooses shuffle
    partition counts from runtime statistics.

    ``n_rows`` defaults to a ``count()`` of ``vecs`` — one cheap
    columnar-scan action (count-star over parquet metadata / a cached
    relation; the corpus is persisted by every caller that self-joins
    it anyway). At warehouse scale the count comes free from table
    statistics. True duplicates still collide in every band regardless
    of width (their sign bits agree plane-by-plane), so widening bands
    with n preserves recall for the high-cosine pairs dedup targets
    while keeping the candidate set linear.

    ``target_recall`` switches on the PLANNER-DRIVEN mode (the q497
    loop closed): ``n_bands`` is ignored and chosen by
    ``planned_bands_for_recall`` so a true pair AT the threshold is
    discovered with at least that probability — the band count is set
    by the same S-curve the q495 harness validated empirically,
    instead of by folklore. The default (``None``) keeps the shipped
    4-band dial, and a target whose plan lands on 4 bands is pinned
    output-identical to the default in tests.
    """
    n = n_rows if n_rows is not None else vecs.count()
    if target_recall is not None:
        # joint (bits, bands) plan: keeps the adaptive width whenever the
        # recall-driven band count fits, narrows bands only when it must
        # (large n at an aggressive target) instead of raising
        bits, n_bands = plan_bits_and_bands(threshold, target_recall, n)
    else:
        bits = adaptive_band_bits(n)
    return banded_near_dup_pairs(
        vecs,
        threshold=threshold,
        n_planes=bits * n_bands,
        n_bands=n_bands,
        id_col=id_col,
        vec_col=vec_col,
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


def multiprobe_ivf_cosine_topk(
    queries: DataFrame,
    indexed: DataFrame,
    centroids_df: DataFrame,
    k: int = 3,
    max_probes: int = 8,
    margin: float = 0.25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search with MARGIN-ORDERED ADAPTIVE probing (the multi-probe
    idea of Lv et al., VLDB'07, applied to the coarse quantizer): a
    query near the MIDDLE of its Voronoi cell probes few cells; a query
    near a cell BOUNDARY — where the true neighbors spill into the
    adjacent cell — probes more. Probe set per query = centroids whose
    squared distance is within ``(1+margin)^2`` of the nearest
    centroid's, in increasing-distance (= increasing-margin) order,
    capped at ``max_probes``; the nearest cell is always probed.

    MEASURED VERDICT (q421, the r7 ROADMAP lead resolved by harness
    rather than by assertion): on the synthetic embeddings corpus the
    margin-ordered allocation does NOT beat uniform nprobe at matched
    average probes/query — recall@10 tracks the TOTAL probed-cell count
    almost linearly (fixed-4 0.6925 vs multiprobe-avg-3.8 0.6375 at 16
    cells; the 64-cell and floor+margin hybrids measured the same way,
    see SCALE.md r8). The operator is kept because the rule is the
    right shape for CLUSTERED corpora (boundary queries are where IVF
    recall loss concentrates when cells capture real structure) and
    the probe set is hard-capped either way — but per the q421 numbers,
    a uniform-nprobe default is the honest recommendation here.

    Scale shape identical to ``ivf_cosine_topk``: the centroid relation
    broadcasts (both windows below are per-query over <= n_centroids
    rows — bounded, never a global sort), candidate cells partition-
    prune BEFORE scoring, and the probe fan-out is data-dependent but
    hard-capped at ``max_probes``."""
    mfac = float((1.0 + margin) ** 2)
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    wq = W.partitionBy("query_id")
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
        .withColumn("d2min", F.min("dist2").over(wq))
        .withColumn(
            "rk",
            F.row_number().over(wq.orderBy("dist2", "centroid_id")),
        )
        .where(
            (F.col("rk") <= max_probes)
            & (
                (F.col("rk") == 1)
                | (F.col("dist2") <= F.col("d2min") * F.lit(mfac))
            )
        )
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


def knn_graph(
    vecs: DataFrame,
    k: int = 3,
    prefix_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus-wide kNN graph: EVERY vector's top-k cosine neighbors
    within its LSH bucket — the graph primitive under SemDeDup/D4-style
    semantic curation, graph-based filtering, and diversity sampling
    (``lsh_cosine_topk`` answers point queries; this builds the whole
    graph in one pass).

    No broadcast of the query side: the bucketed self-join carries the
    quantized vector and its once-computed norm on both aliases of ONE
    persisted relation, so cost is Σ bucket² pair scorings + a
    per-vector top-k window over tiny (bucket-bounded) partitions.
    ``prefix_bits`` is the same collision dial as the banded near-dup
    paths — production sizes it ~log2(n/target_bucket). Quantized
    integer projections keep buckets and cosines engine-exact, so the
    whole graph is value-oracle-checkable."""
    scored = bucketed_cosine_candidates(
        vecs, prefix_bits=prefix_bits, id_col=id_col, vec_col=vec_col
    )
    w = W.partitionBy("vec_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "cosine", "rank")
    )


def bucketed_cosine_candidates(
    vecs: DataFrame,
    prefix_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All in-bucket directed candidate pairs with exact cosine —
    (vec_id, neighbor_id, cosine) — the shared substrate under
    ``knn_graph`` and ``mutual_proximity_knn``. Symmetric by
    construction: the equi-join on bucket generates BOTH directions of
    every pair with bit-identical cosine (integer dot products commute),
    which is what lets mutual proximity read the reverse direction with
    a self-join instead of recomputation."""
    bucket = _band_slices_arrow(prefix_bits, 1)
    base = vecs.select(
        F.col(id_col).alias("vec_id"), _quantize(F.col(vec_col)).alias("v")
    )
    b = base.select(
        "vec_id",
        "v",
        F.element_at(bucket(F.col("v")), 1).alias("bucket"),
        F.sqrt(_dot(F.col("v"), F.col("v")).cast("double")).alias("norm"),
    ).transform(managed_persist)
    a, c = b.alias("a"), b.alias("c")
    return a.join(
        c,
        (F.col("a.bucket") == F.col("c.bucket"))
        & (F.col("a.vec_id") != F.col("c.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("c.vec_id").alias("neighbor_id"),
        _cosine_prenorm_arrow()(
            F.col("a.v"), F.col("c.v"), F.col("a.norm"), F.col("c.norm")
        ).alias("cosine"),
    )


def mutual_proximity_knn(
    vecs: DataFrame,
    k: int = 3,
    prefix_bits: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """HUBNESS-CORRECTED kNN graph via empirical MUTUAL PROXIMITY
    (Schnitzer et al., JMLR 2012): re-rank each vector's in-bucket
    candidates by ``MP(x,y) = P(cos(x,·) < cos(x,y)) * P(cos(y,·) <
    cos(y,x))`` — the probability, under each endpoint's OWN empirical
    similarity distribution, that a random candidate is farther away.
    A hub that is "close to everyone" has a tight distribution, so
    being close to a hub stops being informative and its inflated
    in-degree collapses (the q466-measured pathology: in-degree skew
    4+ on the raw graph).

    Spark shape — three window functions and one self-join, no new
    pair generation:
      1. candidates = the same Σ bucket² scored relation knn_graph
         uses (persisted once);
      2. per DIRECTED edge, the empirical CDF = rank-among-own-
         candidates: ``RANK() OVER (PARTITION BY vec_id ORDER BY
         cosine) - 1`` strictly-below count over ``n_cand`` (exact
         integers — ties share a rank, so the count is engine-exact);
      3. MP = product of the two directions' CDFs, read with an
         equi-join of the directed relation to itself reversed
         (both directions exist by construction);
      4. top-k per vector by (mp DESC, cosine DESC, neighbor_id).

    Output: (vec_id, neighbor_id, w, mp, rank) with ``w`` the same
    integer edge weight as ``knn_graph``'s oracle twin
    (round((1-cosine)*1e6)) so downstream graph ops swap substrates
    without changes."""
    scored = bucketed_cosine_candidates(
        vecs, prefix_bits=prefix_bits, id_col=id_col, vec_col=vec_col
    ).transform(managed_persist)
    # RANK with ties (no tiebreak column!) so rank-1 == strictly-below
    # count; n_cand via an unordered count window on the same partition
    directed = scored.select(
        "vec_id",
        "neighbor_id",
        "cosine",
        (
            F.rank().over(W.partitionBy("vec_id").orderBy("cosine")) - 1
        ).cast("bigint").alias("below"),
        F.count(F.lit(1))
        .over(W.partitionBy("vec_id"))
        .cast("bigint")
        .alias("n_cand"),
    )
    f, r = directed.alias("f"), directed.alias("r")
    mp_scored = f.join(
        r,
        (F.col("f.vec_id") == F.col("r.neighbor_id"))
        & (F.col("f.neighbor_id") == F.col("r.vec_id")),
    ).select(
        F.col("f.vec_id").alias("vec_id"),
        F.col("f.neighbor_id").alias("neighbor_id"),
        F.col("f.cosine").alias("cosine"),
        (
            (F.col("f.below").cast("double") / F.col("f.n_cand"))
            * (F.col("r.below").cast("double") / F.col("r.n_cand"))
        ).alias("mp"),
    )
    w = W.partitionBy("vec_id").orderBy(
        F.desc("mp"), F.desc("cosine"), "neighbor_id"
    )
    return (
        mp_scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select(
            "vec_id",
            "neighbor_id",
            F.round((F.lit(1.0) - F.col("cosine")) * 1000000)
            .cast("bigint")
            .alias("w"),
            F.round("mp", 6).alias("mp"),
            "rank",
        )
    )


from variantcalling_spark._serde import register_module_by_value

register_module_by_value(__name__)


def semantic_dedup_flags(
    indexed: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "v",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: within each coarse cluster
    (``centroid_id`` from ``ivf_index``), drop every vector whose cosine
    to a LOWER-id vector in the same cluster reaches ``threshold`` —
    deterministic keep-min-id, single pass, no iteration.

    Scale shape: candidate pairs are generated per cluster (an equi-join
    on ``centroid_id``), so cost is sum(cluster_size^2), not corpus^2 —
    the production recipe caps cluster sizes via the quantizer's k.
    Expects integer-quantized vectors (``QUANT``) so the verification
    cosines are engine-exact. Output: (vec_id, centroid_id, is_dropped).
    """
    a = indexed.select(
        F.col(id_col).alias("id_a"), F.col("centroid_id"), F.col(vec_col).alias("va")
    )
    b = indexed.select(
        F.col(id_col).alias("id_b"), F.col("centroid_id"), F.col(vec_col).alias("vb")
    )
    dropped = (
        a.join(b, "centroid_id")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_b",
            _cosine_arrow()(F.col("va"), F.col("vb")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("is_dropped", F.lit(True))
    )
    return (
        indexed.select(id_col, "centroid_id")
        .join(dropped, id_col, "left")
        .select(
            id_col,
            "centroid_id",
            F.coalesce("is_dropped", F.lit(False)).alias("is_dropped"),
        )
    )


def _unit(col):
    """Vector scaled to unit L2 norm (as array<double>): PQ codebooks and
    ADC run on the unit sphere so L2 order == cosine order (L2^2 =
    2 - 2cos on unit vectors) and recall is measured against the cosine
    baselines. Zero vectors pass through unscaled."""
    v = col.cast("array<double>")
    norm = F.sqrt(
        F.aggregate(v, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    # let-bind norm via a 1-element array: as transform's array argument
    # it evaluates ONCE; capturing the O(d) aggregate inside the inner
    # lambda would re-evaluate it per element (O(d^2) per vector) — the
    # split-materialization rule of operators/dedup.py applied to a
    # scalar that must stay inside one Column expression.
    return F.get(
        F.transform(
            F.array(norm),
            lambda nrm: F.transform(
                v, lambda x: F.when(nrm > 0, x / nrm).otherwise(x)
            ),
        ),
        0,
    )


def pq_index(
    emb: DataFrame,
    m: int = 4,
    k_sub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 5,
):
    """Product-quantization index (Jégou et al. 2011): split each vector
    into ``m`` subspaces, train a ``k_sub``-centroid KMeans codebook per
    subspace, encode every vector as ``m`` small codes.

    The memory-compression ANN path, complementary to IVF's cell pruning
    (`ivf_index`): a 64-dim float corpus (256 B/vec) encodes to m=4
    bytes/vec — at 10^9 documents the whole code table fits on a handful
    of executors and scans at memory bandwidth. Returns
    (codebooks_df, codes_df): codebooks is m x k_sub rows (always
    broadcast); codes is one row per vector with an array of m codes.

    Training is a single shared Lloyd's loop over ALL subspaces at once
    (unlike q71's per-index Spark ML fit): the working relation is
    (vec, subspace, subvector), assignment is one broadcast join +
    struct-MIN argmin, the centroid update is one per-(subspace, code,
    dim) DECIMAL-mean aggregate — so m codebooks cost the same number of
    distributed jobs as one, and every arithmetic step is
    order-independent (no Spark ML / BLAS version dependence; the only
    driver state per iteration is the m x k_sub centroid table).
    Deterministic init: per subspace, the subvectors of the k_sub
    smallest md5(vec_id) hashes. Empty clusters keep their previous
    centroid. Encoding assigns via the same broadcast join + argmin —
    the corpus never shuffles except by its own id to regroup codes."""
    d = len(emb.select(vec_col).head()[0])
    sub = d // m
    spark = emb.sparkSession

    parts = emb.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[F.slice(_unit(F.col(vec_col)), j * sub + 1, sub) for j in range(m)]
            )
        ).alias("subspace", "part"),
    ).transform(managed_persist)

    init_w = W.partitionBy("subspace").orderBy(
        F.md5(F.col(id_col).cast("string")), id_col
    )
    books = {
        (r.subspace, r.rk - 1): list(r.part)
        for r in parts.withColumn("rk", F.row_number().over(init_w))
        .where(F.col("rk") <= k_sub)
        .collect()
    }
    for _ in range(iters):
        cb = spark.createDataFrame(
            [(s, c, v) for (s, c), v in sorted(books.items())],
            "subspace int, code int, centroid array<double>",
        )
        d2 = F.aggregate(
            F.zip_with(
                F.col("part"), F.col("centroid"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        assign = (
            parts.join(F.broadcast(cb), "subspace")
            .groupBy(id_col, "subspace")
            .agg(
                F.min(F.struct(d2.alias("d2"), F.col("code")))["code"].alias("code"),
                F.first("part").alias("part"),
            )
        )
        means = (
            assign.select("subspace", "code", F.posexplode("part").alias("dim", "x"))
            .groupBy("subspace", "code", "dim")
            .agg(F.avg(F.col("x").cast("decimal(28,18)")).cast("double").alias("mx"))
            .groupBy("subspace", "code")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("dim", "mx"))),
                    lambda s: s["mx"],
                ).alias("centroid")
            )
        )
        updated = {(r.subspace, r.code): list(r.centroid) for r in means.collect()}
        books = {key: updated.get(key, old) for key, old in books.items()}

    codebooks = spark.createDataFrame(
        [(s, c, v) for (s, c), v in sorted(books.items())],
        "subspace int, code int, centroid array<double>",
    )
    dist2 = F.aggregate(
        F.zip_with(F.col("part"), F.col("centroid"), lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    assigned = (
        parts.join(F.broadcast(codebooks), "subspace")
        .select(id_col, "subspace", "code", dist2.alias("d2"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy(id_col, "subspace").orderBy("d2", "code")
            ),
        )
        .where(F.col("rk") == 1)
    )
    codes = assigned.groupBy(id_col).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("subspace", "code"))),
            lambda x: x["code"],
        ).alias("codes")
    )
    return codebooks, codes


def pq_adc_topk(
    queries: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    k: int = 3,
    m: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ search: per query, build the
    m x k_sub lookup table of exact subspace distances query->centroid,
    then every corpus vector's approximate distance is the SUM of m
    table lookups on its codes — no float vector is ever touched at scan
    time.

    Scale shape: the LUT is |queries| * m * k_sub rows (tiny — always
    broadcast); the corpus codes table is scanned once, joined map-side
    on (subspace, code), and aggregated by (query, vector) with
    map-side partial sums. Distances sum in DECIMAL so ranking is
    reproducible at any partition count. Top-k per query over |queries|
    x corpus scored rows with id tie-break."""
    d_header = queries.select(vec_col).head()[0]
    sub = len(d_header) // m
    qparts = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(
            F.array(
                *[F.slice(_unit(F.col(vec_col)), j * sub + 1, sub) for j in range(m)]
            )
        ).alias("subspace", "qpart"),
    )
    lut = qparts.join(F.broadcast(codebooks), "subspace").select(
        "query_id",
        "subspace",
        "code",
        F.aggregate(
            F.zip_with(F.col("qpart"), F.col("centroid"), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        .cast("decimal(24,12)")
        .alias("pd2"),
    )
    expanded = codes.select(
        F.col(id_col).alias("cand_id"),
        F.posexplode("codes").alias("subspace", "code"),
    )
    scored = (
        expanded.join(F.broadcast(lut), ["subspace", "code"])
        .where(F.col("query_id") != F.col("cand_id"))
        .groupBy("query_id", "cand_id")
        .agg(F.sum("pd2").cast("double").alias("adc_dist2"))
    )
    return (
        scored.withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy("adc_dist2", "cand_id")
            ),
        )
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", F.round("adc_dist2", 9).alias("adc_dist2"), "rank")
    )


def adaptive_knn_bits(n_rows: int, target_bucket: int = 9, floor_bits: int = 4) -> int:
    """Bucket-width rule for the kNN graph: prefix_bits ≈
    log2(n / target_bucket), clamped to ``floor_bits``. Expected bucket
    occupancy stays ~``target_bucket`` at ANY corpus size, so the
    in-bucket pair count (Σ bucket² ≈ n·target_bucket) grows LINEARLY
    with n — the fixed-bits graph (q132's oracle point) grows its pair
    count quadratically instead. target_bucket must exceed k (every
    vector needs k in-bucket neighbors to rank); 9 covers the k=3
    default three times over."""
    import math

    if n_rows <= target_bucket:
        return floor_bits
    return max(floor_bits, math.ceil(math.log2(n_rows / target_bucket)))


def adaptive_knn_graph(
    vecs: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
) -> DataFrame:
    """``knn_graph`` with the bucket dial on autopilot (the q129-for-q74
    pattern applied to the graph substrate): bits from
    ``adaptive_knn_bits`` over the corpus row count, so 10x the corpus
    means ~10x the pairs, not 100x. At sf0.01 (575 vectors) the rule
    lands on 6 bits — exactly q132's oracle configuration — so the
    adaptive path is value-proven at the driver's scale factor through
    the same SQL."""
    n = n_rows if n_rows is not None else vecs.count()
    return knn_graph(
        vecs, k=k, prefix_bits=adaptive_knn_bits(n), id_col=id_col, vec_col=vec_col
    )


def ivf_pq_rerank_topk(
    queries: DataFrame,
    emb: DataFrame,
    centroids_df: DataFrame,
    assigned: DataFrame,
    codes: DataFrame,
    codebooks: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    adc_pool: int = 50,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """THE PRODUCTION ANN PAIRING: IVF cell pruning for candidates, PQ
    asymmetric-distance for cheap in-cell ranking, EXACT cosine rerank
    of the small ADC pool (Jegou et al.'s IVFADC + rerank — the
    composition q478's harness readout calls for: PQ alone loses ~71%
    of exact neighbors at m=8, but as a POOL SELECTOR feeding an exact
    rerank its error only costs recall when the true neighbor falls
    out of the top-``adc_pool``).

    Scale shape at 10^9 vectors: centroids and the per-query LUT
    broadcast; the codes table is scanned cell-pruned (nprobe/n_cells
    of the corpus), ADC-scored with map-side DECIMAL partial sums, and
    only ``adc_pool`` full float vectors per query are ever touched
    (the rerank join is |queries| x adc_pool rows against the vector
    store — the only stage that reads floats)."""
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    q_cells = (
        qv.crossJoin(F.broadcast(centroids_df))
        .select(
            "query_id",
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
        .select("query_id", "centroid_id")
    )
    cand = (
        assigned.select(F.col(id_col).alias("cand_id"), "centroid_id")
        .join(F.broadcast(q_cells), "centroid_id")
        .where(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
    )
    # per-query ADC over the cell-pruned candidates only
    d_header = queries.select(vec_col).head()[0]
    sub = len(d_header) // m
    qparts = queries.select(
        F.col(id_col).alias("query_id"),
        F.posexplode(
            F.array(
                *[F.slice(_unit(F.col(vec_col)), j * sub + 1, sub) for j in range(m)]
            )
        ).alias("subspace", "qpart"),
    )
    lut = qparts.join(F.broadcast(codebooks), "subspace").select(
        "query_id",
        "subspace",
        "code",
        F.aggregate(
            F.zip_with(
                F.col("qpart"), F.col("centroid"), lambda x, y: (x - y) * (x - y)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        .cast("decimal(24,12)")
        .alias("pd2"),
    )
    # Per-query LUT folded to ONE broadcast map row (key = subspace·2^16
    # + code): ADC becomes a single zip_with/aggregate expression over
    # the intact codes array — the former shape posexploded every
    # candidate m ways, equi-joined the m·|cand| rows against the LUT,
    # and re-grouped them back to (query, cand) through an Exchange.
    # Decimal fold = the same exact partial sums the groupBy computed
    # (decimal addition is order-free), cast double once at the end.
    lut_map = lut.groupBy("query_id").agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    (F.col("subspace").cast("bigint") * 65536 + F.col("code")).alias(
                        "k"
                    ),
                    F.col("pd2").alias("v"),
                )
            )
        ).alias("lut")
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: F.element_at(
                F.col("lut"), s.cast("bigint") * 65536 + c
            ),
        ),
        F.lit(0).cast("decimal(34,12)"),
        lambda acc, v: (acc + v).cast("decimal(34,12)"),
    )
    pool = (
        cand.join(codes.select(F.col(id_col).alias("cand_id"), "codes"), "cand_id")
        .join(F.broadcast(lut_map), "query_id")
        .select("query_id", "cand_id", adc.cast("double").alias("adc_dist2"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("query_id").orderBy("adc_dist2", "cand_id")
            ),
        )
        .where(F.col("rk") <= adc_pool)
        .select("query_id", "cand_id")
    )
    # exact rerank: the ONLY stage that touches full float vectors
    qq = queries.select(
        F.col(id_col).alias("query_id"), _quantize(F.col(vec_col)).alias("xq")
    )
    cc = emb.select(
        F.col(id_col).alias("cand_id"), _quantize(F.col(vec_col)).alias("xc")
    )
    scored = (
        pool.join(F.broadcast(qq), "query_id")
        .join(cc, "cand_id")
        .select(
            "query_id",
            "cand_id",
            _cosine_arrow()(F.col("xq"), F.col("xc")).alias("cosine"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), "cand_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
        .select("query_id", "cand_id", "cosine", "rank")
    )


def nn_descent_refine(
    vecs: DataFrame,
    k: int = 3,
    band_bits: int | None = None,
    init_bands: int = 2,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Final graph of :func:`nn_descent_graphs` — see there for the
    algorithm; this face keeps the original one-graph API."""
    return nn_descent_graphs(
        vecs,
        k=k,
        band_bits=band_bits,
        init_bands=init_bands,
        iterations=iterations,
        id_col=id_col,
        vec_col=vec_col,
    )[-1]


def nn_descent_graphs(
    vecs: DataFrame,
    k: int = 3,
    band_bits: int | None = None,
    init_bands: int = 2,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[DataFrame]:
    """NN-DESCENT kNN-graph refinement (Dong et al., WWW 2011: "a
    neighbor of a neighbor is likely a neighbor") with a MULTI-BAND
    initialization: the starting graph is each vector's top-k over the
    union of ``init_bands`` independent ``band_bits``-bit hyperplane
    bucketings, then every iteration scores the EXACT cosine of each
    neighbor-of-neighbor candidate over the undirected neighborhood
    and re-ranks to top-k.

    Why multi-band init is load-bearing (measured, r9): a SINGLE-band
    top-k graph is bucket-local, and the neighbor-of-neighbor closure
    of a bucket-local graph never leaves the bucket — expansion
    candidates are exactly the in-bucket pairs the initial scoring
    already ranked, so iterations are a provable no-op. With >=2
    independent bucketings the expansion genuinely mixes: u's band-A
    neighbor v can contribute ITS band-B neighbor w, a pair no single
    band ever co-bucketed. On the sf0.1 corpus one iteration rewires
    ~10% of edges strictly upward (621/6000), a second ~3.6% —
    converging as the paper predicts.

    Scale shape: initialization is ``init_bands`` equi-joins on
    (band_ix, key) over ONE persisted quantized relation (the
    multiband ANN cost model, Sigma bucket^2 per band); each iteration
    is one self-join of the undirected edge list on the shared
    endpoint (Sigma deg^2 candidates, k-bounded except at hubs —
    q466/q469 are the hub dial) plus one scoring join per side.
    Every cosine is the same integer-dot/prenormed-double expression
    on both engines, so the refined graph is fully value-checkable.

    Reference parity: the reference has no ANN-graph surface; this
    extends the LLM-pipeline similarity family (SURVEY.md LLM ops).

    ``band_bits=None`` (default) sizes each band with
    ``adaptive_knn_bits`` so per-band pair volume stays linear in the
    corpus — the fixed 6-bit dial measured quadratic-dead at 100x
    (575k vectors / 64 buckets; the round's recurring fixed-dial
    class). The explicit value exists for oracle determinism; at
    sf0.01 the adaptive rule lands on 6 anyway (the q146 argument).

    Returns the list [g0, g1, ..., g_iterations] — every intermediate
    graph, each carrying (vec_id, neighbor_id, cosine, rank). Harnesses
    that grade iteration-by-iteration (q484/q496) read the list and
    share ONE refinement chain; per-iteration lazy localCheckpoints cut
    each graph's lineage, so the arms' static plans stay flat instead
    of re-inlining the whole chain per arm (r11: 490 -> ~30 Exchange
    nodes per harness).
    """
    if band_bits is None:
        band_bits = adaptive_knn_bits(vecs.count())
    sl = _band_slices_arrow(band_bits * init_bands, init_bands)
    base = vecs.select(
        F.col(id_col).alias("vec_id"), _quantize(F.col(vec_col)).alias("v")
    ).select(
        "vec_id",
        "v",
        F.sqrt(_dot(F.col("v"), F.col("v")).cast("double")).alias("norm"),
        sl(F.col("v")).alias("keys"),
    ).transform(managed_persist)

    banded = base.select("vec_id", F.posexplode("keys").alias("band_ix", "key"))
    p1, p2 = banded.alias("p1"), banded.alias("p2")
    pairs = (
        p1.join(
            p2,
            (F.col("p1.band_ix") == F.col("p2.band_ix"))
            & (F.col("p1.key") == F.col("p2.key")),
        )
        .where(F.col("p1.vec_id") != F.col("p2.vec_id"))
        .select(
            F.col("p1.vec_id").alias("vec_id"),
            F.col("p2.vec_id").alias("neighbor_id"),
        )
        .distinct()
    )

    q_side = base.select(
        "vec_id", F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )
    c_side = base.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )

    def score(cand: DataFrame) -> DataFrame:
        return (
            cand.join(q_side, "vec_id")
            .join(c_side, "neighbor_id")
            .select(
                "vec_id",
                "neighbor_id",
                _cosine_prenorm_arrow()(
                    F.col("qv"), F.col("cv"), F.col("qnorm"), F.col("cnorm")
                ).alias("cosine"),
            )
        )

    w = W.partitionBy("vec_id").orderBy(F.desc("cosine"), "neighbor_id")

    def topk(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("vec_id", "neighbor_id", "cosine")
        )

    def with_rank(df: DataFrame) -> DataFrame:
        return df.withColumn("rank", F.row_number().over(w).cast("int")).select(
            "vec_id", "neighbor_id", "cosine", "rank"
        )

    # per-iteration lazy localCheckpoint on the carried graph and its
    # undirected closure (the q255/q491 iterative-consumer rule): each
    # round's plan reads flat RDD scans instead of nesting every prior
    # round's join pipeline
    g = topk(score(pairs)).transform(lineage_cut)
    out = [with_rank(g)]
    for _ in range(iterations):
        und = (
            g.select("vec_id", "neighbor_id")
            .unionByName(
                g.select(
                    F.col("neighbor_id").alias("vec_id"),
                    F.col("vec_id").alias("neighbor_id"),
                )
            )
            .distinct()
            .transform(lineage_cut)
        )
        u1, u2 = und.alias("u1"), und.alias("u2")
        cand = (
            u1.join(u2, F.col("u1.neighbor_id") == F.col("u2.vec_id"))
            .where(F.col("u1.vec_id") != F.col("u2.neighbor_id"))
            .select(
                F.col("u1.vec_id").alias("vec_id"),
                F.col("u2.neighbor_id").alias("neighbor_id"),
            )
            .distinct()
        )
        # an edge can arrive from both the current graph and the
        # candidate join with the identical deterministic cosine;
        # max-groupby is the engine-safe distinct over doubles
        g = (
            g.unionByName(score(cand))
            .groupBy("vec_id", "neighbor_id")
            .agg(F.max("cosine").alias("cosine"))
            .transform(topk)
            .transform(lineage_cut)
        )
        out.append(with_rank(g))
    return out


def knn_shapley_values(
    pairs: DataFrame,
    k: int,
    test_col: str = "test_id",
    cand_col: str = "cand_id",
    dist_col: str = "dist2",
    ind_col: str = "ind",
    carry: tuple = (),
) -> DataFrame:
    """Exact KNN-Shapley values (Jia et al., VLDB 2019 Theorem 1) from
    a scored (test, candidate) relation: per test point, candidates
    rank by (``dist_col`` ASC, ``cand_col`` ASC) and the published
    recursion

        s_N = ind_N * min(K, N) / (K * N)
        s_i = s_(i+1) + (ind_i - ind_(i+1)) / K * min(K, i) / i

    (the paper states the base case as ind_N / N under its N >= K
    assumption; min(K, N)/(K*N) is the general form — equal to 1/N
    bit-for-bit when N >= K, and the one that keeps the EFFICIENCY
    axiom sum(s) = v(full) = (1/K) sum_{top-min(K,N)} ind when a test
    point has fewer than K candidates, hypothesis-pinned in tests)

    unrolls into per-rank contributions summed by a window SUFFIX SUM.
    ``ind_col`` is the 0/1 correctness indicator (1.0 when the
    candidate's label matches the test's). Contributions snap to
    round-9 DECIMAL so the suffix accumulation is order-exact on any
    engine; N is the per-test candidate count (window COUNT — tests
    with different candidate universes each get their own N).

    ``carry`` names extra per-row columns to pass through unchanged
    (a label column the consumer aggregates by, e.g.).

    Returns (test, cand, *carry, rn, sv): sv is the candidate's exact Shapley
    value for that test point as DECIMAL(38,9); averaging sv over
    tests per candidate is the corpus-level valuation (q528's face).

    Scale: one exchange (rank repartition on the test key); the
    per-test O(N log N) sort is the closed form's inherent cost,
    parallel across test points. Shard-stratified or LSH-approximate
    deployments (same paper) reuse this operator on smaller N.
    """
    w = W.partitionBy(test_col).orderBy(dist_col, cand_col)
    wn = W.partitionBy(test_col)
    r = pairs.select(
        test_col,
        cand_col,
        *carry,
        F.row_number().over(w).alias("rn"),
        F.col(ind_col).alias("_ind"),
        F.lead(ind_col).over(w).alias("_lead_ind"),
        F.count(F.lit(1)).over(wn).cast("bigint").alias("_n"),
    )
    contrib = (
        F.when(
            F.col("rn") < F.col("_n"),
            F.round(
                (F.col("_ind") - F.col("_lead_ind"))
                * F.least(F.lit(k), F.col("rn"))
                / (F.lit(float(k)) * F.col("rn")),
                9,
            ),
        )
        .otherwise(
            F.round(
                F.col("_ind")
                * F.least(F.lit(k), F.col("_n"))
                / (F.lit(float(k)) * F.col("_n")),
                9,
            )
        )
        .cast("decimal(28,9)")
    )
    sw = (
        W.partitionBy(test_col)
        .orderBy("rn")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    return r.select(
        test_col, cand_col, *carry, "rn", contrib.alias("_contrib")
    ).select(
        test_col, cand_col, *carry, "rn", F.sum("_contrib").over(sw).alias("sv")
    )
