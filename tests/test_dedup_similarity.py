"""Validation of the approximate operators (MinHash-LSH, SimHash, LSH-ANN)
against their exact counterparts — the checks the DuckDB oracle can't do."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from variantcalling_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
    simhash,
)
from variantcalling_spark.operators.similarity import cosine_topk, lsh_cosine_topk
from variantcalling_spark.queries.dedup import corpus
from variantcalling_spark.sources import load_table


@pytest.fixture(scope="module")
def aug_corpus(spark, sf_dir):
    return corpus(spark, sf_dir).cache()


def test_minhash_lsh_recall_vs_exact(spark, aug_corpus):
    """Near-dup pairs (jaccard >= 0.6) found by LSH candidates must cover
    the exact ground truth (these constructed near-dups have very high
    similarity, so every band should collide)."""
    sh = shingles(aug_corpus, n=3).cache()
    truth = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(sh, min_jaccard=0.6).collect()
    }
    assert truth, "augmented corpus must contain near-duplicates"
    sigs = minhash_signatures(sh, num_hashes=32)
    cands = {
        (r.doc_a, r.doc_b)
        for r in lsh_candidate_pairs(sigs, num_bands=8, rows_per_band=4).collect()
    }
    missed = truth - cands
    recall = 1 - len(missed) / len(truth)
    assert recall >= 0.95, f"LSH recall {recall:.2f}, missed {sorted(missed)[:5]}"


def test_minhash_signature_similarity_estimates_jaccard(spark, aug_corpus):
    """Signature agreement rate approximates Jaccard for a known
    exact-duplicate pair (agreement must be 1.0) and differs for
    unrelated docs."""
    sh = shingles(aug_corpus, n=3)
    sigs = {r.doc_id: r.signature for r in minhash_signatures(sh, 16).collect()}
    # doc 0 has an exact copy at 200000
    assert sigs[0] == sigs[200000]
    # unrelated pair: far-apart ids should NOT have identical signatures
    some_other = next(i for i in sigs if i not in (0, 200000))
    assert sigs[0] != sigs[some_other]


def test_simhash_exact_copy_zero_hamming(spark, aug_corpus):
    sigs = {r.doc_id: r.simhash for r in simhash(aug_corpus, bits=32).collect()}
    assert sigs[0] == sigs[200000]  # exact copy -> identical signature
    # near-copy (first word dropped) -> small hamming distance
    d = bin(sigs[0] ^ sigs[100000]).count("1")
    assert d <= 4, f"near-dup hamming {d}"


def test_lsh_ann_rerank_is_exact_within_buckets(spark, sf_dir):
    """Every (query, candidate) cosine produced by the LSH path must equal
    the exact brute-force cosine for that pair (rerank correctness), and
    per-query results must be a descending-ranked list."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.cand_id): r.cosine
        for r in cosine_topk(queries, emb, k=1000).collect()
    }
    approx = lsh_cosine_topk(queries, emb, k=3, n_planes=16, prefix_bits=6).collect()
    assert approx, "LSH ANN returned nothing"
    for r in approx:
        assert abs(exact[(r.query_id, r.cand_id)] - r.cosine) < 1e-12
    by_q: dict[int, list] = {}
    for r in approx:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_multimodal_featurize_batch_shape(spark):
    from variantcalling_spark.operators.multimodal import (
        attach_binary_payload,
        decode_image,
        featurize_binary,
    )

    df = spark.createDataFrame([(1, "abc"), (2, "xyzw")], "doc_id long, text string")
    out = {r.doc_id: r for r in featurize_binary(attach_binary_payload(df)).collect()}
    assert out[1].n_bytes == 3 and out[1].first_byte == ord("a") and out[1].last_byte == ord("c")
    assert out[2].n_bytes == 4 and out[2].byte_sum == sum(b"xyzw")
    # no real decoder in this container -> deterministic fake contract
    assert decode_image(b"\x89PNG").shape == (1, 32, 3)


def test_ivf_ann_recall_vs_exact(spark, sf_dir):
    from variantcalling_spark.operators.similarity import (
        cosine_topk,
        ivf_cosine_topk,
        ivf_index,
    )
    from variantcalling_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.cand_id) for r in cosine_topk(queries, emb, k=5).collect()
    }
    centroids, indexed = ivf_index(emb, n_centroids=8)
    approx = {
        (r.query_id, r.cand_id)
        for r in ivf_cosine_topk(queries, indexed, centroids, k=5, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # nprobe = n_centroids degenerates to exact search
    full = {
        (r.query_id, r.cand_id)
        for r in ivf_cosine_topk(queries, indexed, centroids, k=5, nprobe=8).collect()
    }
    assert full == exact


def test_embedding_neardup_lsh_recall_and_precision(spark, sf_dir):
    """Banded hyperplane discovery (q74) vs the exact all-pairs baseline
    (q73): precision must be exact by construction (every candidate is
    re-scored), recall of the constructed near-dups must be high — at
    cosine >= 0.97 each of the 16 sign bits agrees w.p. ~0.93, so
    P[>=1 of 4 bands collides] ~ 0.99."""
    from variantcalling_spark.queries.similarity import neardup_corpus
    from variantcalling_spark.operators.similarity import (
        banded_near_dup_pairs,
        cosine_near_dup_pairs,
    )

    c = neardup_corpus(spark, sf_dir).cache()
    exact = {(r.id_a, r.id_b) for r in cosine_near_dup_pairs(c, 0.9).collect()}
    assert exact, "augmented corpus must contain near-duplicate vectors"
    approx = {
        (r.id_a, r.id_b)
        for r in banded_near_dup_pairs(c, 0.9, n_planes=32, n_bands=4).collect()
    }
    assert approx <= exact  # precision 1.0: verify step is the exact predicate
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9


def test_adaptive_band_bits_rule():
    """bits = max(8, ceil(log2 n) + 2): floors at 8 for tiny corpora,
    tracks log2(n) above — the candidate set stays ~n/4 per band."""
    from variantcalling_spark.operators.similarity import adaptive_band_bits

    assert adaptive_band_bits(10) == 8
    assert adaptive_band_bits(64) == 8
    assert adaptive_band_bits(575) == 12  # the sf0.01 neardup corpus -> q129 oracle
    assert adaptive_band_bits(2300) == 14
    assert adaptive_band_bits(23000) == 17
    assert adaptive_band_bits(1_000_000_000) == 32


def test_adaptive_neardup_equals_explicit_width(spark, sf_dir):
    """The adaptive wrapper is exactly banded_near_dup_pairs at the width
    the rule picks — and exact duplicates survive ANY width (their sign
    bits agree plane-by-plane, so they collide in every band)."""
    from variantcalling_spark.operators.similarity import (
        adaptive_band_bits,
        adaptive_banded_near_dup_pairs,
        banded_near_dup_pairs,
    )
    from variantcalling_spark.queries.similarity import neardup_corpus

    c = neardup_corpus(spark, sf_dir).cache()
    n = c.count()
    bits = adaptive_band_bits(n)
    got = {
        (r.id_a, r.id_b, round(r.cosine, 9))
        for r in adaptive_banded_near_dup_pairs(c, 0.9, n_bands=4).collect()
    }
    want = {
        (r.id_a, r.id_b, round(r.cosine, 9))
        for r in banded_near_dup_pairs(
            c, 0.9, n_planes=bits * 4, n_bands=4
        ).collect()
    }
    assert got == want
    copies = {
        (v, v + 200000)
        for (v,) in c.select("vec_id").collect()
        if v % 20 == 0 and v < 100000
    }
    found = {(a, b) for (a, b, _) in got}
    assert copies <= found, "exact +200000 copies must collide at any band width"


def test_planned_bands_for_recall_closed_form():
    """The hyperplane (b, bits) planner: b = ceil(ln(1-t)/ln(1-p^bits))
    with p = 1 - acos(threshold)/pi — values checked against an
    independent evaluation of the S-curve, monotone in target and
    inversely monotone in threshold."""
    import pytest as _pytest

    from variantcalling_spark.operators.similarity import planned_bands_for_recall

    # threshold 0.9, 8-bit bands: per-band collision ~0.29
    assert planned_bands_for_recall(0.9, 0.5, 8) == 3
    assert planned_bands_for_recall(0.9, 0.7, 8) == 4   # the shipped default dial
    assert planned_bands_for_recall(0.9, 0.9, 8) == 7
    assert planned_bands_for_recall(0.9, 0.99, 8) == 14
    # wider bands (more bits) need more of them at the same target
    assert planned_bands_for_recall(0.9, 0.7, 12) == 8
    # easier (higher) threshold needs fewer bands
    assert planned_bands_for_recall(0.95, 0.9, 8) == 5
    # an infeasible point raises instead of silently under-recalling
    with _pytest.raises(ValueError):
        planned_bands_for_recall(0.8, 0.9, 8, max_bands=8)
    with _pytest.raises(ValueError):
        planned_bands_for_recall(0.9, 1.0, 8)


def test_planner_driven_neardup_equals_default_at_its_plan(spark, sf_dir):
    """target_recall mode is the SAME operator at the planned band
    count: a target that plans exactly 4 bands must reproduce the
    default 4-band output bit-for-bit, and a higher target must plan
    more bands and discover a superset of true pairs."""
    import math

    from variantcalling_spark.operators.similarity import (
        adaptive_band_bits,
        adaptive_banded_near_dup_pairs,
        planned_bands_for_recall,
    )
    from variantcalling_spark.queries.similarity import neardup_corpus

    c = neardup_corpus(spark, sf_dir).cache()
    n = c.count()
    bits = adaptive_band_bits(n)
    p = 1.0 - math.acos(0.9) / math.pi
    pb = p**bits
    t4 = 1.0 - (1.0 - pb) ** 4 - 1e-9  # the recall 4 bands just achieves
    assert planned_bands_for_recall(0.9, t4, bits) == 4
    got = {
        (r.id_a, r.id_b, round(r.cosine, 9))
        for r in adaptive_banded_near_dup_pairs(
            c, 0.9, target_recall=t4
        ).collect()
    }
    want = {
        (r.id_a, r.id_b, round(r.cosine, 9))
        for r in adaptive_banded_near_dup_pairs(c, 0.9, n_bands=4).collect()
    }
    assert got == want
    # a stricter target plans more bands -> recall can only grow
    t_hi = 1.0 - (1.0 - pb) ** 6 - 1e-9
    n_hi = planned_bands_for_recall(0.9, t_hi, bits)
    assert n_hi == 6
    more = {
        (r.id_a, r.id_b)
        for r in adaptive_banded_near_dup_pairs(
            c, 0.9, target_recall=t_hi
        ).collect()
    }
    assert {(a, b) for (a, b, _) in got} <= more


def test_connected_components_vs_union_find(spark):
    """Min-label propagation must produce exactly the components a plain
    union-find computes, including chains longer than one round."""
    from variantcalling_spark.operators.dedup import connected_components

    pairs = [
        (1, 2), (2, 3), (3, 4),          # chain -> one component {1,2,3,4}
        (10, 11), (11, 10),              # duplicate edge both ways
        (20, 21), (22, 21),              # star
        (30, 31), (32, 33), (31, 32),    # two edges merged by a bridge
        (40, 41),
    ]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    got = {
        r.node: r.label for r in connected_components(df, max_iters=20).collect()
    }

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    # normalize: label = min member of the component
    comp: dict[int, list[int]] = {}
    for n, r in expected.items():
        comp.setdefault(find(r), []).append(n)
    want = {n: min(members) for root, members in comp.items() for n in members}
    assert got == want


def test_components_local_path_equals_distributed(spark, monkeypatch):
    """The size-gated driver union-find short circuit must produce
    exactly the (node, label) rows of the distributed rounds it
    replaces, for BOTH components operators (cap=0 disables the gate
    and forces the distributed path)."""
    from variantcalling_spark.operators.dedup import (
        connected_components,
        star_contraction_components,
    )

    pairs = [(i, i + 1) for i in range(1, 30)]  # deep path graph
    pairs += [(100, 103), (103, 101), (200, 201), (300, 300 + 1)]
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")

    def run_both(op, **kw):
        monkeypatch.setenv("SPARK_GRAFT_COMPONENTS_LOCAL_CAP", "200000")
        local = {(r.node, r.label) for r in op(df, **kw).collect()}
        monkeypatch.setenv("SPARK_GRAFT_COMPONENTS_LOCAL_CAP", "0")
        dist = {(r.node, r.label) for r in op(df, **kw).collect()}
        assert local == dist and local

    run_both(star_contraction_components)
    run_both(connected_components, max_iters=40)


def test_projection_sums_arrow_matches_fold(spark):
    """The Arrow matmul signature stage must be bit-identical to the
    interpreted expression fold it replaced (quantized integer inputs
    keep every partial sum exact in both paths)."""
    from variantcalling_spark.operators.similarity import (
        _projection_sums,
        _projection_sums_arrow,
    )

    vecs = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: ((F.col("id") * 31 + i * 17) % 200001 - 100000).cast("bigint"),
        ).alias("v"),
    )
    both = vecs.select(
        "vec_id",
        _projection_sums(F.col("v"), 32).alias("fold"),
        _projection_sums_arrow(32)(F.col("v")).alias("arrow"),
    )
    bad = both.where(F.col("fold") != F.col("arrow")).count()
    assert bad == 0


def test_band_slices_arrow_matches_sign_bits(spark):
    """The one-pass Arrow band packer must equal the _sign_bits
    expression over the projection fold, band by band."""
    from variantcalling_spark.operators.similarity import (
        _band_slices_arrow,
        _projection_sums,
        _sign_bits,
    )

    vecs = spark.range(200).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(63)),
            lambda i: ((F.col("id") * 37 + i * 13) % 200001 - 100000).cast("bigint"),
        ).alias("v"),
    )
    sums = _projection_sums(F.col("v"), 32)
    both = vecs.select(
        "vec_id",
        F.array(*[_sign_bits(sums, b * 8, 8) for b in range(4)]).alias("expr_slices"),
        _band_slices_arrow(32, 4)(F.col("v")).alias("arrow_slices"),
    )
    assert both.where(F.col("expr_slices") != F.col("arrow_slices")).count() == 0


def test_image_decode_resize_and_features(spark):
    """The deterministic image decoder tiles bytes into (H, 32, 3); the
    nearest-neighbor resize uses floor index maps; image_features emits
    exact channel means and the resized checksum."""
    import numpy as np

    from variantcalling_spark.operators.multimodal import (
        attach_binary_payload,
        decode_image_fake,
        image_features,
        resize_nearest,
    )

    content = bytes(range(97)) * 2  # 194 bytes -> H = 3
    img = decode_image_fake(content)
    assert img.shape == (3, 32, 3) and img.dtype == np.uint8
    flat = img.reshape(-1)
    assert all(flat[p] == content[p % len(content)] for p in range(len(flat)))

    small = resize_nearest(img, 2, 4)
    assert small.shape == (2, 4, 3)
    assert (small[1, 3] == img[(1 * 3) // 2, (3 * 32) // 4]).all()

    # empty payload -> 1x32x3 zeros, no crash
    assert decode_image_fake(b"").sum() == 0

    df = spark.createDataFrame([(1, "abcdef" * 40)], "doc_id long, text string")
    row = image_features(attach_binary_payload(df)).collect()[0]
    b = ("abcdef" * 40).encode()
    exp = decode_image_fake(b)
    assert row.height == exp.shape[0]
    assert row.mean_r == exp.reshape(-1, 3)[:, 0].mean()
    assert row.mean_g == exp.reshape(-1, 3)[:, 1].mean()


def test_audio_decode_and_features(spark):
    """The sign-mixing audio decoder and its waveform stats."""
    import numpy as np

    from variantcalling_spark.operators.multimodal import (
        attach_binary_payload,
        audio_features,
        decode_audio_fake,
    )

    s = decode_audio_fake(b"abc")
    assert list(s) == [(ord(c) * 37) % 256 - 128 for c in "abc"]
    assert len(decode_audio_fake(b"")) == 0

    df = spark.createDataFrame([(1, "hello world")], "doc_id long, text string")
    row = audio_features(attach_binary_payload(df)).collect()[0]
    ss = decode_audio_fake(b"hello world").astype(np.int64)
    assert row.n_samples == len(ss)
    assert row.rms == float(np.sqrt((ss * ss).sum() / len(ss)))
    assert row.n_zero_crossings == int((ss[:-1] * ss[1:] < 0).sum())


def test_star_contraction_matches_label_propagation(spark):
    """Star contraction must produce the same components as min-label
    propagation — including on a 65-node path graph (diameter 64, deeper
    than propagation's default round budget) and a multi-component mixed
    graph."""
    from variantcalling_spark.operators.dedup import (
        connected_components,
        star_contraction_components,
    )

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "doc_a long, doc_b long"
    )
    got = {
        (r.node, r.label)
        for r in star_contraction_components(path, max_rounds=12).collect()
    }
    assert got == {(i, 0) for i in range(65)}

    mixed = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 21), (5, 6), (6, 7), (7, 5)],
        "doc_a long, doc_b long",
    )
    star = {
        (r.node, r.label)
        for r in star_contraction_components(mixed).collect()
    }
    prop = {
        (r.node, r.label)
        for r in connected_components(mixed, max_iters=50).collect()
    }
    assert star == prop


def test_int_matrix_rejects_float_vectors():
    """The similarity kernels' contract is integer-quantized vectors;
    float inputs must raise loudly, never truncate-toward-zero silently
    (a truncated cosine would be wrong with no warning)."""
    import numpy as np

    from variantcalling_spark.operators.similarity import _int_matrix

    ints = np.empty(2, dtype=object)
    ints[0] = np.array([1, 2, 3], dtype=np.int64)
    ints[1] = np.array([4, 5, 6], dtype=np.int64)
    mat = _int_matrix(ints, [0, 1])
    assert mat.dtype == np.int64 and mat.shape == (2, 3)

    floats = np.empty(1, dtype=object)
    floats[0] = np.array([0.9, 1.1], dtype=np.float64)
    with pytest.raises(TypeError, match="integer-quantized"):
        _int_matrix(floats, [0])


def test_no_zero_norm_embeddings_after_quantization(spark, sf_dir):
    """_cosine_arrow maps zero-norm vectors to NULL (documented
    contract); assert the testdata embeddings never hit that branch, so
    the NaN->NULL difference vs the old expression fold can't affect any
    oracle-checked result."""
    from variantcalling_spark.operators.similarity import _quantize

    emb = load_table(spark, sf_dir, "embeddings")
    zero_norm = emb.select(
        F.aggregate(
            _quantize(F.col("embedding")),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x * x,
        ).alias("nsq")
    ).where(F.col("nsq") == 0)
    assert zero_norm.count() == 0


def test_real_image_decoder_contract(monkeypatch):
    """Exercises the REAL branch of decode_image in every environment:
    a genuine binary format (uncompressed 24-bit BMP via the vendored
    stdlib codec) round-trips through the same (H, W, 3) uint8 array
    contract the pillow branch uses, so flipping VCSPARK_REAL_DECODERS=1
    changes no downstream plumbing. When pillow is present the PNG path
    is cross-checked too."""
    import numpy as np

    from variantcalling_spark.operators.media_codecs import decode_bmp, encode_bmp
    from variantcalling_spark.operators.multimodal import decode_image

    monkeypatch.setenv("VCSPARK_REAL_DECODERS", "1")
    img = np.full((2, 4, 3), [10, 20, 30], dtype=np.uint8)
    img[1, 3] = [200, 100, 50]  # corner pixel pins row order + BGR swap
    payload = encode_bmp(img)
    arr = decode_image(payload)
    assert arr.shape == (2, 4, 3) and arr.dtype == np.uint8
    assert (arr == img).all()
    # codec-level round trip with a width that needs row padding
    odd = np.arange(3 * 3 * 3, dtype=np.uint8).reshape(3, 3, 3)
    assert (decode_bmp(encode_bmp(odd)) == odd).all()
    # undecodable payloads must RAISE under the flag, not silently fake
    with pytest.raises(Exception):
        decode_image(b"not an image")
    with pytest.raises(ValueError):
        decode_image(b"BM" + b"\0" * 60)  # BMP magic, garbage header
    try:
        from PIL import Image  # optional cross-check, not a skip
    except ImportError:
        return
    import io

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    assert (decode_image(buf.getvalue()) == img).all()


def test_real_audio_decoder_contract(monkeypatch):
    """Same for the audio branch: RIFF/WAVE PCM-16 (stdlib codec)
    round-trips as 1-D int16 samples with stereo averaged to mono,
    raising on undecodable payloads. soundfile cross-checked when
    present."""
    import numpy as np

    from variantcalling_spark.operators.media_codecs import (
        decode_wav_pcm16,
        encode_wav_pcm16,
    )
    from variantcalling_spark.operators.multimodal import decode_audio

    monkeypatch.setenv("VCSPARK_REAL_DECODERS", "1")
    samples = np.array([0, 1000, -1000, 32000], dtype=np.int16)
    out = decode_audio(encode_wav_pcm16(samples, 8000))
    assert out.ndim == 1 and out.dtype == np.int16
    assert (out == samples).all()
    # stereo averages to mono through the public decode_audio contract
    stereo = np.array([[100, 300], [-200, -400]], dtype=np.int16)
    mono = decode_audio(encode_wav_pcm16(stereo, 8000, channels=2))
    assert (mono == np.array([200, -300], dtype=np.int16)).all()
    got, rate = decode_wav_pcm16(encode_wav_pcm16(samples, 44100))
    assert rate == 44100 and (got == samples).all()
    with pytest.raises(Exception):
        decode_audio(b"not audio")
    with pytest.raises(Exception):
        decode_audio(b"RIFF\0\0\0\0WAVEjunk")  # WAV magic, garbage body
    try:
        import soundfile  # optional cross-check, not a skip
    except ImportError:
        return
    import io

    buf = io.BytesIO()
    soundfile.write(buf, samples, 8000, format="WAV", subtype="PCM_16")
    assert (decode_audio(buf.getvalue()) == samples).all()


def test_substring_dedup_spans_pinned(spark):
    """Constructed corpus with a known shared passage: spans must cover
    exactly the repeated 7-token run in each doc (maximal, merged), and
    a doc with no duplicated shingle must emit nothing."""
    from variantcalling_spark.operators.dedup import duplicated_substring_spans

    shared = "the quick brown fox jumps over fences"  # 7 tokens
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta {shared} gamma delta"),
            (2, f"{shared} epsilon zeta eta theta iota"),
            (3, "one two three four five six seven eight nine"),
        ],
        ["doc_id", "text"],
    )
    rows = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_substring_spans(docs, k=5, min_docs=2).collect()
    }
    # doc 1: shared run at token positions 2..8; doc 2: positions 0..6.
    assert rows == {(1, 2, 8, 7), (2, 0, 6, 7)}


def test_substring_dedup_merges_adjacent_runs(spark):
    """Two overlapping duplicated shingle families in one doc merge into
    a single maximal island, not two abutting spans."""
    from variantcalling_spark.operators.dedup import duplicated_substring_spans

    a = "a b c d e f g h"          # 8 tokens, all shared with doc 20
    docs = spark.createDataFrame(
        [(10, f"x {a} y"), (20, f"{a} tail1 tail2"), (30, "p q r s t u v w")],
        ["doc_id", "text"],
    )
    rows = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicated_substring_spans(docs, k=5, min_docs=2).collect()
    }
    assert rows == {(10, 1, 8), (20, 0, 7)}


def _clustered_vectors(n_per=20, centers=5, dim=16):
    """Deterministic clustered vectors: `centers` well-separated
    orthogonal-ish centers, small LCG perturbations — the regime PQ is
    built for (random uniform vectors have concentrated distances and
    are a worst case for any quantizer)."""
    rows = []
    vid = 0
    for c in range(centers):
        for i in range(n_per):
            vec = []
            for d in range(dim):
                base = 10.0 if d % centers == c else 0.0
                h = (vid * 1103515245 + d * 69069 + 12345) % 1000
                vec.append(base + (h - 500) / 1000.0)
            rows.append((vid, vec, c))
            vid += 1
    return rows


def test_pq_adc_recovers_cluster_structure(spark):
    """On clustered data, every PQ-ADC top-3 neighbor must come from the
    query's own cluster (inter-cluster distances dwarf quantization
    error) — the version-portable recall check behind q121's pinned
    oracle."""
    from variantcalling_spark.operators.similarity import pq_adc_topk, pq_index

    rows = _clustered_vectors()
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    codebooks, codes = pq_index(emb, m=4, k_sub=8)
    queries = emb.where("vec_id IN (0, 25, 45, 65, 85)")
    got = pq_adc_topk(queries, codes, codebooks, k=3, m=4).collect()
    assert len(got) == 15
    label = {vid: lab for vid, _, lab in rows}
    assert all(label[r.cand_id] == label[r.query_id] for r in got)


def test_pq_deterministic_across_runs(spark):
    """Two independent index builds + searches must be row-identical
    (md5-order init, DECIMAL means, struct-MIN assignment — no RNG, no
    partition-order dependence)."""
    from variantcalling_spark.operators.similarity import pq_adc_topk, pq_index

    emb = spark.createDataFrame(
        _clustered_vectors(), "vec_id long, embedding array<double>, label int"
    )
    outs = []
    for _ in range(2):
        codebooks, codes = pq_index(emb, m=4, k_sub=8)
        queries = emb.where("vec_id < 3")
        outs.append(
            sorted(
                (r.query_id, r.cand_id, r.adc_dist2, r.rank)
                for r in pq_adc_topk(queries, codes, codebooks, k=3, m=4).collect()
            )
        )
    assert outs[0] == outs[1]


def test_q478_pq_arms_memo_served(spark, sf_dir):
    """All three of q478's PQ trainings are session-memoized (r11
    sixth-session fix: the m=2/m=4 arms re-ran their 5-round Lloyd
    loops on every invocation — 12.7 s per warm re-invocation at
    sf0.01). A second build in the same session must serve every arm
    from the memo (same substrate objects, no retraining) and return
    identical rows."""
    from variantcalling_spark.queries import similarity as simq

    app = spark.sparkContext.applicationId

    def pq_entries():
        return {
            k: id(v[1])
            for k, v in simq._SUBSTRATE_MEMO.items()
            if k[1] == app and k[0].startswith("pq") and k[0].endswith("x16")
        }

    r1 = sorted(map(tuple, simq.q478_pq_recall_harness(spark, sf_dir).collect()))
    entries = pq_entries()
    assert {k[0] for k in entries} >= {f"pq{m}x16" for m in simq._PQR_MS}
    r2 = sorted(map(tuple, simq.q478_pq_recall_harness(spark, sf_dir).collect()))
    assert r1 == r2
    assert pq_entries() == entries  # memo-served, not rebuilt


def test_pq_codes_compress_to_m_bytes(spark):
    """The code table carries exactly m small codes per vector — the
    memory contract (m bytes/vec at k_sub<=256) that makes PQ the
    10^9-corpus scan path."""
    from variantcalling_spark.operators.similarity import pq_index

    emb = spark.createDataFrame(
        _clustered_vectors(), "vec_id long, embedding array<double>, label int"
    )
    _, codes = pq_index(emb, m=4, k_sub=8)
    rows = codes.collect()
    assert len(rows) == 100
    assert all(len(r.codes) == 4 for r in rows)
    assert all(0 <= c < 8 for r in rows for c in r.codes)


def test_incremental_dedup_finds_sources_not_fresh(spark, sf_dir):
    """Every near-copy in the new batch must match its own source doc in
    the old corpus; genuinely-new (reversed) docs must match nothing."""
    from variantcalling_spark.queries.dedup import q122_incremental_dedup

    rows = q122_incremental_dedup(spark, sf_dir).collect()
    by_new = {}
    for r in rows:
        by_new.setdefault(r.doc_new, set()).add(r.doc_old)
    # reversed docs (+300000) never match
    assert not any(d >= 300000 for d in by_new)
    # each near-copy (+100000) matches at least its source (id - 100000)
    near_ids = [d for d in by_new if 100000 <= d < 300000]
    assert near_ids, "near-copies must produce matches"
    assert all(d - 100000 in by_new[d] for d in near_ids)


def test_rowwise_signature_equals_aggregate_form(spark, sf_dir):
    """The shuffle-free projection form of the MinHash signature must be
    bit-identical to the aggregate form — it is the streaming-ingest
    contract (and a correctness guard for q122's probe path)."""
    from variantcalling_spark.operators.dedup import (
        portable_minhash_signatures,
        rowwise_minhash_signatures,
        shingles,
    )
    from variantcalling_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    agg = {
        r.doc_id: list(r.signature)
        for r in portable_minhash_signatures(shingles(docs, n=3)).collect()
    }
    row = {
        r.doc_id: list(r.signature)
        for r in rowwise_minhash_signatures(docs, n=3).collect()
    }
    assert agg == row and len(agg) > 0


def test_adaptive_knn_bits_rule():
    from variantcalling_spark.operators.similarity import adaptive_knn_bits

    assert adaptive_knn_bits(575) == 6      # the q132-oracle fixed point
    assert adaptive_knn_bits(5750) == 10    # 10x data -> ~10x pairs
    assert adaptive_knn_bits(5) == 4        # floor
    # monotone non-decreasing, and occupancy n/2^bits stays <= target
    prev = 0
    for n in (10, 100, 1000, 10_000, 100_000, 1_000_000):
        b = adaptive_knn_bits(n)
        assert b >= prev
        prev = b
        assert n / 2**b <= 9 or b == 4


def test_managed_persist_plan_aware_eviction(spark, monkeypatch):
    """Evicting a ring entry must NOT drop a cache entry a newer entry
    with the identical logical plan still relies on (Spark dedups
    identical plans to one cache entry)."""
    from variantcalling_spark import _persist
    from variantcalling_spark._persist import managed_persist

    monkeypatch.setattr(_persist, "_PERSIST_CAP", 1)
    monkeypatch.setattr(_persist, "_persist_ring", type(_persist._persist_ring)())

    base = spark.range(100).selectExpr("id", "id * 2 AS v")
    a = managed_persist(base)
    a.count()
    # identical plan: CacheManager points b at a's cache entry
    b = managed_persist(spark.range(100).selectExpr("id", "id * 2 AS v"))
    # cap=1 forced a's eviction attempt — but b shares the plan, so the
    # cache entry must survive
    assert b.storageLevel.useMemory
    # a DIFFERENT plan evicts the shared one once it is the only holder
    c = managed_persist(spark.range(5).selectExpr("id"))
    c.count()
    assert not b.storageLevel.useMemory  # now released (no newer sharer)
    assert c.storageLevel.useMemory


def test_adaptive_knn_graph_equals_fixed_at_rule_point(spark, sf_dir):
    from variantcalling_spark.operators.similarity import (
        adaptive_knn_bits,
        adaptive_knn_graph,
        knn_graph,
    )
    from variantcalling_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").cache()
    bits = adaptive_knn_bits(emb.count())
    got = {
        (r.vec_id, r.neighbor_id, r.rank)
        for r in adaptive_knn_graph(emb, k=3).collect()
    }
    want = {
        (r.vec_id, r.neighbor_id, r.rank)
        for r in knn_graph(emb, k=3, prefix_bits=bits).collect()
    }
    assert got == want and got


def test_kmv_overlap_error_bound(spark, sf_dir):
    """q303's KMV Jaccard estimate is a k=64 bottom-k estimator: its
    standard error is ~sqrt(J(1-J)/k) <= 0.0625, so |est - exact| must
    stay within a loose 4-sigma band (0.25) on every pair, and the
    union estimate within 35% relative — the executable accuracy claim
    of the sketch (the q263 grading convention applied to the
    intersection estimator)."""
    from variantcalling_spark.queries import all_queries

    rows = all_queries()["q303_kmv_source_overlap"].fn(spark, sf_dir).collect()
    assert rows, "no source pairs at smoke scale"
    for r in rows:
        assert r.jaccard_abs_err <= 0.25, r
        rel = abs(r.est_union - r.exact_union) / r.exact_union
        assert rel <= 0.35, r


def test_mmr_rerank_semantics(spark, sf_dir):
    """q304 MMR invariants: per query, exactly one pick per step, all
    picks distinct, step-1 is the plain-relevance argmax, and every
    later pick's mmr_score stays within (1-lambda)*|sim| of lambda*rel
    (cosines may be negative, so the "penalty" can legitimately add —
    the bound is two-sided)."""
    from variantcalling_spark.queries import all_queries

    rows = all_queries()["q304_mmr_rerank"].fn(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 2
    for qid, rs in by_q.items():
        assert sorted(r.step for r in rs) == [1, 2, 3, 4]
        assert len({r.cand_id for r in rs}) == 4
        s1 = next(r for r in rs if r.step == 1)
        assert max(r.rel for r in rs) <= s1.rel + 1e-9
        # s1.rel is itself 6dp-rounded, so recomputing lambda*rel can
        # drift a full ulp-of-the-6th-digit: allow 2e-6
        assert abs(s1.mmr_score - 0.7 * s1.rel) <= 2e-6
        for r in rs:
            if r.step > 1:
                assert abs(r.mmr_score - 0.7 * r.rel) <= 0.3 + 1e-9


def test_lof_scores_positive_and_ranked(spark, sf_dir):
    """q294 LOF sanity at smoke scale: 20 rows, strictly positive
    scores and lrds, rank ordered by score descending."""
    from variantcalling_spark.queries import all_queries

    rows = all_queries()["q294_lof_outliers"].fn(spark, sf_dir).collect()
    assert len(rows) > 0
    scores = [r.lof for r in sorted(rows, key=lambda r: r.rk)]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    assert all(r.lrd > 0 for r in rows)


def test_multiprobe_ivf_probe_contract(spark):
    """Multi-probe IVF invariants: (a) its result with margin=inf
    equals fixed nprobe=max_probes (the probe sets coincide);
    (b) the nearest cell is always probed, so every query returns
    results even at margin=0."""
    from pyspark.sql import functions as F

    from variantcalling_spark.operators.similarity import (
        ivf_cosine_topk,
        ivf_index,
        multiprobe_ivf_cosine_topk,
    )

    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .where(F.col("vec_id") < 300)
    )
    q = emb.where(F.col("vec_id") < 10)
    centroids, indexed = ivf_index(emb, n_centroids=8)
    fixed = ivf_cosine_topk(q, indexed, centroids, k=5, nprobe=4)
    wide = multiprobe_ivf_cosine_topk(
        q, indexed, centroids, k=5, max_probes=4, margin=1e9
    )
    assert sorted(map(tuple, fixed.collect())) == sorted(
        map(tuple, wide.collect())
    )
    tight = multiprobe_ivf_cosine_topk(
        q, indexed, centroids, k=5, max_probes=4, margin=0.0
    )
    assert tight.select("query_id").distinct().count() == 10


def test_mutual_proximity_deflates_hubs(spark, sf_dir):
    """q469's operator contract, executed: (a) exactly <=k edges per
    vector; (b) the MP re-ranking reduces the in-degree concentration
    the q466 audit measures (max in-degree and orphan count must not
    increase, and at least one must strictly improve on the test
    corpus); (c) every surviving edge came from the raw candidate set
    (MP re-ranks, never invents pairs)."""
    import pandas as pd

    from variantcalling_spark.operators.similarity import (
        bucketed_cosine_candidates,
        knn_graph,
        mutual_proximity_knn,
    )
    from variantcalling_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").cache()
    n = emb.count()
    raw = knn_graph(emb, k=3, prefix_bits=6).toPandas()
    mp = mutual_proximity_knn(emb, k=3, prefix_bits=6).toPandas()

    assert mp.groupby("vec_id").size().max() <= 3
    assert (mp["mp"] >= 0).all() and (mp["mp"] <= 1).all()

    def indeg_stats(edges: pd.DataFrame):
        d = edges.groupby("neighbor_id").size()
        dmax = int(d.max())
        orphans = n - edges["neighbor_id"].nunique()
        return dmax, orphans

    raw_dmax, raw_orph = indeg_stats(raw)
    mp_dmax, mp_orph = indeg_stats(mp)
    assert mp_dmax <= raw_dmax and mp_orph <= raw_orph
    assert (mp_dmax < raw_dmax) or (mp_orph < raw_orph)

    cand = {
        (r.vec_id, r.neighbor_id)
        for r in bucketed_cosine_candidates(emb, prefix_bits=6)
        .select("vec_id", "neighbor_id")
        .collect()
    }
    assert set(zip(mp["vec_id"], mp["neighbor_id"])) <= cand


def test_canonicalization_keeps_best_member(spark, sf_dir):
    """q476 contract: exactly one kept doc per cluster, and the kept
    doc maximizes (n_tokens, then min doc_id) within its cluster —
    specifically the truncation case: a +100000 near-dup (leading word
    stripped) must never shadow its full-length original."""
    from variantcalling_spark.queries import all_queries

    pdf = (
        all_queries()["q476_dup_cluster_canonicalization"]
        .fn(spark, sf_dir)
        .toPandas()
    )
    assert len(pdf) > 0
    kept = pdf[pdf.is_kept == 1]
    assert kept.groupby("cluster_id").size().eq(1).all()
    assert set(kept.cluster_id) == set(pdf.cluster_id)
    for _, grp in pdf.groupby("cluster_id"):
        best = grp.sort_values(["n_tokens", "doc_id"], ascending=[False, True]).iloc[0]
        assert grp[grp.is_kept == 1].iloc[0].doc_id == best.doc_id
    # truncated near-dups (+100000) lose to their originals
    trunc_kept = kept[(kept.doc_id >= 100000) & (kept.doc_id < 200000)]
    assert len(trunc_kept) == 0


def test_clustering_coefficient_bounds(spark, sf_dir):
    """q477: cc in [0, 1], triangles <= C(deg, 2), and every node has
    deg >= 2 by the output contract."""
    from variantcalling_spark.queries import all_queries

    pdf = all_queries()["q477_clustering_coefficient"].fn(spark, sf_dir).toPandas()
    assert len(pdf) > 0
    assert (pdf.deg >= 2).all()
    assert ((pdf.local_cc >= 0) & (pdf.local_cc <= 1)).all()
    assert (pdf.triangles <= pdf.deg * (pdf.deg - 1) // 2).all()


def test_embedding_mmd_nonnegative_and_partitioned(spark, sf_dir):
    """q480: MMD^2 is a squared norm (>= 0 per label), and each row's
    n_label + n_rest equals the corpus size."""
    from variantcalling_spark.queries import all_queries
    from variantcalling_spark.sources import load_table

    pdf = all_queries()["q480_embedding_mmd"].fn(spark, sf_dir).toPandas()
    n = load_table(spark, sf_dir, "embeddings").count()
    assert (pdf.mmd2_linear >= 0).all()
    assert ((pdf.n_label + pdf.n_rest) == n).all()


def test_nn_descent_monotone_improvement(spark, sf_dir):
    """q483's operator contract, executed: (a) <=k edges per vector
    with dense 1..k ranks; (b) the multiband init dominates the
    single-band graph pointwise, and each NN-descent iteration never
    makes any vector's neighborhood WORSE — per-vector summed cosine
    is monotone (the candidate union contains the current edges, so
    the re-ranked top-k dominates); (c) the r9 no-op discovery stays
    pinned: single-band init (init_bands=1) is a FIXED POINT of the
    iteration — its neighbor-of-neighbor closure is bucket-local, so
    one iteration must change nothing."""
    import pandas as pd

    from variantcalling_spark.operators.similarity import (
        knn_graph,
        nn_descent_refine,
    )
    from variantcalling_spark.sources import load_table

    emb = load_table(spark, sf_dir, "embeddings").cache()
    g0 = nn_descent_refine(emb, k=3, band_bits=6, iterations=0).toPandas()
    g1 = nn_descent_refine(emb, k=3, band_bits=6, iterations=1).toPandas()

    per = g1.groupby("vec_id")
    assert per.size().max() <= 3
    assert (per["rank"].max() == per.size()).all()  # dense ranks

    def dominates(a: pd.DataFrame, b: pd.DataFrame):
        sa = a.groupby("vec_id")["cosine"].sum()
        sb = b.groupby("vec_id")["cosine"].sum()
        j = pd.concat([sa.rename("a"), sb.rename("b")], axis=1).fillna(-1e9)
        assert (j["b"] >= j["a"] - 1e-12).all()

    sb = knn_graph(emb, k=3, prefix_bits=6).toPandas()
    dominates(sb, g0)  # 2-band init sees a superset of band-0 pairs
    dominates(g0, g1)
    g2 = nn_descent_refine(emb, k=3, band_bits=6, iterations=2).toPandas()
    dominates(g1, g2)

    # (c) single-band fixed point: iteration cannot leave the bucket
    f0 = nn_descent_refine(emb, k=3, band_bits=6, init_bands=1, iterations=0).toPandas()
    f1 = nn_descent_refine(emb, k=3, band_bits=6, init_bands=1, iterations=1).toPandas()
    e0 = set(zip(f0["vec_id"], f0["neighbor_id"]))
    e1 = set(zip(f1["vec_id"], f1["neighbor_id"]))
    assert e0 == e1


def test_rendezvous_sharding_invariants(spark, sf_dir):
    """q485's guarantees, executed on real keys: (a) assignments are in
    range and deterministic across two plans; (b) growing 8 -> 12
    shards moves NO key between surviving shards; (c) shrinking the
    audit to n_old == n_new moves nothing; (d) every shard of the
    smaller ring is actually populated (no dead shard at these key
    counts)."""
    from pyspark.sql import functions as F

    from variantcalling_spark.operators.sharding import (
        rendezvous_shard,
        shard_movement_audit,
    )
    from variantcalling_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id").cache()
    a1 = rendezvous_shard(docs, "doc_id", 8).toPandas()
    a2 = rendezvous_shard(docs, "doc_id", 8).toPandas()
    assert a1["shard"].between(0, 7).all()
    assert a1.sort_values("doc_id")["shard"].tolist() == a2.sort_values(
        "doc_id"
    )["shard"].tolist()
    assert a1["shard"].nunique() == 8

    row = shard_movement_audit(docs, "doc_id", n_old=8, n_new=12).head()
    assert row.n_moved_to_surviving == 0
    assert 0 < row.n_moved < row.n_keys
    # expected moved fraction (12-8)/12 = 1/3; allow a wide band
    assert 0.15 < row.moved_frac < 0.55

    same = shard_movement_audit(docs, "doc_id", n_old=12, n_new=12).head()
    assert same.n_moved == 0


def test_winnowing_guarantee_and_density(spark):
    """The two properties winnowing is chosen for, executed:
    (a) GUARANTEE — two documents sharing a run of >= w+n-1 = 6 words
    share at least one selected fingerprint, wherever the run sits;
    (b) DENSITY — on long random-ish text the selected fraction of
    positions is near the theoretical 2/(w+1) = 0.4;
    (c) every document with at least one shingle gets >= 1 fingerprint
    (the short-doc first-window branch)."""
    from pyspark.sql import functions as F

    from variantcalling_spark.operators.dedup import (
        positional_shingles,
        winnowing_fingerprints,
    )

    shared = "alpha beta gamma delta epsilon zeta"  # 6 shared words
    rows = [
        (1, "one two three " + shared + " four five six seven"),
        (2, shared + " eight nine ten eleven twelve thirteen"),
        (3, "only two"),  # shorter than n: no shingles, no fingerprints
        (4, "just three words"),  # exactly one shingle -> 1 fingerprint
    ]
    # a long deterministic pseudo-random doc for the density check
    words = [f"w{(i * 2654435761) % 997}" for i in range(4000)]
    rows.append((5, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    fp = winnowing_fingerprints(docs, n=3, w=4).cache()
    byid = {r.doc_id: r.n for r in fp.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}

    h1 = {r.h for r in fp.where(F.col("doc_id") == 1).collect()}
    h2 = {r.h for r in fp.where(F.col("doc_id") == 2).collect()}
    assert h1 & h2, "shared 6-word run must produce a shared fingerprint"

    assert 3 not in byid
    assert byid.get(4) == 1

    n_pos = positional_shingles(docs, n=3).where(F.col("doc_id") == 5).count()
    density = byid[5] / n_pos
    assert 0.3 < density < 0.5, density  # theory: 2/(w+1) = 0.4


def test_q503_epsilon_budget_composition(spark, sf_dir):
    """Composition-correctness pin for the per-cluster DP release:
    (a) the per-release epsilons sum to DP_RELEASE_EPS_TOTAL
    (sequential composition ledger); (b) every row's scale equals
    sensitivity/eps; (c) every row's noise is EXACTLY scale x
    unit-Laplace(u) with u recomputed independently from the md5 seed
    recipe — the budget is enforced by the mechanism, not just
    printed; (d) cells get distinct seeds (no noise reuse)."""
    import hashlib
    import math

    from variantcalling_spark.queries.dedup import (
        DP_RELEASE_EPS_TOTAL,
        q503_dp_cluster_release,
    )

    rows = q503_dp_cluster_release(spark, sf_dir).collect()
    assert rows
    per_release_eps = {}
    for r in rows:
        per_release_eps.setdefault(r.release, set()).add(r.eps)
    # one epsilon per release, summing to the declared total
    assert all(len(v) == 1 for v in per_release_eps.values())
    assert math.isclose(
        sum(next(iter(v)) for v in per_release_eps.values()),
        DP_RELEASE_EPS_TOTAL,
    )
    seeds = set()
    for r in rows:
        assert math.isclose(r.scale, r.sensitivity / r.eps), r
        key = f"dp2:{r.release}:{r.cell}"
        h = int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % 2147483647
        k = (h * 2654435761 + 12345) % 2147483647
        seeds.add(k)
        u = (k + 0.5) / 2147483648.0
        sign = 1.0 if u >= 0.5 else -1.0
        unit = -sign * math.log(1.0 - 2.0 * abs(u - 0.5))
        assert math.isclose(r.noise, round(r.scale * unit, 6), abs_tol=1e-9), r
        assert math.isclose(
            r.noisy_value, round(r.true_value + r.scale * unit, 6), abs_tol=1e-9
        ), r
    assert len(seeds) == len(rows), "each cell must draw its own noise"


def test_q505_refinement_modularity_theorem(spark, sf_dir):
    """Leiden-refinement invariants, pinned executable: splitting a
    community into connected pieces keeps intra-edge totals and
    strictly shrinks the degree-penalty term, so exact-rational
    modularity can only rise — strictly, when any community actually
    split (every piece has positive degree on a kNN graph)."""
    from variantcalling_spark.queries.similarity import q505_leiden_refinement

    r = q505_leiden_refinement(spark, sf_dir).collect()[0]
    assert r.q_refine_num >= r.q_move_num
    if r.n_split > 0:
        assert r.q_refine_num > r.q_move_num
    # each split community contributes at least one extra piece
    assert r.n_comms_refine >= r.n_comms_move + r.n_split
    assert r.q_den > 0


def test_q506_aggregate_level_sanity(spark, sf_dir):
    """Leiden aggregate-level invariants: merging supernodes can only
    shrink the community count (n_comms_level2 <= n_super), every
    supernode either stays or moves (n_super_moved <= n_super), and
    the induced node-level partitions share the exact denominator."""
    from variantcalling_spark.queries.similarity import q506_leiden_aggregate_level

    r = q506_leiden_aggregate_level(spark, sf_dir).collect()[0]
    assert 1 <= r.n_comms_level2 <= r.n_super
    assert 0 <= r.n_super_moved <= r.n_super
    assert r.q_den > 0


def test_q507_ari_bounds_and_identity(spark, sf_dir):
    """ARI output sanity on the real corpus: the exact-vs-neardup
    agreement is strictly between chance (0) and identity (1) on a
    corpus with planted near-dups that exact dedup cannot see, and
    the exact pair ledger is internally consistent."""
    from variantcalling_spark.queries.dedup import q507_partition_agreement_ari

    r = q507_partition_agreement_ari(spark, sf_dir).collect()[0]
    assert 0.0 < r.ari < 1.0
    assert r.ari_den2 > 0
    assert r.sum_ij <= min(r.sum_a, r.sum_b)  # cell pairs bound row/col pairs
    assert round(r.ari_num2 / r.ari_den2, 6) == r.ari


def test_substrate_memo_keyed_by_application_id_with_eviction():
    """Two-session memo hygiene (r10 verdict ask #6): the substrate memo
    must key on applicationId (id(spark) can be reused by CPython after
    GC) and must evict entries whose session has been stopped, so dead
    sessions' checkpoint blocks are not pinned for the process lifetime.
    Exercised with fake sessions so the keying/eviction logic is tested
    without paying a second JVM."""
    from variantcalling_spark.queries import similarity as simq

    class FakeCtx:
        def __init__(self, app_id):
            self.applicationId = app_id
            self._jsc = object()

    class FakeSession:
        def __init__(self, app_id):
            self.sparkContext = FakeCtx(app_id)

        def stop(self):
            self.sparkContext._jsc = None

    saved = dict(simq._SUBSTRATE_MEMO)
    simq._SUBSTRATE_MEMO.clear()
    try:
        s1 = FakeSession("app-1")
        builds = []
        v1 = simq._memoized("lpa", s1, "/sf", lambda: builds.append(1) or "sub1")
        assert v1 == "sub1" and len(builds) == 1
        # Same session + sf -> memo hit, no rebuild.
        assert simq._memoized("lpa", s1, "/sf", lambda: builds.append(1) or "X") == "sub1"
        assert len(builds) == 1
        # Distinct sf_dir and kind are distinct keys.
        assert simq._memoized("lpa", s1, "/sf10", lambda: "sub1b") == "sub1b"
        assert simq._memoized("knn", s1, "/sf", lambda: "sub1c") == "sub1c"
        # A second live session with a different applicationId must NOT be
        # served the first session's substrate.
        s2 = FakeSession("app-2")
        assert simq._memoized("lpa", s2, "/sf", lambda: "sub2") == "sub2"
        # Stopping s1 evicts ALL of its entries on the next access.
        s1.stop()
        simq._memoized("lpa", s2, "/sf", lambda: "unused")
        assert all(k[1] != "app-1" for k in simq._SUBSTRATE_MEMO)
        assert ("lpa", "app-2", "/sf") in simq._SUBSTRATE_MEMO
    finally:
        simq._SUBSTRATE_MEMO.clear()
        simq._SUBSTRATE_MEMO.update(saved)


def test_plan_bits_and_bands_joint_narrowing():
    """r10 ADVICE guard: the joint planner keeps the adaptive band
    width when the recall-driven band count fits max_bands, narrows
    bands (sheds bits) exactly as far as needed on large corpora where
    the adaptive width alone would make every realistic target
    infeasible, and still raises for truly infeasible points."""
    import math

    import pytest as _pytest

    from variantcalling_spark.operators.similarity import (
        adaptive_band_bits,
        plan_bits_and_bands,
        planned_bands_for_recall,
    )

    # Small corpus: adaptive width fits -> unchanged from the old path.
    n_small = 1000
    bits_small = adaptive_band_bits(n_small)
    bits, bands = plan_bits_and_bands(0.9, 0.7, n_small)
    assert bits == bits_small
    assert bands == planned_bands_for_recall(0.9, 0.7, bits_small)
    # 1M-row corpus at threshold 0.9: adaptive width is 22 bits, where
    # recall 0.9 needs ~90 bands (the ADVICE example) -- the joint
    # planner must narrow instead of raising.
    n_big = 1_000_000
    assert adaptive_band_bits(n_big) == 22
    bits, bands = plan_bits_and_bands(0.9, 0.9, n_big)
    assert bits < 22 and bands <= 16
    p = 1.0 - math.acos(0.9) / math.pi
    achieved = 1.0 - (1.0 - p**bits) ** bands
    assert achieved >= 0.9
    # Minimal narrowing: one more bit would not have fit max_bands.
    with _pytest.raises(ValueError):
        planned_bands_for_recall(0.9, 0.9, bits + 1)
    # Truly infeasible even at min_bits still raises.
    with _pytest.raises(ValueError):
        plan_bits_and_bands(0.05, 0.9999, n_big, max_bands=2, min_bits=4)


def test_q519_multilevel_monotone_and_guarded(spark, sf_dir):
    """The full Leiden loop's executable guarantees (r10 verdict ask
    #4): q_best_num is monotonically non-decreasing across levels BY
    CONSTRUCTION (the strict-improvement guard), an accepted level's
    q_num IS the new best, a rejected level leaves the best untouched,
    and the shared exact denominator never changes."""
    from variantcalling_spark.queries.similarity import q519_leiden_multilevel

    rows = sorted(
        q519_leiden_multilevel(spark, sf_dir).collect(), key=lambda r: r.step
    )
    assert len(rows) >= 3 and rows[0].phase == "refine0" and rows[0].accepted
    assert len({r.q_den for r in rows}) == 1 and rows[0].q_den > 0
    best = rows[0].q_best_num
    assert best == rows[0].q_num
    for prev, r in zip(rows, rows[1:]):
        assert r.q_best_num >= prev.q_best_num  # monotone ledger
        if r.accepted:
            assert r.q_num > prev.q_best_num and r.q_best_num == r.q_num
        else:
            assert r.q_num <= prev.q_best_num and r.q_best_num == prev.q_best_num


def test_planned_minhash_bands_closed_form_and_default_equality(spark, sf_dir):
    """MinHash (b, r) planner (r10 verdict ask #5, mirroring the cosine
    planner): closed-form band counts checked against an independent
    S-curve evaluation, infeasible points raise, and a target that
    plans exactly the shipped 8-band default reproduces the default
    8x4 candidate set bit-for-bit with a signature sized to b*r."""
    import math

    import pytest as _pytest

    from variantcalling_spark.operators.dedup import (
        planned_minhash_bands_for_recall,
        planned_minhash_candidates,
        portable_band_candidates,
        portable_minhash_signatures,
        shingles,
    )
    from variantcalling_spark.queries.dedup import corpus

    # threshold 0.6, r=4: per-band collision 0.6^4 = 0.1296
    assert planned_minhash_bands_for_recall(0.6, 0.5, 4) == 5
    assert planned_minhash_bands_for_recall(0.6, 0.67, 4) == 8  # the default dial
    # 0.6/0.9/r4 needs 17 bands -> over the 16-band signature cap
    with _pytest.raises(ValueError):
        planned_minhash_bands_for_recall(0.6, 0.9, 4, max_bands=16)
    with _pytest.raises(ValueError):
        planned_minhash_bands_for_recall(0.6, 1.0, 4)
    # independent evaluation: planned b achieves the floor, b-1 does not
    for thr, tgt, r in ((0.6, 0.67, 4), (0.7, 0.8, 4), (0.8, 0.9, 2)):
        b = planned_minhash_bands_for_recall(thr, tgt, r)
        curve = lambda bb: 1.0 - (1.0 - thr**r) ** bb
        assert curve(b) >= tgt and (b == 1 or curve(b - 1) < tgt)
    # default-equality pin on the real corpus
    sh = shingles(corpus(spark, sf_dir), n=3).cache()
    planned, b = planned_minhash_candidates(sh, 0.6, target_recall=0.67)
    assert b == 8
    got = {(r.doc_a, r.doc_b) for r in planned.collect()}
    sig = portable_minhash_signatures(sh, 32)
    want = {(r.doc_a, r.doc_b) for r in portable_band_candidates(sig, 8, 4).collect()}
    assert got == want and len(want) > 0


def test_q528_knn_shapley_matches_direct_recursion(spark, sf_dir):
    """q528's window-suffix-sum form equals a direct numpy replay of
    the Jia et al. (2019) Theorem-1 recursion, per training point (the
    efficiency axiom comes free: both forms telescope to the same
    per-test utilities). Validates the closed form independently of
    the SQL oracle."""
    import numpy as np
    import pandas as pd

    from variantcalling_spark.queries.similarity import (
        _SHAPLEY_K,
        _SHAPLEY_TEST_MOD,
        q528_knn_shapley_valuation,
    )

    got = {
        r.vec_id: r.shapley
        for r in q528_knn_shapley_valuation(spark, sf_dir).collect()
    }

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    qv = np.round(np.stack(emb.embedding.to_numpy()).astype(np.float64) * 100_000)
    labels = emb.label.to_numpy()
    ids = emb.vec_id.to_numpy()
    is_test = ids % _SHAPLEY_TEST_MOD == 0
    ti, ci = np.where(is_test)[0], np.where(~is_test)[0]
    n, phis = len(ci), {int(ids[j]): 0.0 for j in ci}
    for t in ti:
        d2 = ((qv[ci] - qv[t]) ** 2).sum(axis=1)
        order = ci[np.lexsort((ids[ci], d2))]
        ind = (labels[order] == labels[t]).astype(float)
        s = np.zeros(n)
        s[n - 1] = round(ind[n - 1] * min(_SHAPLEY_K, n) / (_SHAPLEY_K * float(n)), 9)
        for i in range(n - 2, -1, -1):
            s[i] = s[i + 1] + round(
                (ind[i] - ind[i + 1])
                * min(_SHAPLEY_K, i + 1)
                / (_SHAPLEY_K * (i + 1.0)),
                9,
            )
        for i, j in enumerate(order):
            phis[int(ids[j])] += s[i]
    assert len(got) == n
    for vid, phi in phis.items():
        assert abs(got[vid] - phi / len(ti)) < 1e-5, vid


def test_q531_planted_hierarchy_depth_and_stall(spark, sf_dir):
    """The planted two-level hierarchy drives the guarded Leiden loop
    PAST the kNN substrate's level-2 stall: >= 3 consecutive accepted
    levels from the singleton start, monotone q_best, a strictly
    shrinking community count while accepting, and the final level
    recording a stall (accepted=false, state untouched). Also pins the
    substrate: symmetric edges, no self-loops, every node
    degree >= 2."""
    from pyspark.sql import functions as F

    from variantcalling_spark.queries.similarity import (
        _planted_frames,
        q531_leiden_planted_hierarchy,
    )

    rows = sorted(
        q531_leiden_planted_hierarchy(spark, sf_dir).collect(),
        key=lambda r: r.step,
    )
    assert rows[0].phase == "init" and rows[0].accepted
    accepted_levels = [r for r in rows[1:] if r.accepted]
    assert len(accepted_levels) >= 3
    assert not rows[-1].accepted  # the ledger captures the stall
    best = rows[0].q_best_num
    prev_n = rows[0].n_comms
    for r in rows[1:]:
        assert r.q_best_num >= best
        best = r.q_best_num
        if r.accepted:
            assert r.n_comms < prev_n
            prev_n = r.n_comms

    edges, deg, m2t, sing = _planted_frames(spark, sf_dir)
    assert edges.where(F.col("src") == F.col("dst")).count() == 0
    rev = edges.select(
        F.col("dst").alias("src"), F.col("src").alias("dst")
    )
    assert edges.exceptAll(rev).count() == 0  # symmetric
    assert deg.agg(F.min("k")).collect()[0][0] >= 2


def test_q532_sharded_values_track_exact(spark, sf_dir):
    """The sharded estimator is q528's deployment dial: every training
    row valued exactly once (its own hash shard), per-shard
    efficiency holds (summing all values x n_tests == sum over
    (test, shard) of v(shard) == (1/K) sum of top-min(K,Ns)
    indicators), and the sharded ranking tracks the exact one
    (positive Spearman rank correlation)."""
    from variantcalling_spark.queries.similarity import (
        _SHAPLEY_SHARDS,
        q528_knn_shapley_valuation,
        q532_sharded_knn_shapley,
    )

    exact = {
        r.vec_id: r.shapley
        for r in q528_knn_shapley_valuation(spark, sf_dir).collect()
    }
    sharded = {}
    for r in q532_sharded_knn_shapley(spark, sf_dir).collect():
        assert r.shard == r.vec_id % _SHAPLEY_SHARDS
        assert r.vec_id not in sharded  # one value per row
        sharded[r.vec_id] = r.shapley
    assert set(sharded) == set(exact)

    def ranks(d):
        order = sorted(d, key=lambda k: (d[k], k))
        return {k: i for i, k in enumerate(order)}
    ra, rb = ranks(exact), ranks(sharded)
    n = len(exact)
    d2 = sum((ra[k] - rb[k]) ** 2 for k in exact)
    rho = 1 - 6 * d2 / (n * (n * n - 1))
    assert rho > 0.5, rho
