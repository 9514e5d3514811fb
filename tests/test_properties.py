"""Property-based tests (hypothesis): the distributed operators must
equal naive single-threaded Python reference implementations on
arbitrary inputs — beyond the reference repo's example-based testing
(SURVEY.md §5 notes it has no property tests; we exceed that bar).

Hypothesis drives only the INPUT GENERATION; each case runs through the
real Spark operators. Sizes are kept small so the whole module stays
fast; `deadline=None` because Spark job latency varies.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from variantcalling_spark.operators.kernels import compress_gvcf_blocks
from variantcalling_spark.operators.ordered import merge_intervals, running_extent_dedup

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

intervals_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=60),  # start
        st.integers(min_value=1, max_value=25),  # length
    ),
    min_size=1,
    max_size=25,
)


def naive_merge(iv):
    iv = sorted((s, s + ln) for s, ln in iv)
    out = [list(iv[0])]
    for s, e in iv[1:]:
        if s > out[-1][1]:
            out.append([s, e])
        else:
            out[-1][1] = max(out[-1][1], e)
    return [tuple(x) for x in out]


@given(iv=intervals_strategy)
@settings(**SETTINGS)
def test_merge_intervals_matches_naive(spark, iv):
    df = spark.createDataFrame(
        [("c1", s, s + ln) for s, ln in iv], "chrom string, start long, end long"
    )
    got = sorted(
        (r.start, r.end) for r in merge_intervals(df, ["chrom"]).collect()
    )
    assert got == naive_merge(iv)


@given(iv=intervals_strategy)
@settings(**SETTINGS)
def test_running_extent_dedup_matches_naive(spark, iv):
    rows = sorted((s, s + ln) for s, ln in iv)
    df = spark.createDataFrame(
        [("c1", i, s, e) for i, (s, e) in enumerate(rows)],
        "chrom string, rid long, start long, end long",
    )
    out = running_extent_dedup(df, ["chrom"], ["start", "end", "rid"])
    got = {r.rid: r.kept for r in out.collect()}
    run_max = None
    for i, (s, e) in enumerate(rows):
        expect = run_max is None or s >= run_max
        assert got[i] == expect, (i, rows)
        run_max = e if run_max is None else max(run_max, e)


gvcf_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # 0 PASS, 1 RefCall, 2 LowQual-RefCall
        st.integers(min_value=0, max_value=59),  # gq
    ),
    min_size=1,
    max_size=40,
)


def naive_compress(recs, ref_thr=22, merge_thr=10):
    """Single-threaded reference fold of the documented block semantics."""
    out = []
    blk = None

    def flush():
        nonlocal blk
        if blk is not None:
            out.append(("blk", blk["pos"], blk["n"], blk["min_gq"]))
            blk = None

    for pos, (kind, gq) in enumerate(recs):
        filt = "PASS" if kind == 0 else "RefCall"
        mergeable = filt == "RefCall" and gq >= ref_thr
        if not mergeable:
            flush()
            out.append(("solo", pos, 1, gq))
            continue
        if blk is None:
            blk = {"pos": pos, "min_gq": gq, "max_gq": gq, "n": 1}
        else:
            nmin, nmax = min(blk["min_gq"], gq), max(blk["max_gq"], gq)
            if nmax - nmin < merge_thr:
                blk.update(min_gq=nmin, max_gq=nmax, n=blk["n"] + 1)
            else:
                flush()
                blk = {"pos": pos, "min_gq": gq, "max_gq": gq, "n": 1}
    flush()
    return sorted(out, key=lambda t: t[1])


@given(recs=gvcf_strategy)
@settings(**SETTINGS)
def test_compress_gvcf_matches_naive(spark, recs):
    rows = [
        (
            "c1",
            pos,
            pos,
            "PASS" if kind == 0 else "RefCall",
            gq,
            30,
            30,
            [0, gq, 99],
        )
        for pos, (kind, gq) in enumerate(recs)
    ]
    df = spark.createDataFrame(
        rows,
        "chrom string, pos long, stop long, filter string, gq int, "
        "min_dp int, dp int, pl array<int>",
    )
    got = sorted(
        (r.pos, r.n_merged, r.gq)
        for r in compress_gvcf_blocks(df).collect()
    )
    expect = [(pos, n, gq) for _, pos, n, gq in naive_compress(recs)]
    assert got == expect
    # conservation: every input record lands in exactly one output row
    assert sum(n for _, n, _ in got) == len(recs)


@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
@settings(**SETTINGS)
def test_portable_hash_matches_duckdb(spark, words):
    """The portable string hash (the basis of every value-oracled LSH
    path) must agree bit-for-bit with its DuckDB rendering on arbitrary
    printable-ascii strings, including the empty string."""
    import duckdb

    from pyspark.sql import functions as F

    from variantcalling_spark.operators.dedup import (
        PORTABLE_HASH_SQL,
        portable_string_hash,
    )

    df = spark.createDataFrame([(w,) for w in words], "s string")
    got = {r.s: r.v for r in df.select("s", portable_string_hash(F.col("s")).alias("v")).collect()}

    con = duckdb.connect()
    expr = PORTABLE_HASH_SQL.format(col="s")
    want = dict(
        con.execute(
            f"SELECT s, {expr} FROM (SELECT unnest(?) AS s)", [words]
        ).fetchall()
    )
    assert got == want


# --- round-4 operators ---

words_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=5, max_size=14
    ).map(" ".join),
    min_size=2,
    max_size=8,
)


def naive_dup_spans(docs, k=3, min_docs=2):
    """Single-threaded reference: duplicated k-shingle covered positions
    -> maximal islands per doc."""
    sh_occ = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        for i in range(len(toks) - k + 1):
            sh_occ.setdefault(" ".join(toks[i : i + k]), []).append((doc_id, i))
    dup = {s for s, occ in sh_occ.items() if len({d for d, _ in occ}) >= min_docs}
    covered = {}
    for s in dup:
        for doc_id, i in sh_occ[s]:
            covered.setdefault(doc_id, set()).update(range(i, i + k))
    out = set()
    for doc_id, pos in covered.items():
        pos = sorted(pos)
        start = prev = pos[0]
        for p in pos[1:]:
            if p > prev + 1:
                out.add((doc_id, start, prev, prev - start + 1))
                start = p
            prev = p
        out.add((doc_id, start, prev, prev - start + 1))
    return out


@given(texts=words_strategy)
@settings(**SETTINGS)
def test_substring_dedup_spans_match_naive(spark, texts):
    from variantcalling_spark.operators.dedup import duplicated_substring_spans

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_tokens)
        for r in duplicated_substring_spans(df, k=3, min_docs=2).collect()
    }
    assert got == naive_dup_spans(docs, k=3, min_docs=2)


bam_records_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # flag selector
        st.integers(min_value=1, max_value=99999),  # pos (1-based)
        st.integers(min_value=0, max_value=60),     # mapq
        st.lists(                                   # cigar ops
            st.tuples(
                st.integers(min_value=1, max_value=120),
                st.sampled_from(list("MIDNSHP=X")),
            ),
            min_size=0,
            max_size=4,
        ),
    ),
    min_size=1,
    max_size=12,
)


@given(recs=bam_records_strategy)
@settings(**SETTINGS)
def test_bam_record_codec_round_trip(recs):
    """pack_bam -> bgzf -> parse_bam_bytes must reproduce every field of
    every record for arbitrary flags/positions/CIGARs (no Spark needed —
    the codec is the unit under test)."""
    from variantcalling_spark.sources.bam import (
        bgzf_compress,
        pack_bam,
        parse_bam_bytes,
    )

    flags = [0, 4, 16, 1024]
    rows = [
        dict(
            qname=f"r{i}",
            flag=flags[fs],
            chrom="cX" if flags[fs] != 4 else "*",
            pos=pos if flags[fs] != 4 else 0,
            mapq=mapq,
            cigar="".join(f"{n}{op}" for n, op in ops) if ops else "*",
        )
        for i, (fs, pos, mapq, ops) in enumerate(recs)
    ]
    raw = pack_bam(rows, refs=[("cX", 10**6)])
    df = parse_bam_bytes(bgzf_compress(raw, block_size=96))
    assert len(df) == len(rows)
    for want, got in zip(rows, df.to_dict("records")):
        assert got["qname"] == want["qname"]
        assert got["flag"] == want["flag"]
        assert got["chrom"] == want["chrom"]
        assert got["pos"] == want["pos"]
        assert got["mapq"] == want["mapq"]
        assert got["cigar"] == want["cigar"]


runs_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=100_000),  # start
        st.integers(min_value=1, max_value=500),  # length
        st.integers(min_value=0, max_value=1 << 20),  # integer depth value
    ),
    min_size=1,
    max_size=60,
)


@given(runs=runs_strategy, compress=st.booleans())
@settings(**SETTINGS)
def test_bigwig_section_codec_roundtrip(runs, compress):
    """encode_section/decode_section are exact inverses for arbitrary
    sorted run lists (pure codec — no Spark in the loop, so hypothesis
    can push many cases). Integer depths stay exact through the
    float32 value field (all < 2^24)."""
    from variantcalling_spark.sources.bigwig import decode_section, encode_section

    items = sorted((s, s + ln, float(v)) for s, ln, v in runs)
    blob, raw_size = encode_section(3, items, compress)
    assert raw_size == 24 + 12 * len(items)
    assert decode_section(blob, compress) == [(3, s, e, v) for s, e, v in items]


@given(runs=runs_strategy)
@settings(**SETTINGS)
def test_bigwig_file_roundtrip_pure(runs, tmp_path_factory):
    """Whole-file assembly/index round-trip on arbitrary inputs, driven
    through the pure encode/assemble/read path (one section per call
    keeps it Spark-free and fast): every section registered in the
    R-tree must come back with its exact byte range."""
    import os

    from variantcalling_spark.sources.bigwig import (
        assemble_bigwig,
        decode_section,
        encode_section,
        read_bigwig_index,
    )

    items = sorted((s, s + ln, float(v)) for s, ln, v in runs)
    half = max(1, len(items) // 2)
    secs = []
    for chunk in (items[:half], items[half:]):
        if not chunk:
            continue
        blob, raw = encode_section(0, chunk)
        secs.append(
            {
                "chrom_id": 0,
                "start_bp": chunk[0][0],
                "end_bp": chunk[-1][1],
                "n_items": len(chunk),
                "raw_size": raw,
                "blob": blob,
                "valid_count": sum(e - s for s, e, _ in chunk),
                "min_val": min(v for _, _, v in chunk),
                "max_val": max(v for _, _, v in chunk),
                "sum_data": sum(v * (e - s) for s, e, v in chunk),
                "sum_squares": sum(v * v * (e - s) for s, e, v in chunk),
            }
        )
    path = os.path.join(tmp_path_factory.mktemp("bw"), "prop.bw")
    assemble_bigwig(secs, {"c0": 200_000}, path)
    idx = read_bigwig_index(path)
    # UCSC dataCount semantics: the header count is data SECTIONS
    assert idx["n_sections"] == len(secs)
    got = []
    with open(path, "rb") as f:
        data = f.read()
    for off, size in idx["sections"]:
        got.extend(decode_section(data[off : off + size], True))
    assert sorted(got) == [(0, s, e, v) for s, e, v in items]


@given(texts=words_strategy)
@settings(**SETTINGS)
def test_cdc_chunks_reconstruct_and_match_naive(spark, texts):
    """CDC chunking invariants on arbitrary inputs: chunks partition the
    token stream exactly (concatenating a doc's chunks in chunk_id order
    reproduces the text), chunk ids are dense from 0, and the boundary
    rule matches a single-threaded reference."""
    import hashlib

    from variantcalling_spark.operators.dedup import cdc_chunks

    M31 = 2147483647
    mod = 4

    def phash(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % M31

    def naive(doc_id, text):
        ws = text.split(" ")
        chunks, cur = [], [ws[0]]
        for t in ws[1:]:
            if phash(t) % mod == 0:
                chunks.append(cur)
                cur = [t]
            else:
                cur.append(t)
        chunks.append(cur)
        return [
            (doc_id, i, phash(" ".join(c)), len(c))
            for i, c in enumerate(chunks)
        ]

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.chunk_id, r.chunk_hash, r.n_tokens)
        for r in cdc_chunks(df, boundary_mod=mod).collect()
    )
    want = sorted(row for d, t in docs for row in naive(d, t))
    assert got == want
    # token partition: per doc, chunk token counts sum to the doc length
    for d, t in docs:
        assert sum(n for dd, _, _, n in got if dd == d) == len(t.split(" "))


@given(texts=words_strategy)
@settings(**SETTINGS)
def test_containment_prefix_filter_is_lossless(spark, texts):
    """Every pair at-or-above the containment threshold must survive the
    asymmetric prefix filter: verify(candidates) == verify(all pairs)."""
    from variantcalling_spark.operators.dedup import (
        containment_candidate_pairs,
        jaccard_for_pairs,
        shingles,
    )
    from pyspark.sql import functions as F

    t = 0.6
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    sh = shingles(df, n=2)
    shl = sh.collect()
    sets: dict[int, set] = {}
    for r in shl:
        sets.setdefault(r.doc_id, set()).add(r.shingle)
    want = set()
    for a, sa in sets.items():
        for b, sb in sets.items():
            if a != b and len(sa & sb) / len(sa) >= t:
                want.add((a, b))
    cands = containment_candidate_pairs(sh, threshold=t)
    got = {
        (r.doc_a, r.doc_b)
        for r in jaccard_for_pairs(cands, sh)
        .where(F.col("n_shared") / F.col("n_a") >= t)
        .collect()
    }
    assert got == want


# ---- round-6 kernels ------------------------------------------------------

dna_strategy = st.lists(
    st.text(alphabet="ACGT", min_size=0, max_size=10), min_size=2, max_size=8
)


def naive_nw(a, b, match=2, mis=-1, gap=-2):
    n, m = len(a), len(b)
    dp = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        dp[i][0] = gap * i
    for j in range(m + 1):
        dp[0][j] = gap * j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            s = match if a[i - 1] == b[j - 1] else mis
            dp[i][j] = max(dp[i - 1][j - 1] + s, dp[i - 1][j] + gap, dp[i][j - 1] + gap)
    return dp[n][m]


@given(seqs=dna_strategy)
@settings(**SETTINGS)
def test_nw_kernel_matches_naive_dp(spark, seqs):
    """The vectorized NW kernel (running-max closed form for the
    left-gap chain) must equal the O(n*m) cell-by-cell reference DP on
    arbitrary strings, including empty sides."""
    from variantcalling_spark.operators.kernels import nw_align_scores

    pairs = [(i, seqs[i], seqs[(i + 1) % len(seqs)]) for i in range(len(seqs))]
    df = spark.createDataFrame(pairs, "pair_id long, a string, b string")
    got = {r.pair_id: r.nw_score for r in nw_align_scores(df).collect()}
    for pid, a, b in pairs:
        assert got[pid] == naive_nw(a, b), (a, b)


def reference_bpe(word, merges):
    """GPT-2/HF reference encode: pick the lowest-rank pair present,
    merge ALL its occurrences greedily left-to-right, repeat."""
    ranks = {p: i for i, p in enumerate(merges)}
    syms = list(word)
    while len(syms) >= 2:
        pairs = {(syms[i], syms[i + 1]) for i in range(len(syms) - 1)}
        best = min(pairs, key=lambda p: ranks.get(p, len(merges)))
        if best not in ranks:
            break
        u, v = best
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == u and syms[i + 1] == v:
                out.append(u + v)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


bpe_words = st.lists(
    st.text(alphabet="abc", min_size=0, max_size=8), min_size=1, max_size=5
)
bpe_merges = st.lists(
    st.tuples(st.text(alphabet="abc", min_size=1, max_size=2),
              st.text(alphabet="abc", min_size=1, max_size=2)),
    min_size=0,
    max_size=6,
    unique=True,
)


@given(words=bpe_words, merges=bpe_merges)
@settings(**SETTINGS)
def test_bpe_kernel_matches_reference(spark, words, merges):
    """apply_bpe_merges must agree with the independent HF-style
    reference encoder on arbitrary words and merge tables, including
    hierarchical merges over already-merged symbols."""
    from variantcalling_spark.operators.kernels import apply_bpe_merges

    df = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    out = apply_bpe_merges(df, merges).collect()[0]
    want = [reference_bpe(w, merges) for w in words if w]
    assert out.tokens == "|".join(" ".join(e) for e in want)
    assert out.n_tokens == sum(len(e) for e in want)


rank_rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=-50, max_value=50),   # value
        st.integers(min_value=0, max_value=9),      # tie
    ),
    min_size=1,
    max_size=40,
)


@given(rows=rank_rows_strategy, width=st.integers(min_value=1, max_value=16))
@settings(**SETTINGS)
def test_distributed_row_number_property(spark, rows, width):
    """distributed_row_number == the single-partition row_number for
    arbitrary (value, tie) multisets and arbitrary bucket widths."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from variantcalling_spark.operators.ordered import distributed_row_number

    df = spark.createDataFrame(
        [(i, v, t) for i, (v, t) in enumerate(rows)],
        "rid long, v long, tie long",
    )
    exp = {
        (r.rid, r.rn)
        for r in df.select(
            "rid", F.row_number().over(W.orderBy("v", "tie", "rid")).alias("rn")
        ).collect()
    }
    got = {
        (r.rid, r.rn)
        for r in distributed_row_number(
            df,
            [F.col("v"), F.col("tie"), F.col("rid")],
            F.floor(F.col("v") / width).cast("bigint"),
        ).collect()
    }
    assert got == exp


@given(
    vals=st.lists(
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=30,
    ),
    width=st.integers(min_value=1, max_value=32),
)
@settings(**SETTINGS)
def test_value_at_rank_bucketed_property(spark, vals, width):
    """value_at_rank_bucketed == sorted-list indexing for arbitrary
    float multisets, both directions, every rank."""
    from variantcalling_spark.operators.ordered import value_at_rank_bucketed

    df = spark.createDataFrame([(v,) for v in vals], "score double")
    n = len(vals)
    ranks = df.sparkSession.createDataFrame(
        [(k,) for k in range(1, n + 1)], "k long"
    )
    for descending in (False, True):
        ordered = sorted(vals, reverse=descending)
        got = {
            r.k: r.value_at_rank
            for r in value_at_rank_bucketed(
                df, "score", ranks, bucket_width=float(width),
                descending=descending,
            ).collect()
        }
        for k in range(1, n + 1):
            assert got[k] == ordered[k - 1], (descending, k)


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**9), min_size=5,
                  max_size=40, unique=True),
    n_old=st.integers(min_value=2, max_value=6),
    extra=st.integers(min_value=1, max_value=6),
)
@settings(**SETTINGS)
def test_rendezvous_movement_property(spark, keys, n_old, extra):
    """HRW minimal-movement on ARBITRARY key sets and ring sizes: for
    any grow n_old -> n_old+extra, (a) no key moves between surviving
    shards, (b) keys that move land on a NEW shard, (c) the Spark
    assignment equals a pure-Python recomputation of the same md5
    weights (the operator is a pure function of its spec)."""
    import hashlib

    from variantcalling_spark.operators.sharding import (
        rendezvous_shard,
        shard_movement_audit,
    )

    n_new = n_old + extra
    df = spark.createDataFrame([(k,) for k in keys], "doc_id bigint")
    row = shard_movement_audit(df, "doc_id", n_old=n_old, n_new=n_new).head()
    assert row.n_moved_to_surviving == 0
    assert 0 <= row.n_moved <= row.n_keys

    def hrw(k, n):
        def w(s):
            h = hashlib.md5(f"{k}:{s}".encode()).hexdigest()[:8]
            return int(h, 16) % 2147483647
        ws = [w(s) for s in range(n)]
        return ws.index(max(ws))

    got = {r.doc_id: r.shard for r in rendezvous_shard(df, "doc_id", n_new).collect()}
    for k in keys:
        assert got[k] == hrw(k, n_new)


@given(
    words=st.lists(
        st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff", "gg"]),
        min_size=3, max_size=40,
    ),
    w=st.integers(min_value=2, max_value=6),
)
@settings(**SETTINGS)
def test_winnowing_matches_reference_selection(spark, words, w):
    """Windowed AND rowwise winnowing equal a naive Python reference
    (min with rightmost tie-break per window, plus the short-doc
    first-window branch) on arbitrary word sequences and window
    sizes — and equal each other."""
    import hashlib

    from variantcalling_spark.operators.dedup import (
        MERSENNE31,
        rowwise_winnowing_fingerprints,
        winnowing_fingerprints,
    )

    n = 3
    text = " ".join(words)
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % MERSENNE31

    grams = [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]
    hashes = [h(g) for g in grams]
    want = set()
    if hashes:
        if len(hashes) < w:
            window = hashes
            m = min(window)
            pos = max(i for i, v in enumerate(window) if v == m)
            want.add((pos + 1, m))
        else:
            for j in range(len(hashes) - w + 1):
                window = hashes[j:j + w]
                m = min(window)
                pos = j + max(i for i, v in enumerate(window) if v == m)
                want.add((pos + 1, m))

    got_w = {(r.pos, r.h) for r in winnowing_fingerprints(df, n=n, w=w).collect()}
    got_r = {(r.pos, r.h) for r in rowwise_winnowing_fingerprints(df, n=n, w=w).collect()}
    assert got_w == want
    assert got_r == want


@given(
    texts=st.lists(
        st.lists(st.sampled_from(["x", "y", "z", "p", "q"]), min_size=3,
                 max_size=12).map(" ".join),
        min_size=2, max_size=6,
    ),
    reps=st.integers(min_value=2, max_value=4),
)
@settings(**SETTINGS)
def test_weighted_jaccard_repetition_property(spark, texts, reps):
    """Multiset-Jaccard contracts, executed on arbitrary corpora:
    (a) J_w(doc, doc) = 1; (b) against a doc repeated ``reps`` times,
    J_w(doc, doc^reps) = 1/reps exactly (shared multiset = one copy of
    every positional shingle... the min picks the single count) when
    the doc has no internal repeats of its boundary shingles —
    asserted via the exact integer identity num = tot_orig and
    den = tot_rep instead of the fragile closed form."""
    from pyspark.sql import functions as F2

    from variantcalling_spark.operators.dedup import (
        tf_shingles,
        weighted_jaccard_for_pairs,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    rows += [(100 + i, " ".join([t] * reps)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    docs = docs.where(F2.size(F2.split("text", " ")) >= 3)
    tf = tf_shingles(docs, n=3)
    pairs = spark.createDataFrame(
        [(i, i) for i in range(len(texts))], "doc_a bigint, doc_b bigint"
    )
    # J_w(doc, doc): join the SAME doc id on both sides via tf twice
    self_pairs = spark.createDataFrame(
        [(i,) for i in range(len(texts))], "doc_a bigint"
    ).select("doc_a", F2.col("doc_a").alias("doc_b"))
    self_j = weighted_jaccard_for_pairs(self_pairs, tf).collect()
    for r in self_j:
        assert abs(r.jaccard_weighted - 1.0) < 1e-12

    rep_pairs = spark.createDataFrame(
        [(i, 100 + i) for i in range(len(texts))], "doc_a bigint, doc_b bigint"
    )
    for r in weighted_jaccard_for_pairs(rep_pairs, tf).collect():
        # w_shared <= tot_a (min-sum bounded by the smaller multiset)
        assert r.w_shared <= min(r.tot_a, r.tot_b)
        assert 0.0 < r.jaccard_weighted <= 1.0


shapley_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=100),  # dist
        st.booleans(),  # label matches test?
    ),
    min_size=1,
    max_size=20,
)


@given(cands=shapley_strategy, k=st.integers(min_value=1, max_value=6))
@settings(**SETTINGS)
def test_knn_shapley_matches_recursion_and_efficiency(spark, cands, k):
    """knn_shapley_values == the direct Jia et al. recursion on
    arbitrary (distance, match) configurations — including distance
    ties (id tie-break) and K > N — and satisfies the EFFICIENCY
    axiom: sum of values == utility of the full set == (matching
    among the K nearest)/K."""
    from pyspark.sql import functions as F

    from variantcalling_spark.operators.similarity import knn_shapley_values

    df = spark.createDataFrame(
        [(0, i, d, 1.0 if m else 0.0) for i, (d, m) in enumerate(cands)],
        "test_id int, cand_id int, dist2 long, ind double",
    )
    got = {
        r.cand_id: float(r.sv)
        for r in knn_shapley_values(df, k=k).collect()
    }

    order = sorted(range(len(cands)), key=lambda i: (cands[i][0], i))
    ind = [1.0 if cands[i][1] else 0.0 for i in order]
    n = len(ind)
    s = [0.0] * n
    s[n - 1] = round(ind[n - 1] * min(k, n) / (k * float(n)), 9)
    for i in range(n - 2, -1, -1):
        s[i] = s[i + 1] + round(
            (ind[i] - ind[i + 1]) * min(k, i + 1) / (k * (i + 1.0)), 9
        )
    want = {order[i]: s[i] for i in range(n)}
    assert set(got) == set(want)
    for cid in want:
        assert abs(got[cid] - want[cid]) < 1e-9, cid
    # efficiency: the values telescope to v(full) = (1/K) sum_{top-K} ind
    v_full = sum(ind[: min(k, n)]) / k
    assert abs(sum(got.values()) - v_full) < 1e-6


kn_counts_strategy = st.dictionaries(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # w1 id
        st.integers(min_value=0, max_value=4),  # w2 id
    ),
    st.integers(min_value=1, max_value=9),
    min_size=1,
    max_size=20,
)


@given(big=kn_counts_strategy)
@settings(max_examples=50, deadline=None)
def test_kneser_ney_formula_is_proper(big):
    """Pure-formula property behind q529: for ANY bigram count table,
    interpolated KN with D in (0,1] sums to exactly 1 over the full
    continuation vocabulary for every in-model context — the discount
    mass D*N1+(w1.)/c(w1) re-enters through P_cont, whose weights
    N1+(.w2)/types sum to 1 by construction."""
    D = 0.75
    c1: dict[int, int] = {}
    nf: dict[int, int] = {}
    nb: dict[int, int] = {}
    for (w1, w2), c in big.items():
        c1[w1] = c1.get(w1, 0) + c
        nf[w1] = nf.get(w1, 0) + 1
        nb[w2] = nb.get(w2, 0) + 1
    tt = len(big)
    for w1 in c1:
        tot = sum(
            (max(big.get((w1, w2), 0) - D, 0.0) + D * nf[w1] * (nb[w2] / tt))
            / c1[w1]
            for w2 in nb
        )
        assert abs(tot - 1.0) < 1e-9, w1


graph_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # community
        st.integers(min_value=0, max_value=15),  # node a
        st.integers(min_value=-1, max_value=15),  # b: -1 marker, else edge
    ),
    min_size=1,
    max_size=30,
)


@given(rows=graph_strategy)
@settings(**SETTINGS)
def test_community_piece_labels_matches_naive_union_find(spark, rows):
    """community_piece_labels == a pure-python union-find per
    community, on arbitrary (community, edge|marker) relations —
    BOTH paths (Arrow fold and the star-contraction fallback forced
    with cap=1), including self-loop edges, repeated edges, and
    endpoints with no marker row."""
    from variantcalling_spark.operators.kernels import community_piece_labels

    df = spark.createDataFrame(rows, "community long, a long, b long")

    want: dict = {}
    for comm in {c for c, _, _ in rows}:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                x = parent[x]
            return x

        for c, a, b in rows:
            if c != comm:
                continue
            parent.setdefault(a, a)
            if b >= 0:
                parent.setdefault(b, b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        for n in parent:
            want[(comm, n)] = find(n)

    for cap in (1_000_000, 1):
        got = {
            (r.community, r.node): r.rc
            for r in community_piece_labels(df, max_group_rows=cap).collect()
        }
        assert got == want, cap
