"""Count-invariant + golden tests for the stateful genomic kernels,
mirroring the reference's test strategy (SURVEY.md §5: pinned counts
4438->1184 for compress, 17-removed for cleanup, on its own fixtures)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from variantcalling_spark.operators.kernels import (
    compress_gvcf_blocks,
    overlap_buffer_filter,
)


def _gvcf_rows():
    # chrom, pos, stop, filter, gq, min_dp, dp, pl
    return [
        # c1: run of near-constant GQ RefCalls -> one block
        ("c1", 100, 199, "RefCall", 40, 30, 35, [0, 60, 90]),
        ("c1", 200, 299, "RefCall", 43, 28, 33, [0, 55, 95]),
        ("c1", 300, 399, "RefCall", 38, 31, 36, [0, 58, 80]),
        # GQ jump >= 10 breaks the block
        ("c1", 400, 499, "RefCall", 55, 29, 34, [0, 70, 99]),
        # PASS flushes and is emitted as-is
        ("c1", 500, 501, "PASS", 50, None, 40, [50, 0, 80]),
        # low-GQ RefCall (< 22) emitted unmerged
        ("c1", 600, 699, "RefCall", 10, 20, 25, [0, 20, 30]),
        # new mergeable run
        ("c1", 700, 799, "RefCall", 30, 22, 27, [0, 40, 70]),
        ("c1", 800, 899, "RefCall", 33, 21, 26, [0, 42, 65]),
        # c2: chrom boundary must flush independently
        ("c2", 100, 199, "RefCall", 30, 10, 15, [0, 30, 60]),
        ("c2", 200, 299, "RefCall", 31, 12, 14, [0, 33, 55]),
    ]


GVCF_SCHEMA = (
    "chrom string, pos long, stop long, filter string, gq int, "
    "min_dp int, dp int, pl array<int>"
)


def test_compress_gvcf_blocks(spark):
    df = spark.createDataFrame(_gvcf_rows(), GVCF_SCHEMA)
    out = compress_gvcf_blocks(df, refcall_gq_threshold=22, merge_gq_threshold=10)
    rows = {(r.chrom, r.pos): r for r in out.collect()}
    # 10 input records -> 6 output blocks (3.75x-style compression shape)
    assert len(rows) == 6
    blk = rows[("c1", 100)]
    assert blk.stop == 399 and blk.n_merged == 3
    assert blk.gq == 38  # min GQ of the block
    assert blk.min_dp == 28  # min(coalesce(min_dp, dp))
    assert blk.pl == [0, 55, 80]  # elementwise min
    assert not blk.is_variant
    # the GQ-jump record starts its own block
    assert rows[("c1", 400)].n_merged == 1
    # PASS record: emitted as-is, flagged variant
    p = rows[("c1", 500)]
    assert p.is_variant and p.n_merged == 1 and p.gq == 50 and p.min_dp == 40
    # low-GQ RefCall: unmerged
    assert rows[("c1", 600)].n_merged == 1
    # second mergeable run
    assert rows[("c1", 700)].n_merged == 2 and rows[("c1", 700)].stop == 899
    # chrom boundary: c2 merges only within c2
    assert rows[("c2", 100)].n_merged == 2


def test_compress_gvcf_spread_is_running_not_pairwise(spark):
    # 30, 38, 34: pairwise diffs < 10 but running spread (38-30)+34 keeps
    # the block only while max-min < 10; adding 41 (spread 11) must break.
    rows = [
        ("c1", 1, 10, "RefCall", 30, 5, 6, [0, 1, 2]),
        ("c1", 11, 20, "RefCall", 38, 5, 6, [0, 1, 2]),
        ("c1", 21, 30, "RefCall", 34, 5, 6, [0, 1, 2]),
        ("c1", 31, 40, "RefCall", 41, 5, 6, [0, 1, 2]),
    ]
    df = spark.createDataFrame(rows, GVCF_SCHEMA)
    out = compress_gvcf_blocks(df).orderBy("pos").collect()
    assert [r.n_merged for r in out] == [3, 1]
    assert out[0].gq == 30 and out[0].stop == 30


def test_overlap_buffer_filter(spark):
    rows = [
        # chrom, pos, stop, is_deletion, is_null_gt
        ("c1", 100, 150, True, False),   # deletion spanning to 150
        ("c1", 120, 121, False, True),   # null-GT inside span -> removed
        ("c1", 150, 151, False, True),   # pos == stop boundary -> removed
        ("c1", 151, 152, False, True),   # past the span -> kept
        ("c1", 100, 101, False, True),   # SAME pos as deletion -> kept (strictly-earlier rule)
        ("c1", 130, 140, False, False),  # non-null-GT inside span -> kept
        ("c2", 120, 121, False, True),   # other contig -> kept
    ]
    df = spark.createDataFrame(
        rows, "chrom string, pos long, stop long, is_deletion boolean, is_null_gt boolean"
    )
    res = overlap_buffer_filter(df).collect()
    out = {(r.chrom, r.pos, r.stop): r.kept for r in res}
    assert out[("c1", 120, 121)] is False
    assert out[("c1", 150, 151)] is False  # pos == stop boundary: inside
    assert out[("c1", 151, 152)] is True
    # null-GT at the SAME pos as the deletion: strictly-earlier rule keeps it
    assert out[("c1", 100, 101)] is True
    assert out[("c1", 130, 140)] is True  # non-null-GT never removed
    assert out[("c2", 120, 121)] is True  # other contig untouched
    assert sum(1 for r in res if not r.kept) == 2


def test_overlap_buffer_growing_extent(spark):
    # overlapping deletions extend the running extent
    rows = [
        ("c1", 10, 100, True, False),
        ("c1", 50, 200, True, False),
        ("c1", 150, 151, False, True),  # inside the EXTENDED span -> removed
        ("c1", 201, 202, False, True),  # outside -> kept
    ]
    df = spark.createDataFrame(
        rows, "chrom string, pos long, stop long, is_deletion boolean, is_null_gt boolean"
    )
    out = {r.pos: r.kept for r in overlap_buffer_filter(df).collect()}
    assert out[150] is False and out[201] is True


def test_pl_compress3_matches_bruteforce(spark):
    from variantcalling_spark.functions.genotypes import pl_compress3

    # n=4 alleles -> 10 PLs; het-ref indices {1,3,6}; non-ref {2,4,5,7,8,9}
    pl = list(range(10, 110, 10))  # [10..100]
    df = spark.createDataFrame([(pl,)], "pl array<int>")
    out = df.select(pl_compress3(F.col("pl"), F.lit(4)).alias("c")).collect()[0].c
    assert out == [10, min(pl[1], pl[3], pl[6]), min(pl[2], pl[4], pl[5], pl[7], pl[8], pl[9])]


def test_genotype_ordering_layout(spark):
    from variantcalling_spark.functions.genotypes import genotype_ordering

    got = {
        (r.n_alleles, r.allele_1, r.allele_2): r.pl_index
        for r in genotype_ordering(spark, 3).collect()
    }
    # canonical diploid biallelic layout: (0,0)=0 (0,1)=1 (1,1)=2
    assert got[(2, 0, 0)] == 0 and got[(2, 0, 1)] == 1 and got[(2, 1, 1)] == 2
    # triallelic: (0,2)=3 (1,2)=4 (2,2)=5
    assert got[(3, 0, 2)] == 3 and got[(3, 1, 2)] == 4 and got[(3, 2, 2)] == 5


def test_phred_roundtrip(spark):
    from variantcalling_spark.functions.math import phred, phred_decode, phred_encode, unphred

    df = spark.createDataFrame([(0.001,), (0.01,), (0.5,)], "p double")
    out = df.select(
        F.round(unphred(phred(F.col("p"))), 12).alias("roundtrip")
    ).collect()
    assert [r.roundtrip for r in out] == [0.001, 0.01, 0.5]

    df2 = spark.createDataFrame([([0, 10, 40, 93],)], "q array<int>")
    enc_dec = df2.select(phred_decode(phred_encode(F.col("q"))).alias("r")).collect()[0].r
    assert enc_dec == [0, 10, 40, 93]


def test_hmer_and_revcomp(spark):
    from variantcalling_spark.functions.dna import hmer_run_length, revcomp

    df = spark.createDataFrame([("AAACGT",), ("GGGGGA",), ("T",), ("ACGT",)], "s string")
    got = df.select("s", hmer_run_length(F.col("s")).alias("h"), revcomp(F.col("s")).alias("rc")).collect()
    by_s = {r.s: (r.h, r.rc) for r in got}
    assert by_s["AAACGT"] == (3, "ACGTTT")
    assert by_s["GGGGGA"] == (5, "TCCCCC")
    assert by_s["T"] == (1, "A")
    assert by_s["ACGT"] == (1, "ACGT")  # palindromic revcomp


def test_greedy_packing_first_fit_invariants(spark):
    """Every bin respects capacity (unless a single oversized doc),
    bins are consecutively numbered per shard, and each doc opens a new
    bin iff it does not fit in the running one (first-fit-sequential)."""
    from variantcalling_spark.operators.kernels import greedy_pack_documents

    rows = [
        (s, s * 1000 + i, tok)
        for s in range(3)
        for i, tok in enumerate([400, 500, 200, 1100, 30, 1000, 10])
    ]
    df = spark.createDataFrame(rows, "shard int, doc_id long, n_tokens int")
    out = greedy_pack_documents(df, capacity=1024).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == {0, 1, 2}
    for shard, recs in by_shard.items():
        recs.sort(key=lambda r: r.doc_id)
        # replay first-fit sequentially
        used, cur = 0, -1
        for r in recs:
            if cur >= 0 and used + r.n_tokens <= 1024:
                used += r.n_tokens
            else:
                cur += 1
                used = r.n_tokens
            assert r.bin_id == cur, (shard, r.doc_id, r.bin_id, cur)
        # capacity invariant
        fill: dict[int, int] = {}
        for r in recs:
            fill[r.bin_id] = fill.get(r.bin_id, 0) + r.n_tokens
        for b, tot in fill.items():
            members = [r for r in recs if r.bin_id == b]
            assert tot <= 1024 or len(members) == 1
        # expected layout for [400,500,200,1100,30,1000,10] @ 1024:
        # [400+500] [200] no-wait 200 fits (900+... 400+500=900, +200=1100>1024 -> new bin)
        assert [r.bin_id for r in recs] == [0, 0, 1, 2, 3, 4, 4]


def test_depth_runs_bucketed_cumsum_crosses_buckets(spark):
    """The two-level cumulative sum must be exact across bucket
    boundaries: reads spanning several tiny buckets produce the same
    runs a single sequential scan would."""
    from variantcalling_spark.operators.pileup import reads_to_depth_runs

    reads = spark.createDataFrame(
        [("c1", 0, 25), ("c1", 5, 15), ("c1", 10, 30), ("c1", 40, 50),
         ("c2", 3, 9)],
        "chrom string, start long, end long",
    )
    got = {
        (r.chrom, r.start, r.end): r.depth
        for r in reads_to_depth_runs(reads, bucket=8).collect()
    }
    # sequential reference: difference array over all positions
    import collections

    delta = collections.defaultdict(int)
    rows = [("c1", 0, 25), ("c1", 5, 15), ("c1", 10, 30), ("c1", 40, 50), ("c2", 3, 9)]
    exp = {}
    for chrom in ("c1", "c2"):
        d = collections.defaultdict(int)
        for c, s, e in rows:
            if c == chrom:
                d[s] += 1
                d[e] -= 1
        bps = sorted(k for k, v in d.items() if v != 0)
        depth = 0
        for i, bp in enumerate(bps[:-1]):
            depth += d[bp]
            if depth > 0:
                exp[(chrom, bp, bps[i + 1])] = depth
    assert got == exp
    # a read end meeting another's start must NOT split equal-depth runs
    merged = spark.createDataFrame(
        [("c1", 0, 10), ("c1", 10, 20)], "chrom string, start long, end long"
    )
    out = reads_to_depth_runs(merged, bucket=8).collect()
    assert [(r.start, r.end, r.depth) for r in sorted(out, key=lambda r: r.start)] == [
        (0, 20, 1)
    ]


def test_apply_bpe_merges_semantics(spark):
    """BPE encode against hand-computed merges: priority order wins over
    position, leftmost-first within a priority, merged symbols cascade
    (the 'ab'+'c' -> 'abc' chain), unlisted pairs never merge."""
    from variantcalling_spark.operators.kernels import apply_bpe_merges

    docs = spark.createDataFrame(
        [(1, "abcab xa"), (2, "bb"), (3, "")], ["doc_id", "text"]
    )
    merges = [("a", "b"), ("ab", "c")]
    out = {r.doc_id: r for r in apply_bpe_merges(docs, merges).collect()}
    # 'abcab' -> a+b first (priority 0, leftmost): [ab, c, ab] -> ab+c:
    # [abc, ab]; 'xa' has no listed pair
    assert out[1].tokens == "abc ab|x a" and out[1].n_tokens == 4
    assert out[1].n_words == 2
    assert out[2].tokens == "b b"  # ('b','b') not a listed merge
    assert out[3].n_words == 0 and out[3].n_tokens == 0

    # closes the induction loop: merges mined by the q126 counting pass
    # are directly consumable
    docs2 = spark.createDataFrame([(1, "aaab aab")], ["doc_id", "text"])
    mined = [("a", "a"), ("a", "b")]
    enc = apply_bpe_merges(docs2, mined).collect()[0]
    # aaab: [a,a,a,b] -> aa (leftmost, prio 0) -> [aa,a,b] -> a+b
    # (prio 1) -> [aa, ab]; aab: [a,a,b] -> [aa, b], (aa,b) unlisted
    assert enc.tokens == "aa ab|aa b"


def test_apply_bpe_merges_all_occurrences_per_pass(spark):
    """Reference (GPT-2/HF) BPE merges ALL occurrences of the chosen
    pair per pass. The one-occurrence-per-step variant diverges when a
    merge creates a higher-priority pair overlapping a remaining
    occurrence: merges [(ab,a),(a,b)] on 'abab' — per-pass gives
    [ab, ab] (merge both (a,b) first; (ab,ab) unlisted), while
    one-at-a-time would give [aba, b] (first merge creates (ab,a),
    priority 0, which then steals the second 'a'). Pinned to the
    reference answer; greedy left-to-right non-overlap pinned on runs."""
    from variantcalling_spark.operators.kernels import apply_bpe_merges

    docs = spark.createDataFrame([(1, "abab"), (2, "aaaaa")], ["doc_id", "text"])
    merges = [("ab", "a"), ("a", "b"), ("a", "a")]
    out = {r.doc_id: r for r in apply_bpe_merges(docs, merges).collect()}
    assert out[1].tokens == "ab ab" and out[1].n_tokens == 2
    # runs pair greedily left-to-right within the pass: aaaaa -> [aa,aa,a]
    # -> no listed pair over merged symbols remains
    assert out[2].tokens == "aa aa a" and out[2].n_tokens == 3


def test_nw_align_scores(spark):
    """Needleman-Wunsch kernel against hand-computed scores (match +2,
    mismatch -1, gap -2), including empty-side and identical-string
    edges, plus the classic substitution-vs-indel tradeoff."""
    from variantcalling_spark.operators.kernels import nw_align_scores

    rows = [
        (0, "ACGT", "ACGT"),    # identical: 4 matches = 8
        (1, "ACGT", ""),        # all gaps: -8
        (2, "", ""),            # empty: 0
        (3, "ACGT", "AGGT"),    # one substitution: 3*2 - 1 = 5
        (4, "ACGT", "AGT"),     # one deletion: 3*2 - 2 = 4
        (5, "AAAA", "TTTT"),    # all mismatch (-4) beats all-gap (-16)
    ]
    df = spark.createDataFrame(rows, ["pair_id", "a", "b"])
    out = {r.pair_id: r for r in nw_align_scores(df).collect()}
    assert out[0].nw_score == 8 and out[0].norm_score == 2.0
    assert out[1].nw_score == -8 and (out[1].n, out[1].m) == (4, 0)
    assert out[2].nw_score == 0 and out[2].norm_score == 0.0
    assert out[3].nw_score == 5
    assert out[4].nw_score == 4
    assert out[5].nw_score == -4


def test_holt_linear_smooth(spark):
    """Holt kernel against a hand-computed walk (alpha=0.4, beta=0.2):
    l1=10, b1=2 -> t=2: l=0.4*12+0.6*12=12.0, b=0.2*2+0.8*2=2.0 ->
    t=3: l=0.4*14+0.6*14=14.0, b=2.0 (a perfect linear series keeps
    level on the line and trend constant); plus the n=1 degenerate."""
    from variantcalling_spark.operators.kernels import holt_linear_smooth

    rows = [("s1", 0, 10.0), ("s1", 1, 12.0), ("s1", 2, 14.0), ("one", 5, 7.0)]
    df = spark.createDataFrame(rows, ["series", "t", "m"])
    out = {r.series: r for r in holt_linear_smooth(df).collect()}
    assert out["s1"].n_obs == 3
    assert abs(out["s1"].level - 14.0) < 1e-12
    assert abs(out["s1"].trend - 2.0) < 1e-12
    assert abs(out["s1"].forecast - 28.0) < 1e-12
    assert out["one"].n_obs == 1 and out["one"].level == 7.0
    assert out["one"].trend == 0.0


def test_holt_out_of_order_input(spark):
    """The kernel sorts by t inside each group: shuffled input rows
    produce the same walk as ordered ones."""
    from variantcalling_spark.operators.kernels import holt_linear_smooth

    ordered = [("s", t, float(v)) for t, v in enumerate([5, 9, 4, 12, 8])]
    shuffled = [ordered[i] for i in (3, 0, 4, 1, 2)]
    a = holt_linear_smooth(
        spark.createDataFrame(ordered, ["series", "t", "m"])
    ).collect()[0]
    b = holt_linear_smooth(
        spark.createDataFrame(shuffled, ["series", "t", "m"])
    ).collect()[0]
    assert (a.level, a.trend, a.forecast) == (b.level, b.trend, b.forecast)


def test_dtw_pair_distances(spark):
    """DTW kernel against hand-computed DPs: identical series -> 0,
    singletons -> |a-b|, repeated-element stretch pays per matched
    step, and warping absorbs a phase shift a plain L1 would not."""
    from variantcalling_spark.operators.kernels import dtw_pair_distances

    rows = [
        ("a", "b", [1, 2, 3], [1, 2, 3]),          # identical: 0
        ("c", "d", [1], [5]),                       # singletons: 4
        ("e", "f", [0, 0], [1]),                    # stretch: 1 + 1 = 2
        ("g", "h", [0, 1, 2, 3], [1, 2, 3, 3]),     # shift: warp cost 1
    ]
    df = spark.createDataFrame(rows, ["ea", "eb", "xa", "xb"])
    out = {(r.ea, r.eb): r for r in dtw_pair_distances(df).collect()}
    assert out[("a", "b")].dtw_micro == 0
    assert out[("c", "d")].dtw_micro == 4
    assert out[("e", "f")].dtw_micro == 2
    # warp: 0->1 costs 1, then diagonal matches 1,2,3 and the final 3
    # re-matches: total 1
    assert out[("g", "h")].dtw_micro == 1
    assert out[("g", "h")].n_a == 4 and out[("g", "h")].n_b == 4


def test_viterbi_decode_basic_and_tiebreak(spark):
    """Viterbi kernel: a clean two-regime observation string decodes to
    one switch; with all-equal weights every argmax ties and the
    LOW-tie-break must yield the all-zero path."""
    from variantcalling_spark.operators.kernels import viterbi_decode_2state

    rows = [("s", t, o) for t, o in enumerate([0, 0, 0, 1, 1, 1], start=1)]
    df = spark.createDataFrame(rows, ["series", "t", "obs"])
    out = viterbi_decode_2state(
        df, emit_match=0, emit_miss=-1000, t_stay=-100, t_switch=-900, init=0
    ).collect()
    path = [r.state for r in sorted(out, key=lambda r: r.t)]
    assert path == [0, 0, 0, 1, 1, 1]

    tied = viterbi_decode_2state(
        df, emit_match=0, emit_miss=0, t_stay=0, t_switch=0, init=0
    ).collect()
    assert [r.state for r in sorted(tied, key=lambda r: r.t)] == [0] * 6


def test_gotoh_align_scores(spark):
    """Gotoh kernel against hand-computed affine scores (match +2,
    mismatch -1, open -4, extend -1): identical strings, a contiguous
    3-gap (one open) vs the linear model's per-base charge, and the
    empty edge."""
    from variantcalling_spark.operators.kernels import gotoh_align_scores

    rows = [
        (0, "ACGT", "ACGT"),      # 4 matches = 8
        (1, "ACGTTTA", "ACGA"),   # best: 4 matches + one 3-run gap = 8 - 6 = 2
        (2, "ACGT", ""),          # one 4-gap: -4 -1*3 = -7
        (3, "A", "T"),            # single mismatch beats double gap
    ]
    df = spark.createDataFrame(rows, ["pair_id", "a", "b"])
    out = {r.pair_id: r for r in gotoh_align_scores(df).collect()}
    assert out[0].affine_score == 8
    assert out[1].affine_score == 2
    assert out[2].affine_score == -7
    assert out[3].affine_score == -1


def test_hmm_posterior_symmetry(spark):
    """Forward-backward invariants: posteriors live strictly in (0,1),
    and the symmetric 2-state model obeys label-flip symmetry —
    running the kernel on 1-obs gives exactly 1 - p of running it on
    obs (alpha/beta swap roles under the relabeling, so the identity
    is bit-exact, not approximate)."""
    from variantcalling_spark.operators.kernels import hmm_posterior_2state

    obs = [0, 1, 1, 0, 1, 0, 0, 1, 1, 1]
    rows = [("s", t, o) for t, o in enumerate(obs, start=1)]
    flipped = [("s", t, 1 - o) for t, o in enumerate(obs, start=1)]
    df = spark.createDataFrame(rows, ["series", "t", "obs"])
    dff = spark.createDataFrame(flipped, ["series", "t", "obs"])
    p = {
        r.t: r.a1 * r.b1 / (r.a0 * r.b0 + r.a1 * r.b1)
        for r in hmm_posterior_2state(df, 0.8, 0.75).collect()
    }
    pf = {
        r.t: r.a1 * r.b1 / (r.a0 * r.b0 + r.a1 * r.b1)
        for r in hmm_posterior_2state(dff, 0.8, 0.75).collect()
    }
    for t in p:
        assert 0.0 < p[t] < 1.0
        assert abs(p[t] - (1.0 - pf[t])) < 1e-12


def test_facility_location_gains_non_increasing(spark, sf_dir):
    """Nemhauser greedy on a submodular objective: marginal gains are
    non-increasing across the 4 picks, coverage is non-decreasing, and
    all picked nodes are distinct."""
    from variantcalling_spark.queries import all_queries

    rows = sorted(
        all_queries()["q308_facility_location"].fn(spark, sf_dir).collect(),
        key=lambda r: r.step,
    )
    assert [r.step for r in rows] == [1, 2, 3, 4]
    assert len({r.node for r in rows}) == 4
    gains = [r.gain for r in rows]
    assert all(gains[i] >= gains[i + 1] - 1e-9 for i in range(len(gains) - 1))
    covs = [r.coverage for r in rows]
    assert all(covs[i] <= covs[i + 1] + 1e-9 for i in range(len(covs) - 1))


def test_lcs_kernel_matches_naive_dp(spark):
    """lcs_lengths (vectorized running-max row identity) vs the
    textbook O(n*m) per-cell DP on assorted pairs incl. empty and
    identical strings."""
    from variantcalling_spark.operators.kernels import lcs_lengths

    cases = [
        ("", ""), ("A", ""), ("", "B"), ("ACGT", "ACGT"),
        ("AGGTAB", "GXTXAYB"), ("ABCBDAB", "BDCABA"),
        ("AAAA", "AA"), ("ACACAC", "CACACA"),
    ]

    def naive(a, b):
        n, m = len(a), len(b)
        L = [[0] * (m + 1) for _ in range(n + 1)]
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                L[i][j] = (
                    L[i - 1][j - 1] + 1
                    if a[i - 1] == b[j - 1]
                    else max(L[i - 1][j], L[i][j - 1])
                )
        return L[n][m]

    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(cases)],
        "pair_id long, a string, b string",
    )
    got = {r.pair_id: r.lcs_len for r in lcs_lengths(df).collect()}
    for i, (a, b) in enumerate(cases):
        assert got[i] == naive(a, b), (a, b)


def test_lcs_tokens_kernel_matches_naive_dp(spark):
    """lcs_lengths_tokens == naive O(n*m) python DP on token lists,
    including unicode tokens (the latin1-crash class is dead) and
    empty/None sides."""
    from variantcalling_spark.operators.kernels import lcs_lengths_tokens

    def naive(a, b):
        n, m = len(a), len(b)
        dp = [[0] * (m + 1) for _ in range(n + 1)]
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                dp[i][j] = (
                    dp[i - 1][j - 1] + 1
                    if a[i - 1] == b[j - 1]
                    else max(dp[i - 1][j], dp[i][j - 1])
                )
        return dp[n][m]

    cases = [
        (0, ["the", "cat", "sat"], ["the", "dog", "sat"]),
        (1, ["a"], []),
        (2, [], []),
        (3, ["x", "y", "z", "x", "y"], ["y", "x", "y", "z"]),
        (4, ["naïve", "café", "日本語"], ["café", "日本語", "naïve"]),
        (5, ["r"] * 7, ["r"] * 4),
    ]
    df = spark.createDataFrame(
        [(i, a, b) for i, a, b in cases],
        "pair_id bigint, a array<string>, b array<string>",
    )
    got = {
        r.pair_id: (r.n, r.m, r.lcs_len)
        for r in lcs_lengths_tokens(df).collect()
    }
    for i, a, b in cases:
        assert got[i] == (len(a), len(b), naive(a, b)), (i, got[i])


def test_lcs_lengths_survives_non_latin1(spark):
    """The r7 ADVICE crash class: characters above U+00FF must not
    kill the executor task (utf-32 encode replaced latin1)."""
    from variantcalling_spark.operators.kernels import lcs_lengths

    df = spark.createDataFrame(
        [(0, "日本語テキスト", "日本語テスト"), (1, "añoré", "año")],
        "pair_id bigint, a string, b string",
    )
    rows = {r.pair_id: r.lcs_len for r in lcs_lengths(df).collect()}
    assert rows[0] == 6 and rows[1] == 3


def test_community_components_cap_fallback_equals_kernel(spark):
    """r9 ADVICE guard: communities larger than ``max_group_rows`` take
    the distributed star-contraction path instead of one Arrow group.
    Forcing the cap to 1 routes EVERY community through the fallback —
    output must equal the unconstrained kernel, including isolated
    marker-only nodes and multi-piece communities."""
    from variantcalling_spark.operators.kernels import community_components

    # community 1: path 1-2-3 plus isolated 4 (2 pieces)
    # community 2: two pairs 10-11, 12-13 (2 pieces)
    # community 3: singleton marker only (1 piece)
    # community 4: triangle 20-21-22 + chain 23-24 (2 pieces)
    edges = [
        (1, 1, 2), (1, 2, 3),
        (2, 10, 11), (2, 12, 13),
        (4, 20, 21), (4, 21, 22), (4, 20, 22), (4, 23, 24),
    ]
    markers = [(1, n) for n in (1, 2, 3, 4)] + [(2, n) for n in (10, 11, 12, 13)]
    markers += [(3, 99)] + [(4, n) for n in (20, 21, 22, 23, 24)]
    rows = spark.createDataFrame(
        [(c, a, b) for c, a, b in edges]
        + [(c, a, -1) for c, a in markers],
        "community long, a long, b long",
    )
    want = {
        (r.community, r.n_nodes, r.n_pieces)
        for r in community_components(rows).collect()
    }
    assert want == {(1, 4, 2), (2, 4, 2), (3, 1, 1), (4, 5, 2)}
    got = {
        (r.community, r.n_nodes, r.n_pieces)
        for r in community_components(rows, max_group_rows=1).collect()
    }
    assert got == want
    # mixed routing: only community 4 (9 rows) exceeds a cap of 8
    mixed = {
        (r.community, r.n_nodes, r.n_pieces)
        for r in community_components(rows, max_group_rows=8).collect()
    }
    assert mixed == want

def test_community_components_endpoint_without_marker_row(spark):
    """r10 ADVICE guard: an edge endpoint that has NO marker row must be
    counted in n_nodes on BOTH paths — the Arrow fold counts every node
    it sees in any row; the big-community fallback now derives the node
    universe from markers UNION edge endpoints, so the two paths agree."""
    from variantcalling_spark.operators.kernels import community_components

    # community 7: edge 1-2, marker only for node 1 (node 2 unmarked);
    # community 8: edge 5-6 with NO markers at all; isolated marker 9.
    rows = spark.createDataFrame(
        [(7, 1, 2), (7, 1, -1), (8, 5, 6), (8, 9, -1)],
        "community long, a long, b long",
    )
    want = {
        (r.community, r.n_nodes, r.n_pieces)
        for r in community_components(rows).collect()
    }
    assert want == {(7, 2, 1), (8, 3, 2)}
    got = {
        (r.community, r.n_nodes, r.n_pieces)
        for r in community_components(rows, max_group_rows=1).collect()
    }
    assert got == want


def test_community_piece_labels_fallback_equals_kernel(spark):
    """community_piece_labels (the per-node sibling): rc is the piece's
    NUMERIC minimum on both paths — the Arrow fold's min-rooted
    union-find and the star-contraction fallback, whose namespaced keys
    are zero-padded so lexicographic min == numeric min (ids crossing a
    digit-length boundary, e.g. 9 vs 10, are the trap case covered
    here)."""
    from variantcalling_spark.operators.kernels import community_piece_labels

    # community 1: path 9-10-11 (min 9 — digit-length boundary) + isolated 4
    # community 2: pairs 10-11 and 112-13
    # community 3: marker-only 99
    edges = [
        (1, 9, 10), (1, 10, 11),
        (2, 10, 11), (2, 112, 13),
    ]
    markers = [(1, n) for n in (9, 10, 11, 4)] + [(2, n) for n in (10, 11, 13, 112)]
    markers += [(3, 99)]
    rows = spark.createDataFrame(
        [(c, a, b) for c, a, b in edges]
        + [(c, a, -1) for c, a in markers],
        "community long, a long, b long",
    )
    want = {
        (r.community, r.node, r.rc)
        for r in community_piece_labels(rows).collect()
    }
    assert want == {
        (1, 9, 9), (1, 10, 9), (1, 11, 9), (1, 4, 4),
        (2, 10, 10), (2, 11, 10), (2, 13, 13), (2, 112, 13),
        (3, 99, 99),
    }
    got = {
        (r.community, r.node, r.rc)
        for r in community_piece_labels(rows, max_group_rows=1).collect()
    }
    assert got == want
    mixed = {
        (r.community, r.node, r.rc)
        for r in community_piece_labels(rows, max_group_rows=4).collect()
    }
    assert mixed == want
