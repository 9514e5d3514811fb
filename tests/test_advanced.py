"""Unit tests for second-wave operators: PL array math kernels and the
lossless prefix-filter dedup discovery."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from variantcalling_spark.functions.genotypes import (
    haploid_pl,
    imputation_reweighted_pl,
)
from variantcalling_spark.operators.dedup import (
    jaccard_for_pairs,
    jaccard_pairs,
    prefix_filtered_pairs,
    shingles,
)


def test_haploid_pl_pinned(spark):
    # convert_haploid_regions.py:38-70 semantics on hand-computed cases
    rows = [
        ([0, 30, 60], 0, 60),   # hom-ref: keep 0, gq = 60 capped
        ([50, 10, 20], 1, 30),  # alt wins: pl -> [30, 0], gq = 30
        ([200, 0, 10], 1, 99),  # gq capped at 99
    ]
    df = spark.createDataFrame(
        [(i, pl) for i, (pl, _, _) in enumerate(rows)], "i int, pl array<int>"
    )
    out = df.select("i", haploid_pl(F.col("pl")).alias("h")).orderBy("i").collect()
    for r, (pl, want_gt, want_gq) in zip(out, rows):
        assert r.h.gt == want_gt
        assert r.h.gq == min(want_gq, 99)
        assert min(r.h.pl) == 0


def test_imputation_reweight_matches_reference_formula(spark):
    # modify_stats_with_imp: posterior = pl - 10*log10(HW prior), argmin GT
    df = spark.createDataFrame(
        [(1, [10.0, 0.0, 40.0], 1.8)], "i int, pl array<double>, ds double"
    )
    r = df.select(imputation_reweighted_pl(F.col("pl"), F.col("ds")).alias("r")).first().r
    d = 0.9
    priors = [(1 - d) ** 2, 2 * d * (1 - d), d**2]
    post = [p - 10 * math.log10(pr) for p, pr in zip([10.0, 0.0, 40.0], priors)]
    m = min(post)
    expect = [round(p - m, 4) for p in post]
    assert [round(x, 4) for x in r.pl] == expect
    assert r.gt_index == expect.index(min(expect))
    # strong alt dosage pulls a hom-ref-ish record toward het/hom-alt
    assert r.gt_index in (1, 2)


def test_prefix_filter_is_lossless(spark, sf_dir):
    # every pair at-or-above threshold must survive discovery: the
    # prefix+length filtered pipeline equals the naive all-pairs join
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .limit(150)
        .select("doc_id", "text")
    )
    near = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
    )
    corpus = docs.unionByName(near)
    sh = shingles(corpus, n=3)
    t = 0.5
    exact = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(sh, min_jaccard=t).collect()
    }
    filtered = {
        (r.doc_a, r.doc_b)
        for r in jaccard_for_pairs(prefix_filtered_pairs(sh, t), sh)
        .where(F.col("jaccard") >= t)
        .collect()
    }
    assert exact == filtered
    assert len(exact) > 0


def test_q91_penalty_algebra(spark, sf_dir):
    """The four penalty modes obey the reference's adjustment algebra
    (`vcfeval_flavors.py:153-166`, pinned pattern `test_vcfeval_flavors.
    py:14-18`): tp is constant except mode -1 (which adds the full
    allele-error count), fp/fn shrink monotonically 2 -> 1 -> 0, and
    mode -1 shares mode 0's fp/fn."""
    from variantcalling_spark.queries import all_queries

    rows = {
        r.penalty: r
        for r in all_queries()["q91_vcfeval_penalty_flavors"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(rows) == {2, 1, 0, -1}
    ae = rows[2].fp - rows[0].fp
    assert ae >= 0
    assert rows[1].fp == rows[0].fp + ae / 2
    assert rows[2].fn - rows[0].fn == ae  # symmetric key granularity
    assert rows[-1].fp == rows[0].fp and rows[-1].fn == rows[0].fn
    assert rows[2].tp == rows[1].tp == rows[0].tp
    assert rows[-1].tp == rows[0].tp + ae
    for p in rows.values():
        assert 0 <= p.precision <= 100 and 0 <= p.recall <= 100


def test_q92_split_indices_match_genotype_ordering(spark, sf_dir):
    """The split's (0, i(i+1)/2, i(i+1)/2+i) PL picks are exactly the
    positions of genotypes (0,0), (0,i), (i,i) in the VCF PL layout
    (`genotype_ordering`, pinned `test_correct_genotypes_by_imputation.
    py:8-44`)."""
    # VCF spec ordering: index of genotype (a,b) with a<=b is b(b+1)/2+a
    for i in range(1, 4):
        assert 0 == 0 * (0 + 1) // 2 + 0
        assert i * (i + 1) // 2 + 0 == i * (i + 1) // 2
        assert i * (i + 1) // 2 + i == i * (i + 3) // 2
    from variantcalling_spark.queries import all_queries

    df = all_queries()["q92_split_multiallelic"].fn(spark, sf_dir)
    r = df.where("k = 5 AND alt_index = 2").first()  # k=5 -> n_alt=3
    # pl[j] = (5*7 + 13j) % 100; indices (0, 3, 5) for alt 2
    assert (r.pl0, r.pl1, r.pl2) == (35, (35 + 39) % 100, (35 + 65) % 100)


def test_bucketed_closest_equals_broadcast_argmin(spark, sf_dir):
    """The radius-escalating bucketed nearest-interval join must return
    exactly the broadcast argmin answer (including distance-0 containment
    and id tie-breaks), with sparse groups resolving via escalation."""
    from pyspark.sql import functions as F

    from variantcalling_spark.operators.interval_join import bucketed_closest
    from variantcalling_spark.queries.intervals import (
        events_points,
        intervals_a,
    )

    ev = events_points(spark, sf_dir).select("event_id", "grp", "ts_us").limit(2000)
    iv = intervals_a(spark)

    got = {
        (r.event_id): (r.iv_id, r.dist)
        for r in bucketed_closest(
            ev, iv, "ts_us", bucket_width=3_600_000_000, keys=["grp"],
            start_col="start_us", end_col="end_us",
        ).collect()
    }

    dist = (
        F.when((ev["ts_us"] >= iv["start_us"]) & (ev["ts_us"] < iv["end_us"]), F.lit(0))
        .when(ev["ts_us"] < iv["start_us"], iv["start_us"] - ev["ts_us"])
        .otherwise(ev["ts_us"] - iv["end_us"] + 1)
    )
    want = {
        r.event_id: (r.iv_id, r.dist)
        for r in ev.join(F.broadcast(iv), ev["grp"] == iv["grp"])
        .select("event_id", iv["iv_id"], dist.alias("dist"))
        .groupBy("event_id")
        .agg(
            F.min_by("iv_id", F.struct("dist", "iv_id")).alias("iv_id"),
            F.min("dist").alias("dist"),
        )
        .collect()
    }
    assert got == want


def test_q92_q95_split_collapse_round_trip(spark, sf_dir):
    """Collapsing the split rows recovers each site's allele count, alt
    order, shared ref depth, and per-alt depths — q92 and q95 are
    inverses over the shared derivation."""
    from variantcalling_spark.queries import all_queries

    split = all_queries()["q92_split_multiallelic"].fn(spark, sf_dir)
    collapsed = {
        r.k: r for r in all_queries()["q95_collapse_multiallelic"].fn(spark, sf_dir).collect()
    }
    from collections import defaultdict

    by_site = defaultdict(list)
    for r in split.collect():
        by_site[r.k].append(r)
    assert set(by_site) == set(collapsed)
    for k, rows in by_site.items():
        rows.sort(key=lambda r: r.alt_index)
        c = collapsed[k]
        ad_alts = [int(x) for x in c.ad_alts.split(",")]
        assert c.n_alt == len(rows) == rows[0].n_alt
        assert c.ad_ref == rows[0].ad_ref
        assert ad_alts == [r.ad_alt for r in rows]
        assert c.alts.split(",") == [f"ALT{r.alt_index}" for r in rows]
        assert c.dp == c.ad_ref + sum(ad_alts)


def test_chain_rescue_mnv_snp_pair(spark):
    """Base-edit group matching: an MNV FP is rescued against its
    SNP-pair FN decomposition (and vice versa); allele errors at one
    position never are; a bucket polluted by an extra mismatching
    record conservatively rescues nothing."""
    from variantcalling_spark.queries.advanced import chain_rescued_records

    schema = "chrom string, pos long, ref string, alt string"
    # forward chain at 320/321; reverse chain at 640/641 (bucket 40);
    # allele error at 100; polluted bucket at 960..962
    fp = spark.createDataFrame(
        [
            ("chr1", 100, "A", "C"),
            ("chr1", 320, "AC", "GT"),
            ("chr1", 640, "T", "A"),
            ("chr1", 641, "G", "C"),
            ("chr1", 960, "TG", "CA"),
            ("chr1", 962, "A", "G"),  # extra FP edit pollutes bucket 60
        ],
        schema,
    )
    fn = spark.createDataFrame(
        [
            ("chr1", 100, "A", "G"),
            ("chr1", 320, "A", "G"),
            ("chr1", 321, "C", "T"),
            ("chr1", 640, "TG", "AC"),
            ("chr1", 960, "T", "C"),
            ("chr1", 961, "G", "A"),
        ],
        schema,
    )
    resc_fp, resc_fn = chain_rescued_records(fp, fn, bucket=16)
    assert {(r.chrom, r.pos) for r in resc_fp.collect()} == {
        ("chr1", 320),
        ("chr1", 640),
        ("chr1", 641),
    }
    assert {(r.chrom, r.pos) for r in resc_fn.collect()} == {
        ("chr1", 320),
        ("chr1", 321),
        ("chr1", 640),
    }


def test_chain_rescue_penalty_matrix(spark):
    """Pinned 4-mode penalty matrix over a chain-rescued classification,
    mirroring the reference's matrix test (`test/system/
    test_vcfeval_flavors.py:10-50`; penalty semantics
    `vcfeval_flavors.py:146-166`): chain-equivalent runs convert to TPs
    first, then allele/genotype errors are charged per mode (2 = both
    sides, 1 = half, 0 = none, -1 = none plus a TP reward)."""
    from variantcalling_spark.queries.advanced import chain_rescued_records

    schema = "chrom string, pos long, ref string, alt string"
    tp_exact = 24
    # 2 allele errors (100, 200), 1 chain (MNV 320 vs SNPs 320/321),
    # 2 clean FPs (400, 420), 2 clean FNs (500, 520)
    fp = spark.createDataFrame(
        [
            ("chr1", 100, "A", "C"),
            ("chr1", 200, "C", "T"),
            ("chr1", 320, "AC", "GT"),
            ("chr1", 400, "G", "A"),
            ("chr1", 420, "T", "C"),
        ],
        schema,
    )
    fn = spark.createDataFrame(
        [
            ("chr1", 100, "A", "G"),
            ("chr1", 200, "C", "A"),
            ("chr1", 320, "A", "G"),
            ("chr1", 321, "C", "T"),
            ("chr1", 500, "A", "T"),
            ("chr1", 520, "C", "G"),
        ],
        schema,
    )
    resc_fp, resc_fn = chain_rescued_records(fp, fn, bucket=16)
    n_chain_fp, n_chain_fn = resc_fp.count(), resc_fn.count()
    assert (n_chain_fp, n_chain_fn) == (1, 2)

    # allele errors: FP and FN sharing (chrom, pos) that were NOT rescued
    resc_fp_keys = {(r.chrom, r.pos) for r in resc_fp.collect()}
    resc_fn_keys = {(r.chrom, r.pos) for r in resc_fn.collect()}
    fp_keys = {(r.chrom, r.pos) for r in fp.collect()} - resc_fp_keys
    fn_keys = {(r.chrom, r.pos) for r in fn.collect()} - resc_fn_keys
    ae = len(fp_keys & fn_keys)
    assert ae == 2

    tp = tp_exact + n_chain_fn
    fp_n = fp.count() - n_chain_fp
    fn_n = fn.count() - n_chain_fn
    assert (tp, fp_n, fn_n) == (26, 4, 4)

    def matrix(p):
        extra = {2: ae, 1: ae / 2, 0: 0, -1: 0}[p]
        reward = ae if p == -1 else 0
        t, f_p, f_n = tp + reward, fp_n - ae + extra, fn_n - ae + extra
        return (t, f_p, f_n, round(100 * t / (t + f_p), 2), round(100 * t / (t + f_n), 2))

    assert matrix(2) == (26, 4, 4, 86.67, 86.67)
    assert matrix(1) == (26, 3.0, 3.0, 89.66, 89.66)
    assert matrix(0) == (26, 2, 2, 92.86, 92.86)
    assert matrix(-1) == (28, 2, 2, 93.33, 93.33)


def test_haplotype_replay_rescues_indel_chains(spark):
    """Replay equality (reconstructed sequence) absorbs length-changing
    split/merge chains that base-edit multisets cannot: a 2-base
    deletion vs its split deletions, an insertion vs its anchor-shifted
    re-spelling. Allele errors and reference-inconsistent runs stay
    unmatched."""
    from variantcalling_spark.queries.advanced import (
        chain_rescued_records,
        replay_rescued_records,
    )

    schema = "chrom string, pos long, ref string, alt string"
    # reference is 'ACGT'[pos % 4]; bucket width 32
    # bucket 0: del-merge chain; bucket 2: ins chain; bucket 4: allele err
    fp = spark.createDataFrame(
        [
            ("chr1", 0, "AC", "A"),    # split deletion, part 1
            ("chr1", 2, "G", ""),      # split deletion, part 2
            ("chr1", 64, "A", "AT"),   # split insertion, part 1
            ("chr1", 65, "C", "TC"),   # split insertion, part 2
            ("chr1", 128, "A", "G"),   # allele error
        ],
        schema,
    )
    fn = spark.createDataFrame(
        [
            ("chr1", 0, "ACG", "A"),   # merged deletion
            ("chr1", 64, "A", "ATT"),  # merged insertion
            ("chr1", 128, "A", "T"),   # allele error (different alt)
        ],
        schema,
    )
    resc_fp, resc_fn = replay_rescued_records(fp, fn, bucket=32)
    assert {(r.chrom, r.pos) for r in resc_fp.collect()} == {
        ("chr1", 0),
        ("chr1", 2),
        ("chr1", 64),
        ("chr1", 65),
    }
    assert {(r.chrom, r.pos) for r in resc_fn.collect()} == {
        ("chr1", 0),
        ("chr1", 64),
    }
    # the base-edit multiset matcher (q110) cannot absorb these chains:
    # length-changing records stay opaque single edits
    ch_fp, _ = chain_rescued_records(fp, fn, bucket=32)
    assert {(r.chrom, r.pos) for r in ch_fp.collect()} == set()


def test_segmented_replay_rescues_across_bucket_boundary(spark):
    """An MNV<->SNP-pair equivalence chain straddling pos 32 is invisible
    to fixed 32 bp replay buckets (the records land in different buckets)
    but rescues under data-driven segmentation — the exact depth gap q113
    documented and q119 closes."""
    from variantcalling_spark.queries.advanced import (
        replay_rescued_records,
        segmented_replay_rescue,
    )

    cols = ["chrom", "pos", "ref", "alt"]
    fp = spark.createDataFrame([("c1", 31, "A", "G"), ("c1", 32, "C", "G")], cols)
    fn = spark.createDataFrame([("c1", 31, "AC", "GG")], cols)

    sfp, sfn = segmented_replay_rescue(fp, fn)
    assert sfp.count() == 2 and sfn.count() == 1

    bfp, bfn = replay_rescued_records(fp, fn, bucket=32)
    assert bfp.count() == 0 and bfn.count() == 0


def test_segmented_replay_rejects_allele_error(spark):
    """A genuine allele error in the same segment must NOT rescue:
    replay strings differ when the applied sequences differ."""
    from variantcalling_spark.queries.advanced import segmented_replay_rescue

    cols = ["chrom", "pos", "ref", "alt"]
    fp = spark.createDataFrame([("c1", 31, "A", "G")], cols)
    fn = spark.createDataFrame([("c1", 31, "A", "T")], cols)
    sfp, sfn = segmented_replay_rescue(fp, fn)
    assert sfp.count() == 0 and sfn.count() == 0


def test_bridging_snv_cases(spark, monkeypatch, tmp_path):
    """Constructed sequences pin the calibrate_bridging_snvs semantics:
    a bridging alt-hmer rescues; a symmetric tandem repeat is excluded;
    an edge-adjacent hmer (min arm 0) is excluded; low qual is excluded."""
    import pandas as pd

    from variantcalling_spark.queries.genomics import q125_bridging_snv_calibration

    #                 1-based pos 12 = variant site (ref base), alt = rotation
    cases = {
        # ref 'A' -> alt 'C'; C-run on both sides (2 up, 1 down): bridges
        10: "GGGGGGGGGCCACGGGGGGGGGGG",
        # ref 'A' -> alt 'C': tandem TCC A CCT? build symmetric: up==down==2,
        # before == after == 'A' == ref -> excluded
        20: "GGGGGGGGACCACCAGGGGGGGGG",
        # ref 'A' -> alt 'C': run only downstream (up 0): min arm 0 -> excluded
        31: "GGGGGGGGGGGACCCGGGGGGGGG",
        # same as case 10 but low qual (short text -> qual < 30)... qual is
        # n_chars%100 so control it via text length instead: covered below.
        40: "GGGGGGGGGCCACGGGGGGGGGGG",
    }
    # build a documents parquet: text whose translate() is the DNA itself
    # (sequences already use only ACGT chars, translate leaves them be),
    # n_chars drives qual: 50 (>=30) except doc 40 -> 120 -> qual 20
    rows = []
    for doc_id, seq in cases.items():
        n_chars = 120 if doc_id == 40 else 50
        rows.append((doc_id, seq, "en", "src0", n_chars))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    sf = tmp_path / "sf"
    sf.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(pdf), str(sf / "documents.parquet"))

    out = {r.doc_id: r for r in q125_bridging_snv_calibration(spark, str(sf)).collect()}
    assert out[10].rescued and not out[10].is_tandem and out[10].hmer_size == 4
    assert not out[20].rescued and out[20].is_tandem
    assert not out[31].rescued and out[31].up_len == 0
    assert not out[40].rescued and out[40].qual == 20  # low qual


def test_diplotype_replay_refuses_phase_flip_with_anchor(spark):
    """The discriminator the single-sequence methods cannot see: a
    cis/trans flip against an exactly-matched neighbor SNP. With the TP
    anchor in the window the haplotype PAIRS differ -> no rescue; the
    same records without the anchor degrade to the (wrong) rescue —
    proving the anchor is what carries the phase information."""
    from variantcalling_spark.queries.advanced import diplotype_replay_rescue

    cols = ["chrom", "pos", "ref", "alt", "gt"]
    schema = "chrom string, pos long, ref string, alt string, gt string"
    fp = spark.createDataFrame([("c1", 101, "C", "G", "1|0")], cols)
    fn = spark.createDataFrame([("c1", 101, "C", "G", "0|1")], cols)
    tp = spark.createDataFrame([("c1", 100, "A", "T", "1|0")], cols)
    no_tp = spark.createDataFrame([], schema)

    rfp, rfn = diplotype_replay_rescue(fp, fn, tp)
    assert rfp.count() == 0 and rfn.count() == 0

    rfp, rfn = diplotype_replay_rescue(fp, fn, no_tp)
    assert rfp.count() == 1 and rfn.count() == 1


def test_diplotype_replay_rescues_phased_chains(spark):
    """Phased MNV<->SNP-pair on one haplotype and a hom split deletion
    both rescue; an allele error in the same shape never does."""
    from variantcalling_spark.queries.advanced import diplotype_replay_rescue

    cols = ["chrom", "pos", "ref", "alt", "gt"]
    schema = "chrom string, pos long, ref string, alt string, gt string"
    no_tp = spark.createDataFrame([], schema)

    fp = spark.createDataFrame(
        [("c1", 100, "A", "T", "1|0"), ("c1", 101, "C", "G", "1|0"),
         ("c2", 200, "AC", "A", "1|1"), ("c2", 202, "G", "", "1|1")], cols)
    fn = spark.createDataFrame(
        [("c1", 100, "AC", "TG", "1|0"), ("c2", 200, "ACG", "A", "1|1")], cols)
    rfp, rfn = diplotype_replay_rescue(fp, fn, no_tp)
    assert rfp.count() == 4 and rfn.count() == 2

    fp = spark.createDataFrame([("c3", 300, "A", "G", "1|0")], cols)
    fn = spark.createDataFrame([("c3", 300, "A", "T", "1|0")], cols)
    rfp, rfn = diplotype_replay_rescue(fp, fn, no_tp)
    assert rfp.count() == 0 and rfn.count() == 0


def test_segment_union_two_level_equals_window(spark):
    """The bucket-decomposed segmentation (`two_level=True`) assigns the
    exact segments of the per-chrom window form, including chains that
    cross a pos-bucket boundary and a record whose long REF spans it."""
    import pyspark.sql.functions as F
    from variantcalling_spark.queries.advanced import _segment_union

    rows = []
    # dense chain straddling the 64 KiB bucket edge at 65536
    for pos in (65520, 65530, 65534, 65537, 65545):
        rows.append(("c1", pos, "ACGTACGTAC", "T", "fp"))
    # isolated records far apart -> their own segments
    rows += [("c1", 10, "A", "T", "fn"), ("c1", 200000, "A", "G", "fp")]
    # second chrom, independent numbering
    rows += [("c2", 65534, "AAAA", "C", "fn"), ("c2", 65540, "A", "G", "fp")]
    u = spark.createDataFrame(
        rows, "chrom string, pos long, ref string, alt string, side string"
    ).withColumn("e", F.col("pos") + F.length("ref"))

    order = ["pos", "ref", "alt", "side"]
    base = {
        (r.chrom, r.pos, r.side): r.seg
        for r in _segment_union(u, order, gap=10, two_level=False).collect()
    }
    deco = {
        (r.chrom, r.pos, r.side): r.seg
        for r in _segment_union(u, order, gap=10, two_level=True).collect()
    }
    assert base == deco
    # sanity: the straddling chain is ONE segment, isolated rows are not
    segs = {base[("c1", p, "fp")] for p in (65520, 65530, 65534, 65537, 65545)}
    assert len(segs) == 1
    assert base[("c1", 200000, "fp")] not in segs


def test_q529_kneser_ney_is_proper_and_matches_replay(spark, sf_dir):
    """Interpolated KN is a PROPER distribution over the continuation
    vocabulary (sums to exactly 1 per in-model context — the discount
    mass D*N1+(w1.) re-enters through P_cont), and the per-doc mean
    NLL matches a pandas replay of the same model."""
    import math

    import pandas as pd

    from variantcalling_spark.queries.text import _KN_D, q529_kneser_ney_bigram

    got = {
        r.doc_id: (r.n_scored, r.mean_nll)
        for r in q529_kneser_ney_bigram(spark, sf_dir).collect()
    }

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    pairs = []
    for _, row in docs.iterrows():
        w = row.text.split(" ")
        pairs += [(row.doc_id, w[i], w[i + 1]) for i in range(len(w) - 1)]
    pdf = pd.DataFrame(pairs, columns=["doc_id", "w1", "w2"])
    train = pdf[pdf.doc_id % 2 == 0]
    big = train.groupby(["w1", "w2"]).size()
    c1 = big.groupby("w1").sum()
    nf = big.groupby("w1").size()
    nb = big.groupby("w2").size()
    tt = len(big)

    def p(w1, w2):
        c12 = big.get((w1, w2), 0)
        return (
            max(c12 - _KN_D, 0.0) + _KN_D * nf[w1] * (nb[w2] / float(tt))
        ) / c1[w1]

    # propriety: for three contexts, sum over the FULL continuation
    # vocab is exactly 1 (up to float noise)
    for w1 in list(c1.index[:3]):
        assert abs(sum(p(w1, w2) for w2 in nb.index) - 1.0) < 1e-9, w1

    held = pdf[pdf.doc_id % 2 == 1]
    for doc_id, g in held.groupby("doc_id"):
        sc = [
            round(-math.log(p(r.w1, r.w2)), 9)
            for r in g.itertuples()
            if r.w1 in c1.index and r.w2 in nb.index
        ]
        if not sc:
            assert doc_id not in got
            continue
        n_scored, mean_nll = got[doc_id]
        assert n_scored == len(sc)
        assert abs(mean_nll - sum(sc) / len(sc)) < 1e-5, doc_id


def test_q530_rrf_equals_arm_replay(spark, sf_dir):
    """The fused RRF top-20 equals a python fold of the two arm
    rankings (BM25 scores + exact cosine ranks), including the
    rank-0-marks-absent contract and the rounded-score tie-break."""
    from pyspark.sql import functions as F

    from variantcalling_spark.operators.similarity import cosine_topk
    from variantcalling_spark.queries.text import (
        _RRF_DEPTH,
        _RRF_K,
        _bm25_doc_scores,
        q530_reciprocal_rank_fusion,
    )
    from variantcalling_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load_table(spark, sf_dir, "embeddings")
    bm = sorted(
        _bm25_doc_scores(docs).collect(), key=lambda r: (-r.score, r.doc_id)
    )[:_RRF_DEPTH]
    r1 = {r.doc_id: i + 1 for i, r in enumerate(bm)}
    em = cosine_topk(emb.where(F.col("vec_id") == 0), emb, k=_RRF_DEPTH).collect()
    r2 = {r.cand_id: r.rank for r in em}
    fused = {
        d: round(
            (1.0 / (_RRF_K + r1[d]) if d in r1 else 0.0)
            + (1.0 / (_RRF_K + r2[d]) if d in r2 else 0.0),
            6,
        )
        for d in set(r1) | set(r2)
    }
    want = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = sorted(
        q530_reciprocal_rank_fusion(spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert [(r.doc_id, r.rrf) for r in got] == want
    for r in got:
        assert r.bm25_rank == r1.get(r.doc_id, 0)
        assert r.cos_rank == r2.get(r.doc_id, 0)
