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
