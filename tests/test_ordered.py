"""Ordered-operator tests: weighted quantile forms."""

from __future__ import annotations

SF = "/root/testdata/sf0.001"


def test_weighted_quantile_bucketed_equals_windowed(spark):
    """The two-phase (bucket-decomposed) weighted quantile must equal
    the ordered-window form row-for-row — on the q163 corpus weights
    and on a skewed synthetic where one group's mass sits in a single
    value (crossing-bucket edge: threshold met exactly at a bucket
    boundary)."""
    from pyspark.sql import functions as F

    from variantcalling_spark.operators.ordered import (
        weighted_quantile_bucketed,
        weighted_quantile_windowed,
    )
    from variantcalling_spark.queries.dedup import WQ_SCALE, corpus
    from variantcalling_spark.sources import load_table

    qs = [(1, 2), (9, 10)]
    c = corpus(spark, SF)
    from pyspark.sql import Window as W

    cs = c.withColumn(
        "cluster_size", F.count(F.lit(1)).over(W.partitionBy(F.md5("text")))
    )
    docs = load_table(spark, SF, "documents").select(
        F.col("doc_id").alias("orig_id"), "source"
    )
    w = (
        cs.withColumn("orig_id", F.col("doc_id") % 100000)
        .join(docs, "orig_id")
        .select(
            "doc_id",
            "source",
            F.size(F.split("text", " ")).cast("bigint").alias("value"),
            F.expr(f"CAST({WQ_SCALE} DIV cluster_size AS BIGINT)").alias("wt"),
        )
    )
    for data in (
        w,
        spark.createDataFrame(
            [("g1", i, 16, 1) for i in range(64)]
            + [("g2", 32, 1000, 100), ("g2", 33, 1, 101)],
            "source string, value long, wt long, doc_id long",
        ),
    ):
        a = {
            tuple(r)
            for r in weighted_quantile_windowed(data, qs, ["source"]).collect()
        }
        bkt = {
            tuple(r)
            for r in weighted_quantile_bucketed(
                data, qs, ["source"], bucket_width=16
            ).collect()
        }
        assert a == bkt and a


def test_q167_auc_matches_naive_pairwise(spark):
    """The histogram Mann-Whitney AUC must equal the O(n^2) definition
    (P(score_pos > score_neg) + 0.5*P(tie)) computed naively per
    contig on the driver."""
    from collections import defaultdict

    from variantcalling_spark.queries import all_queries

    got = {
        r.chrom: (r.n_pos, r.n_neg, r.auc_num, r.auc_den)
        for r in all_queries()["q167_exact_auc"].fn(spark, SF).collect()
    }
    assert got

    from variantcalling_spark.queries.pipelines_q import _cohort_calls

    rows = _cohort_calls(spark, SF).collect()
    by_chrom = defaultdict(lambda: ([], []))
    for r in rows:
        by_chrom[r.chrom][0 if r.gt > 0 else 1].append(r.gq)
    for chrom, (pos, neg) in by_chrom.items():
        if not pos or not neg:
            assert chrom not in got
            continue
        wins = sum(1 for p in pos for q in neg if p > q)
        ties = sum(1 for p in pos for q in neg if p == q)
        np_, nn_, num, den = got[chrom]
        assert (np_, nn_) == (len(pos), len(neg))
        # auc = (wins + ties/2) / (np*nn)  ==  num/den with den=2*np*nn
        assert num == 2 * wins + ties, chrom
        assert den == 2 * len(pos) * len(neg)


def test_incremental_stats_parquet_roundtrip_and_associativity(spark, tmp_path):
    """Deployment shape: stored stats read back from parquet, merged
    with two successive deltas — result equals one full recompute, and
    merge order (one-by-one vs deltas-first) doesn't matter."""
    from pyspark.sql import functions as F

    from variantcalling_spark.pipelines.incremental import (
        build_source_stats,
        merge_source_stats,
    )

    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text", "source")
    )
    d1 = docs.where(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 500000).alias("doc_id"), "text", "source"
    )
    d2 = docs.where(F.col("doc_id") % 3 == 1).select(
        (F.col("doc_id") + 600000).alias("doc_id"),
        F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
        "source",
    )
    p = str(tmp_path / "stats")
    build_source_stats(docs).write.mode("overwrite").parquet(p)
    stored = spark.read.parquet(p)

    one_by_one = merge_source_stats(
        merge_source_stats(stored, build_source_stats(d1)), build_source_stats(d2)
    )
    deltas_first = merge_source_stats(
        stored, merge_source_stats(build_source_stats(d1), build_source_stats(d2))
    )
    full = build_source_stats(docs.unionByName(d1).unionByName(d2))

    def key(df):
        return {tuple(r) for r in df.collect()}

    assert key(one_by_one) == key(full)
    assert key(deltas_first) == key(full)


def test_approx_toolbox_error_bounds(spark):
    """The 'swap exact for approx at web scale' claims (q154/q168
    docstrings) made executable: approx_count_distinct lands within
    its configured rsd of the exact distinct count on every language
    slice, and approx_percentile with accuracy=10000 is exact on the
    driver corpus (n << accuracy). Plans stay map-side combinable —
    neither op shuffles rows, only sketches."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    w = docs.select("lang", F.explode(F.split("text", " ")).alias("word"))
    both = (
        w.groupBy("lang")
        .agg(
            F.count_distinct("word").alias("exact"),
            F.approx_count_distinct("word", rsd=0.02).alias("approx"),
        )
        .collect()
    )
    assert both
    for r in both:
        assert abs(r.approx - r.exact) <= max(3 * 0.02 * r.exact, 1), (
            r.lang, r.exact, r.approx
        )

    n = docs.select(F.size(F.split("text", " ")).alias("v"))
    row = n.agg(
        F.expr("approx_percentile(v, array(0.5, 0.9), 10000)").alias("ap"),
        F.expr("percentile(v, array(0.5, 0.9))").alias("ex"),
    ).collect()[0]
    for a, e in zip(row.ap, row.ex):
        assert abs(a - e) <= 1, (row.ap, row.ex)


def test_mad_and_trimmed_mean_match_naive(spark):
    """q183's histogram medians and q184's rank-range trimmed mean vs
    plain-Python sort-based references on the driver corpus — the
    oracles mirror the histogram construction, so this pins the
    SEMANTICS (lower-median convention, 5%-per-tail trim on sorted
    order) independently."""
    from pyspark.sql import functions as F

    from variantcalling_spark.queries import all_queries

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    vals = {}
    for r in docs.select(
        "source", F.size(F.split("text", " ")).alias("v")
    ).collect():
        vals.setdefault(r.source, []).append(r.v)

    def lower_median(xs):
        xs = sorted(xs)
        # min value with cum*2 >= n  ==  element at index ceil(n/2)-1
        return xs[(len(xs) + 1) // 2 - 1]

    got_mad = {
        r.source: (r.median, r.mad)
        for r in all_queries()["q183_mad_robust"].fn(spark, SF).collect()
    }
    got_tm = {
        r.source: (r.n_kept, r.sum_kept)
        for r in all_queries()["q184_trimmed_mean"].fn(spark, SF).collect()
    }
    assert set(got_mad) == set(vals) == set(got_tm)
    for src, xs in vals.items():
        med = lower_median(xs)
        mad = lower_median([abs(x - med) for x in xs])
        assert got_mad[src] == (med, mad), src
        xs_sorted = sorted(xs)
        lo = len(xs) * 5 // 100
        kept = xs_sorted[lo : len(xs) - lo]
        assert got_tm[src] == (len(kept), sum(kept)), src
