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


def test_distributed_row_number_matches_window(spark):
    """`distributed_row_number` (bucket prefix + bucket-local window)
    must equal the single-partition row_number for asc and desc sorts,
    including ties broken by the tie column and values that straddle
    bucket boundaries."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from variantcalling_spark.operators.ordered import distributed_row_number

    data = spark.createDataFrame(
        [(i, (i * 7) % 23, f"id{i:03d}") for i in range(200)]
        + [(1000 + i, 5, f"tie{i:03d}") for i in range(40)],
        "rid long, v long, tie string",
    )
    # ascending
    exp = {
        (r.rid, r.rn)
        for r in data.select(
            "rid", F.row_number().over(W.orderBy("v", "tie")).alias("rn")
        ).collect()
    }
    got = {
        (r.rid, r.rn)
        for r in distributed_row_number(
            data, [F.col("v"), F.col("tie")], F.expr("v DIV 4")
        ).collect()
    }
    assert got == exp
    # descending leading key: bucket on the negated value
    exp_d = {
        (r.rid, r.rn)
        for r in data.select(
            "rid",
            F.row_number().over(W.orderBy(F.col("v").desc(), "tie")).alias("rn"),
        ).collect()
    }
    got_d = {
        (r.rid, r.rn)
        for r in distributed_row_number(
            data, [F.col("v").desc(), F.col("tie")], F.expr("-v DIV 4")
        ).collect()
    }
    assert got_d == exp_d


def test_ranged_row_number_matches_window(spark):
    """`ranged_row_number` (range-exchange buckets + bucket-local
    window) must equal the single-partition row_number for asc and
    desc sorts on a SKEWED key (half the rows share one value — the
    shape that breaks a static first-character coarsening), at
    several partition counts including more partitions than rows."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from variantcalling_spark.operators.ordered import ranged_row_number

    data = spark.createDataFrame(
        [(i, "the quick", f"id{i:03d}") for i in range(120)]
        + [(1000 + i, f"w{(i * 7) % 23:02d}", f"tie{i:03d}") for i in range(80)],
        "rid long, s string, tie string",
    )
    exp = {
        (r.rid, r.rn)
        for r in data.select(
            "rid", F.row_number().over(W.orderBy("s", "tie")).alias("rn")
        ).collect()
    }
    for n in (3, 16, 500):
        got = {
            (r.rid, r.rn)
            for r in ranged_row_number(
                data, [F.col("s"), F.col("tie")], num_partitions=n
            ).collect()
        }
        assert got == exp, n
    exp_d = {
        (r.rid, r.rn)
        for r in data.select(
            "rid",
            F.row_number().over(W.orderBy(F.col("s").desc(), "tie")).alias("rn"),
        ).collect()
    }
    got_d = {
        (r.rid, r.rn)
        for r in ranged_row_number(
            data, [F.col("s").desc(), F.col("tie")], num_partitions=8
        ).collect()
    }
    assert got_d == exp_d


def test_value_at_rank_bucketed_matches_sort(spark):
    """`value_at_rank_bucketed` vs a driver-side sorted pick — both
    directions, several ranks, two ranks crossing in the SAME bucket
    (the double-count regression), and a rank equal to n."""
    from pyspark.sql import functions as F

    from variantcalling_spark.operators.ordered import value_at_rank_bucketed

    vals = [0.08, 0.08, 5.36, 5.4, 11.7, 11.7, 11.7, 200.0, 480.5, 3.2, 3.2]
    df = spark.createDataFrame([(v,) for v in vals], "score double")
    n = len(vals)
    ks = [1, 2, 3, n // 2, n - 1, n]
    ranks = spark.createDataFrame([(k,) for k in ks], "k long")
    asc = sorted(vals)
    desc = sorted(vals, reverse=True)
    got_asc = {
        r.k: r.value_at_rank
        for r in value_at_rank_bucketed(
            df, "score", ranks, bucket_width=4.0
        ).collect()
    }
    got_desc = {
        r.k: r.value_at_rank
        for r in value_at_rank_bucketed(
            df, "score", ranks, bucket_width=4.0, descending=True
        ).collect()
    }
    for k in ks:
        assert got_asc[k] == asc[k - 1], ("asc", k)
        assert got_desc[k] == desc[k - 1], ("desc", k)


def test_ntile_expr_matches_sql_ntile(spark):
    """`ntile_expr` closed form vs NTILE(k) for n mod k != 0, n mod
    k == 0, and n < k."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from variantcalling_spark.operators.ordered import ntile_expr

    for n, k in ((11, 5), (10, 5), (3, 5), (100, 7)):
        df = spark.createDataFrame([(i,) for i in range(n)], "v long")
        exp = {
            (r.v, r.t)
            for r in df.select(
                "v", F.ntile(k).over(W.orderBy("v")).alias("t")
            ).collect()
        }
        got = {
            (r.v, r.t)
            for r in df.select(
                "v",
                ntile_expr(
                    F.col("v") + 1, F.lit(n).cast("bigint"), k
                ).alias("t"),
            ).collect()
        }
        assert got == exp, (n, k)


def test_pr_curve_bucketed_matches_single_window(spark):
    """The bucketed two-level pr_curve must equal the plain
    unpartitioned-window form value-for-value, grouped and ungrouped,
    for any bucket width (1 bucket == the old plan; fine buckets split
    every distinct score)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from variantcalling_spark.operators.metrics import pr_curve

    ev = (
        spark.read.parquet(f"{SF}/events.parquet")
        .where(F.col("event_type").isin("purchase", "error"))
        .select(
            F.col("value").alias("score"),
            F.when(F.col("event_type") == "purchase", "tp")
            .otherwise("fp")
            .alias("label"),
            (F.col("event_id") % 3).cast("string").alias("grp"),
        )
    )

    def reference(df, group_cols):
        per_score = df.groupBy(*group_cols, "score").agg(
            F.count(F.when(F.col("label") == "tp", 1)).alias("n_tp"),
            F.count(F.when(F.col("label") == "fp", 1)).alias("n_fp"),
        )
        w_cum = (
            W.partitionBy(*group_cols)
            .orderBy(F.desc("score"))
            .rowsBetween(W.unboundedPreceding, 0)
        )
        w_all = W.partitionBy(*group_cols) if group_cols else W.partitionBy(F.lit(1))
        return per_score.select(
            *group_cols,
            F.col("score").alias("threshold"),
            F.sum("n_tp").over(w_cum).alias("cum_tp"),
            F.sum("n_fp").over(w_cum).alias("cum_fp"),
            F.sum("n_tp").over(w_all).alias("tot_tp"),
        )

    for group_cols in ([], ["grp"]):
        for width in (1e9, 16.0, 0.25):
            exp = {
                tuple(r)
                for r in reference(ev, group_cols).collect()
            }
            got = {
                tuple(r)
                for r in pr_curve(
                    ev, "score", "label", group_cols or None, bucket_width=width
                )
                .select(
                    *group_cols,
                    "threshold",
                    "cum_tp",
                    "cum_fp",
                    (F.col("cum_tp") + F.col("cum_fn")).alias("tot_tp"),
                )
                .collect()
            }
            assert got == exp and got, (group_cols, width)


def test_value_at_rank_bucketed_null_for_out_of_range_rank(spark):
    """r7 ADVICE contract: a rank beyond the row count comes back as a
    row with value_at_rank NULL, never a silently missing row."""
    from pyspark.sql import functions as F

    from variantcalling_spark.operators.ordered import value_at_rank_bucketed

    df = spark.range(1, 11).select(F.col("id").cast("double").alias("v"))
    ranks = spark.createDataFrame([(5,), (10,), (11,), (999,)], "k bigint")
    out = {r.k: r.value_at_rank for r in value_at_rank_bucketed(df, "v", ranks).collect()}
    assert out[5] == 5.0 and out[10] == 10.0
    assert out[11] is None and out[999] is None
    assert len(out) == 4


def test_ece_contributions_sum_to_ece(spark):
    """q479: the per-bin ece_contrib column is the ECE decomposition —
    contributions are n_b-weighted gaps over N, so sum(contrib) must
    equal sum(n_b * gap) / N within rounding, and the deterministic
    pseudo-Bernoulli construction must come out nearly calibrated
    (ECE < 0.05 on the driver events)."""
    from variantcalling_spark.queries import all_queries

    pdf = (
        all_queries()["q479_ece_calibration"]
        .fn(spark, "/root/testdata/sf0.001")
        .toPandas()
    )
    n = pdf.n_b.sum()
    ece = pdf.ece_contrib.sum()
    recomputed = (pdf.n_b * pdf.gap).sum() / n
    assert abs(ece - recomputed) < 1e-4
    assert ece < 0.05
