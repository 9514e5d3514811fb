"""Composed pipeline queries (SURVEY.md §3): the reference's flagship
pipelines re-expressed as single declarative plans over stand-in tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from variantcalling_spark.pipelines.coverage import coverage_summary
from variantcalling_spark.pipelines.evaluate_concordance import evaluate_concordance
from variantcalling_spark.pipelines.sv_stats import binned_type_matrix
from variantcalling_spark.queries import query
from variantcalling_spark.queries._helpers import cnt, managed_persist
from variantcalling_spark.queries.intervals import SQL_IV_A, events_points, intervals_a
from variantcalling_spark.sources import load_table


@query(
    "q85_evaluate_concordance",
    oracle="""
WITH conc AS (
  SELECT l_returnflag AS category,
         CASE WHEN l_quantity > 25 THEN 'tp'
              WHEN l_discount > 0.05 THEN 'fp'
              ELSE 'fn' END AS classify
  FROM lineitem
),
m AS (
  SELECT category,
         COUNT(*) FILTER (WHERE classify = 'tp') AS tp,
         COUNT(*) FILTER (WHERE classify = 'fp') AS fp,
         COUNT(*) FILTER (WHERE classify = 'fn') AS fn
  FROM conc GROUP BY category
)
SELECT category, tp, fp, fn,
       tp / CAST(tp + fp AS DOUBLE) AS precision,
       tp / CAST(tp + fn AS DOUBLE) AS recall,
       2 * (tp / CAST(tp + fp AS DOUBLE)) * (tp / CAST(tp + fn AS DOUBLE))
         / ((tp / CAST(tp + fp AS DOUBLE)) + (tp / CAST(tp + fn AS DOUBLE))) AS f1
FROM m
""",
)
def q85_evaluate_concordance(spark, sf_dir):
    """The evaluate_concordance pipeline's `optimal_recall_precision`
    table (`evaluate_concordance.py:71-108` -> `report_utils.py:206-222`)
    over a concordance-shaped derivation of lineitem: per-category
    tp/fp/fn + precision/recall/F1 in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    conc = li.select(
        F.col("l_returnflag").alias("category"),
        F.when(F.col("l_quantity") > 25, "tp")
        .when(F.col("l_discount") > 0.05, "fp")
        .otherwise("fn")
        .alias("classify"),
        F.col("l_extendedprice").alias("score"),
    )
    return evaluate_concordance(conc)["optimal_recall_precision"]


@query(
    "q86_coverage_summary",
    oracle=f"""
WITH iv AS ({SQL_IV_A}),
depth AS (
  -- FLOOR, not bare CAST: Spark's cast(double->int) truncates while
  -- DuckDB's rounds; FLOOR pins identical semantics
  SELECT epoch_us(ts) AS pos, user_id % 5 AS grp, CAST(FLOOR(value) AS INT) AS depth
  FROM events
),
annotated AS (
  SELECT iv.category, d.depth
  FROM depth d JOIN iv
    ON d.grp = iv.grp AND d.pos >= iv.start_us AND d.pos < iv.end_us
),
hist AS (
  SELECT category, depth, COUNT(*) AS cnt FROM annotated GROUP BY category, depth
),
cdf AS (
  SELECT category, depth,
         SUM(cnt) OVER (PARTITION BY category ORDER BY depth
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(cnt) OVER (PARTITION BY category) AS tot
  FROM hist
),
pct AS (
  SELECT category,
         MIN(CASE WHEN cum >= CEIL(0.05 * tot) THEN depth END) AS p05,
         MIN(CASE WHEN cum >= CEIL(0.25 * tot) THEN depth END) AS p25,
         MIN(CASE WHEN cum >= CEIL(0.50 * tot) THEN depth END) AS p50,
         MIN(CASE WHEN cum >= CEIL(0.75 * tot) THEN depth END) AS p75,
         MIN(CASE WHEN cum >= CEIL(0.95 * tot) THEN depth END) AS p95
  FROM cdf GROUP BY category
),
stats AS (
  SELECT category,
         COUNT(*) AS n_positions,
         CAST(SUM(CAST(depth AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_depth
  FROM annotated GROUP BY category
)
SELECT stats.category, n_positions, mean_depth, p05, p25, p50, p75, p95
FROM stats JOIN pct ON stats.category = pct.category
""",
)
def q86_coverage_summary(spark, sf_dir):
    """The coverage full_analysis core (`coverage_analysis.py:412-594`)
    as ONE plan: depth rows -> broadcast interval join (annotation
    categories) -> per-category count/mean + histogram-CDF percentiles.
    The reference's region x interval-file process fan-out collapses into
    this single declarative job (SURVEY.md §3.3)."""
    ev = events_points(spark, sf_dir)
    depth = ev.select(
        F.col("ts_us").alias("pos"), "grp", F.col("value").cast("int").alias("depth")
    )
    iv = intervals_a(spark)
    return coverage_summary(
        depth, iv, keys=["grp"], start_col="start_us", end_col="end_us"
    )


@query(
    "q87_sv_stats_matrix",
    oracle="""
WITH binned AS (
  SELECT o_orderstatus AS sv_type,
         CASE WHEN o_totalprice < 50000 THEN '0-50k'
              WHEN o_totalprice < 100000 THEN '50k-100k'
              WHEN o_totalprice < 200000 THEN '100k-200k'
              WHEN o_totalprice < 400000 THEN '200k-400k'
              ELSE '400k+' END AS len_bin
  FROM orders
  WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
),
counts AS (
  SELECT sv_type, len_bin, COUNT(*) AS n FROM binned GROUP BY sv_type, len_bin
),
domain AS (
  SELECT t.sv_type, b.len_bin
  FROM unnest(['F', 'O', 'P']) t(sv_type)
  CROSS JOIN unnest(['0-50k', '50k-100k', '100k-200k', '200k-400k', '400k+']) b(len_bin)
)
SELECT domain.sv_type, domain.len_bin, COALESCE(n, 0) AS n
FROM domain LEFT JOIN counts
  ON domain.sv_type = counts.sv_type AND domain.len_bin = counts.len_bin
""",
)
def q87_sv_stats_matrix(spark, sf_dir):
    """The sv_stats_collect matrix (`sv_stats_collect.py:37-52`): PASS
    filter -> length binning -> (type x bin) counts REINDEXED to the
    fixed label domain (zeros included) via a generated domain table —
    the `unstack().reindex()` pattern in one join."""
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
    )
    bin_expr = (
        F.when(F.col("o_totalprice") < 50000, "0-50k")
        .when(F.col("o_totalprice") < 100000, "50k-100k")
        .when(F.col("o_totalprice") < 200000, "100k-200k")
        .when(F.col("o_totalprice") < 400000, "200k-400k")
        .otherwise("400k+")
    )
    return binned_type_matrix(
        o,
        spark,
        "o_orderstatus",
        bin_expr,
        ["F", "O", "P"],
        ["0-50k", "50k-100k", "100k-200k", "200k-400k", "400k+"],
    )


@query(
    "q88_hit_fraction",
    oracle="""
WITH calls AS (
  SELECT DISTINCT l_orderkey, l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'N'
),
truth AS (
  SELECT DISTINCT l_orderkey, l_partkey, l_suppkey FROM lineitem WHERE l_linestatus = 'F'
),
hits AS (SELECT COUNT(*) AS hit_count FROM calls JOIN truth USING (l_orderkey, l_partkey, l_suppkey)),
gt AS (SELECT COUNT(*) AS gt_count FROM truth)
SELECT hit_count, gt_count,
       hit_count / (gt_count + 0.001) AS hit_fraction
FROM hits, gt
""",
)
def q88_hit_fraction(spark, sf_dir):
    """The hit-fraction comparison — SURVEY.md §7.2's minimum end-to-end
    slice (`variant_hit_fraction_caller.py:33-42`): two callsets inner-
    joined on the composite variant key; hit_count / (gt_count + 0.001)."""
    li = load_table(spark, sf_dir, "lineitem")
    key = ["l_orderkey", "l_partkey", "l_suppkey"]
    calls = li.where(F.col("l_returnflag") == "N").select(*key).distinct()
    truth = li.where(F.col("l_linestatus") == "F").select(*key).distinct()
    hits = calls.join(truth, key).agg(cnt("hit_count"))
    gt = truth.agg(cnt("gt_count"))
    return hits.crossJoin(gt).select(
        "hit_count",
        "gt_count",
        (F.col("hit_count") / (F.col("gt_count") + 0.001)).alias("hit_fraction"),
    )


@query(
    "q89_ml_filter_score",
    oracle="""
SELECT * FROM (VALUES
  (CAST(0 AS INT), CAST(921 AS BIGINT), CAST(0.219 AS DOUBLE), CAST(0.127 AS DOUBLE)),
  (CAST(1 AS INT), CAST(3079 AS BIGINT), CAST(0.898 AS DOUBLE), CAST(0.926 AS DOUBLE))
) AS t(predicted, n, mean_score, true_rate)
""",
)
def q89_ml_filter_score(spark, sf_dir):
    """Variant-filtering model train + score on Spark ML (the reference's
    sklearn/xgboost `tree_score` pipeline, `docs/filter_variants_
    pipeline.md`): logistic regression over concordance-shaped features,
    scored distributively; output is the per-predicted-class score
    summary.

    Trains on a FIXED synthetic feature table (4000 rows, integer
    residue features, a separable label rule) so the learned decision
    boundary — and hence the class counts, exact true rates, and
    3-decimal mean scores — is reproducible run to run. Iterative LBFGS
    training is genuinely non-SQL, so the oracle is the literal expected
    aggregate (the q52 pattern); last-ulp coefficient jitter across
    partitionings is absorbed by the rounding, verified stable across
    local[8]/local[32] in tests/test_ml.py. Same Spark-ML-build pinning
    assumption as q71: a different Spark/BLAS build could move the LBFGS
    solution and spuriously fail the literal oracle — re-pin on upgrade;
    the separability test in tests/test_ml.py is the portable check."""
    from variantcalling_spark.ml import score_with_model, train_filtering_model

    feats = q89_features(spark)
    model = train_filtering_model(
        feats, ["qual", "vaf", "depth"], label_col="label", max_iter=10
    )
    scored = score_with_model(model, feats)
    return (
        scored.groupBy(F.col("prediction").cast("int").alias("predicted"))
        .agg(
            cnt("n"),
            F.round(F.avg("tree_score"), 3).alias("mean_score"),
            F.round(F.avg("label"), 3).alias("true_rate"),
        )
        .orderBy("predicted")
    )


def q89_features(spark):
    """Deterministic synthetic concordance-feature table: integer-residue
    qual/vaf/depth plus the separable rule the model must recover. The
    fixed 8-partition layout keeps the treeAggregate combine order (and
    thus the fitted coefficients) identical across launch configs."""
    return (
        spark.range(0, 4000, 1, 8)
        .select(
            (F.col("id") % 61).cast("double").alias("qual"),
            ((F.col("id") * 7) % 101).cast("double").alias("vaf"),
            ((F.col("id") * 13) % 47).cast("double").alias("depth"),
            F.when(((F.col("id") % 61) > 30) | (((F.col("id") * 7) % 101) > 50), 1.0)
            .otherwise(0.0)
            .alias("label"),
        )
    )


SQL_TRIO = """
  SELECT concat('c', CAST(l_orderkey % 4 AS VARCHAR)) AS chrom,
         l_orderkey * 10 + l_linenumber AS pos,
         CAST(l_partkey % 3 AS INT) AS gt1,
         CAST(l_suppkey % 3 AS INT) AS gt2,
         CAST(l_quantity AS DOUBLE) AS gq
  FROM lineitem
"""


@query(
    "q90_denovo_refinement",
    oracle=f"""
WITH child AS ({SQL_TRIO}),
mother AS (
  SELECT chrom, pos, CAST(gt1 % 2 AS INT) AS gt1, CAST(0 AS INT) AS gt2, gq + 1 AS gq
  FROM child WHERE pos % 3 <> 0
),
father AS (
  SELECT chrom, pos, CAST(0 AS INT) AS gt1, CAST(gt2 % 2 AS INT) AS gt2, gq + 2 AS gq
  FROM child WHERE pos % 5 <> 0
),
m AS (
  SELECT chrom, pos, MIN(gt1) AS mother_gt1, MIN(gt2) AS mother_gt2, MIN(gq) AS mother_gq
  FROM mother GROUP BY chrom, pos
),
f AS (
  SELECT chrom, pos, MIN(gt1) AS father_gt1, MIN(gt2) AS father_gt2, MIN(gq) AS father_gq
  FROM father GROUP BY chrom, pos
),
j AS (
  SELECT c.*, m.mother_gt1, m.mother_gt2, m.mother_gq,
         f.father_gt1, f.father_gt2, f.father_gq,
         GREATEST(c.gt1, c.gt2) AS child_alt
  FROM child c LEFT JOIN m USING (chrom, pos) LEFT JOIN f USING (chrom, pos)
),
flagged AS (
  SELECT *,
         child_alt > 0 AND mother_gq IS NOT NULL AND father_gq IS NOT NULL
         AND NOT COALESCE(child_alt = mother_gt1 OR child_alt = mother_gt2, FALSE)
         AND NOT COALESCE(child_alt = father_gt1 OR child_alt = father_gt2, FALSE)
           AS is_denovo
  FROM j
)
SELECT chrom, pos, is_denovo,
       CASE WHEN is_denovo THEN LEAST(gq, mother_gq, father_gq) END AS denovo_qual
FROM flagged
""",
)
def q90_denovo_refinement(spark, sf_dir):
    """De-novo refinement pipeline (`denovo_refinement.py`): trio join
    with parental column namespacing + duplicate pre-aggregation, alt
    allele absent from both parents flags the candidate, denovo quality
    = min of the trio genotype qualities."""
    from variantcalling_spark.pipelines.denovo import refine_denovo

    li = load_table(spark, sf_dir, "lineitem")
    child = li.select(
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias("chrom"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("pos"),
        (F.col("l_partkey") % 3).cast("int").alias("gt1"),
        (F.col("l_suppkey") % 3).cast("int").alias("gt2"),
        F.col("l_quantity").cast("double").alias("gq"),
    )
    mother = child.where(F.col("pos") % 3 != 0).select(
        "chrom",
        "pos",
        (F.col("gt1") % 2).cast("int").alias("gt1"),
        F.lit(0).cast("int").alias("gt2"),
        (F.col("gq") + 1).alias("gq"),
    )
    father = child.where(F.col("pos") % 5 != 0).select(
        "chrom",
        "pos",
        F.lit(0).cast("int").alias("gt1"),
        (F.col("gt2") % 2).cast("int").alias("gt2"),
        (F.col("gq") + 2).alias("gq"),
    )
    out = refine_denovo(child, mother, father)
    return out.select("chrom", "pos", "is_denovo", "denovo_qual")


SQL_READS = """
  SELECT concat('c', CAST(l_orderkey % 4 AS VARCHAR)) AS chrom,
         (l_orderkey * 7 + l_linenumber * 13) % 50000 AS start,
         (l_orderkey * 7 + l_linenumber * 13) % 50000 + 30 + CAST(l_quantity AS BIGINT) AS "end"
  FROM lineitem
"""


@query(
    "q105_depth_runs",
    oracle=f"""
WITH reads AS ({SQL_READS}),
deltas AS (
  SELECT chrom, start AS bp, 1 AS delta FROM reads
  UNION ALL
  SELECT chrom, "end" AS bp, -1 AS delta FROM reads
),
agg AS (
  SELECT chrom, bp, SUM(delta) AS d FROM deltas
  GROUP BY chrom, bp HAVING SUM(delta) <> 0
),
cum AS (
  SELECT chrom, bp AS start,
         LEAD(bp) OVER (PARTITION BY chrom ORDER BY bp) AS "end",
         CAST(SUM(d) OVER (PARTITION BY chrom ORDER BY bp) AS BIGINT) AS depth
  FROM agg
)
SELECT chrom, start, "end", depth FROM cum
WHERE "end" IS NOT NULL AND depth > 0
""",
)
def q105_depth_runs(spark, sf_dir):
    """Per-base depth from aligned-read intervals (`coverage_analysis.py:
    653-683`, samtools depth -> bed), as minimal RLE runs via the
    difference-array: +1/-1 deltas at read boundaries, two-level
    cumulative sum (within-bucket window + per-chrom bucket-prefix
    join), zero-net breakpoints dropped. The oracle recomputes with a
    single whole-chrom window — identical integer arithmetic, so the
    bucketed decomposition is value-proven, not just shape-tested."""
    from variantcalling_spark.operators.pileup import reads_to_depth_runs

    li = load_table(spark, sf_dir, "lineitem")
    reads = li.select(
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias("chrom"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000).alias("start"),
        (
            (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000
            + 30
            + F.col("l_quantity").cast("long")
        ).alias("end"),
    )
    return reads_to_depth_runs(reads)


@query(
    "q106_pileup_calls",
    oracle="""
SELECT chrom, pos, dp, ad, ROUND(ad / CAST(dp AS DOUBLE), 6) AS af
FROM (
  SELECT concat('c', CAST(l_orderkey % 4 AS VARCHAR)) AS chrom,
         l_orderkey % 5000 AS pos,
         CAST(COUNT(*) AS BIGINT) AS dp,
         CAST(SUM(CASE WHEN l_partkey % 5 < 2 THEN 1 ELSE 0 END) AS BIGINT) AS ad
  FROM lineitem
  GROUP BY 1, 2
)
WHERE dp >= 8 AND ad / CAST(dp AS DOUBLE) >= 0.25
""",
)
def q106_pileup_calls(spark, sf_dir):
    """mpileup-style variant calling from per-read base observations
    (`variant_hit_fraction_caller.py:23-28`: bcftools mpileup + the
    AD/DP >= min_af emission filter): one map-side-combinable
    (chrom, pos) aggregate — depth, alt-supporting count, allele
    frequency — then the threshold filter. Scan-speed at any coverage;
    the downstream hit-fraction join is q88."""
    from variantcalling_spark.operators.pileup import pileup_call_variants

    li = load_table(spark, sf_dir, "lineitem")
    obs = li.select(
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias("chrom"),
        (F.col("l_orderkey") % 5000).alias("pos"),
        (F.col("l_partkey") % 5 < 2).alias("is_alt"),
    )
    return pileup_call_variants(obs, min_af=0.25, min_dp=8)


@query(
    "q111_reads_ingest_depth",
    oracle="""
WITH reads AS (
  SELECT concat('c', CAST(l_orderkey % 4 AS VARCHAR)) AS chrom,
         (l_orderkey * 7 + l_linenumber * 13) % 50000 AS start,
         (l_orderkey * 7 + l_linenumber * 13) % 50000
           + (20 + CAST(l_quantity AS BIGINT) % 30) + (1 + l_linenumber % 3) AS "end"
  FROM lineitem
  WHERE l_linenumber % 7 <> 0 AND l_partkey % 60 >= 20
),
deltas AS (
  SELECT chrom, start AS bp, 1 AS delta FROM reads
  UNION ALL
  SELECT chrom, "end" AS bp, -1 AS delta FROM reads
),
agg AS (
  SELECT chrom, bp, SUM(delta) AS d FROM deltas
  GROUP BY chrom, bp HAVING SUM(delta) <> 0
),
cum AS (
  SELECT chrom, bp AS start,
         LEAD(bp) OVER (PARTITION BY chrom ORDER BY bp) AS "end",
         CAST(SUM(d) OVER (PARTITION BY chrom ORDER BY bp) AS BIGINT) AS depth
  FROM agg
)
SELECT chrom, start, "end", depth FROM cum
WHERE "end" IS NOT NULL AND depth > 0
""",
)
def q111_reads_ingest_depth(spark, sf_dir):
    """End-to-end text-alignment ingest: construct SAM records (tab
    format, 1-based POS, mixed-op ``<a>M<b>D5S`` CIGARs, some unmapped
    flags and sub-threshold MAPQs), then REALLY parse them with the SAM
    source (`sources/reads.py`: field split, flag/MAPQ filters, CIGAR
    reference-length fold) and pile the intervals into depth runs
    (q105's operator, unchanged). The oracle computes each read's span
    from the generating arithmetic directly — so field extraction,
    1-based conversion, the CIGAR fold (M and D consume reference, S
    does not), and both record filters are all value-proven, not just
    shape-tested. Closes the reference's ``samtools`` text-pipe ingest
    boundary (`coverage_analysis.py:653-683`) inside the engine."""
    from variantcalling_spark.operators.pileup import reads_to_depth_runs
    from variantcalling_spark.sources.reads import (
        parse_sam_lines,
        sam_to_read_intervals,
    )

    li = load_table(spark, sf_dir, "lineitem")
    lines = li.select(
        F.format_string(
            "r%d\t%d\tc%d\t%d\t%d\t%dM%dD5S\t*\t0\t0\t*\t*",
            F.col("l_orderkey"),
            F.when(F.col("l_linenumber") % 7 == 0, F.lit(4)).otherwise(F.lit(0)),
            (F.col("l_orderkey") % 4).cast("int"),
            ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000 + 1),
            (F.col("l_partkey") % 60).cast("int"),
            (20 + F.col("l_quantity").cast("long") % 30).cast("int"),
            (1 + F.col("l_linenumber") % 3).cast("int"),
        ).alias("value")
    )
    intervals = sam_to_read_intervals(parse_sam_lines(lines), min_mapq=20)
    return reads_to_depth_runs(intervals)


@query(
    "q107_joint_genotyping_matrix",
    oracle="""
WITH calls AS (
  SELECT concat('s', CAST(l_suppkey % 4 AS VARCHAR)) AS sample,
         concat('c', CAST(l_orderkey % 4 AS VARCHAR)) AS chrom,
         l_orderkey * 10 + l_linenumber % 3 AS pos,
         MIN(CAST(l_partkey % 3 AS INT)) AS gt,
         MIN(CAST(l_quantity AS INT)) AS gq
  FROM lineitem GROUP BY 1, 2, 3
),
wide AS (
  SELECT chrom, pos,
         MIN(CASE WHEN sample = 's0' THEN gt END) AS s0_gt,
         MIN(CASE WHEN sample = 's0' THEN gq END) AS s0_gq,
         MIN(CASE WHEN sample = 's1' THEN gt END) AS s1_gt,
         MIN(CASE WHEN sample = 's1' THEN gq END) AS s1_gq,
         MIN(CASE WHEN sample = 's2' THEN gt END) AS s2_gt,
         MIN(CASE WHEN sample = 's2' THEN gq END) AS s2_gq,
         MIN(CASE WHEN sample = 's3' THEN gt END) AS s3_gt,
         MIN(CASE WHEN sample = 's3' THEN gq END) AS s3_gq
  FROM calls GROUP BY chrom, pos
)
SELECT *,
       CAST((CASE WHEN s0_gt IS NOT NULL THEN 1 ELSE 0 END)
          + (CASE WHEN s1_gt IS NOT NULL THEN 1 ELSE 0 END)
          + (CASE WHEN s2_gt IS NOT NULL THEN 1 ELSE 0 END)
          + (CASE WHEN s3_gt IS NOT NULL THEN 1 ELSE 0 END) AS INT) AS n_called,
       CAST((CASE WHEN s0_gt > 0 THEN 1 ELSE 0 END)
          + (CASE WHEN s1_gt > 0 THEN 1 ELSE 0 END)
          + (CASE WHEN s2_gt > 0 THEN 1 ELSE 0 END)
          + (CASE WHEN s3_gt > 0 THEN 1 ELSE 0 END) AS INT) AS n_alt
FROM wide
""",
)
def q107_joint_genotyping_matrix(spark, sf_dir):
    """Multi-sample joint genotyping matrix (ROADMAP #4: the trio
    column-namespacing join of q90 generalized to N samples): per-sample
    callsets pivoted to one wide row per (chrom, pos) with an EXPLICIT
    sample domain — a single groupBy+pivot pass, no per-sample join
    chain and no domain-discovery job — plus per-site call-rate /
    alt-count cohort stats computed post-pivot at scan speed. Wide
    columns (not a map) keep every field predicate-pushable and
    column-prunable for downstream cohort filters."""
    li = load_table(spark, sf_dir, "lineitem")
    samples = ["s0", "s1", "s2", "s3"]
    calls = (
        li.groupBy(
            F.concat(F.lit("s"), (F.col("l_suppkey") % 4).cast("string")).alias("sample"),
            F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias("chrom"),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber") % 3).alias("pos"),
        )
        .agg(
            F.min((F.col("l_partkey") % 3).cast("int")).alias("gt"),
            F.min(F.col("l_quantity").cast("int")).alias("gq"),
        )
    )
    wide = (
        calls.groupBy("chrom", "pos")
        .pivot("sample", samples)
        .agg(F.min("gt").alias("gt"), F.min("gq").alias("gq"))
    )
    n_called = sum(
        F.when(F.col(f"{s}_gt").isNotNull(), 1).otherwise(0) for s in samples
    )
    n_alt = sum(F.when(F.col(f"{s}_gt") > 0, 1).otherwise(0) for s in samples)
    return wide.select(
        "*",
        n_called.cast("int").alias("n_called"),
        n_alt.cast("int").alias("n_alt"),
    )


@query(
    "q118_bam_binary_ingest_depth",
    oracle="""
WITH reads AS (
  SELECT concat('c', CAST(l_orderkey % 4 AS VARCHAR)) AS chrom,
         (l_orderkey * 7 + l_linenumber * 13) % 50000 AS start,
         (l_orderkey * 7 + l_linenumber * 13) % 50000
           + (20 + CAST(l_quantity AS BIGINT) % 30) + (1 + l_linenumber % 3) AS "end"
  FROM lineitem
  WHERE l_linenumber % 7 <> 0 AND l_partkey % 60 >= 20
),
deltas AS (
  SELECT chrom, start AS bp, 1 AS delta FROM reads
  UNION ALL
  SELECT chrom, "end" AS bp, -1 AS delta FROM reads
),
agg AS (
  SELECT chrom, bp, SUM(delta) AS d FROM deltas
  GROUP BY chrom, bp HAVING SUM(delta) <> 0
),
cum AS (
  SELECT chrom, bp AS start,
         LEAD(bp) OVER (PARTITION BY chrom ORDER BY bp) AS "end",
         CAST(SUM(d) OVER (PARTITION BY chrom ORDER BY bp) AS BIGINT) AS depth
  FROM agg
)
SELECT chrom, start, "end", depth FROM cum
WHERE "end" IS NOT NULL AND depth > 0
""",
)
def q118_bam_binary_ingest_depth(spark, sf_dir):
    """Binary-BAM ingest, value-proven end-to-end: each executor batch
    PACKS its lineitem-derived alignments into a real BGZF-compressed
    BAM payload (`sources/bam.py::pack_bam` — spec-packed little-endian
    records, BGZF members with BSIZE fields) and immediately DECODES it
    with the same parser the `binaryFile` scan uses, then the decoded
    records flow through the unchanged text-era operators
    (`sam_to_read_intervals` -> `reads_to_depth_runs`). The oracle
    recomputes depth runs from the generating arithmetic, so the binary
    record codec (refID dictionary, 0-based positions, packed CIGAR
    ops, flag/mapq fields) and both record filters are value-checked —
    the same proof q111 gives the text-SAM grammar. Encode+decode run
    inside ONE Arrow mapInPandas stage: no shuffle added over q111's
    plan, and the file-scan path (`read_bam`) shares the decoder
    byte-for-byte (pinned equal to the text parse in
    tests/test_sources.py)."""
    from variantcalling_spark.operators.pileup import reads_to_depth_runs
    from variantcalling_spark.sources.bam import (
        BAM_SCHEMA,
        bgzf_compress,
        pack_bam,
        parse_bam_bytes,
    )
    from variantcalling_spark.sources.reads import sam_to_read_intervals

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )

    def roundtrip(batches):
        refs = [(f"c{i}", 100000) for i in range(4)]
        for pdf in batches:
            recs = [
                dict(
                    qname=f"r{ok}",
                    flag=4 if ln % 7 == 0 else 0,
                    chrom=f"c{ok % 4}",
                    pos=(ok * 7 + ln * 13) % 50000 + 1,
                    mapq=int(pk % 60),
                    cigar=f"{20 + int(qty) % 30}M{1 + ln % 3}D5S",
                )
                for ok, ln, pk, qty in zip(
                    pdf["l_orderkey"],
                    pdf["l_linenumber"],
                    pdf["l_partkey"],
                    pdf["l_quantity"],
                )
            ]
            yield parse_bam_bytes(bgzf_compress(pack_bam(recs, refs)))

    sam = li.mapInPandas(roundtrip, schema=BAM_SCHEMA)
    # Persist the decoded intervals: the depth operator fans out over its
    # input (+1/-1 delta union + bucket-prefix join), and without the
    # persist every consumer re-runs the Python codec stage (measured 4
    # MapInPandas nodes in the plan; pinned to 1 in tests/test_plans.py).
    intervals = sam_to_read_intervals(sam, min_mapq=20).transform(managed_persist)
    return reads_to_depth_runs(intervals)


@query(
    "q123_gvcf_hcr",
    oracle="""
WITH blocks AS (
  SELECT concat('c', CAST(l_orderkey % 4 AS VARCHAR)) AS chrom,
         (l_orderkey * 7 + l_linenumber * 11) % 100000 AS start,
         (l_orderkey * 7 + l_linenumber * 11) % 100000
           + 1 + CAST(l_quantity AS BIGINT) % 50 AS "end",
         CAST(l_partkey % 100 AS INT) AS gq,
         l_suppkey % 5 <> 0 AS has_gt
  FROM lineitem
),
hc AS (SELECT chrom, start, "end" FROM blocks WHERE gq >= 20 AND has_gt),
segd AS (
  SELECT chrom, start, "end",
         SUM(brk) OVER (PARTITION BY chrom ORDER BY start, "end"
                        ROWS UNBOUNDED PRECEDING) AS seg
  FROM (
    SELECT *, CASE WHEN pm IS NULL OR start > pm THEN 1 ELSE 0 END AS brk
    FROM (
      SELECT *, MAX("end") OVER (PARTITION BY chrom ORDER BY start, "end"
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
      FROM hc
    )
  )
)
SELECT chrom, MIN(start) AS start, MAX("end") AS "end",
       CAST(COUNT(*) AS INT) AS n_blocks
FROM segd GROUP BY chrom, seg
""",
)
def q123_gvcf_hcr(spark, sf_dir):
    """High-confidence-region extraction from gVCF blocks (reference
    `pipelines/vcfbed/gvcf_hcr_main.py:21-35`: gvcf_to_bed with a GQ
    threshold + genotype presence, then `bedtools merge`): filter blocks
    on GQ >= 20 AND has-GT, then merge overlapping/bookended intervals
    per chrom (running-max gaps-and-islands — merge when the next start
    <= running max end, bedtools' default distance-0 semantics). Output
    is the HCR BED plus blocks-per-region. One filter + one per-chrom
    window + one aggregate; at 3x10^9 blocks the window decomposes into
    the two-level bucketed form like every prefix aggregate here."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    blocks = li.select(
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias("chrom"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 11) % 100000).alias(
            "start"
        ),
        (
            (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 11) % 100000
            + 1
            + F.col("l_quantity").cast("long") % 50
        ).alias("end"),
        (F.col("l_partkey") % 100).cast("int").alias("gq"),
        (F.col("l_suppkey") % 5 != 0).alias("has_gt"),
    )
    hc = blocks.where((F.col("gq") >= 20) & F.col("has_gt")).select(
        "chrom", "start", "end"
    )
    w_ord = W.partitionBy("chrom").orderBy("start", "end")
    pm = F.max("end").over(w_ord.rowsBetween(W.unboundedPreceding, -1))
    segd = hc.withColumn(
        "brk", F.when(pm.isNull() | (F.col("start") > pm), 1).otherwise(0)
    ).withColumn("seg", F.sum("brk").over(w_ord.rowsBetween(W.unboundedPreceding, 0)))
    return (
        segd.groupBy("chrom", "seg")
        .agg(
            F.min("start").alias("start"),
            F.max("end").alias("end"),
            F.count(F.lit(1)).cast("int").alias("n_blocks"),
        )
        .drop("seg")
    )


@query(
    "q124_sample_identity_matrix",
    oracle="""
WITH calls AS (
  SELECT concat('s', CAST(l_suppkey % 4 AS VARCHAR)) AS sample,
         concat('c', CAST(l_orderkey % 4 AS VARCHAR)) AS chrom,
         l_orderkey * 10 AS pos,
         MIN(CAST(l_partkey % 3 AS INT)) AS gt
  FROM lineitem GROUP BY 1, 2, 3
),
truth AS (
  SELECT concat('t', CAST(o_orderkey % 3 AS VARCHAR)) AS truth_id,
         concat('c', CAST(o_orderkey % 4 AS VARCHAR)) AS chrom,
         o_orderkey * 10 AS pos,
         CAST(o_custkey % 3 AS INT) AS gt
  FROM orders
),
m AS (
  SELECT c.sample, t.truth_id,
         COUNT(*) AS n_sites,
         COUNT(*) FILTER (WHERE c.gt = t.gt) AS n_match
  FROM calls c JOIN truth t ON c.chrom = t.chrom AND c.pos = t.pos
  GROUP BY c.sample, t.truth_id
)
SELECT sample, truth_id, n_sites, n_match,
       ROUND(n_match / CAST(n_sites AS DOUBLE), 6) AS match_rate,
       CAST(ROW_NUMBER() OVER (PARTITION BY sample
              ORDER BY n_match / CAST(n_sites AS DOUBLE) DESC, truth_id) AS INT) AS rank
FROM m
""",
)
def q124_sample_identity_matrix(spark, sf_dir):
    """Quick-fingerprinting sample-identity matrix (reference
    `comparison/quick_fingerprinter.py`: every sample's calls checked
    against every candidate ground truth inside HCR, best hit fraction
    wins): calls x truths genotype-concordance at shared sites — an
    equi-join on (chrom, pos), conditional-count aggregate per
    (sample, truth), per-sample best-match ranking. The all-pairs is in
    the tiny (samples x truths) aggregate output, never in the join:
    site matching is hash-partitioned by position, so the matrix costs
    one shuffle regardless of cohort size."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    calls = (
        li.groupBy(
            F.concat(F.lit("s"), (F.col("l_suppkey") % 4).cast("string")).alias(
                "sample"
            ),
            F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias(
                "chrom"
            ),
            (F.col("l_orderkey") * 10).alias("pos"),
        )
        .agg(F.min((F.col("l_partkey") % 3).cast("int")).alias("gt"))
    )
    truth = o.select(
        F.concat(F.lit("t"), (F.col("o_orderkey") % 3).cast("string")).alias(
            "truth_id"
        ),
        F.concat(F.lit("c"), (F.col("o_orderkey") % 4).cast("string")).alias("chrom"),
        (F.col("o_orderkey") * 10).alias("pos"),
        (F.col("o_custkey") % 3).cast("int").alias("gt_t"),
    )
    m = (
        calls.join(truth, ["chrom", "pos"])
        .groupBy("sample", "truth_id")
        .agg(
            F.count(F.lit(1)).alias("n_sites"),
            F.count(F.when(F.col("gt") == F.col("gt_t"), 1)).alias("n_match"),
        )
    )
    from pyspark.sql import Window as W

    rate = F.col("n_match") / F.col("n_sites").cast("double")
    return m.select(
        "sample",
        "truth_id",
        "n_sites",
        "n_match",
        F.round(rate, 6).alias("match_rate"),
        F.row_number()
        .over(W.partitionBy("sample").orderBy(rate.desc(), "truth_id"))
        .cast("int")
        .alias("rank"),
    )


@query(
    "q142_zoom_reduction",
    oracle="""
WITH runs AS (
  SELECT 'c' || (o_orderkey % 4) AS chrom,
         o_orderkey * 50 AS s,
         o_orderkey * 50 + (o_orderkey % 40) + 10 AS e,
         CAST(o_custkey % 7 + 1 AS DOUBLE) AS depth
  FROM orders
),
w AS (
  SELECT chrom, s, e, depth,
         unnest(generate_series(s // 1024, (e - 1) // 1024)) AS win
  FROM runs
)
SELECT chrom, win,
  CAST(MIN(GREATEST(s, win * 1024)) AS BIGINT) AS zstart,
  CAST(MAX(LEAST(e, (win + 1) * 1024)) AS BIGINT) AS zend,
  CAST(SUM(LEAST(e, (win + 1) * 1024) - GREATEST(s, win * 1024)) AS BIGINT)
    AS valid_count,
  MIN(depth) AS min_val,
  MAX(depth) AS max_val,
  SUM(depth * (LEAST(e, (win + 1) * 1024) - GREATEST(s, win * 1024)))
    AS sum_data,
  SUM(depth * depth * (LEAST(e, (win + 1) * 1024) - GREATEST(s, win * 1024)))
    AS sum_squares
FROM w GROUP BY chrom, win
""",
)
def q142_zoom_reduction(spark, sf_dir):
    """The bigWig zoom-level reduction as an oracled query: depth runs
    -> one bbi zoom record per 1024-bp window (covered bases, min/max
    depth, base-weighted sum and sum of squares) via
    ``sources/bigwig.py::zoom_reduce`` — the distributed pass behind
    every zoom level the sink writes. Explode-to-spanned-windows (fan-out
    ~1 when runs are shorter than the reduction) + one map-side-
    combinable groupBy; all sums are exact integers in doubles, so both
    engines agree bit-for-bit. Runs are synthesized disjoint from orders
    (stride 200 > max length 50 per chromosome)."""
    from variantcalling_spark.sources.bigwig import zoom_reduce

    o = load_table(spark, sf_dir, "orders")
    runs = o.select(
        F.concat(F.lit("c"), (F.col("o_orderkey") % 4).cast("string")).alias(
            "chrom"
        ),
        (F.col("o_orderkey") * 50).alias("start"),
        (F.col("o_orderkey") * 50 + F.col("o_orderkey") % 40 + 10).alias("end"),
        (F.col("o_custkey") % 7 + 1).cast("double").alias("depth"),
    )
    return zoom_reduce(runs, 1024)


def _gc_bias_oracle_sql() -> str:
    from variantcalling_spark.operators.dedup import PORTABLE_HASH_SQL

    ph = PORTABLE_HASH_SQL.format(col="chrom || ':' || CAST(win AS VARCHAR)")
    return f"""
WITH runs AS (
  SELECT 'c' || (o_orderkey % 4) AS chrom,
         o_orderkey * 50 AS s,
         o_orderkey * 50 + (o_orderkey % 40) + 10 AS e,
         CAST(o_custkey % 7 + 1 AS DOUBLE) AS depth
  FROM orders
),
w AS (
  SELECT chrom, s, e, depth,
         unnest(generate_series(s // 1024, (e - 1) // 1024)) AS win
  FROM runs
),
z AS (
  SELECT chrom, win,
    SUM(LEAST(e, (win + 1) * 1024) - GREATEST(s, win * 1024)) AS valid_count,
    SUM(depth * (LEAST(e, (win + 1) * 1024) - GREATEST(s, win * 1024)))
      AS sum_data
  FROM w GROUP BY chrom, win
),
gc AS (
  SELECT chrom, win, valid_count, sum_data,
         CAST(({ph}) % 101 AS INT) AS gc_pct
  FROM z
)
SELECT CAST(LEAST(gc_pct // 10, 9) AS INT) AS gc_decile,
       COUNT(*) AS n_windows,
       CAST(SUM(valid_count) AS BIGINT) AS covered_bases,
       ROUND(SUM(sum_data) / SUM(valid_count), 6) AS mean_depth
FROM gc GROUP BY 1
"""


@query("q143_gc_bias_curve", oracle=_gc_bias_oracle_sql())
def q143_gc_bias_curve(spark, sf_dir):
    """Coverage-vs-GC bias curve — the QC view behind the reference's
    GC-content stratification (`report_data_loader.py:88` carries
    `gc_content` as a first-class stratifier; `coverage_analysis.py`
    computes per-window depth): per-1024-bp-window mean depth grouped
    into GC-content deciles, exposing amplification bias (depth
    depression at GC extremes). Window depth summaries come from the
    SAME distributed reduction the bigWig zoom sink uses
    (`zoom_reduce` — one explode + map-side-combinable groupBy);
    window GC is a deterministic md5 stand-in so both engines agree
    (production joins the reference-genome GC track, an identical
    broadcast shape). All sums are exact integers in doubles."""
    from variantcalling_spark.operators.dedup import portable_string_hash
    from variantcalling_spark.sources.bigwig import zoom_reduce

    o = load_table(spark, sf_dir, "orders")
    runs = o.select(
        F.concat(F.lit("c"), (F.col("o_orderkey") % 4).cast("string")).alias(
            "chrom"
        ),
        (F.col("o_orderkey") * 50).alias("start"),
        (F.col("o_orderkey") * 50 + F.col("o_orderkey") % 40 + 10).alias("end"),
        (F.col("o_custkey") % 7 + 1).cast("double").alias("depth"),
    )
    z = zoom_reduce(runs, 1024)
    gc_pct = (
        portable_string_hash(
            F.concat(F.col("chrom"), F.lit(":"), F.col("win").cast("string"))
        )
        % 101
    ).cast("int")
    return (
        z.select(
            "valid_count",
            "sum_data",
            F.least(F.floor(gc_pct / 10), F.lit(9)).cast("int").alias("gc_decile"),
        )
        .groupBy("gc_decile")
        .agg(
            cnt("n_windows"),
            F.sum("valid_count").cast("bigint").alias("covered_bases"),
            F.round(F.sum("sum_data") / F.sum("valid_count"), 6).alias(
                "mean_depth"
            ),
        )
    )


SQL_COHORT_CALLS = """
  SELECT 's' || (l_suppkey % 4) AS sample,
         'c' || (l_orderkey % 4) AS chrom,
         l_orderkey * 10 + l_linenumber % 3 AS pos,
         CAST(MIN(l_partkey % 3) AS INT) AS gt,
         CAST(MIN(CAST(l_quantity AS INT)) AS INT) AS gq
  FROM lineitem
  GROUP BY 1, 2, 3
"""


def _cohort_calls(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.concat(F.lit("s"), (F.col("l_suppkey") % 4).cast("string")).alias(
            "sample"
        ),
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias(
            "chrom"
        ),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber") % 3).alias("pos"),
    ).agg(
        F.min((F.col("l_partkey") % 3).cast("int")).alias("gt"),
        F.min(F.col("l_quantity").cast("int")).alias("gq"),
    )


@query(
    "q148_sample_qc",
    oracle=f"""
WITH calls AS ({SQL_COHORT_CALLS}),
alt_carriers AS (
  SELECT chrom, pos, COUNT(*) AS n_carriers
  FROM calls WHERE gt > 0 GROUP BY chrom, pos
)
SELECT c.sample,
       COUNT(*) AS n_sites,
       CAST(SUM(CASE WHEN c.gt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_het,
       CAST(SUM(CASE WHEN c.gt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hom_alt,
       ROUND(SUM(CASE WHEN c.gt = 1 THEN 1 ELSE 0 END)
             / CAST(SUM(CASE WHEN c.gt = 2 THEN 1 ELSE 0 END) AS DOUBLE), 6)
         AS het_hom_ratio,
       CAST(SUM(CASE WHEN c.gt > 0 AND ac.n_carriers = 1 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_singletons,
       ROUND(CAST(SUM(CAST(c.gq AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_gq
FROM calls c
LEFT JOIN alt_carriers ac ON ac.chrom = c.chrom AND ac.pos = c.pos
GROUP BY c.sample
""",
)
def q148_sample_qc(spark, sf_dir):
    """Per-sample callset QC — the cohort health dashboard behind every
    joint-calling run (plink/bcftools `stats` shape; the reference's
    per-sample concordance stats are the truth-based cousin): site
    count, het and hom-alt counts, het/hom ratio (the contamination /
    ploidy-problem tell), singleton count (sites where this sample is
    the cohort's ONLY alt carrier — the sequencing-error tell), and
    DECIMAL-exact mean GQ. One groupBy over the per-sample calls plus a
    broadcast-sized per-site carrier count joined back — no pivot, no
    per-sample pass."""
    calls = _cohort_calls(spark, sf_dir)
    carriers = (
        calls.where(F.col("gt") > 0)
        .groupBy("chrom", "pos")
        .agg(F.count(F.lit(1)).alias("n_carriers"))
    )
    het = F.sum(F.when(F.col("gt") == 1, 1).otherwise(0))
    hom = F.sum(F.when(F.col("gt") == 2, 1).otherwise(0))
    return (
        calls.join(carriers, ["chrom", "pos"], "left")
        .groupBy("sample")
        .agg(
            cnt("n_sites"),
            het.cast("bigint").alias("n_het"),
            hom.cast("bigint").alias("n_hom_alt"),
            F.round(het / hom.cast("double"), 6).alias("het_hom_ratio"),
            F.sum(
                F.when((F.col("gt") > 0) & (F.col("n_carriers") == 1), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_singletons"),
            F.round(
                F.sum(F.col("gq").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_gq"),
        )
    )


@query(
    "q149_king_kinship",
    oracle=f"""
WITH calls AS ({SQL_COHORT_CALLS}),
pairs AS (
  SELECT a.sample AS sample_i, b.sample AS sample_j,
         COUNT(*) AS n_shared,
         SUM(CASE WHEN a.gt = 1 AND b.gt = 1 THEN 1 ELSE 0 END) AS n_both_het,
         SUM(CASE WHEN (a.gt = 0 AND b.gt = 2) OR (a.gt = 2 AND b.gt = 0)
                  THEN 1 ELSE 0 END) AS n_opp_hom,
         SUM(CASE WHEN a.gt = 1 THEN 1 ELSE 0 END) AS n_het_i,
         SUM(CASE WHEN b.gt = 1 THEN 1 ELSE 0 END) AS n_het_j
  FROM calls a JOIN calls b
    ON a.chrom = b.chrom AND a.pos = b.pos AND a.sample < b.sample
  GROUP BY a.sample, b.sample
)
SELECT sample_i, sample_j, CAST(n_shared AS BIGINT) AS n_shared,
       CAST(n_both_het AS BIGINT) AS n_both_het,
       CAST(n_opp_hom AS BIGINT) AS n_opp_hom,
       ROUND((n_both_het - 2.0 * n_opp_hom) / (n_het_i + n_het_j), 6)
         AS kinship
FROM pairs
""",
)
def q149_king_kinship(spark, sf_dir):
    """Pairwise KING-robust kinship over the cohort (Manichaikul 2010,
    the plink2 `--make-king` estimator): φ̂ = (N_both-het − 2·N_opposite-
    hom) / (N_het,i + N_het,j) over sites called in both samples —
    unrelated pairs sit near 0, duplicates near 0.5, and opposite
    homozygotes drive the estimate negative (the sample-swap /
    contamination screen; q124's hit-fraction identity check is the
    truth-based cousin of this cohort-internal one). One equi-join on
    (chrom, pos) with the sample-order predicate — the J² pair space
    materializes only per co-called site, never as a cross join —
    then one map-side-combinable aggregate per pair."""
    calls = _cohort_calls(spark, sf_dir)
    a = calls.select(
        "chrom", "pos", F.col("sample").alias("sample_i"), F.col("gt").alias("gt_i")
    )
    b = calls.select(
        "chrom", "pos", F.col("sample").alias("sample_j"), F.col("gt").alias("gt_j")
    )
    both_het = F.sum(
        F.when((F.col("gt_i") == 1) & (F.col("gt_j") == 1), 1).otherwise(0)
    )
    opp_hom = F.sum(
        F.when(
            ((F.col("gt_i") == 0) & (F.col("gt_j") == 2))
            | ((F.col("gt_i") == 2) & (F.col("gt_j") == 0)),
            1,
        ).otherwise(0)
    )
    het_i = F.sum(F.when(F.col("gt_i") == 1, 1).otherwise(0))
    het_j = F.sum(F.when(F.col("gt_j") == 1, 1).otherwise(0))
    return (
        a.join(b, ["chrom", "pos"])
        .where(F.col("sample_i") < F.col("sample_j"))
        .groupBy("sample_i", "sample_j")
        .agg(
            cnt("n_shared"),
            both_het.cast("bigint").alias("n_both_het"),
            opp_hom.cast("bigint").alias("n_opp_hom"),
            F.round(
                (both_het - 2.0 * opp_hom) / (het_i + het_j), 6
            ).alias("kinship"),
        )
    )


@query(
    "q153_hwe_exact_chi2",
    oracle=f"""
WITH calls AS ({SQL_COHORT_CALLS}),
site AS (
  SELECT chrom, pos,
         COUNT(*) AS n,
         CAST(SUM(CASE WHEN gt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_ref_hom,
         CAST(SUM(CASE WHEN gt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_het,
         CAST(SUM(CASE WHEN gt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hom_alt
  FROM calls GROUP BY chrom, pos
)
SELECT chrom, pos, n, n_ref_hom, n_het, n_hom_alt, chi2_num, chi2_den,
       ROUND(chi2_num / CAST(chi2_den AS DOUBLE), 6) AS chi2
FROM (
  SELECT *,
         CAST(n * (4 * n_ref_hom * n_hom_alt - n_het * n_het)
                * (4 * n_ref_hom * n_hom_alt - n_het * n_het) AS BIGINT)
           AS chi2_num,
         CAST((2 * n_ref_hom + n_het) * (2 * n_ref_hom + n_het)
                * (2 * n_hom_alt + n_het) * (2 * n_hom_alt + n_het) AS BIGINT)
           AS chi2_den
  FROM site
)
WHERE 2 * n_ref_hom + n_het > 0 AND 2 * n_hom_alt + n_het > 0
""",
)
def q153_hwe_exact_chi2(spark, sf_dir):
    """Hardy-Weinberg equilibrium chi-square per site — the third leg of
    the cohort-QC family (q148 per-sample, q149 pairwise kinship, this
    per-site): systematic HWE departure flags genotyping artifacts and
    population structure before any downstream association work
    (plink --hardy shape). EXACT: the 1-df chi-square collapses
    algebraically to N·(4·n_AA·n_aa − n_Aa²)² / (a²·b²) with
    a = 2·n_AA + n_Aa, b = 2·n_aa + n_Aa — numerator and denominator
    stay in bigints (no p-hat floats, no expected-count division), the
    reported double is a single rounded quotient. Monomorphic sites
    (a = 0 or b = 0, chi2 undefined) are excluded. Plan: ONE per-site
    groupBy over the cohort calls — map-side-combinable counts, one
    shuffle on (chrom, pos), projections thereafter."""
    calls = _cohort_calls(spark, sf_dir)
    site = calls.groupBy("chrom", "pos").agg(
        cnt("n"),
        F.sum(F.when(F.col("gt") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ref_hom"),
        F.sum(F.when(F.col("gt") == 1, 1).otherwise(0)).cast("bigint").alias("n_het"),
        F.sum(F.when(F.col("gt") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hom_alt"),
    )
    d = 4 * F.col("n_ref_hom") * F.col("n_hom_alt") - F.col("n_het") * F.col("n_het")
    a = 2 * F.col("n_ref_hom") + F.col("n_het")
    b = 2 * F.col("n_hom_alt") + F.col("n_het")
    return (
        site.withColumn("chi2_num", (F.col("n") * d * d).cast("bigint"))
        .withColumn("chi2_den", (a * a * b * b).cast("bigint"))
        .where((a > 0) & (b > 0))
        .select(
            "chrom",
            "pos",
            "n",
            "n_ref_hom",
            "n_het",
            "n_hom_alt",
            "chi2_num",
            "chi2_den",
            F.round(F.col("chi2_num") / F.col("chi2_den").cast("double"), 6).alias(
                "chi2"
            ),
        )
    )


@query(
    "q155_site_frequency_spectrum",
    oracle=f"""
WITH calls AS ({SQL_COHORT_CALLS}),
site AS (
  SELECT chrom, pos,
         CAST(SUM(gt) AS BIGINT) AS ac,
         CAST(2 * COUNT(*) AS BIGINT) AS an
  FROM calls GROUP BY chrom, pos
)
SELECT ac,
       CAST(LEAST(ac, an - ac) AS BIGINT) AS folded_ac,
       COUNT(*) AS n_sites,
       ROUND(COUNT(*) / CAST((SELECT COUNT(*) FROM site WHERE ac > 0) AS DOUBLE), 6)
         AS frac_of_segregating
FROM site
WHERE ac > 0
GROUP BY ac, LEAST(ac, an - ac)
""",
)
def q155_site_frequency_spectrum(spark, sf_dir):
    """Site-frequency spectrum — the population-genetics summary every
    cohort callset report leads with (plink --freq counts shape): how
    many segregating sites carry each alt-allele count. Excess
    singletons flag sequencing error; a shifted spectrum flags
    population structure — the cohort-level cousin of q148's per-sample
    singleton tell. Also reports the folded count min(AC, AN-AC)
    (ancestral-allele-agnostic form). Plan: per-site SUM(gt) groupBy
    (map-side combinable), then a spectrum groupBy over one row per
    SITE — second shuffle input is orders of magnitude smaller than the
    calls; the segregating-site total is a 1-row broadcast."""
    calls = _cohort_calls(spark, sf_dir)
    site = calls.groupBy("chrom", "pos").agg(
        F.sum("gt").cast("bigint").alias("ac"),
        (2 * F.count(F.lit(1))).cast("bigint").alias("an"),
    ).where(F.col("ac") > 0)
    site = managed_persist(site)
    tot = site.agg(F.count(F.lit(1)).alias("n_seg"))
    return (
        site.groupBy(
            "ac", F.least(F.col("ac"), F.col("an") - F.col("ac")).alias("folded_ac")
        )
        .agg(cnt("n_sites"))
        .crossJoin(F.broadcast(tot))
        .select(
            "ac",
            "folded_ac",
            "n_sites",
            F.round(F.col("n_sites") / F.col("n_seg").cast("double"), 6).alias(
                "frac_of_segregating"
            ),
        )
    )


@query(
    "q167_exact_auc",
    oracle=f"""
WITH calls AS ({SQL_COHORT_CALLS}),
lab AS (
  SELECT chrom, gq AS score, CASE WHEN gt > 0 THEN 1 ELSE 0 END AS y
  FROM calls
),
h AS (
  SELECT chrom, score,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(1 - y) AS BIGINT) AS n_neg
  FROM lab GROUP BY chrom, score
),
rk AS (
  SELECT chrom, score, n_pos, n_neg,
         COALESCE(SUM(n_pos + n_neg) OVER (PARTITION BY chrom ORDER BY score
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM h
),
u AS (
  SELECT chrom,
         CAST(SUM(n_pos) AS BIGINT) AS np,
         CAST(SUM(n_neg) AS BIGINT) AS nn,
         CAST(SUM(n_pos * (2 * below + n_pos + n_neg + 1)) AS BIGINT) AS r2sum
  FROM rk GROUP BY chrom
)
SELECT chrom, np AS n_pos, nn AS n_neg,
       CAST(r2sum - np * (np + 1) AS BIGINT) AS auc_num,
       CAST(2 * np * nn AS BIGINT) AS auc_den,
       ROUND((r2sum - np * (np + 1)) / CAST(2 * np * nn AS DOUBLE), 6) AS auc
FROM u WHERE np > 0 AND nn > 0
""",
)
def q167_exact_auc(spark, sf_dir):
    """Exact ROC-AUC per contig via the score-histogram form — the
    metric behind every 'does GQ separate carriers from non-carriers'
    calibration check, computed the only way that scales: aggregate to
    per-(group, score) positive/negative counts FIRST (map-side
    combinable; the shuffle is score-domain-sized, never row-sized),
    then average tie ranks over the tiny histogram: a tie group
    spanning ranks [below+1, below+cnt] contributes
    n_pos·(2·below+cnt+1) to the doubled rank sum, so
    AUC = (Σ2r − n⁺(n⁺+1)) / (2·n⁺·n⁻) stays a bigint rational with
    one rounded division (Mann-Whitney U with tie correction, exact —
    no per-row global sort anywhere). Numerator/denominator are
    returned alongside so downstream micro/macro averaging stays
    exact."""
    calls = _cohort_calls(spark, sf_dir)
    lab = calls.select(
        "chrom",
        F.col("gq").alias("score"),
        F.when(F.col("gt") > 0, 1).otherwise(0).alias("y"),
    )
    h = lab.groupBy("chrom", "score").agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n_neg"),
    )
    from pyspark.sql import Window as W

    wb = (
        W.partitionBy("chrom")
        .orderBy("score")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    rk = h.withColumn(
        "below",
        F.coalesce(
            F.sum(F.col("n_pos") + F.col("n_neg")).over(wb),
            F.lit(0).cast("bigint"),
        ),
    )
    u = rk.groupBy("chrom").agg(
        F.sum("n_pos").cast("bigint").alias("np"),
        F.sum("n_neg").cast("bigint").alias("nn"),
        F.sum(
            F.col("n_pos")
            * (2 * F.col("below") + F.col("n_pos") + F.col("n_neg") + 1)
        )
        .cast("bigint")
        .alias("r2sum"),
    )
    num = F.col("r2sum") - F.col("np") * (F.col("np") + 1)
    den = 2 * F.col("np") * F.col("nn")
    return (
        u.where((F.col("np") > 0) & (F.col("nn") > 0))
        .select(
            "chrom",
            F.col("np").alias("n_pos"),
            F.col("nn").alias("n_neg"),
            num.cast("bigint").alias("auc_num"),
            den.cast("bigint").alias("auc_den"),
            F.round(num / den.cast("double"), 6).alias("auc"),
        )
    )


SQL_DOC_DELTA = """
  SELECT doc_id + 100000 AS doc_id,
         substr(text, strpos(text, ' ') + 1) AS text,
         source
  FROM documents WHERE doc_id % 10 = 0
"""


@query(
    "q169_incremental_aggregates",
    oracle=f"""
WITH delta AS ({SQL_DOC_DELTA}),
alld AS (
  SELECT source, text FROM documents
  UNION ALL SELECT source, text FROM delta
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
       CAST(MIN(len(string_split(text, ' '))) AS BIGINT) AS min_tokens,
       CAST(MAX(len(string_split(text, ' '))) AS BIGINT) AS max_tokens,
       ROUND(SUM(len(string_split(text, ' ')))
             / CAST(COUNT(*) AS DOUBLE), 6) AS avg_tokens
FROM alld GROUP BY source
""",
)
def q169_incremental_aggregates(spark, sf_dir):
    """Materialized-view merge law, value-proven: the Spark side
    maintains the per-source stats table INCREMENTALLY — aggregate the
    stored corpus once, aggregate the ingest delta alone, merge the
    two algebraically (`pipelines/incremental.py`) — while the oracle
    recomputes over corpus ∪ delta from scratch. Hash equality IS the
    proof that the merge path equals full recomputation, which is what
    licenses never re-reading 100 TB per ingest. avg re-derives from
    merged sum/count (the sum/count pair is the mergeable carrier;
    a stored avg would not merge)."""
    from variantcalling_spark.pipelines.incremental import (
        build_source_stats,
        merge_source_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    delta = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
        "source",
    )
    merged = merge_source_stats(build_source_stats(docs), build_source_stats(delta))
    return merged.select(
        "source",
        "n_docs",
        "sum_tokens",
        "min_tokens",
        "max_tokens",
        F.round(
            F.col("sum_tokens") / F.col("n_docs").cast("double"), 6
        ).alias("avg_tokens"),
    )


@query(
    "q181_flagstat",
    oracle="""
WITH p AS (
  SELECT CASE WHEN l_partkey % 2 = 1 THEN 1 ELSE 0 END AS paired,
         CASE WHEN l_partkey % 2 = 1 AND l_suppkey % 3 = 0 THEN 1 ELSE 0 END
           AS proper,
         CASE WHEN l_linenumber % 7 = 0 THEN 1 ELSE 0 END AS unmapped,
         CASE WHEN l_orderkey % 11 = 0 THEN 1 ELSE 0 END AS secondary,
         CASE WHEN CAST(l_quantity AS BIGINT) % 9 < 2 THEN 1 ELSE 0 END AS dup
  FROM lineitem
)
SELECT COUNT(*) AS n_total,
       CAST(SUM(1 - unmapped) AS BIGINT) AS n_mapped,
       CAST(SUM(paired) AS BIGINT) AS n_paired,
       CAST(SUM(proper) AS BIGINT) AS n_proper_pair,
       CAST(SUM(secondary) AS BIGINT) AS n_secondary,
       CAST(SUM(dup) AS BIGINT) AS n_duplicates,
       ROUND(SUM(1 - unmapped) / CAST(COUNT(*) AS DOUBLE), 6) AS frac_mapped
FROM p
""",
)
def q181_flagstat(spark, sf_dir):
    """``samtools flagstat`` over the engine's own SAM parser: alignment
    lines carry a full flag mix (paired 0x1, proper-pair 0x2, unmapped
    0x4, secondary 0x100, duplicate 0x400, composed arithmetically),
    get REALLY parsed by `sources/reads.py::parse_sam_lines`, and the
    flagstat summary extracts each bit with bitwiseAND from the parsed
    integer — while the oracle recomputes the same counts from the
    generating predicates directly. Equality proves line parsing + bit
    extraction end to end (the q111 recipe applied to the flag word).
    One scan, one 1-row aggregate; conditional sums are map-side
    combinable — flagstat at 100 TB is scan-speed."""
    from variantcalling_spark.sources.reads import parse_sam_lines

    li = load_table(spark, sf_dir, "lineitem")
    flag = (
        (F.col("l_partkey") % 2)  # paired
        + 2 * F.when((F.col("l_partkey") % 2 == 1) & (F.col("l_suppkey") % 3 == 0), 1).otherwise(0)
        + 4 * F.when(F.col("l_linenumber") % 7 == 0, 1).otherwise(0)
        + 256 * F.when(F.col("l_orderkey") % 11 == 0, 1).otherwise(0)
        + 1024 * F.when(F.col("l_quantity").cast("bigint") % 9 < 2, 1).otherwise(0)
    )
    lines = li.select(
        F.format_string(
            "r%d\t%d\tc%d\t%d\t%d\t10M\t*\t0\t0\t*\t*",
            F.col("l_orderkey"),
            flag.cast("int"),
            (F.col("l_orderkey") % 4).cast("int"),
            (F.col("l_orderkey") % 50000 + 1).cast("long"),
            (F.col("l_suppkey") % 60).cast("int"),
        ).alias("value")
    )
    sam = parse_sam_lines(lines)
    b = F.col("flag")
    return sam.agg(
        cnt("n_total"),
        F.sum(F.when(b.bitwiseAND(4) == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_mapped"),
        F.sum(F.when(b.bitwiseAND(1) != 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_paired"),
        F.sum(F.when(b.bitwiseAND(2) != 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_proper_pair"),
        F.sum(F.when(b.bitwiseAND(256) != 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_secondary"),
        F.sum(F.when(b.bitwiseAND(1024) != 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_duplicates"),
        F.round(
            F.sum(F.when(b.bitwiseAND(4) == 0, 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("frac_mapped"),
    )


HS_DEPTHS = (1, 4, 8)


@query(
    "q187_target_coverage_metrics",
    oracle=f"""
WITH reads AS (
  SELECT concat('c', CAST(l_orderkey % 4 AS VARCHAR)) AS chrom,
         (l_orderkey * 7 + l_linenumber * 13) % 50000 AS start,
         (l_orderkey * 7 + l_linenumber * 13) % 50000
           + (20 + CAST(l_quantity AS BIGINT) % 30) AS "end"
  FROM lineitem
),
deltas AS (
  SELECT chrom, start AS bp, 1 AS delta FROM reads
  UNION ALL SELECT chrom, "end" AS bp, -1 AS delta FROM reads
),
agg AS (
  SELECT chrom, bp, SUM(delta) AS d FROM deltas
  GROUP BY chrom, bp HAVING SUM(delta) <> 0
),
runs AS (
  SELECT chrom, bp AS start,
         LEAD(bp) OVER (PARTITION BY chrom ORDER BY bp) AS "end",
         CAST(SUM(d) OVER (PARTITION BY chrom ORDER BY bp) AS BIGINT) AS depth
  FROM agg
),
targets AS (
  SELECT concat('c', CAST(c AS VARCHAR)) AS chrom,
         j * 997 AS tstart, j * 997 + 400 AS tend,
         'panel' || CAST(j % 3 AS VARCHAR) AS category
  FROM generate_series(0, 3) cs(c), generate_series(0, 49) js(j)
),
tot AS (
  SELECT category, CAST(SUM(tend - tstart) AS BIGINT) AS target_bases
  FROM targets GROUP BY category
),
ov AS (
  SELECT t.category, r.depth,
         LEAST(r."end", t.tend) - GREATEST(r.start, t.tstart) AS bases
  FROM runs r JOIN targets t
    ON t.chrom = r.chrom AND r.start < t.tend AND t.tstart < r."end"
  WHERE r."end" IS NOT NULL AND r.depth > 0
)
SELECT tot.category, tot.target_bases,
       {", ".join(
         f'''CAST(COALESCE(SUM(CASE WHEN ov.depth >= {d} THEN ov.bases END), 0) AS BIGINT)
           AS bases_{d}x,
       ROUND(COALESCE(SUM(CASE WHEN ov.depth >= {d} THEN ov.bases END), 0)
             / CAST(tot.target_bases AS DOUBLE), 6) AS pct_{d}x'''
         for d in HS_DEPTHS)}
FROM tot LEFT JOIN ov ON ov.category = tot.category
GROUP BY tot.category, tot.target_bases
""",
)
def q187_target_coverage_metrics(spark, sf_dir):
    """Hybrid-selection coverage metrics (picard HsMetrics
    PCT_TARGET_BASES_{{1,4,8}}X): depth runs from the read pileup
    intersected with the capture-panel intervals, per-panel fraction
    of target bases at-or-above each depth. q48 answers this
    genome-wide from the depth histogram; panels need the
    INTERSECTION first — the broadcast interval-overlap join
    (`operators/interval_join.py::interval_overlap_join`: target BEDs
    are always broadcast-small) clips each depth run to each target,
    then per-category conditional sums are map-side combinable.
    Targets left-join so a panel with zero coverage still reports
    0.0, not absence."""
    from variantcalling_spark.operators.interval_join import interval_overlap_join
    from variantcalling_spark.operators.pileup import reads_to_depth_runs

    li = load_table(spark, sf_dir, "lineitem")
    reads = li.select(
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias("chrom"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000).alias(
            "start"
        ),
        (
            (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000
            + (20 + F.col("l_quantity").cast("bigint") % 30)
        ).alias("end"),
    )
    runs = reads_to_depth_runs(reads).where(F.col("depth") > 0)
    spark_b = spark
    targets = (
        spark_b.range(4)
        .select(F.col("id").alias("c"))
        .crossJoin(spark_b.range(50).select(F.col("id").alias("j")))
        .select(
            F.concat(F.lit("c"), F.col("c").cast("string")).alias("chrom"),
            (F.col("j") * 997).alias("start"),
            (F.col("j") * 997 + 400).alias("end"),
            F.concat(F.lit("panel"), (F.col("j") % 3).cast("string")).alias(
                "category"
            ),
        )
    )
    tot = targets.groupBy("category").agg(
        F.sum(F.col("end") - F.col("start")).cast("bigint").alias("target_bases")
    )
    ov = interval_overlap_join(
        runs, targets.select("chrom", "start", "end", "category"), keys=["chrom"]
    ).select(
        "category",
        "depth",
        (F.col("overlap_end") - F.col("overlap_start")).alias("bases"),
    )
    aggs = []
    for d in HS_DEPTHS:
        covered = F.sum(F.when(F.col("depth") >= d, F.col("bases")))
        aggs.append(
            F.coalesce(covered, F.lit(0)).cast("bigint").alias(f"bases_{d}x")
        )
        aggs.append(
            F.round(
                F.coalesce(covered, F.lit(0)) / F.col("target_bases").cast("double"),
                6,
            ).alias(f"pct_{d}x")
        )
    joined = tot.join(ov, "category", "left")
    return joined.groupBy("category", "target_bases").agg(*aggs)


@query(
    "q188_mark_duplicates",
    oracle="""
WITH p AS (
  SELECT 'c' || CAST(l_orderkey % 4 AS VARCHAR) AS chrom,
         l_orderkey % 20000 + 1 AS pos,
         CASE WHEN l_partkey % 3 = 0 THEN 16 ELSE 0 END AS strand,
         CAST(l_suppkey % 60 AS INT) AS mapq
  FROM lineitem
  WHERE l_linenumber % 7 <> 0
),
g AS (
  SELECT chrom, pos, strand, COUNT(*) AS n_reads, MAX(mapq) AS best_mapq
  FROM p GROUP BY chrom, pos, strand
)
SELECT chrom,
       CAST(SUM(n_reads) AS BIGINT) AS n_mapped,
       CAST(SUM(CASE WHEN n_reads > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_groups,
       CAST(SUM(n_reads - 1) AS BIGINT) AS n_duplicates,
       ROUND(SUM(n_reads - 1) / CAST(SUM(n_reads) AS DOUBLE), 6) AS dup_rate,
       ROUND(CAST(SUM(CAST(best_mapq AS DECIMAL(18,6)) * n_reads) AS DOUBLE)
             / SUM(n_reads), 6) AS mean_best_mapq
FROM g GROUP BY chrom
""",
)
def q188_mark_duplicates(spark, sf_dir):
    """The MarkDuplicates primitive (picard/sambamba core): mapped reads
    sharing (chrom, unclipped start, strand) form a duplicate group;
    the best-MAPQ member survives, the rest are flagged — PCR/optical
    duplicate rate per contig is the library-complexity dial every
    sequencing QC report leads with. Reads REALLY parse through the
    SAM source (flags carry strand 0x10, unmapped records drop via the
    0x4 filter, the q181 discipline); the duplicate grouping is ONE
    groupBy on the position key — at 100 TB this is the shuffle
    MarkDuplicates always pays, here with map-side combine since only
    counts and maxima travel. Mean best-MAPQ goes through DECIMAL so
    the per-contig means are partition-order-independent."""
    from variantcalling_spark.sources.reads import parse_sam_lines

    li = load_table(spark, sf_dir, "lineitem")
    flag = (
        4 * F.when(F.col("l_linenumber") % 7 == 0, 1).otherwise(0)
        + 16 * F.when(F.col("l_partkey") % 3 == 0, 1).otherwise(0)
    )
    lines = li.select(
        F.format_string(
            "r%d\t%d\tc%d\t%d\t%d\t10M\t*\t0\t0\t*\t*",
            F.col("l_orderkey"),
            flag.cast("int"),
            (F.col("l_orderkey") % 4).cast("int"),
            (F.col("l_orderkey") % 20000 + 1).cast("long"),
            (F.col("l_suppkey") % 60).cast("int"),
        ).alias("value")
    )
    sam = parse_sam_lines(lines).where(F.col("flag").bitwiseAND(4) == 0)
    g = sam.groupBy(
        "chrom",
        "pos",
        F.col("flag").bitwiseAND(16).alias("strand"),
    ).agg(cnt("n_reads"), F.max("mapq").alias("best_mapq"))
    return g.groupBy("chrom").agg(
        F.sum("n_reads").cast("bigint").alias("n_mapped"),
        F.sum(F.when(F.col("n_reads") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dup_groups"),
        F.sum(F.col("n_reads") - 1).cast("bigint").alias("n_duplicates"),
        F.round(
            F.sum(F.col("n_reads") - 1) / F.sum("n_reads").cast("double"), 6
        ).alias("dup_rate"),
        F.round(
            F.sum(F.col("best_mapq").cast("decimal(18,6)") * F.col("n_reads"))
            .cast("double")
            / F.sum("n_reads"),
            6,
        ).alias("mean_best_mapq"),
    )


LD_WINDOW = 40


@query(
    "q198_ld_r2_pairs",
    oracle=f"""
WITH calls AS ({SQL_COHORT_CALLS}),
a AS (
  SELECT chrom, sample, pos, CAST(gt AS BIGINT) AS gt,
         unnest([pos // {LD_WINDOW}, pos // {LD_WINDOW} + 1]) AS bk
  FROM calls
),
b AS (
  SELECT chrom, sample, pos, CAST(gt AS BIGINT) AS gt,
         pos // {LD_WINDOW} AS bk
  FROM calls
),
pr AS (
  SELECT a.chrom, a.pos AS pos_a, b.pos AS pos_b,
         COUNT(*) AS n,
         CAST(SUM(a.gt) AS BIGINT) AS sx, CAST(SUM(b.gt) AS BIGINT) AS sy,
         CAST(SUM(a.gt * a.gt) AS BIGINT) AS sxx,
         CAST(SUM(b.gt * b.gt) AS BIGINT) AS syy,
         CAST(SUM(a.gt * b.gt) AS BIGINT) AS sxy
  FROM a JOIN b
    ON b.chrom = a.chrom AND b.sample = a.sample AND b.bk = a.bk
   AND b.pos > a.pos AND b.pos - a.pos <= {LD_WINDOW}
  GROUP BY a.chrom, a.pos, b.pos
)
SELECT chrom, pos_a, pos_b, CAST(n AS BIGINT) AS n,
       CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) AS BIGINT) AS r2_num,
       CAST((n * sxx - sx * sx) * (n * syy - sy * sy) AS BIGINT) AS r2_den,
       ROUND((n * sxy - sx * sy) * (n * sxy - sx * sy)
             / CAST((n * sxx - sx * sx) * (n * syy - sy * sy) AS DOUBLE), 6)
         AS r2
FROM pr
WHERE n >= 3 AND (n * sxx - sx * sx) * (n * syy - sy * sy) > 0
""",
)
def q198_ld_r2_pairs(spark, sf_dir):
    """Pairwise linkage-disequilibrium r² between nearby sites (the
    plink --r2 genotypic-correlation form): squared Pearson
    correlation of genotype dosages over the samples both sites share,
    for site pairs within {LD_WINDOW} bp — the pruning input of every
    GWAS pipeline (LD-prune before association, tag-SNP selection).
    Exact: r² is a bigint rational from the q165 sufficient-statistic
    algebra on 0/1/2 dosages. Scale shape: the pair discovery is the
    BANDED range self-join at SITE granularity (a-side exploded to two
    adjacent position buckets, equi-join on (chrom, bucket) + distance
    refinement — the q127 anchor-join lesson, never a per-chrom
    cross). The cohort's sample domain is fixed by construction
    (s0..s3, ``l_suppkey % 4``), so each site carries its dosages as a
    4-slot pivot and every pair's sufficient statistics fold in pure
    codegen over the slots — the join shuffles one row per SITE (not
    per site x sample) and the former pair x sample re-aggregation
    Exchange disappears; monomorphic-in-sample pairs drop via the
    zero-variance guard."""
    calls = _cohort_calls(spark, sf_dir)
    n_slots = 4  # the cohort construction's fixed sample domain
    # persisted: BOTH self-join sides consume the pivot, and the pos_a/
    # pos_b renames defeat exchange reuse — without it the calls + pivot
    # aggregates execute twice (the prefix_filtered_pairs precedent)
    site = calls.groupBy("chrom", "pos").agg(
        *[
            F.max(
                F.when(F.col("sample") == f"s{i}", F.col("gt").cast("bigint"))
            ).alias(f"g{i}")
            for i in range(n_slots)
        ]
    ).transform(managed_persist)
    a = site.select(
        "chrom",
        F.col("pos").alias("pos_a"),
        *[F.col(f"g{i}").alias(f"x{i}") for i in range(n_slots)],
        F.explode(
            F.array(
                F.expr(f"pos DIV {LD_WINDOW}"),
                F.expr(f"pos DIV {LD_WINDOW} + 1"),
            )
        ).alias("bk"),
    )
    b = site.select(
        "chrom",
        F.col("pos").alias("pos_b"),
        *[F.col(f"g{i}").alias(f"y{i}") for i in range(n_slots)],
        F.expr(f"pos DIV {LD_WINDOW}").alias("bk"),
    )
    # pos_b DIV W lands on exactly one of pos_a's two exploded buckets
    # whenever 0 < pos_b - pos_a <= W, so each qualifying pair matches
    # exactly once (the same invariant the per-sample form relied on)
    joined = a.join(b, ["chrom", "bk"]).where(
        (F.col("pos_b") > F.col("pos_a"))
        & (F.col("pos_b") - F.col("pos_a") <= LD_WINDOW)
    )
    both = [
        (F.col(f"x{i}").isNotNull() & F.col(f"y{i}").isNotNull())
        for i in range(n_slots)
    ]

    def fold(term):
        acc = F.lit(0).cast("bigint")
        for i in range(n_slots):
            acc = acc + F.when(both[i], term(i)).otherwise(F.lit(0).cast("bigint"))
        return acc

    pr = joined.select(
        "chrom",
        "pos_a",
        "pos_b",
        fold(lambda i: F.lit(1).cast("bigint")).alias("n"),
        fold(lambda i: F.col(f"x{i}")).alias("sx"),
        fold(lambda i: F.col(f"y{i}")).alias("sy"),
        fold(lambda i: F.col(f"x{i}") * F.col(f"x{i}")).alias("sxx"),
        fold(lambda i: F.col(f"y{i}") * F.col(f"y{i}")).alias("syy"),
        fold(lambda i: F.col(f"x{i}") * F.col(f"y{i}")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    dx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    return (
        pr.where((F.col("n") >= 3) & (dx * dy > 0))
        .select(
            "chrom",
            "pos_a",
            "pos_b",
            F.col("n").cast("bigint").alias("n"),
            (num * num).cast("bigint").alias("r2_num"),
            (dx * dy).cast("bigint").alias("r2_den"),
            F.round((num * num) / (dx * dy).cast("double"), 6).alias("r2"),
        )
    )


LD_PRUNE_R2 = 0.5


def _q198_oracle() -> str:
    from variantcalling_spark.queries import _REGISTRY

    return _REGISTRY["q198_ld_r2_pairs"].oracle


@query(
    "q199_ld_prune",
    oracle=f"""
WITH calls AS ({SQL_COHORT_CALLS}),
sites AS (SELECT DISTINCT chrom, pos FROM calls),
ld AS ({_q198_oracle()}),
pruned AS (
  SELECT DISTINCT chrom, pos_b AS pos FROM ld WHERE r2 >= {LD_PRUNE_R2}
)
SELECT s.chrom,
       COUNT(*) AS n_sites,
       CAST(SUM(CASE WHEN p.pos IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN p.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pruned,
       ROUND(SUM(CASE WHEN p.pos IS NULL THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS keep_rate
FROM sites s LEFT JOIN pruned p ON p.chrom = s.chrom AND p.pos = s.pos
GROUP BY s.chrom
""",
)
def q199_ld_prune(spark, sf_dir):
    """LD pruning (deterministic single-pass form): drop any site whose
    r² against an EARLIER site within the window reaches
    {LD_PRUNE_R2} — the tag-SNP thinning GWAS runs before association
    (plink --indep-pairwise's windowed intent without the
    order-dependent greedy state, so both engines compute the
    identical keep-set). Composes the registered q198 pair SQL; the
    prune set is a DISTINCT over the flagged right-ends and the
    keep-set is a left-anti-shaped join. Per-chrom keep rates are the
    report."""
    from variantcalling_spark.queries import _REGISTRY

    ld = _REGISTRY["q198_ld_r2_pairs"].fn(spark, sf_dir)
    calls = _cohort_calls(spark, sf_dir)
    sites = calls.select("chrom", "pos").distinct()
    pruned = (
        ld.where(F.col("r2") >= LD_PRUNE_R2)
        .select("chrom", F.col("pos_b").alias("pos"))
        .distinct()
        .withColumn("is_pruned", F.lit(1))
    )
    j = sites.join(pruned, ["chrom", "pos"], "left")
    return j.groupBy("chrom").agg(
        cnt("n_sites"),
        F.sum(F.when(F.col("is_pruned").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
        F.sum(F.when(F.col("is_pruned").isNotNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_pruned"),
        F.round(
            F.sum(F.when(F.col("is_pruned").isNull(), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("keep_rate"),
    )


HWE_CHI2_CUT = 4.0  # ~p 0.046 at 1 df


@query(
    "q200_gwas_prep_funnel",
    oracle=f"""
WITH calls AS ({SQL_COHORT_CALLS}),
site AS (
  SELECT chrom, pos,
         COUNT(*) AS n,
         CAST(SUM(CASE WHEN gt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS aa,
         CAST(SUM(CASE WHEN gt = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ab,
         CAST(SUM(CASE WHEN gt = 2 THEN 1 ELSE 0 END) AS BIGINT) AS bb
  FROM calls GROUP BY chrom, pos
),
poly AS (
  SELECT *, 2 * aa + ab AS ra, 2 * bb + ab AS al FROM site
  WHERE 2 * aa + ab > 0 AND 2 * bb + ab > 0
),
hwe AS (
  SELECT chrom, pos FROM poly
  WHERE n * (4 * aa * bb - ab * ab) * (4 * aa * bb - ab * ab)
        <= {HWE_CHI2_CUT} * (ra * ra * al * al)
),
ld AS ({{LD}}),
pruned AS (
  SELECT DISTINCT chrom, pos_b AS pos FROM ld WHERE r2 >= {LD_PRUNE_R2}
),
survivors AS (
  SELECT h.chrom, h.pos FROM hwe h
  LEFT JOIN pruned p ON p.chrom = h.chrom AND p.pos = h.pos
  WHERE p.pos IS NULL
)
SELECT 'a_total_sites' AS stage, (SELECT COUNT(*) FROM site) AS n
UNION ALL SELECT 'b_polymorphic', (SELECT COUNT(*) FROM poly)
UNION ALL SELECT 'c_hwe_pass', (SELECT COUNT(*) FROM hwe)
UNION ALL SELECT 'd_ld_pruned_kept', (SELECT COUNT(*) FROM survivors)
""".replace("{LD}", "SELECT * FROM (" + _q198_oracle() + ") ldq"),
)
def q200_gwas_prep_funnel(spark, sf_dir):
    """The GWAS-prep funnel — the genomics twin of q99's curation
    funnel, composing the cohort family end to end: all sites →
    polymorphic (q155's segregation predicate) → HWE pass (q153's
    exact chi-square ≤ {HWE_CHI2_CUT}, still a pure integer comparison
    — the cutoff multiplies through the rational, no division) →
    LD-thinned survivors (q198/q199's banded r² prune). One row per
    stage; every stage is the REGISTERED machinery, so this funnel is
    regression cover for four queries at once — and the integer-exact
    HWE filter demonstrates threshold tests on rationals without ever
    materializing the quotient."""
    calls = _cohort_calls(spark, sf_dir)
    site = calls.groupBy("chrom", "pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("gt") == 0, 1).otherwise(0)).cast("bigint").alias("aa"),
        F.sum(F.when(F.col("gt") == 1, 1).otherwise(0)).cast("bigint").alias("ab"),
        F.sum(F.when(F.col("gt") == 2, 1).otherwise(0)).cast("bigint").alias("bb"),
    ).transform(managed_persist)
    ra = 2 * F.col("aa") + F.col("ab")
    al = 2 * F.col("bb") + F.col("ab")
    poly = site.where((ra > 0) & (al > 0)).withColumn("ra", ra).withColumn("al", al)
    poly = managed_persist(poly)
    d = 4 * F.col("aa") * F.col("bb") - F.col("ab") * F.col("ab")
    hwe = poly.where(
        F.col("n") * d * d
        <= F.lit(HWE_CHI2_CUT)
        * (F.col("ra") * F.col("ra") * F.col("al") * F.col("al"))
    ).select("chrom", "pos").transform(managed_persist)
    from variantcalling_spark.queries import _REGISTRY

    ld = _REGISTRY["q198_ld_r2_pairs"].fn(spark, sf_dir)
    pruned = (
        ld.where(F.col("r2") >= LD_PRUNE_R2)
        .select("chrom", F.col("pos_b").alias("pos"))
        .distinct()
    )
    survivors = hwe.join(pruned, ["chrom", "pos"], "left_anti")
    stages = [
        ("a_total_sites", site),
        ("b_polymorphic", poly),
        ("c_hwe_pass", hwe),
        ("d_ld_pruned_kept", survivors),
    ]
    out = None
    for name, df in stages:
        row = df.agg(F.count(F.lit(1)).alias("n")).select(
            F.lit(name).alias("stage"), "n"
        )
        out = row if out is None else out.unionByName(row)
    return out


@query(
    "q202_switch_error_rate",
    oracle="""
WITH het AS (
  SELECT 'c' || CAST(l_orderkey % 4 AS VARCHAR) AS chrom,
         l_orderkey * 10 + l_linenumber AS pos,
         CASE WHEN MIN(l_partkey) % 2 = 0 THEN '0|1' ELSE '1|0' END AS gt_a,
         CASE WHEN (MIN(l_partkey) + MIN(l_suppkey)) % 2 = 0
              THEN '0|1' ELSE '1|0' END AS gt_b
  FROM lineitem WHERE l_quantity < 30
  GROUP BY 1, 2
),
agr AS (
  SELECT chrom, pos,
         CASE WHEN gt_a = gt_b THEN 1 ELSE 0 END AS agree
  FROM het
),
sw AS (
  SELECT chrom, agree,
         LAG(agree) OVER (PARTITION BY chrom ORDER BY pos) AS prev_agree
  FROM agr
)
SELECT chrom,
       COUNT(*) AS n_het_sites,
       CAST(SUM(CASE WHEN prev_agree IS NOT NULL AND agree <> prev_agree
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_switches,
       ROUND(SUM(CASE WHEN prev_agree IS NOT NULL AND agree <> prev_agree
                      THEN 1 ELSE 0 END)
             / CAST(COUNT(*) - 1 AS DOUBLE), 6) AS switch_error_rate
FROM sw GROUP BY chrom
""",
)
def q202_switch_error_rate(spark, sf_dir):
    """Phasing switch-error rate between two phased callsets (the
    whatshap-compare / long-read-phasing eval metric, and the
    POSITION-SEQUENCE cousin of q127's per-segment diplotype match):
    at each shared het site the two callsets either agree or disagree
    on phase orientation; a SWITCH is where that relative orientation
    flips between consecutive sites — global flips cost one switch,
    not one error per site, which is exactly what makes this the right
    phaser metric. One LAG window per contig over the het-site
    sequence + one counting aggregate; at genome scale the window
    partitions per contig like every ordered operator here."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    # the synthetic lineitem carries duplicate (orderkey, linenumber)
    # pairs — one het record per site via MIN aggregates (a LAG over a
    # non-unique ordering would be engine-dependent)
    het = (
        li.where(F.col("l_quantity") < 30)
        .groupBy(
            F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias(
                "chrom"
            ),
            (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("pos"),
        )
        .agg(
            F.min("l_partkey").alias("pk"), F.min("l_suppkey").alias("sk")
        )
        .select(
            "chrom",
            "pos",
            F.when(F.col("pk") % 2 == 0, "0|1").otherwise("1|0").alias("gt_a"),
            F.when((F.col("pk") + F.col("sk")) % 2 == 0, "0|1")
            .otherwise("1|0")
            .alias("gt_b"),
        )
    )
    agr = het.select(
        "chrom",
        "pos",
        F.when(F.col("gt_a") == F.col("gt_b"), 1).otherwise(0).alias("agree"),
    )
    wo = W.partitionBy("chrom").orderBy("pos")
    sw = agr.withColumn("prev_agree", F.lag("agree").over(wo))
    switch = F.when(
        F.col("prev_agree").isNotNull()
        & (F.col("agree") != F.col("prev_agree")),
        1,
    ).otherwise(0)
    return sw.groupBy("chrom").agg(
        cnt("n_het_sites"),
        F.sum(switch).cast("bigint").alias("n_switches"),
        F.round(
            F.sum(switch) / (F.count(F.lit(1)) - 1).cast("double"), 6
        ).alias("switch_error_rate"),
    )


@query(
    "q203_cohens_kappa",
    oracle="""
WITH lab AS (
  SELECT CAST(l_partkey % 3 AS INT) AS rater_a,
         CAST((l_partkey + CASE WHEN l_suppkey % 5 = 0 THEN 1 ELSE 0 END) % 3
              AS INT) AS rater_b
  FROM lineitem
),
cm AS (SELECT rater_a, rater_b, COUNT(*) AS c FROM lab GROUP BY rater_a, rater_b),
n_t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cm),
diag AS (SELECT CAST(SUM(c) AS BIGINT) AS d FROM cm WHERE rater_a = rater_b),
marg AS (
  SELECT CAST(SUM(ra.rc * rb.cc) AS BIGINT) AS e FROM
    (SELECT rater_a AS k, SUM(c) AS rc FROM cm GROUP BY rater_a) ra
    JOIN (SELECT rater_b AS k, SUM(c) AS cc FROM cm GROUP BY rater_b) rb
      ON rb.k = ra.k
)
SELECT n_t.n, diag.d AS n_agree,
       CAST(n_t.n * diag.d - marg.e AS BIGINT) AS kappa_num,
       CAST(n_t.n * n_t.n - marg.e AS BIGINT) AS kappa_den,
       ROUND((n_t.n * diag.d - marg.e)
             / CAST(n_t.n * n_t.n - marg.e AS DOUBLE), 6) AS kappa
FROM n_t CROSS JOIN diag CROSS JOIN marg
""",
)
def q203_cohens_kappa(spark, sf_dir):
    """Cohen's kappa between two raters — the chance-corrected
    agreement metric (annotation-quality control for labeled training
    data; the reference's concordance stats are the truth-based
    cousin, kappa is the no-truth pairwise one). Exact: clearing
    denominators gives κ = (N·Σdiag − Σ rᵢcᵢ) / (N² − Σ rᵢcᵢ), a
    bigint rational from the confusion matrix — the q153/q166
    discipline on the agreement family. One (a, b) groupBy over the
    pairs (the only data-sized shuffle), then class-count joins over
    the k-row matrix."""
    li = load_table(spark, sf_dir, "lineitem")
    lab = li.select(
        (F.col("l_partkey") % 3).cast("int").alias("rater_a"),
        (
            (
                F.col("l_partkey")
                + F.when(F.col("l_suppkey") % 5 == 0, 1).otherwise(0)
            )
            % 3
        )
        .cast("int")
        .alias("rater_b"),
    )
    cm = lab.groupBy("rater_a", "rater_b").agg(cnt("c")).transform(managed_persist)
    n_t = cm.agg(F.sum("c").cast("bigint").alias("n"))
    diag = cm.where(F.col("rater_a") == F.col("rater_b")).agg(
        F.sum("c").cast("bigint").alias("d")
    )
    ra = cm.groupBy(F.col("rater_a").alias("k")).agg(F.sum("c").alias("rc"))
    rb = cm.groupBy(F.col("rater_b").alias("k")).agg(F.sum("c").alias("cc"))
    marg = (
        ra.join(rb, "k")
        .agg(F.sum(F.col("rc") * F.col("cc")).cast("bigint").alias("e"))
    )
    num = F.col("n") * F.col("d") - F.col("e")
    den = F.col("n") * F.col("n") - F.col("e")
    return (
        n_t.crossJoin(F.broadcast(diag))
        .crossJoin(F.broadcast(marg))
        .select(
            "n",
            F.col("d").alias("n_agree"),
            num.cast("bigint").alias("kappa_num"),
            den.cast("bigint").alias("kappa_den"),
            F.round(num / den.cast("double"), 6).alias("kappa"),
        )
    )


@query(
    "q205_brier_reliability",
    oracle=f"""
WITH calls AS ({SQL_COHORT_CALLS}),
lab AS (
  SELECT gq AS s, CASE WHEN gt > 0 THEN 1 ELSE 0 END AS y FROM calls
  WHERE gq BETWEEN 0 AND 50
),
b AS (
  SELECT s, COUNT(*) AS n_k, CAST(SUM(y) AS BIGINT) AS o_k
  FROM lab GROUP BY s
)
SELECT CAST(s AS INT) AS score, CAST(n_k AS BIGINT) AS n_k, o_k,
       ROUND(o_k / CAST(n_k AS DOUBLE), 6) AS obs_rate,
       ROUND(s / 50.0, 6) AS pred_prob,
       CAST((s * n_k - 50 * o_k) * (s * n_k - 50 * o_k) AS BIGINT) AS rel_num,
       CAST(2500 * n_k AS BIGINT) AS rel_den,
       ROUND((s * n_k - 50 * o_k) * (s * n_k - 50 * o_k)
             / CAST(2500 * n_k AS DOUBLE), 6) AS reliability_contrib
FROM b
""",
)
def q205_brier_reliability(spark, sf_dir):
    """Calibration reliability diagram with EXACT per-bin Brier
    reliability contributions — the proper-scoring companion to q167's
    AUC (AUC grades ranking; reliability grades whether predicted
    probabilities MEAN what they say — the quality filters' scores
    feed sampling weights, so miscalibration silently reweights the
    corpus). With integer scores s/50 as predicted probability, the
    reliability term n_k·(p_k − ō_k)² clears denominators to
    (s·n_k − 50·o_k)² / (2500·n_k) — a bigint rational per bin
    (Σ over bins / N = the Murphy-decomposition reliability). One
    score-domain groupBy; everything else is projection."""
    calls = _cohort_calls(spark, sf_dir)
    lab = calls.where(F.col("gq").between(0, 50)).select(
        F.col("gq").alias("s"),
        F.when(F.col("gt") > 0, 1).otherwise(0).alias("y"),
    )
    b = lab.groupBy("s").agg(
        cnt("n_k"), F.sum("y").cast("bigint").alias("o_k")
    )
    dev = F.col("s") * F.col("n_k") - 50 * F.col("o_k")
    return b.select(
        F.col("s").cast("int").alias("score"),
        F.col("n_k").cast("bigint").alias("n_k"),
        "o_k",
        F.round(F.col("o_k") / F.col("n_k").cast("double"), 6).alias("obs_rate"),
        F.round(F.col("s") / F.lit(50.0), 6).alias("pred_prob"),
        (dev * dev).cast("bigint").alias("rel_num"),
        (2500 * F.col("n_k")).cast("bigint").alias("rel_den"),
        F.round((dev * dev) / (2500 * F.col("n_k")).cast("double"), 6).alias(
            "reliability_contrib"
        ),
    )


ROH_MIN_SITES = 25


@query(
    "q211_roh_segments",
    oracle=f"""
WITH calls AS ({SQL_COHORT_CALLS}),
h AS (
  SELECT sample, chrom, pos,
         CASE WHEN gt IN (0, 2) THEN 1 ELSE 0 END AS hom
  FROM calls
),
g AS (
  SELECT sample, chrom, pos, hom,
         CASE WHEN LAG(hom) OVER w IS NULL OR hom <> LAG(hom) OVER w
              THEN 1 ELSE 0 END AS brk
  FROM h
  WINDOW w AS (PARTITION BY sample, chrom ORDER BY pos)
),
runs AS (
  SELECT sample, chrom, pos, hom,
         SUM(brk) OVER (PARTITION BY sample, chrom ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM g
),
seg AS (
  SELECT sample, chrom, run_id,
         COUNT(*) AS n_sites,
         CAST(MIN(pos) AS BIGINT) AS start_pos,
         CAST(MAX(pos) AS BIGINT) AS end_pos
  FROM runs WHERE hom = 1
  GROUP BY sample, chrom, run_id
)
SELECT sample,
       COUNT(*) AS n_roh,
       CAST(SUM(n_sites) AS BIGINT) AS total_sites_in_roh,
       CAST(SUM(end_pos - start_pos) AS BIGINT) AS total_roh_span,
       CAST(MAX(n_sites) AS BIGINT) AS longest_roh_sites
FROM seg WHERE n_sites >= {ROH_MIN_SITES}
GROUP BY sample
""",
)
def q211_roh_segments(spark, sf_dir):
    """Runs of homozygosity per sample (plink --homozyg shape): maximal
    stretches of consecutive homozygous calls with ≥ {ROH_MIN_SITES}
    sites — the consanguinity / autozygosity QC the cohort pipeline
    reports beside q149's kinship (long ROH = recent parental
    relatedness; the two cross-validate). Classic gaps-and-islands:
    per-(sample, chrom) LAG break on the hom/het flag, running-sum run
    ids, per-run rollup, per-sample summary — the q42/q179 machinery
    on genotype state, windows never wider than one sample-contig."""
    from pyspark.sql import Window as W

    calls = _cohort_calls(spark, sf_dir)
    h = calls.select(
        "sample",
        "chrom",
        "pos",
        F.when(F.col("gt").isin(0, 2), 1).otherwise(0).alias("hom"),
    )
    wo = W.partitionBy("sample", "chrom").orderBy("pos")
    lag = F.lag("hom").over(wo)
    g = h.withColumn(
        "brk", F.when(lag.isNull() | (F.col("hom") != lag), 1).otherwise(0)
    )
    runs = g.withColumn(
        "run_id", F.sum("brk").over(wo.rowsBetween(W.unboundedPreceding, 0))
    )
    seg = (
        runs.where(F.col("hom") == 1)
        .groupBy("sample", "chrom", "run_id")
        .agg(
            cnt("n_sites"),
            F.min("pos").cast("bigint").alias("start_pos"),
            F.max("pos").cast("bigint").alias("end_pos"),
        )
    )
    return (
        seg.where(F.col("n_sites") >= ROH_MIN_SITES)
        .groupBy("sample")
        .agg(
            cnt("n_roh"),
            F.sum("n_sites").cast("bigint").alias("total_sites_in_roh"),
            F.sum(F.col("end_pos") - F.col("start_pos"))
            .cast("bigint")
            .alias("total_roh_span"),
            F.max("n_sites").cast("bigint").alias("longest_roh_sites"),
        )
    )


@query(
    "q212_decile_lift",
    oracle=f"""
WITH calls AS ({SQL_COHORT_CALLS}),
lab AS (
  SELECT chrom, pos, gq AS s, CASE WHEN gt > 0 THEN 1 ELSE 0 END AS y
  FROM calls WHERE sample = 's0'
),
r AS (
  SELECT y,
         ROW_NUMBER() OVER (ORDER BY s DESC, chrom, pos) AS rnk,
         COUNT(*) OVER () AS n
  FROM lab
),
d AS (
  SELECT y, CAST(((rnk - 1) * 10) // n + 1 AS BIGINT) AS decile, n FROM r
),
t AS (SELECT CAST(SUM(y) AS BIGINT) AS tot_pos, COUNT(*) AS tot_n FROM d),
agg AS (
  SELECT decile, COUNT(*) AS n_k, CAST(SUM(y) AS BIGINT) AS pos_k
  FROM d GROUP BY decile
),
cum AS (
  SELECT decile, n_k, pos_k,
         CAST(SUM(n_k) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
         CAST(SUM(pos_k) OVER (ORDER BY decile
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
  FROM agg
)
SELECT c.decile, CAST(c.n_k AS BIGINT) AS n, c.pos_k AS n_pos,
       ROUND(c.pos_k / CAST(c.n_k AS DOUBLE), 6) AS response_rate,
       ROUND((c.cum_pos * t.tot_n) / (CAST(c.cum_n AS DOUBLE) * t.tot_pos), 6)
         AS cumulative_lift,
       ROUND(c.cum_pos / CAST(t.tot_pos AS DOUBLE), 6) AS cumulative_gain
FROM cum c CROSS JOIN t
""",
)
def q212_decile_lift(spark, sf_dir):
    """Decile lift/gains table for a ranking score (here s0's GQ
    ranking carrier status) — the third leg of the model-eval family:
    q167 grades ranking globally (AUC), q205 grades probability
    calibration, this is the OPERATING table ('score the top decile,
    capture X% of positives at Y× lift') that decides where to set a
    triage cutoff. Deciles by integer rank arithmetic
    ((rnk−1)·10 DIV n — no percentile floats), lift as an exact
    integer cross-ratio rounded once; the rank orders by (score DESC,
    chrom, pos) so ties split deterministically on both engines. The
    rank is a DISTRIBUTED row number bucketed on the integer GQ domain
    (r7: the previous global rank + whole-relation count windows were
    the SCALE.md:134-139 single-partition straggler)."""
    from pyspark.sql import Window as W

    from variantcalling_spark.operators.ordered import distributed_row_number

    calls = _cohort_calls(spark, sf_dir)
    lab = calls.where(F.col("sample") == "s0").select(
        "chrom",
        "pos",
        F.col("gq").alias("s"),
        F.when(F.col("gt") > 0, 1).otherwise(0).alias("y"),
    )
    nrow = lab.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    r = distributed_row_number(
        lab,
        [F.desc("s"), F.col("chrom"), F.col("pos")],
        (-F.col("s")).cast("bigint"),
        out_col="rnk",
    ).crossJoin(F.broadcast(nrow))
    d = r.select(
        "y", F.expr("CAST(((rnk - 1) * 10) DIV n + 1 AS BIGINT)").alias("decile")
    )
    t = d.agg(
        F.sum("y").cast("bigint").alias("tot_pos"),
        F.count(F.lit(1)).alias("tot_n"),
    )
    agg = d.groupBy("decile").agg(
        cnt("n_k"), F.sum("y").cast("bigint").alias("pos_k")
    )
    wc = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    cum = agg.select(
        "decile",
        "n_k",
        "pos_k",
        F.sum("n_k").over(wc).cast("bigint").alias("cum_n"),
        F.sum("pos_k").over(wc).cast("bigint").alias("cum_pos"),
    )
    return cum.crossJoin(F.broadcast(t)).select(
        "decile",
        F.col("n_k").cast("bigint").alias("n"),
        F.col("pos_k").alias("n_pos"),
        F.round(F.col("pos_k") / F.col("n_k").cast("double"), 6).alias(
            "response_rate"
        ),
        F.round(
            (F.col("cum_pos") * F.col("tot_n"))
            / (F.col("cum_n").cast("double") * F.col("tot_pos")),
            6,
        ).alias("cumulative_lift"),
        F.round(F.col("cum_pos") / F.col("tot_pos").cast("double"), 6).alias(
            "cumulative_gain"
        ),
    )


@query(
    "q218_contamination_estimate",
    oracle="""
WITH obs AS (
  SELECT user_id % 6 AS sample_id,
         event_id % 100 AS site,
         COUNT(*) AS n,
         COUNT(*) FILTER (WHERE value > 10) AS alt
  FROM events
  GROUP BY 1, 2
),
sites AS (
  SELECT sample_id, site, n, alt, (site % 3) / 2.0 AS p_true
  FROM obs
),
grid AS (SELECT c / 1000.0 AS c FROM unnest(generate_series(0, 250, 25)) AS t(c)),
ll AS (
  SELECT s.sample_id, g.c,
         CAST(SUM(CAST(ROUND(
           alt * ln(LEAST(GREATEST((1 - g.c) * p_true + g.c * 0.3, 0.001), 0.999))
           + (n - alt) * ln(1 - LEAST(GREATEST((1 - g.c) * p_true + g.c * 0.3, 0.001), 0.999)),
           8) AS DECIMAL(26,8))) AS DOUBLE) AS loglik
  FROM sites s CROSS JOIN grid g
  GROUP BY s.sample_id, g.c
),
best AS (
  SELECT sample_id, c, loglik,
         ROW_NUMBER() OVER (PARTITION BY sample_id
                            ORDER BY loglik DESC, c ASC) AS rn
  FROM ll
)
SELECT sample_id,
       ROUND(c, 3) AS contamination_hat,
       ROUND(loglik, 4) AS loglik
FROM best WHERE rn = 1
""",
)
def q218_contamination_estimate(spark, sf_dir):
    """CONTAMINATION-FRACTION ESTIMATE (VerifyBamID / GATK
    CalculateContamination shape — the reference's QC layer flags
    cross-sample contamination before trusting a callset, cf. the
    het/hom-ratio screen in q124 and `quick_fingerprinter.py`): per
    sample, maximize a binomial site likelihood over a contamination
    grid. Expected alt fraction at a site under contamination c is
    (1-c)*p_true + c*pop_af (eps-clamped); the MLE is the grid argmax.

    Scale shape: sites aggregate first (one map-side-combinable
    groupBy over reads), THEN cross-join the tiny 11-point grid — the
    likelihood surface is (samples x grid)-sized, never read-sized, so
    100 TB of reads costs one aggregation pass + a broadcast-sized
    grid expansion. Determinism: each site x grid log-likelihood term
    is rounded to 8 decimals and summed as DECIMAL (exact,
    order-independent), so the argmax and the reported likelihood are
    partition-invariant."""
    ev = load_table(spark, sf_dir, "events")
    obs = (
        ev.groupBy(
            (F.col("user_id") % 6).alias("sample_id"),
            (F.col("event_id") % 100).alias("site"),
        )
        .agg(
            cnt("n"),
            F.sum(F.when(F.col("value") > 10, 1).otherwise(0)).alias("alt"),
        )
        .withColumn("p_true", (F.col("site") % 3) / F.lit(2.0))
    )
    grid = spark.range(0, 251, 25).select((F.col("id") / 1000.0).alias("c"))
    p = F.least(
        F.greatest((1 - F.col("c")) * F.col("p_true") + F.col("c") * 0.3, F.lit(0.001)),
        F.lit(0.999),
    )
    term = F.round(
        F.col("alt") * F.log(p) + (F.col("n") - F.col("alt")) * F.log(1 - p), 8
    ).cast("decimal(26,8)")
    ll = (
        obs.crossJoin(F.broadcast(grid))
        .groupBy("sample_id", "c")
        .agg(F.sum(term).cast("double").alias("loglik"))
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(
        W.partitionBy("sample_id").orderBy(F.col("loglik").desc(), F.col("c").asc())
    )
    return (
        ll.withColumn("rn", rn)
        .where(F.col("rn") == 1)
        .select(
            "sample_id",
            F.round("c", 3).alias("contamination_hat"),
            F.round("loglik", 4).alias("loglik"),
        )
    )


@query(
    "q220_insert_size_metrics",
    oracle="""
WITH frag AS (
  SELECT o_orderpriority AS library,
         CASE WHEN o_orderkey % 20 = 0 THEN 'RF'
              WHEN o_orderkey % 20 IN (1, 2) THEN 'TANDEM'
              ELSE 'FR' END AS orientation,
         CAST(FLOOR(o_totalprice) AS INT) % 800 + 50 AS insert_size
  FROM orders
),
r AS (
  SELECT library, orientation, insert_size,
         ROW_NUMBER() OVER (PARTITION BY library, orientation
                            ORDER BY insert_size) AS rn,
         COUNT(*) OVER (PARTITION BY library, orientation) AS n
  FROM frag
),
med AS (
  SELECT library, orientation, n, insert_size AS median_insert
  FROM r WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT f.library, f.orientation, m.n, m.median_insert,
         ABS(f.insert_size - m.median_insert) AS adev,
         ROW_NUMBER() OVER (PARTITION BY f.library, f.orientation
                            ORDER BY ABS(f.insert_size - m.median_insert)) AS rn
  FROM frag f JOIN med m USING (library, orientation)
),
mad AS (
  SELECT library, orientation, n, median_insert, adev AS mad_insert
  FROM dev WHERE rn = (n + 1) // 2
)
SELECT m.library, m.orientation,
       CAST(m.n AS BIGINT) AS n_fragments,
       m.median_insert, m.mad_insert,
       ROUND(CAST(s.mean_dec AS DOUBLE), 4) AS mean_insert,
       s.min_insert, s.max_insert
FROM mad m JOIN (
  SELECT library, orientation,
         SUM(CAST(insert_size AS DECIMAL(18,2))) / COUNT(*) AS mean_dec,
         MIN(insert_size) AS min_insert, MAX(insert_size) AS max_insert
  FROM frag GROUP BY library, orientation
) s USING (library, orientation)
""",
)
def q220_insert_size_metrics(spark, sf_dir):
    """INSERT-SIZE METRICS (Picard CollectInsertSizeMetrics shape —
    the library-QC report the reference's coverage/QC layer sits
    beside): per (library, pair orientation FR/RF/TANDEM) the fragment
    count, exact lower-median insert, exact MAD, DECIMAL-exact mean,
    and min/max — the numbers that catch adapter-dimer and chimeric
    libraries before calling.

    Exactness: median and MAD are picked by row_number (no engine
    interpolation semantics); the mean is a DECIMAL sum. Scale shape:
    two bounded window passes partitioned by (library, orientation) —
    the same per-group-ordered pattern as the percentile family
    (q44/q163); groups are library-sized so no window spans the
    table."""
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    frag = orders.select(
        F.col("o_orderpriority").alias("library"),
        F.when(F.col("o_orderkey") % 20 == 0, "RF")
        .when((F.col("o_orderkey") % 20).isin(1, 2), "TANDEM")
        .otherwise("FR")
        .alias("orientation"),
        (
            F.expr("CAST(FLOOR(o_totalprice) AS INT) % 800") + 50
        ).alias("insert_size"),
    ).transform(managed_persist)
    grp = ["library", "orientation"]
    r = frag.select(
        *grp,
        "insert_size",
        F.row_number()
        .over(W.partitionBy(*grp).orderBy("insert_size"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy(*grp)).alias("n"),
    )
    # exact lower median: rn == (n + 1) DIV 2
    med = r.where(F.col("rn") == F.expr("(n + 1) DIV 2")).select(
        *grp, "n", F.col("insert_size").alias("median_insert")
    )
    dev = frag.join(med, grp).select(
        *grp,
        "n",
        "median_insert",
        F.abs(F.col("insert_size") - F.col("median_insert")).alias("adev"),
    )
    dr = dev.withColumn(
        "rn", F.row_number().over(W.partitionBy(*grp).orderBy("adev"))
    )
    mad = dr.where(F.col("rn") == F.expr("(n + 1) DIV 2")).select(
        *grp, "n", "median_insert", F.col("adev").alias("mad_insert")
    )
    s = frag.groupBy(*grp).agg(
        (F.sum(F.col("insert_size").cast("decimal(18,2)")) / F.count(F.lit(1))).alias(
            "mean_dec"
        ),
        F.min("insert_size").alias("min_insert"),
        F.max("insert_size").alias("max_insert"),
    )
    return mad.join(s, grp).select(
        *grp,
        F.col("n").cast("bigint").alias("n_fragments"),
        "median_insert",
        "mad_insert",
        F.round(F.col("mean_dec").cast("double"), 4).alias("mean_insert"),
        "min_insert",
        "max_insert",
    )


@query(
    "q222_isotonic_calibration",
    oracle="""
WITH bins AS (
  SELECT CAST(FLOOR(value) AS INT) AS score,
         COUNT(*) AS w,
         COUNT(*) FILTER (WHERE event_type = 'error') AS pos
  FROM events GROUP BY 1
),
b AS (
  SELECT score, w, pos,
         CAST(ROW_NUMBER() OVER (ORDER BY score) AS INT) AS i,
         SUM(w) OVER (ORDER BY score) AS cw,
         SUM(pos) OVER (ORDER BY score) AS cp
  FROM bins
),
pairs AS (
  SELECT a.i AS ai, bb.i AS bi,
         CAST(bb.cp - (a.cp - a.pos) AS DOUBLE)
           / CAST(bb.cw - (a.cw - a.w) AS DOUBLE) AS r
  FROM b a JOIN b bb ON bb.i >= a.i
),
t AS (
  SELECT ai, bi,
         MIN(r) OVER (PARTITION BY ai ORDER BY bi DESC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tmin
  FROM pairs
),
fit AS (SELECT bi AS i, MAX(tmin) AS fitted FROM t GROUP BY bi)
SELECT b.score,
       CAST(b.w AS BIGINT) AS n,
       CAST(b.pos AS BIGINT) AS n_pos,
       ROUND(b.pos / CAST(b.w AS DOUBLE), 10) AS raw_rate,
       ROUND(f.fitted, 10) AS fitted_rate
FROM b JOIN fit f ON f.i = b.i
""",
)
def q222_isotonic_calibration(spark, sf_dir):
    """ISOTONIC (PAV) SCORE CALIBRATION — the monotone probability
    calibration step between a filtering model's raw scores (q89) and
    its operating thresholds (q205 measures the calibration this
    repairs): fit the best monotone-nondecreasing rate curve over
    score bins, via the exact minimax identity
    fitted[i] = max_{a<=i} min_{b>=i} mean(y[a..b]) — equivalent to
    pool-adjacent-violators but expressed as two windows over a pair
    table instead of a sequential pooling stack.

    Scale discipline: raw events first aggregate to SCORE BINS (one
    map-side-combinable groupBy — the only pass over the data); the
    O(bins^2) pair table and its windows touch only the tiny binned
    summary, the same bins-then-exact pattern as the weighted-quantile
    operator (ordered.py::weighted_quantile_bucketed). Exactness:
    prefix sums are integer, each candidate mean is ONE bigint/bigint
    IEEE division, and min/max never round — bit-identical on both
    engines with no epsilon anywhere."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    bins = ev.groupBy(
        F.floor("value").cast("int").alias("score")
    ).agg(
        cnt("w"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).alias("pos"),
    )
    wo = W.orderBy("score")
    b = bins.select(
        "score",
        "w",
        "pos",
        F.row_number().over(wo).cast("int").alias("i"),
        F.sum("w").over(wo).alias("cw"),
        F.sum("pos").over(wo).alias("cp"),
    ).transform(managed_persist)
    a = b.select(
        F.col("i").alias("ai"),
        (F.col("cp") - F.col("pos")).alias("cp0"),
        (F.col("cw") - F.col("w")).alias("cw0"),
    )
    bb = b.select(F.col("i").alias("bi"), "cp", "cw")
    pairs = a.join(bb, F.col("bi") >= F.col("ai")).select(
        "ai",
        "bi",
        (
            (F.col("cp") - F.col("cp0")).cast("double")
            / (F.col("cw") - F.col("cw0")).cast("double")
        ).alias("r"),
    )
    t = pairs.select(
        "ai",
        "bi",
        F.min("r")
        .over(
            W.partitionBy("ai")
            .orderBy(F.col("bi").desc())
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        .alias("tmin"),
    )
    fit = t.groupBy("bi").agg(F.max("tmin").alias("fitted"))
    return b.join(fit, b.i == fit.bi).select(
        "score",
        F.col("w").cast("bigint").alias("n"),
        F.col("pos").cast("bigint").alias("n_pos"),
        F.round(F.col("pos") / F.col("w").cast("double"), 10).alias("raw_rate"),
        F.round("fitted", 10).alias("fitted_rate"),
    )


@query(
    "q231_training_consistency_report",
    oracle="""
WITH sites AS (
  SELECT DISTINCT user_id % 6 AS sample_id,
         (event_id * 13) % 3 AS chrom,
         (event_id * 7) % 1000 AS pos
  FROM events
),
truth AS (
  SELECT DISTINCT chrom, pos FROM sites WHERE sample_id IN (0, 1)
),
hf AS (
  SELECT s.sample_id,
         CAST(COUNT(*) AS BIGINT) AS n_calls,
         CAST(COUNT(t.pos) AS BIGINT) AS n_hits,
         COUNT(t.pos) / CAST(COUNT(*) AS DOUBLE) AS hit_fraction
  FROM sites s LEFT JOIN truth t ON t.chrom = s.chrom AND t.pos = s.pos
  GROUP BY s.sample_id
),
cls AS (
  SELECT sample_id, n_calls, n_hits, hit_fraction,
         CASE WHEN sample_id < 4 THEN 'target' ELSE 'normal' END AS role,
         CASE
           WHEN sample_id >= 4 THEN
             CASE WHEN hit_fraction > 0.8 THEN 'error_not_complementary'
                  ELSE 'complementary_ok' END
           WHEN hit_fraction >= 0.9 THEN 'match'
           WHEN hit_fraction <= 0.8 THEN 'suspected_normal_in_tumor'
           ELSE 'error_ambiguous'
         END AS class
  FROM hf
),
suspect_vs_normal AS (
  SELECT s.sample_id, g.sample_id AS normal_id,
         COUNT(n.pos) / CAST(
           (SELECT COUNT(*) FROM sites x WHERE x.sample_id = s.sample_id)
           AS DOUBLE) AS hf2
  FROM (SELECT DISTINCT sample_id FROM cls
        WHERE class = 'suspected_normal_in_tumor') c
  JOIN sites s ON s.sample_id = c.sample_id
  CROSS JOIN (SELECT DISTINCT sample_id FROM sites WHERE sample_id >= 4) g
  LEFT JOIN sites n ON n.sample_id = g.sample_id
                    AND n.chrom = s.chrom AND n.pos = s.pos
  GROUP BY s.sample_id, g.sample_id
),
best AS (
  SELECT sample_id, normal_id AS best_normal, hf2 AS best_normal_hf
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY sample_id
                                 ORDER BY hf2 DESC, normal_id) AS rn
    FROM suspect_vs_normal
  ) WHERE rn = 1
)
SELECT c.sample_id, c.role, c.n_calls, c.n_hits,
       ROUND(c.hit_fraction, 6) AS hit_fraction,
       CASE WHEN c.class = 'suspected_normal_in_tumor' THEN
         CASE WHEN b.best_normal_hf >= 0.6 THEN 'normal_in_tumor_matched'
              ELSE 'error_no_normal_match' END
       ELSE c.class END AS class,
       b.best_normal,
       ROUND(b.best_normal_hf, 6) AS best_normal_hf
FROM cls c LEFT JOIN best b ON b.sample_id = c.sample_id
""",
)
def q231_training_consistency_report(spark, sf_dir):
    """TRAINING-SET CONSISTENCY CHECK
    (`pipelines/deepvariant/training_set_consistency_check.py:74-180` —
    before a DeepVariant training run, validate that every target
    sample CORRELATES with its ground truth, every normal sample
    ANTI-correlates, and every low-hit target is explained as a
    normal-in-tumor swap by matching it against the normals' germline
    callsets): per-sample hit fraction vs the truth site set (the
    `variant_hit_fraction_caller.py` metric, q124's machinery), the
    reference's threshold classification, and for suspected
    normal-in-tumor samples the best-matching normal by pairwise hit
    fraction with deterministic tie-break.

    Scale shape: site sets join on (chrom, pos) — hash-partitioned,
    sample count never multiplies the shuffle; the suspect x normal
    matrix is (suspects x normals)-sized aggregate output. All counts
    exact; fractions are single IEEE divisions."""
    ev = load_table(spark, sf_dir, "events")
    sites = (
        ev.select(
            (F.col("user_id") % 6).alias("sample_id"),
            ((F.col("event_id") * 13) % 3).alias("chrom"),
            ((F.col("event_id") * 7) % 1000).alias("pos"),
        )
        .distinct()
        .transform(managed_persist)
    )
    truth = (
        sites.where(F.col("sample_id").isin(0, 1)).select("chrom", "pos").distinct()
    )
    hf = (
        sites.join(truth.withColumn("hit", F.lit(1)), ["chrom", "pos"], "left")
        .groupBy("sample_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_calls"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("bigint").alias("n_hits"),
        )
        .withColumn(
            "hit_fraction", F.col("n_hits") / F.col("n_calls").cast("double")
        )
    )
    cls = hf.select(
        "*",
        F.when(F.col("sample_id") < 4, "target").otherwise("normal").alias("role"),
        F.when(
            F.col("sample_id") >= 4,
            F.when(F.col("hit_fraction") > 0.8, "error_not_complementary").otherwise(
                "complementary_ok"
            ),
        )
        .when(F.col("hit_fraction") >= 0.9, "match")
        .when(F.col("hit_fraction") <= 0.8, "suspected_normal_in_tumor")
        .otherwise("error_ambiguous")
        .alias("class"),
    ).transform(managed_persist)
    suspects = cls.where(F.col("class") == "suspected_normal_in_tumor").select(
        "sample_id", "n_calls"
    )
    normals = sites.where(F.col("sample_id") >= 4).select(
        F.col("sample_id").alias("normal_id"), "chrom", "pos"
    )
    svn = (
        suspects.join(
            sites.select("sample_id", "chrom", "pos"), "sample_id"
        )
        .join(
            normals,
            ["chrom", "pos"],
        )
        .groupBy("sample_id", "normal_id", "n_calls")
        .agg(cnt("n_shared"))
    )
    # every (suspect, normal) pair must appear even with zero overlap
    pair_spine = suspects.crossJoin(
        normals.select("normal_id").distinct()
    )
    svn_full = pair_spine.join(svn, ["sample_id", "normal_id", "n_calls"], "left").select(
        "sample_id",
        "normal_id",
        (
            F.coalesce(F.col("n_shared"), F.lit(0)) / F.col("n_calls").cast("double")
        ).alias("hf2"),
    )
    from pyspark.sql import Window as W

    best = (
        svn_full.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("sample_id").orderBy(F.col("hf2").desc(), "normal_id")
            ),
        )
        .where(F.col("rn") == 1)
        .select(
            "sample_id",
            F.col("normal_id").alias("best_normal"),
            F.col("hf2").alias("best_normal_hf"),
        )
    )
    return cls.join(best, "sample_id", "left").select(
        "sample_id",
        "role",
        "n_calls",
        "n_hits",
        F.round("hit_fraction", 6).alias("hit_fraction"),
        F.when(
            F.col("class") == "suspected_normal_in_tumor",
            F.when(F.col("best_normal_hf") >= 0.6, "normal_in_tumor_matched").otherwise(
                "error_no_normal_match"
            ),
        )
        .otherwise(F.col("class"))
        .alias("class"),
        "best_normal",
        F.round("best_normal_hf", 6).alias("best_normal_hf"),
    )


@query(
    "q239_fst_hudson",
    oracle="""
WITH gt AS (
  SELECT CAST(l_suppkey % 6 AS INT) AS sample_id,
         l_orderkey % 2000 AS site,
         MIN(CAST(l_partkey % 3 AS INT)) AS dosage
  FROM lineitem GROUP BY 1, 2
),
ac AS (
  SELECT site,
         CAST(SUM(CASE WHEN sample_id < 3 THEN dosage ELSE 0 END) AS BIGINT) AS ac1,
         CAST(SUM(CASE WHEN sample_id >= 3 THEN dosage ELSE 0 END) AS BIGINT) AS ac2,
         COUNT(*) FILTER (WHERE sample_id < 3) AS ns1,
         COUNT(*) FILTER (WHERE sample_id >= 3) AS ns2
  FROM gt GROUP BY site
  HAVING COUNT(*) FILTER (WHERE sample_id < 3) = 3
     AND COUNT(*) FILTER (WHERE sample_id >= 3) = 3
),
p AS (
  SELECT site // 100 AS win,
         ac1 / 6.0 AS p1, ac2 / 6.0 AS p2
  FROM ac
  WHERE ac1 + ac2 > 0 AND ac1 + ac2 < 12
),
terms AS (
  SELECT win,
         CAST(ROUND((p1 - p2) * (p1 - p2)
               - p1 * (1 - p1) / 5.0 - p2 * (1 - p2) / 5.0, 10)
              AS DECIMAL(24,10)) AS num,
         CAST(ROUND(p1 * (1 - p2) + p2 * (1 - p1), 10)
              AS DECIMAL(24,10)) AS den
  FROM p
)
SELECT win,
       CAST(COUNT(*) AS BIGINT) AS n_sites,
       ROUND(CAST(SUM(num) AS DOUBLE), 6) AS num_sum,
       ROUND(CAST(SUM(den) AS DOUBLE), 6) AS den_sum,
       ROUND(CAST(SUM(num) AS DOUBLE) / CAST(SUM(den) AS DOUBLE), 6) AS fst_hudson
FROM terms GROUP BY win
HAVING CAST(SUM(den) AS DOUBLE) > 0
""",
)
def q239_fst_hudson(spark, sf_dir):
    """HUDSON'S FST per window (the Bhatia-2013-recommended
    two-population differentiation estimator, vcftools
    ``--weir-fst-pop`` territory; extends the cohort popgen family
    q100/q153/q155/q238): per segregating site the Hudson
    numerator/denominator from the two populations' allele
    frequencies (sample-size-corrected), combined per window as a
    RATIO OF SUMS (the unbiased form — never the mean of ratios).

    Determinism: per-site terms are rounded to 10 decimals and summed
    as DECIMAL (order-free); the window FST is one IEEE division of
    two exact sums. Scale shape: genotype aggregate -> per-site
    population counts (one conditional aggregate, no join between
    populations — they ride the same groupBy) -> window aggregate;
    all map-side combinable."""
    li = load_table(spark, sf_dir, "lineitem")
    gt = li.groupBy(
        (F.col("l_suppkey") % 6).cast("int").alias("sample_id"),
        (F.col("l_orderkey") % 2000).alias("site"),
    ).agg(F.min((F.col("l_partkey") % 3).cast("int")).alias("dosage"))
    ac = (
        gt.groupBy("site")
        .agg(
            F.sum(F.when(F.col("sample_id") < 3, F.col("dosage")).otherwise(0))
            .cast("bigint")
            .alias("ac1"),
            F.sum(F.when(F.col("sample_id") >= 3, F.col("dosage")).otherwise(0))
            .cast("bigint")
            .alias("ac2"),
            F.sum(F.when(F.col("sample_id") < 3, 1).otherwise(0)).alias("ns1"),
            F.sum(F.when(F.col("sample_id") >= 3, 1).otherwise(0)).alias("ns2"),
        )
        .where((F.col("ns1") == 3) & (F.col("ns2") == 3))
    )
    p = ac.where(
        (F.col("ac1") + F.col("ac2") > 0) & (F.col("ac1") + F.col("ac2") < 12)
    ).select(
        F.expr("site DIV 100").alias("win"),
        (F.col("ac1") / F.lit(6.0)).alias("p1"),
        (F.col("ac2") / F.lit(6.0)).alias("p2"),
    )
    num = F.round(
        (F.col("p1") - F.col("p2")) * (F.col("p1") - F.col("p2"))
        - F.col("p1") * (1 - F.col("p1")) / 5.0
        - F.col("p2") * (1 - F.col("p2")) / 5.0,
        10,
    ).cast("decimal(24,10)")
    den = F.round(
        F.col("p1") * (1 - F.col("p2")) + F.col("p2") * (1 - F.col("p1")), 10
    ).cast("decimal(24,10)")
    w = p.groupBy("win").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sites"),
        F.sum(num).cast("double").alias("nsum"),
        F.sum(den).cast("double").alias("dsum"),
    )
    return w.where(F.col("dsum") > 0).select(
        "win",
        "n_sites",
        F.round("nsum", 6).alias("num_sum"),
        F.round("dsum", 6).alias("den_sum"),
        F.round(F.col("nsum") / F.col("dsum"), 6).alias("fst_hudson"),
    )


def _q240_oracle() -> str:
    from variantcalling_spark.queries import _REGISTRY

    ld = _REGISTRY["q198_ld_r2_pairs"].oracle
    return f"""
WITH ld AS ({ld})
SELECT (pos_b - pos_a) // 8 AS dist_bin,
       CAST(((pos_b - pos_a) // 8) * 8 AS BIGINT) AS bin_lo,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(ROUND(r2, 10) AS DECIMAL(22,10))) AS DOUBLE)
             / COUNT(*), 6) AS mean_r2
FROM ld
GROUP BY 1, 2
"""


@query("q240_ld_decay", oracle=_q240_oracle())
def q240_ld_decay(spark, sf_dir):
    """LD DECAY CURVE — mean r² by inter-site distance bin (the plot
    every GWAS/imputation paper shows; decides imputation panel
    density and the q199 pruning window): q198's exact pairwise LD
    machinery rolled up into 8-bp distance bins (5 bins across q198's 40-bp pairing window). Recombination makes
    mean r² fall with distance; the curve's half-decay length is the
    tag-SNP spacing.

    Determinism: per-pair r² (bigint rationals) snap to DECIMAL before
    the order-free bin sums. Scale shape: inherits q198's banded
    self-join (pair count = sum of bucket sizes squared, never n²);
    the rollup adds one tiny aggregate over the pair table."""
    from variantcalling_spark.queries import _REGISTRY

    ld = _REGISTRY["q198_ld_r2_pairs"].fn(spark, sf_dir)
    return (
        ld.select(
            F.expr("(pos_b - pos_a) DIV 8").alias("dist_bin"),
            (F.expr("(pos_b - pos_a) DIV 8") * 8).cast("bigint").alias("bin_lo"),
            F.round("r2", 10).cast("decimal(22,10)").alias("r2d"),
        )
        .groupBy("dist_bin", "bin_lo")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.round(F.sum("r2d").cast("double") / F.count(F.lit(1)), 6).alias(
                "mean_r2"
            ),
        )
    )


_UMI_SQL = """
  SELECT site, umi0 AS umi FROM (
    SELECT event_id % 50 AS site,
           substr('ACGT', CAST(((event_id // 50) * 2) % 4 + 1 AS INT), 1)
        || substr('ACGT', CAST(((event_id // 50) * 3) % 4 + 1 AS INT), 1)
        || substr('ACGT', CAST(((event_id // 50) * 5) % 4 + 1 AS INT), 1)
        || substr('ACGT', CAST(((event_id // 50) * 7) % 4 + 1 AS INT), 1)
        || substr('ACGT', CAST(((event_id // 50) * 11) % 4 + 1 AS INT), 1)
        || substr('ACGT', CAST(((event_id // 50) * 13) % 4 + 1 AS INT), 1)
          AS base_umi,
           event_id
    FROM events
  ), LATERAL (
    SELECT CASE WHEN event_id % 37 = 0
      THEN substr(base_umi, 1, CAST(event_id % 6 AS INT))
        || substr('ACGT', CAST((event_id // 37) % 4 + 1 AS INT), 1)
        || substr(base_umi, CAST(event_id % 6 + 2 AS INT))
      ELSE base_umi END AS umi0
  )
"""


@query(
    "q241_umi_correction",
    oracle=f"""
WITH reads AS ({_UMI_SQL}),
cnt AS (SELECT site, umi, CAST(COUNT(*) AS BIGINT) AS c FROM reads GROUP BY site, umi),
masked AS (
  SELECT site, umi, c, i,
         substr(umi, 1, CAST(i - 1 AS INT)) || '#' || substr(umi, CAST(i + 1 AS INT)) AS mk
  FROM cnt, unnest(generate_series(1, 6)) AS t(i)
),
adj AS (
  SELECT a.site, a.umi AS u, a.c AS cu, b.umi AS v, b.c AS cv
  FROM masked a JOIN masked b
    ON b.site = a.site AND b.i = a.i AND b.mk = a.mk AND b.umi <> a.umi
  WHERE b.c >= 2 * a.c - 1
    AND (b.c > a.c OR (b.c = a.c AND b.umi < a.umi))
),
rep AS (
  SELECT site, u, v AS rep_umi
  FROM (
    SELECT site, u, v,
           ROW_NUMBER() OVER (PARTITION BY site, u ORDER BY cv DESC, v) AS rn
    FROM adj
  ) WHERE rn = 1
)
SELECT c.site,
       CAST(COUNT(*) AS BIGINT) AS n_raw_umis,
       CAST(COUNT(DISTINCT COALESCE(r.rep_umi, c.umi)) AS BIGINT) AS n_corrected_umis,
       CAST(COUNT(r.rep_umi) AS BIGINT) AS n_merged,
       CAST(SUM(c.c) AS BIGINT) AS total_reads
FROM cnt c LEFT JOIN rep r ON r.site = c.site AND r.u = c.umi
GROUP BY c.site
""",
)
def q241_umi_correction(spark, sf_dir):
    """UMI ERROR CORRECTION (UMI-tools 'directional' adjacency — the
    molecular-dedup step before consensus calling, sibling of q188's
    MarkDuplicates): a sequencing error in the UMI inflates molecule
    counts; a UMI merges into a Hamming-1 neighbor whose read count
    DOMINATES it (c_v >= 2*c_u - 1, count-then-lexicographic
    direction), collapsing error satellites into their true molecule.
    Output: per-site raw vs corrected UMI counts — the dedup-rate
    ledger.

    Scale shape: Hamming-1 discovery is the MASKED-POSITION BAND join
    (each 6-mer UMI explodes to 6 one-position-wildcarded keys; equal
    keys <=> Hamming distance <= 1) — an equi-join linear in UMIs per
    site, never the all-pairs UMI matrix; the same banding family as
    q67's SimHash and q180's rare-token blocking. Single-pass
    dominant-neighbor assignment (deterministic tie-breaks); deep
    error chains — vanishingly rare at real UMI error rates — would
    compose with the q98 component machinery."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    g = F.expr("event_id DIV 50")
    base_umi = F.concat(
        *[
            F.expr(f"substr('ACGT', CAST(((event_id DIV 50) * {m}) % 4 + 1 AS INT), 1)")
            for m in (2, 3, 5, 7, 11, 13)
        ]
    )
    reads = ev.select(
        (F.col("event_id") % 50).alias("site"),
        base_umi.alias("base_umi"),
        "event_id",
    ).select(
        "site",
        F.when(
            F.col("event_id") % 37 == 0,
            F.concat(
                F.expr("substr(base_umi, 1, CAST(event_id % 6 AS INT))"),
                F.expr("substr('ACGT', CAST((event_id DIV 37) % 4 + 1 AS INT), 1)"),
                F.expr("substr(base_umi, CAST(event_id % 6 + 2 AS INT))"),
            ),
        )
        .otherwise(F.col("base_umi"))
        .alias("umi"),
    )
    cnt_t = (
        reads.groupBy("site", "umi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .transform(managed_persist)
    )
    masked = cnt_t.select(
        "site",
        "umi",
        "c",
        F.explode(F.sequence(F.lit(1), F.lit(6))).alias("i"),
    ).select(
        "site",
        "umi",
        "c",
        "i",
        F.expr(
            "concat(substr(umi, 1, CAST(i - 1 AS INT)), '#', substr(umi, CAST(i + 1 AS INT)))"
        ).alias("mk"),
    )
    a = masked.select(
        "site", "i", "mk", F.col("umi").alias("u"), F.col("c").alias("cu")
    )
    b = masked.select(
        "site", "i", "mk", F.col("umi").alias("v"), F.col("c").alias("cv")
    )
    adj = a.join(b, ["site", "i", "mk"]).where(
        (F.col("v") != F.col("u"))
        & (F.col("cv") >= 2 * F.col("cu") - 1)
        & ((F.col("cv") > F.col("cu")) | ((F.col("cv") == F.col("cu")) & (F.col("v") < F.col("u"))))
    )
    rep = (
        adj.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("site", "u").orderBy(F.col("cv").desc(), "v")
            ),
        )
        .where(F.col("rn") == 1)
        .select("site", "u", F.col("v").alias("rep_umi"))
    )
    cl = cnt_t.alias("cl")
    rp = rep.select(
        F.col("site").alias("r_site"), F.col("u").alias("r_u"), "rep_umi"
    )
    return (
        cl.join(
            rp,
            (F.col("cl.site") == F.col("r_site")) & (F.col("cl.umi") == F.col("r_u")),
            "left",
        )
        .select(F.col("cl.site").alias("site"), "umi", "c", "rep_umi")
        .groupBy("site")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_raw_umis"),
            F.countDistinct(F.coalesce(F.col("rep_umi"), F.col("umi")))
            .cast("bigint")
            .alias("n_corrected_umis"),
            F.count("rep_umi").cast("bigint").alias("n_merged"),
            F.sum("c").cast("bigint").alias("total_reads"),
        )
    )


@query(
    "q244_bh_fdr",
    oracle="""
WITH gt AS (
  SELECT CAST(l_suppkey % 6 AS INT) AS sample_id,
         l_orderkey % 2000 AS site,
         MIN(CAST(l_partkey % 3 AS INT)) AS dosage
  FROM lineitem GROUP BY 1, 2
),
cells AS (
  SELECT site, dosage,
         CASE WHEN sample_id < 3 THEN 1 ELSE 0 END AS grp,
         COUNT(*) AS o
  FROM gt GROUP BY 1, 2, 3
),
marg AS (
  SELECT site,
         SUM(o) AS n,
         SUM(CASE WHEN grp = 1 THEN o ELSE 0 END) AS n_case
  FROM cells GROUP BY site HAVING SUM(o) = 6
),
chi AS (
  SELECT c.site,
         SUM(POW(c.o - rd.row_n * (CASE WHEN c.grp = 1 THEN m.n_case
                                        ELSE m.n - m.n_case END) / CAST(m.n AS DOUBLE), 2)
             / (rd.row_n * (CASE WHEN c.grp = 1 THEN m.n_case
                                 ELSE m.n - m.n_case END) / CAST(m.n AS DOUBLE)))
           AS chi2
  FROM cells c
  JOIN marg m USING (site)
  JOIN (SELECT site, dosage, SUM(o) AS row_n FROM cells GROUP BY site, dosage) rd
    ON rd.site = c.site AND rd.dosage = c.dosage
  WHERE m.n_case > 0 AND m.n_case < m.n
  GROUP BY c.site
),
p AS (
  SELECT site, chi2,
         CAST(ROUND(exp(-chi2 / 2), 12) AS DECIMAL(18,12)) AS pd
  FROM chi
),
r AS (
  SELECT site, chi2, CAST(pd AS DOUBLE) AS p_value,
         ROW_NUMBER() OVER (ORDER BY pd, site) AS rk,
         COUNT(*) OVER () AS m
  FROM p
),
q AS (
  SELECT site, chi2, p_value,
         MIN(p_value * m / rk) OVER (ORDER BY rk DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS q_value
  FROM r
)
SELECT site, ROUND(chi2, 6) AS chi2, p_value, q_value,
       q_value <= 0.05 AS significant
FROM q
""",
)
def q244_bh_fdr(spark, sf_dir):
    """BENJAMINI-HOCHBERG FDR q-VALUES — the multiple-testing
    correction every genome-wide scan applies before calling hits
    (the missing step between the per-site tests q153/q166/q199 and a
    defensible discovery list): per-site chi-square (genotype x
    case/control, df=2 so p = exp(-chi2/2) exactly), then the BH
    step-up q_i = min_{j>=i} p_j * m / j as ONE reverse running-min
    window over the p-ranked sites.

    Determinism: p snaps to DECIMAL(18,12) before ranking; q values
    are pure IEEE mul/div/min over identical doubles — emitted
    UN-rounded and still bit-identical. Scale note (r7): both the
    p-ranking AND the step-up suffix-min are two-phase p-bucket
    decompositions (bucket prefix/suffix over the tiny bucket relation
    + bucket-local windows), so a biobank-scale site table never
    single-partitions — the weighted-quantile discipline applied to
    BH."""
    from pyspark.sql import Window as W

    from variantcalling_spark.operators.ordered import distributed_row_number

    li = load_table(spark, sf_dir, "lineitem")
    gt = li.groupBy(
        (F.col("l_suppkey") % 6).cast("int").alias("sample_id"),
        (F.col("l_orderkey") % 2000).alias("site"),
    ).agg(F.min((F.col("l_partkey") % 3).cast("int")).alias("dosage"))
    cells = gt.groupBy(
        "site", "dosage", F.when(F.col("sample_id") < 3, 1).otherwise(0).alias("grp")
    ).agg(F.count(F.lit(1)).alias("o")).transform(managed_persist)
    marg = (
        cells.groupBy("site")
        .agg(
            F.sum("o").alias("n"),
            F.sum(F.when(F.col("grp") == 1, F.col("o")).otherwise(0)).alias("n_case"),
        )
        .where(F.col("n") == 6)
    )
    rd = cells.groupBy("site", "dosage").agg(F.sum("o").alias("row_n"))
    e = F.col("row_n") * F.when(
        F.col("grp") == 1, F.col("n_case")
    ).otherwise(F.col("n") - F.col("n_case")) / F.col("n").cast("double")
    chi = (
        cells.join(marg, "site")
        .join(rd, ["site", "dosage"])
        .where((F.col("n_case") > 0) & (F.col("n_case") < F.col("n")))
        .groupBy("site")
        .agg(F.sum(F.pow(F.col("o") - e, 2) / e).alias("chi2"))
    )
    p = chi.select(
        "site",
        "chi2",
        F.round(F.exp(-F.col("chi2") / 2), 12).cast("decimal(18,12)").alias("pd"),
    )
    m_df = p.agg(F.count(F.lit(1)).alias("m"))
    r = (
        distributed_row_number(
            p,
            [F.col("pd"), F.col("site")],
            F.floor(F.col("pd") * 256).cast("bigint"),
            out_col="rk",
        )
        .crossJoin(F.broadcast(m_df))
        .select(
            "site",
            "chi2",
            F.col("pd").cast("double").alias("p_value"),
            "rk",
            "m",
            F.floor(F.col("pd") * 256).cast("bigint").alias("__bk"),
        )
        .withColumn("__x", F.col("p_value") * F.col("m") / F.col("rk"))
    )
    # suffix-min decomposed on the same p-buckets: per-bucket mins ->
    # tiny strictly-later-bucket suffix -> bucket-local running min
    bmin = r.groupBy("__bk").agg(F.min("__x").alias("__bm"))
    suf = bmin.select(
        "__bk",
        F.min("__bm")
        .over(W.orderBy("__bk").rowsBetween(1, W.unboundedFollowing))
        .alias("__suf"),
    )
    w_loc = (
        W.partitionBy("__bk")
        .orderBy(F.col("rk").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    q = r.join(F.broadcast(suf), "__bk").select(
        "site",
        "chi2",
        "p_value",
        F.least(F.min("__x").over(w_loc), F.col("__suf")).alias("q_value"),
    )
    return q.select(
        "site",
        F.round("chi2", 6).alias("chi2"),
        "p_value",
        "q_value",
        (F.col("q_value") <= 0.05).alias("significant"),
    )


@query(
    "q340_auc_delong",
    oracle=f"""
WITH calls AS ({SQL_COHORT_CALLS}),
lab AS (
  SELECT chrom, gq AS score, CASE WHEN gt > 0 THEN 1 ELSE 0 END AS y
  FROM calls
),
h AS MATERIALIZED (
  SELECT chrom, score,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(1 - y) AS BIGINT) AS n_neg
  FROM lab GROUP BY chrom, score
),
rk AS MATERIALIZED (
  SELECT chrom, score, n_pos, n_neg,
         CAST(COALESCE(SUM(n_neg) OVER (PARTITION BY chrom ORDER BY score
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS neg_below,
         CAST(COALESCE(SUM(n_pos) OVER (PARTITION BY chrom ORDER BY score DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS pos_above
  FROM h
),
tot AS MATERIALIZED (
  SELECT chrom,
         CAST(SUM(n_pos) AS BIGINT) AS np,
         CAST(SUM(n_neg) AS BIGINT) AS nn
  FROM h GROUP BY chrom
),
auc AS MATERIALIZED (
  SELECT r.chrom, t.np, t.nn,
         CAST(SUM(r.n_pos * (2 * r.neg_below + r.n_neg)) AS BIGINT) AS v2sum
  FROM rk r JOIN tot t ON t.chrom = r.chrom
  GROUP BY r.chrom, t.np, t.nn
),
comps AS (
  SELECT r.chrom,
         ROUND(r.n_pos * ((2 * r.neg_below + r.n_neg) / (2.0 * t.nn)
                          - a.v2sum / (2.0 * t.nn * t.np))
                       * ((2 * r.neg_below + r.n_neg) / (2.0 * t.nn)
                          - a.v2sum / (2.0 * t.nn * t.np)), 10) AS t10,
         ROUND(r.n_neg * ((2 * r.pos_above + r.n_pos) / (2.0 * t.np)
                          - a.v2sum / (2.0 * t.nn * t.np))
                       * ((2 * r.pos_above + r.n_pos) / (2.0 * t.np)
                          - a.v2sum / (2.0 * t.nn * t.np)), 10) AS t01
  FROM rk r
  JOIN tot t ON t.chrom = r.chrom
  JOIN auc a ON a.chrom = r.chrom
),
var_ AS (
  SELECT chrom,
         CAST(SUM(CAST(t10 AS DECIMAL(24,10))) AS DOUBLE) AS s10sum,
         CAST(SUM(CAST(t01 AS DECIMAL(24,10))) AS DOUBLE) AS s01sum
  FROM comps GROUP BY chrom
)
SELECT a.chrom, a.np AS n_pos, a.nn AS n_neg,
       ROUND(a.v2sum / (2.0 * a.nn * a.np), 6) AS auc,
       ROUND(sqrt(v.s10sum / (a.np - 1) / a.np
                  + v.s01sum / (a.nn - 1) / a.nn), 6) AS delong_se,
       ROUND((a.v2sum / (2.0 * a.nn * a.np) - 0.5)
             / sqrt(v.s10sum / (a.np - 1) / a.np
                    + v.s01sum / (a.nn - 1) / a.nn), 4) AS z_vs_chance
FROM auc a JOIN var_ v ON v.chrom = a.chrom
WHERE a.np > 1 AND a.nn > 1
""",
)
def q340_auc_delong(spark, sf_dir):
    """AUC WITH DELONG VARIANCE per contig (DeLong 1988 — the
    standard error that turns q167's point-estimate AUC into a
    TESTABLE number: placement-value components V10 per positive and
    V01 per negative, their sample variances, and the z against
    chance): the eval-harness family's missing uncertainty leg.

    Scale discipline: placement values collapse onto the SCORE
    HISTOGRAM (all positives at one score share one V10), so both
    component variances are score-domain aggregates — the corpus is
    never re-paired; V values are exact integer halves
    (2*below + ties over 2n); squared deviations snap at 10 into
    DECIMAL sums. Same windows as q167, one extra reverse
    cumulative."""
    calls = _cohort_calls(spark, sf_dir)
    lab = calls.select(
        "chrom",
        F.col("gq").alias("score"),
        F.when(F.col("gt") > 0, 1).otherwise(0).alias("y"),
    )
    h = lab.groupBy("chrom", "score").agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n_neg"),
    )
    from pyspark.sql import Window as W

    wb = W.partitionBy("chrom").orderBy("score").rowsBetween(
        W.unboundedPreceding, -1
    )
    wa = W.partitionBy("chrom").orderBy(F.col("score").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    rk = h.select(
        "chrom",
        "score",
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(wb), F.lit(0)).cast("bigint").alias(
            "neg_below"
        ),
        F.coalesce(F.sum("n_pos").over(wa), F.lit(0)).cast("bigint").alias(
            "pos_above"
        ),
    ).transform(managed_persist)
    tot = rk.groupBy("chrom").agg(
        F.sum("n_pos").cast("bigint").alias("np"),
        F.sum("n_neg").cast("bigint").alias("nn"),
    )
    auc = (
        rk.groupBy("chrom")
        .agg(
            F.sum(F.col("n_pos") * (2 * F.col("neg_below") + F.col("n_neg")))
            .cast("bigint")
            .alias("v2sum")
        )
        .join(tot, "chrom")
    )
    j = rk.join(F.broadcast(auc), "chrom")
    v10 = (2 * F.col("neg_below") + F.col("n_neg")) / (2.0 * F.col("nn"))
    v01 = (2 * F.col("pos_above") + F.col("n_pos")) / (2.0 * F.col("np"))
    aexp = F.col("v2sum") / (2.0 * F.col("nn") * F.col("np"))
    comps = j.select(
        "chrom",
        F.round(F.col("n_pos") * (v10 - aexp) * (v10 - aexp), 10).alias("t10"),
        F.round(F.col("n_neg") * (v01 - aexp) * (v01 - aexp), 10).alias("t01"),
    )
    var_ = comps.groupBy("chrom").agg(
        F.sum(F.col("t10").cast("decimal(24,10)")).cast("double").alias("s10sum"),
        F.sum(F.col("t01").cast("decimal(24,10)")).cast("double").alias("s01sum"),
    )
    out = auc.join(var_, "chrom").where((F.col("np") > 1) & (F.col("nn") > 1))
    se = F.sqrt(
        F.col("s10sum") / (F.col("np") - 1) / F.col("np")
        + F.col("s01sum") / (F.col("nn") - 1) / F.col("nn")
    )
    return out.select(
        "chrom",
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        F.round(aexp, 6).alias("auc"),
        F.round(se, 6).alias("delong_se"),
        F.round((aexp - 0.5) / se, 4).alias("z_vs_chance"),
    )


_PAUC_ALPHA = 0.25


@query(
    "q341_partial_auc",
    oracle=f"""
WITH calls AS ({SQL_COHORT_CALLS}),
lab AS (
  SELECT chrom, gq AS score, CASE WHEN gt > 0 THEN 1 ELSE 0 END AS y
  FROM calls
),
h AS MATERIALIZED (
  SELECT chrom, score,
         CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(1 - y) AS BIGINT) AS n_neg
  FROM lab GROUP BY chrom, score
),
tot AS MATERIALIZED (
  SELECT chrom, CAST(SUM(n_pos) AS BIGINT) AS np,
         CAST(SUM(n_neg) AS BIGINT) AS nn
  FROM h GROUP BY chrom
),
roc AS MATERIALIZED (
  SELECT h.chrom,
         SUM(h.n_neg) OVER w / CAST(t.nn AS DOUBLE) AS fpr,
         SUM(h.n_pos) OVER w / CAST(t.np AS DOUBLE) AS tpr,
         COALESCE(SUM(h.n_neg) OVER wp, 0) / CAST(t.nn AS DOUBLE) AS fprp,
         COALESCE(SUM(h.n_pos) OVER wp, 0) / CAST(t.np AS DOUBLE) AS tprp
  FROM h JOIN tot t ON t.chrom = h.chrom
  WINDOW w AS (PARTITION BY h.chrom ORDER BY h.score DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wp AS (PARTITION BY h.chrom ORDER BY h.score DESC
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
segs AS (
  SELECT chrom,
         ROUND(CASE
           WHEN fpr <= {_PAUC_ALPHA!r}
             THEN (fpr - fprp) * (tpr + tprp) / 2
           WHEN fprp < {_PAUC_ALPHA!r}
             THEN ({_PAUC_ALPHA!r} - fprp)
                  * (tprp + (tprp + ({_PAUC_ALPHA!r} - fprp) / (fpr - fprp)
                             * (tpr - tprp))) / 2
           ELSE 0.0 END, 10) AS a
  FROM roc
)
SELECT s.chrom, t.np AS n_pos, t.nn AS n_neg,
       ROUND(CAST(SUM(CAST(s.a AS DECIMAL(16,10))) AS DOUBLE), 6) AS pauc,
       ROUND(CAST(SUM(CAST(s.a AS DECIMAL(16,10))) AS DOUBLE)
             / {_PAUC_ALPHA!r}, 6) AS pauc_normalized,
       ROUND(0.5 * (1 + (CAST(SUM(CAST(s.a AS DECIMAL(16,10))) AS DOUBLE)
                         - {_PAUC_ALPHA!r} * {_PAUC_ALPHA!r} / 2)
                        / ({_PAUC_ALPHA!r}
                           - {_PAUC_ALPHA!r} * {_PAUC_ALPHA!r} / 2)), 6)
         AS pauc_mcclish
FROM segs s JOIN tot t ON t.chrom = s.chrom
GROUP BY s.chrom, t.np, t.nn
""",
)
def q341_partial_auc(spark, sf_dir):
    """PARTIAL AUC at FPR <= 0.25 (the screening-test metric: a
    classifier is only as good as its LOW-false-positive region when
    positives get expensive review — full AUC q167/q340 rewards the
    useless right half too), with trapezoid integration, exact
    boundary interpolation inside the crossing segment, and the
    McClish standardization to [0.5, 1].

    Scale discipline: the ROC lives on the SCORE HISTOGRAM (two
    cumulative windows per series, tie segments integrate as
    trapezoids exactly as sklearn does); segment areas snap at 10
    into DECIMAL sums. Alpha enters as a shared literal double."""
    from pyspark.sql import Window as W

    calls = _cohort_calls(spark, sf_dir)
    lab = calls.select(
        "chrom",
        F.col("gq").alias("score"),
        F.when(F.col("gt") > 0, 1).otherwise(0).alias("y"),
    )
    h = lab.groupBy("chrom", "score").agg(
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum(1 - F.col("y")).cast("bigint").alias("n_neg"),
    )
    tot = h.groupBy("chrom").agg(
        F.sum("n_pos").cast("bigint").alias("np"),
        F.sum("n_neg").cast("bigint").alias("nn"),
    )
    w = W.partitionBy("chrom").orderBy(F.col("score").desc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wp = W.partitionBy("chrom").orderBy(F.col("score").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    roc = h.join(F.broadcast(tot), "chrom").select(
        "chrom",
        "np",
        "nn",
        (F.sum("n_neg").over(w) / F.col("nn").cast("double")).alias("fpr"),
        (F.sum("n_pos").over(w) / F.col("np").cast("double")).alias("tpr"),
        (
            F.coalesce(F.sum("n_neg").over(wp), F.lit(0))
            / F.col("nn").cast("double")
        ).alias("fprp"),
        (
            F.coalesce(F.sum("n_pos").over(wp), F.lit(0))
            / F.col("np").cast("double")
        ).alias("tprp"),
    )
    al = F.lit(_PAUC_ALPHA)
    fpr, tpr, fprp, tprp = (
        F.col("fpr"),
        F.col("tpr"),
        F.col("fprp"),
        F.col("tprp"),
    )
    a = F.round(
        F.when(fpr <= al, (fpr - fprp) * (tpr + tprp) / 2)
        .when(
            fprp < al,
            (al - fprp)
            * (tprp + (tprp + (al - fprp) / (fpr - fprp) * (tpr - tprp)))
            / 2,
        )
        .otherwise(F.lit(0.0)),
        10,
    )
    segs = roc.select("chrom", "np", "nn", a.alias("a"))
    pauc = F.sum(F.col("a").cast("decimal(16,10)")).cast("double")
    alpha = _PAUC_ALPHA
    return segs.groupBy("chrom", "np", "nn").agg(
        F.round(pauc, 6).alias("pauc"),
        F.round(pauc / alpha, 6).alias("pauc_normalized"),
        F.round(
            0.5
            * (
                1
                + (pauc - alpha * alpha / 2) / (alpha - alpha * alpha / 2)
            ),
            6,
        ).alias("pauc_mcclish"),
    ).select(
        "chrom",
        F.col("np").alias("n_pos"),
        F.col("nn").alias("n_neg"),
        "pauc",
        "pauc_normalized",
        "pauc_mcclish",
    )


@query(
    "q344_fst_jackknife",
    oracle="""
WITH gt AS (
  SELECT CAST(l_suppkey % 6 AS INT) AS sample_id,
         l_orderkey % 2000 AS site,
         MIN(CAST(l_partkey % 3 AS INT)) AS dosage
  FROM lineitem GROUP BY 1, 2
),
ac AS (
  SELECT site,
         CAST(SUM(CASE WHEN sample_id < 3 THEN dosage ELSE 0 END) AS BIGINT) AS ac1,
         CAST(SUM(CASE WHEN sample_id >= 3 THEN dosage ELSE 0 END) AS BIGINT) AS ac2
  FROM gt GROUP BY site
  HAVING COUNT(*) FILTER (WHERE sample_id < 3) = 3
     AND COUNT(*) FILTER (WHERE sample_id >= 3) = 3
),
p AS (
  SELECT site // 100 AS win, ac1 / 6.0 AS p1, ac2 / 6.0 AS p2
  FROM ac WHERE ac1 + ac2 > 0 AND ac1 + ac2 < 12
),
blocks AS MATERIALIZED (
  SELECT win,
         CAST(SUM(CAST(ROUND((p1 - p2) * (p1 - p2)
               - p1 * (1 - p1) / 5.0 - p2 * (1 - p2) / 5.0, 10)
              AS DECIMAL(24,10))) AS DOUBLE) AS num_b,
         CAST(SUM(CAST(ROUND(p1 * (1 - p2) + p2 * (1 - p1), 10)
              AS DECIMAL(24,10))) AS DOUBLE) AS den_b
  FROM p GROUP BY win
),
tot AS MATERIALIZED (
  SELECT CAST(SUM(CAST(num_b AS DECIMAL(28,10))) AS DOUBLE) AS s_num,
         CAST(SUM(CAST(den_b AS DECIMAL(28,10))) AS DOUBLE) AS s_den,
         CAST(COUNT(*) AS BIGINT) AS nb
  FROM blocks
),
loo AS MATERIALIZED (
  SELECT b.win,
         ROUND((t.s_num - b.num_b) / (t.s_den - b.den_b), 10) AS theta
  FROM blocks b CROSS JOIN tot t
),
jk AS (
  SELECT CAST(SUM(CAST(theta AS DECIMAL(16,10))) AS DOUBLE) AS s_theta,
         CAST(SUM(CAST(ROUND(theta * theta, 10) AS DECIMAL(20,10)))
              AS DOUBLE) AS s_theta2
  FROM loo
)
SELECT t.nb AS n_blocks,
       ROUND(t.s_num / t.s_den, 6) AS fst_global,
       ROUND(sqrt((t.nb - 1.0) / t.nb
                  * (j.s_theta2 - j.s_theta * j.s_theta / t.nb)), 6)
         AS jackknife_se,
       ROUND(t.s_num / t.s_den
             - 1.96 * sqrt((t.nb - 1.0) / t.nb
                           * (j.s_theta2 - j.s_theta * j.s_theta / t.nb)), 6)
         AS ci_lo,
       ROUND(t.s_num / t.s_den
             + 1.96 * sqrt((t.nb - 1.0) / t.nb
                           * (j.s_theta2 - j.s_theta * j.s_theta / t.nb)), 6)
         AS ci_hi
FROM tot t CROSS JOIN jk j
""",
)
def q344_fst_jackknife(spark, sf_dir):
    """GENOME-WIDE FST WITH BLOCK-JACKKNIFE CI (the population-
    genetics uncertainty convention — sites are LD-correlated, so the
    only honest SE comes from leave-one-BLOCK-out resampling; the
    popgen twin of q340's DeLong leg): global Hudson ratio-of-sums
    plus the jackknife SE and 95% CI over the q239 window blocks.

    Scale discipline: the corpus reduces to per-block (num, den)
    sums once (q239's exact DECIMAL terms); every leave-one-out
    estimate is SUBTRACTION from the global sums — B estimates from B
    rows, no resampling scans; the jackknife variance uses the
    sum/sum-of-squares identity with 10-dp snapped thetas."""
    li = load_table(spark, sf_dir, "lineitem")
    gt = li.groupBy(
        (F.col("l_suppkey") % 6).cast("int").alias("sample_id"),
        (F.col("l_orderkey") % 2000).alias("site"),
    ).agg(F.min((F.col("l_partkey") % 3).cast("int")).alias("dosage"))
    ac = (
        gt.groupBy("site")
        .agg(
            F.sum(F.when(F.col("sample_id") < 3, F.col("dosage")).otherwise(0))
            .cast("bigint")
            .alias("ac1"),
            F.sum(F.when(F.col("sample_id") >= 3, F.col("dosage")).otherwise(0))
            .cast("bigint")
            .alias("ac2"),
            F.sum(F.when(F.col("sample_id") < 3, 1).otherwise(0)).alias("ns1"),
            F.sum(F.when(F.col("sample_id") >= 3, 1).otherwise(0)).alias("ns2"),
        )
        .where((F.col("ns1") == 3) & (F.col("ns2") == 3))
    )
    p = ac.where(
        (F.col("ac1") + F.col("ac2") > 0) & (F.col("ac1") + F.col("ac2") < 12)
    ).select(
        F.expr("site DIV 100").alias("win"),
        (F.col("ac1") / 6.0).alias("p1"),
        (F.col("ac2") / 6.0).alias("p2"),
    )
    p1, p2 = F.col("p1"), F.col("p2")
    blocks = p.groupBy("win").agg(
        F.sum(
            F.round(
                (p1 - p2) * (p1 - p2) - p1 * (1 - p1) / 5.0 - p2 * (1 - p2) / 5.0,
                10,
            ).cast("decimal(24,10)")
        )
        .cast("double")
        .alias("num_b"),
        F.sum(
            F.round(p1 * (1 - p2) + p2 * (1 - p1), 10).cast("decimal(24,10)")
        )
        .cast("double")
        .alias("den_b"),
    ).transform(managed_persist)
    tot = blocks.agg(
        F.sum(F.col("num_b").cast("decimal(28,10)")).cast("double").alias("s_num"),
        F.sum(F.col("den_b").cast("decimal(28,10)")).cast("double").alias("s_den"),
        F.count(F.lit(1)).cast("bigint").alias("nb"),
    )
    loo = blocks.crossJoin(F.broadcast(tot)).select(
        F.round(
            (F.col("s_num") - F.col("num_b")) / (F.col("s_den") - F.col("den_b")),
            10,
        ).alias("theta")
    )
    jk = loo.agg(
        F.sum(F.col("theta").cast("decimal(16,10)")).cast("double").alias("s_theta"),
        F.sum(F.round(F.col("theta") * F.col("theta"), 10).cast("decimal(20,10)"))
        .cast("double")
        .alias("s_theta2"),
    )
    out = tot.crossJoin(F.broadcast(jk))
    nb = F.col("nb")
    se = F.sqrt(
        (nb - 1.0)
        / nb
        * (F.col("s_theta2") - F.col("s_theta") * F.col("s_theta") / nb)
    )
    fst = F.col("s_num") / F.col("s_den")
    return out.select(
        nb.alias("n_blocks"),
        F.round(fst, 6).alias("fst_global"),
        F.round(se, 6).alias("jackknife_se"),
        F.round(fst - 1.96 * se, 6).alias("ci_lo"),
        F.round(fst + 1.96 * se, 6).alias("ci_hi"),
    )


_PI0_LAMBDAS = (0.5, 0.7, 0.8)


@query(
    "q368_storey_pi0",
    oracle=f"""
WITH gt AS (
  SELECT CAST(l_suppkey % 6 AS INT) AS sample_id,
         l_orderkey % 2000 AS site,
         MIN(CAST(l_partkey % 3 AS INT)) AS dosage
  FROM lineitem GROUP BY 1, 2
),
cells AS (
  SELECT site, dosage,
         CASE WHEN sample_id < 3 THEN 1 ELSE 0 END AS grp,
         COUNT(*) AS o
  FROM gt GROUP BY 1, 2, 3
),
marg AS (
  SELECT site,
         SUM(o) AS n,
         SUM(CASE WHEN grp = 1 THEN o ELSE 0 END) AS n_case
  FROM cells GROUP BY site HAVING SUM(o) = 6
),
chi AS (
  SELECT c.site,
         SUM(POW(c.o - rd.row_n * (CASE WHEN c.grp = 1 THEN m.n_case
                                        ELSE m.n - m.n_case END) / CAST(m.n AS DOUBLE), 2)
             / (rd.row_n * (CASE WHEN c.grp = 1 THEN m.n_case
                                 ELSE m.n - m.n_case END) / CAST(m.n AS DOUBLE)))
           AS chi2
  FROM cells c
  JOIN marg m USING (site)
  JOIN (SELECT site, dosage, SUM(o) AS row_n FROM cells GROUP BY site, dosage) rd
    ON rd.site = c.site AND rd.dosage = c.dosage
  WHERE m.n_case > 0 AND m.n_case < m.n
  GROUP BY c.site
),
p AS MATERIALIZED (
  SELECT site, ROUND(exp(-chi2 / 2), 10) AS pval FROM chi
),
m AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM p),
lam AS (SELECT * FROM (VALUES {", ".join(f"({x!r})" for x in _PI0_LAMBDAS)}) AS t(l))
SELECT CAST(l.l AS DOUBLE) AS lambda,
       (SELECT m FROM m) AS n_tests,
       CAST(SUM(CASE WHEN p.pval > l.l THEN 1 ELSE 0 END) AS BIGINT)
         AS n_above_lambda,
       ROUND(SUM(CASE WHEN p.pval > l.l THEN 1 ELSE 0 END)
             / ((1 - l.l) * (SELECT m FROM m)), 6) AS pi0_hat,
       ROUND(LEAST(1.0, SUM(CASE WHEN p.pval > l.l THEN 1 ELSE 0 END)
             / ((1 - l.l) * (SELECT m FROM m))), 6) AS pi0_clipped
FROM lam l CROSS JOIN p
GROUP BY l.l
""",
)
def q368_storey_pi0(spark, sf_dir):
    """STOREY'S PI0 ESTIMATOR (the adaptive-FDR upgrade of q244's
    Benjamini-Hochberg: BH assumes ALL hypotheses are null; Storey
    estimates the null fraction pi0 = #(p > lambda)/((1-lambda) m)
    from the flat tail of the p-value histogram, so q-values scale by
    pi0 and gain power when real signals exist): pi0-hat at three
    lambda grid points over the same per-site chi-square p-values.

    Scale discipline: identical p-value derivation to q244 (one
    grouped chi-square pass, p = exp(-chi2/2) exactly for df=2); the
    estimator is a conditional count per lambda over a 3-row spine —
    arithmetic after one aggregate."""
    from pyspark.sql import functions as F

    li = load_table(spark, sf_dir, "lineitem")
    gt = li.groupBy(
        (F.col("l_suppkey") % 6).cast("int").alias("sample_id"),
        (F.col("l_orderkey") % 2000).alias("site"),
    ).agg(F.min((F.col("l_partkey") % 3).cast("int")).alias("dosage"))
    cells = gt.groupBy(
        "site",
        "dosage",
        F.when(F.col("sample_id") < 3, 1).otherwise(0).alias("grp"),
    ).agg(F.count(F.lit(1)).alias("o"))
    marg = (
        cells.groupBy("site")
        .agg(
            F.sum("o").alias("n"),
            F.sum(F.when(F.col("grp") == 1, F.col("o")).otherwise(0)).alias(
                "n_case"
            ),
        )
        .where(F.col("n") == 6)
    )
    rd = cells.groupBy("site", "dosage").agg(F.sum("o").alias("row_n"))
    e = F.col("row_n") * F.when(
        F.col("grp") == 1, F.col("n_case")
    ).otherwise(F.col("n") - F.col("n_case")) / F.col("n").cast("double")
    chi = (
        cells.join(marg, "site")
        .join(rd, ["site", "dosage"])
        .where((F.col("n_case") > 0) & (F.col("n_case") < F.col("n")))
        .groupBy("site")
        .agg(F.sum(F.pow(F.col("o") - e, 2) / e).alias("chi2"))
    )
    p = chi.select(
        F.round(F.exp(-F.col("chi2") / 2), 10).alias("pval")
    ).transform(managed_persist)
    m = p.count()
    lam = spark.createDataFrame([(x,) for x in _PI0_LAMBDAS], "l double")
    j = p.crossJoin(F.broadcast(lam))
    agg = j.groupBy("l").agg(
        F.sum(F.when(F.col("pval") > F.col("l"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_above_lambda")
    )
    pi0 = F.col("n_above_lambda") / ((1 - F.col("l")) * F.lit(float(m)))
    return agg.select(
        F.col("l").cast("double").alias("lambda"),
        F.lit(m).cast("bigint").alias("n_tests"),
        "n_above_lambda",
        F.round(pi0, 6).alias("pi0_hat"),
        F.round(F.least(F.lit(1.0), pi0), 6).alias("pi0_clipped"),
    )


@query(
    "q371_weighted_kappa",
    oracle="""
WITH lab AS (
  SELECT CAST(l_partkey % 3 AS INT) AS rater_a,
         CAST((l_partkey + CASE WHEN l_suppkey % 5 = 0 THEN 1 ELSE 0 END) % 3
              AS INT) AS rater_b
  FROM lineitem
),
cm AS MATERIALIZED (
  SELECT rater_a, rater_b, CAST(COUNT(*) AS BIGINT) AS c
  FROM lab GROUP BY rater_a, rater_b
),
n_t AS MATERIALIZED (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cm),
-- linear disagreement weights scaled x2 so every weight is an exact
-- integer on a 3-level ordinal scale: w = 2*|i-j| in {0, 2, 4}/2(k-1)
obs AS (
  SELECT CAST(SUM(c * 2 * ABS(rater_a - rater_b)) AS BIGINT) AS wo FROM cm
),
marg AS (
  SELECT CAST(SUM(ra.rc * rb.cc * 2 * ABS(ra.k - rb.k)) AS BIGINT) AS we
  FROM (SELECT rater_a AS k, SUM(c) AS rc FROM cm GROUP BY rater_a) ra
  CROSS JOIN (SELECT rater_b AS k, SUM(c) AS cc FROM cm GROUP BY rater_b) rb
)
SELECT n_t.n,
       obs.wo AS weighted_disagreement_x2n,
       marg.we AS expected_disagreement_x2n2,
       ROUND(1 - (n_t.n * obs.wo) / CAST(marg.we AS DOUBLE), 6)
         AS weighted_kappa,
       ROUND((marg.we - n_t.n * obs.wo) / CAST(marg.we AS DOUBLE), 6)
         AS weighted_kappa_check
FROM n_t CROSS JOIN obs CROSS JOIN marg
""",
)
def q371_weighted_kappa(spark, sf_dir):
    """WEIGHTED COHEN'S KAPPA (linear weights — the ordinal-scale
    agreement metric rubric-graded annotation needs: disagreeing by
    one grade is NOT as bad as by two, which q203's plain kappa cannot
    express; the standard for LLM-judge rubric agreement): kappa_w =
    1 - (N * observed weighted disagreement)/(expected weighted
    disagreement), all-integer after clearing denominators (weights
    x2 so the 3-level linear weights are exact ints).

    Scale discipline: one contingency aggregate (k^2-bounded), margins
    cross-joined over k rows; one IEEE division at the end — the q203
    denominator-clearing discipline extended to the weighted form."""
    li = load_table(spark, sf_dir, "lineitem")
    lab = li.select(
        (F.col("l_partkey") % 3).cast("int").alias("rater_a"),
        (
            (
                F.col("l_partkey")
                + F.when(F.col("l_suppkey") % 5 == 0, 1).otherwise(0)
            )
            % 3
        )
        .cast("int")
        .alias("rater_b"),
    )
    cm = lab.groupBy("rater_a", "rater_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).transform(managed_persist)
    n_t = cm.agg(F.sum("c").cast("bigint").alias("n"))
    obs = cm.agg(
        F.sum(F.col("c") * 2 * F.abs(F.col("rater_a") - F.col("rater_b")))
        .cast("bigint")
        .alias("wo")
    )
    ra = cm.groupBy(F.col("rater_a").alias("ka")).agg(F.sum("c").alias("rc"))
    rb = cm.groupBy(F.col("rater_b").alias("kb")).agg(F.sum("c").alias("cc"))
    marg = (
        ra.crossJoin(rb)
        .agg(
            F.sum(
                F.col("rc") * F.col("cc") * 2 * F.abs(F.col("ka") - F.col("kb"))
            )
            .cast("bigint")
            .alias("we")
        )
    )
    return (
        n_t.crossJoin(F.broadcast(obs))
        .crossJoin(F.broadcast(marg))
        .select(
            "n",
            F.col("wo").alias("weighted_disagreement_x2n"),
            F.col("we").alias("expected_disagreement_x2n2"),
            F.round(
                1 - (F.col("n") * F.col("wo")) / F.col("we").cast("double"), 6
            ).alias("weighted_kappa"),
            F.round(
                (F.col("we") - F.col("n") * F.col("wo"))
                / F.col("we").cast("double"),
                6,
            ).alias("weighted_kappa_check"),
        )
    )


_TSC_MAX_VARS = 500
_TSC_ALT = (
    "CASE CAST(o_custkey % 5 AS INT) WHEN 0 THEN 'A' WHEN 1 THEN 'C' "
    "WHEN 2 THEN 'G' WHEN 3 THEN 'T' ELSE 'AT' END "
    "|| CASE WHEN o_orderkey % 11 = 0 THEN ',<*>' ELSE '' END"
)


@query(
    "q373_training_set_consistency",
    oracle=f"""
WITH truth AS (
  SELECT 'chr' || CAST(o_orderkey % 3 + 14 AS VARCHAR) AS chrom,
         CAST((o_orderkey * 331) % 4000000 + 25000000 AS BIGINT) AS pos,
         regexp_replace({_TSC_ALT}, ',<\\*>$', '') AS alt
  FROM orders
),
hcr AS (
  SELECT 'chr' || CAST(s_suppkey % 3 + 14 AS VARCHAR) AS chrom,
         CAST((s_suppkey * 104729) % 4000000 + 25000000 AS BIGINT) AS lo,
         CAST((s_suppkey * 104729) % 4000000 + 25000000 + 40000 AS BIGINT) AS hi
  FROM supplier
),
ti AS (
  SELECT 'chr' || CAST(c_custkey % 3 + 14 AS VARCHAR) AS chrom,
         CAST((c_custkey * 7919) % 4000000 + 25000000 AS BIGINT) AS lo,
         CAST((c_custkey * 7919) % 4000000 + 25000000 + 10000 AS BIGINT) AS hi
  FROM customer
)
SELECT chrom, pos - 1 AS bed_start, pos AS bed_end, alt
FROM truth t
WHERE EXISTS (SELECT 1 FROM hcr WHERE hcr.chrom = t.chrom
              AND t.pos >= hcr.lo AND t.pos < hcr.hi)
  AND EXISTS (SELECT 1 FROM ti WHERE ti.chrom = t.chrom
              AND t.pos >= ti.lo AND t.pos < ti.hi)
  AND t.chrom = 'chr15' AND t.pos > 26000000 AND t.pos <= 30000000
  AND length(alt) = 1
ORDER BY chrom, pos, alt
LIMIT {_TSC_MAX_VARS}
""",
)
def q373_training_set_consistency(spark, sf_dir):
    """TRAINING-SET CONSISTENCY PREP CHAIN (`pipelines/deepvariant/
    training_set_consistency_check.py:66-118` — the four-step
    preparation the r6 verdict flagged as the one cheap parity gap;
    the downstream hit-fraction classification of lines 119-180 is
    q231): ground-truth VCF ∩ HCR bed ∩ training-intervals bed
    (bedtools intersect twice), `bcftools view -r region --type snps`
    (region + SNP restriction, with the reference's `sed 's/,<*>//'`
    spanning-allele strip), `head -max_vars` cap, and the awk
    vcf_to_bed projection (chrom, pos-1, pos, alt).

    Scale shape: both bed sides broadcast (HCR/TI panels are
    interval-list-sized) as `left_semi` range joins — the truth
    callset never shuffles for them; region + SNP predicates are
    scan-time filters; the deterministic `head` cap is
    ORDER BY + LIMIT, planned as TakeOrderedAndProject (a distributed
    heap-select, never a global sort)."""
    from variantcalling_spark.operators.interval_join import (
        point_in_interval_join,
    )

    o = load_table(spark, sf_dir, "orders")
    truth = o.select(
        F.concat(F.lit("chr"), (F.col("o_orderkey") % 3 + 14).cast("string")).alias(
            "chrom"
        ),
        ((F.col("o_orderkey") * 331) % 4000000 + 25000000).cast("bigint").alias("pos"),
        F.regexp_replace(F.expr(_TSC_ALT), r",<\*>$", "").alias("alt"),
    )
    sup = load_table(spark, sf_dir, "supplier")
    hcr = sup.select(
        F.concat(F.lit("chr"), (F.col("s_suppkey") % 3 + 14).cast("string")).alias(
            "chrom"
        ),
        (((F.col("s_suppkey") * 104729) % 4000000) + 25000000)
        .cast("bigint")
        .alias("lo"),
        (((F.col("s_suppkey") * 104729) % 4000000) + 25000000 + 40000)
        .cast("bigint")
        .alias("hi"),
    )
    cust = load_table(spark, sf_dir, "customer")
    ti = cust.select(
        F.concat(F.lit("chr"), (F.col("c_custkey") % 3 + 14).cast("string")).alias(
            "chrom"
        ),
        ((F.col("c_custkey") * 7919) % 4000000 + 25000000)
        .cast("bigint")
        .alias("lo"),
        ((F.col("c_custkey") * 7919) % 4000000 + 25000000 + 10000)
        .cast("bigint")
        .alias("hi"),
    )
    in_hcr = point_in_interval_join(
        truth, hcr, "pos", keys=["chrom"], how="left_semi",
        start_col="lo", end_col="hi",
    )
    in_both = point_in_interval_join(
        in_hcr, ti, "pos", keys=["chrom"], how="left_semi",
        start_col="lo", end_col="hi",
    )
    capped = (
        in_both.where(
            (F.col("chrom") == "chr15")
            & (F.col("pos") > 26000000)
            & (F.col("pos") <= 30000000)
            & (F.length("alt") == 1)
        )
        .orderBy("chrom", "pos", "alt")
        .limit(_TSC_MAX_VARS)
    )
    return capped.select(
        "chrom",
        (F.col("pos") - 1).alias("bed_start"),
        F.col("pos").alias("bed_end"),
        "alt",
    )


@query(
    "q389_sex_inference",
    oracle=f"""
WITH calls AS ({{SQL_COHORT_CALLS}}),
per AS (
  SELECT sample,
         CAST(COUNT(*) FILTER (WHERE chrom <> 'c3') AS BIGINT) AS n_auto,
         CAST(COUNT(*) FILTER (WHERE chrom = 'c3') AS BIGINT) AS n_x,
         CAST(COUNT(*) FILTER (WHERE chrom = 'c3' AND gt = 1) AS BIGINT)
           AS n_x_het
  FROM calls GROUP BY sample
)
SELECT sample, n_auto, n_x, n_x_het,
       ROUND(3.0 * n_x / CAST(n_auto AS DOUBLE), 6) AS x_auto_ratio,
       ROUND(n_x_het / CAST(n_x AS DOUBLE), 6) AS x_het_rate,
       CASE WHEN n_x_het / CAST(n_x AS DOUBLE) < 0.2 THEN 'XY'
            ELSE 'XX' END AS inferred_sex
FROM per
""".format(SQL_COHORT_CALLS=SQL_COHORT_CALLS),
)
def q389_sex_inference(spark, sf_dir):
    """SAMPLE SEX INFERENCE from callset statistics (the standard
    cohort-QC screen — somalier/plink --check-sex style: X-chromosome
    heterozygosity collapses in XY samples, and the X:autosome call
    ratio corroborates; joins the cohort-QC family q148/q149/q153):
    per sample, autosome/X call counts, the normalized X:autosome
    ratio, the X het rate, and the threshold classification (het rate
    < 0.2 -> XY; thresholds are synthetic-cohort constants, stated —
    production would calibrate them per assay).

    Scale shape: ONE conditional aggregate over the callset (map-side
    combinable, sample-bounded output); classification is scalar
    arithmetic on the tiny per-sample ledger."""
    calls = _cohort_calls(spark, sf_dir)
    per = calls.groupBy("sample").agg(
        F.sum(F.when(F.col("chrom") != "c3", 1).otherwise(0))
        .cast("bigint")
        .alias("n_auto"),
        F.sum(F.when(F.col("chrom") == "c3", 1).otherwise(0))
        .cast("bigint")
        .alias("n_x"),
        F.sum(F.when((F.col("chrom") == "c3") & (F.col("gt") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("n_x_het"),
    )
    het = F.col("n_x_het") / F.col("n_x").cast("double")
    return per.select(
        "sample",
        "n_auto",
        "n_x",
        "n_x_het",
        F.round(3.0 * F.col("n_x") / F.col("n_auto").cast("double"), 6).alias(
            "x_auto_ratio"
        ),
        F.round(het, 6).alias("x_het_rate"),
        F.when(het < 0.2, "XY").otherwise("XX").alias("inferred_sex"),
    )
