"""Interval / range-join query family (SURVEY.md §2.3 interval joins).

The genomic pattern: points (variants / depth rows) vs interval tables
(annotation BEDs), intervals vs intervals, subtraction, covered-bases.
Here the "genome" axis is the events table's int64-nanosecond timeline and
the "contig" equi-key is ``user_id % 5``; interval tables are generated
deterministically on both engines (Spark ``range`` / DuckDB
``generate_series``), standing in for annotation BED files.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from variantcalling_spark.operators.interval_join import (
    auto_bucketed_point_in_interval_join,
    bucketed_point_in_interval_join,
    count_bases,
    interval_overlap_join,
    point_in_interval_join,
)
from variantcalling_spark.queries import query
from variantcalling_spark.queries._helpers import cnt, dec
from variantcalling_spark.sources import load_table

EPOCH0 = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in us
HOUR = 3_600_000_000
MIN10 = 600_000_000

# SQL fragments for the generated interval families (DuckDB side).
SQL_IV_A = f"""
  SELECT i AS iv_id,
         {EPOCH0} + i * {3 * HOUR} AS start_us,
         {EPOCH0} + i * {3 * HOUR} + {2 * HOUR} AS end_us,
         i % 5 AS grp,
         'cat' || CAST(i % 4 AS VARCHAR) AS category
  FROM generate_series(0, 239) t(i)
"""

SQL_IV_B = f"""
  SELECT i AS iv_id_b,
         {EPOCH0} + i * {45 * MIN10} AS start_us,
         {EPOCH0} + i * {45 * MIN10} + {3 * HOUR} AS end_us,
         i % 5 AS grp,
         'fam' || CAST(i % 3 AS VARCHAR) AS category_b
  FROM generate_series(0, 159) t(i)
"""

SQL_IV_C = f"""
  SELECT i AS iv_id,
         {EPOCH0} + i * {MIN10} AS start_us,
         {EPOCH0} + i * {MIN10} + {45 * MIN10 // 10} AS end_us,
         i % 5 AS grp,
         'cat' || CAST(i % 4 AS VARCHAR) AS category
  FROM generate_series(0, 3999) t(i)
"""


def intervals_a(spark):
    """240 non-overlapping 2h intervals, 3h spacing — annotation-BED analog."""
    i = F.col("id")
    return spark.range(240).select(
        i.alias("iv_id"),
        (F.lit(EPOCH0) + i * (3 * HOUR)).alias("start_us"),
        (F.lit(EPOCH0) + i * (3 * HOUR) + 2 * HOUR).alias("end_us"),
        (i % 5).alias("grp"),
        F.concat(F.lit("cat"), (i % 4).cast("string")).alias("category"),
    )


def intervals_b(spark):
    """160 overlapping 3h intervals, 7.5h spacing — second annotation family."""
    i = F.col("id")
    return spark.range(160).select(
        i.alias("iv_id_b"),
        (F.lit(EPOCH0) + i * (45 * MIN10)).alias("start_us"),
        (F.lit(EPOCH0) + i * (45 * MIN10) + 3 * HOUR).alias("end_us"),
        (i % 5).alias("grp"),
        F.concat(F.lit("fam"), (i % 3).cast("string")).alias("category_b"),
    )


def intervals_c(spark):
    """4000 dense 45-min intervals, 10-min spacing — 'large' interval side."""
    i = F.col("id")
    return spark.range(4000).select(
        i.alias("iv_id"),
        (F.lit(EPOCH0) + i * MIN10).alias("start_us"),
        (F.lit(EPOCH0) + i * MIN10 + 45 * MIN10 // 10).alias("end_us"),
        (i % 5).alias("grp"),
        F.concat(F.lit("cat"), (i % 4).cast("string")).alias("category"),
    )


def events_points(spark, sf_dir):
    # microseconds (integer DIV — ts exceeds 2^53, float division would lose
    # precision): the common exact timestamp unit of Spark and DuckDB.
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("grp", F.col("user_id") % 5).withColumn(
        "ts_us", F.expr("ts_ns DIV 1000")
    )


@query(
    "q30_point_in_interval",
    oracle=f"""
WITH iv AS ({SQL_IV_A}),
ev AS (SELECT epoch_us(ts) AS ts_us, user_id % 5 AS grp, value FROM events)
SELECT iv.category,
       COUNT(*) AS n,
       CAST(SUM(CAST(ev.value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
FROM ev JOIN iv
  ON ev.grp = iv.grp AND ev.ts_us >= iv.start_us AND ev.ts_us < iv.end_us
GROUP BY iv.category
""",
)
def q30_point_in_interval(spark, sf_dir):
    """Point-in-interval annotate join (broadcast strategy).

    Re-expresses `bedtools intersect -a depth -b annotation`
    (`coverage_analysis.py:732-738`): each point joins the broadcast
    interval table on (contig, pos in [start,end)), then aggregates per
    annotation category. The fact side never shuffles — the plan is
    scan -> broadcast hash join -> partial agg -> final agg, which holds
    at any fact-table scale.
    """
    ev = events_points(spark, sf_dir).select("ts_us", "grp", "value")
    iv = intervals_a(spark)
    joined = point_in_interval_join(ev, iv, "ts_us", keys=["grp"], start_col="start_us", end_col="end_us")
    return joined.groupBy("category").agg(
        cnt("n"), F.sum(dec("value")).cast("double").alias("value_sum")
    )


@query(
    "q31_interval_semi_join",
    oracle=f"""
WITH iv AS ({SQL_IV_A}),
ev AS (SELECT event_id, event_type, epoch_us(ts) AS ts_us, user_id % 5 AS grp FROM events)
SELECT event_type, COUNT(*) AS n_in_intervals
FROM ev
WHERE EXISTS (
  SELECT 1 FROM iv
  WHERE ev.grp = iv.grp AND ev.ts_us >= iv.start_us AND ev.ts_us < iv.end_us
)
GROUP BY event_type
""",
)
def q31_interval_semi_join(spark, sf_dir):
    """Interval semi-join: emit each point once if ANY interval covers it.

    `bedtools intersect -u -wa` semantics (`lpr/train_lib_prep_
    recalibration_model.py:112`, `quick_fingerprinter.py:57-58`) as a
    `left_semi` broadcast range join — no duplication, no distinct.
    """
    ev = events_points(spark, sf_dir).select("event_id", "event_type", "ts_us", "grp")
    iv = intervals_a(spark)
    hit = point_in_interval_join(ev, iv, "ts_us", keys=["grp"], how="left_semi", start_col="start_us", end_col="end_us")
    return hit.groupBy("event_type").agg(cnt("n_in_intervals"))


@query(
    "q32_interval_anti_join",
    oracle=f"""
WITH iv AS ({SQL_IV_A}),
ev AS (SELECT event_id, event_type, epoch_us(ts) AS ts_us, user_id % 5 AS grp, value FROM events)
SELECT event_type,
       COUNT(*) AS n_outside,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
FROM ev
WHERE NOT EXISTS (
  SELECT 1 FROM iv
  WHERE ev.grp = iv.grp AND ev.ts_us >= iv.start_us AND ev.ts_us < iv.end_us
)
GROUP BY event_type
""",
)
def q32_interval_anti_join(spark, sf_dir):
    """Interval anti-join: points covered by NO interval.

    `bedtools subtract -a cmp -b problematic` (`create_somatic_gt_file.py:
    273-292`) / `bcftools isec -C` complement (`vcfeval_flavors.py:
    136-143`) as a `left_anti` broadcast range join.
    """
    ev = events_points(spark, sf_dir).select("event_id", "event_type", "ts_us", "grp", "value")
    iv = intervals_a(spark)
    out = point_in_interval_join(ev, iv, "ts_us", keys=["grp"], how="left_anti", start_col="start_us", end_col="end_us")
    return out.groupBy("event_type").agg(
        cnt("n_outside"), F.sum(dec("value")).cast("double").alias("value_sum")
    )


@query(
    "q33_interval_intersect",
    oracle=f"""
WITH a AS ({SQL_IV_A}), b AS ({SQL_IV_B})
SELECT a.category,
       b.category_b,
       COUNT(*) AS n_pairs,
       CAST(SUM(LEAST(a.end_us, b.end_us) - GREATEST(a.start_us, b.start_us)) AS BIGINT) AS overlap_us
FROM a JOIN b
  ON a.grp = b.grp AND a.start_us < b.end_us AND b.start_us < a.end_us
GROUP BY a.category, b.category_b
""",
)
def q33_interval_intersect(spark, sf_dir):
    """Interval ∩ interval with overlap-segment arithmetic.

    `intersect_bed_files` (`vcfeval_flavors.py:108-112`) /
    `training_set_consistency_check.py:106-109`: overlap pairs via range
    join, intersection segment = [greatest(starts), least(ends)).
    """
    a = intervals_a(spark)
    b = intervals_b(spark)
    ov = interval_overlap_join(a, b, keys=["grp"], start_col="start_us", end_col="end_us")
    return ov.groupBy("category", "category_b").agg(
        cnt("n_pairs"),
        F.sum(F.col("overlap_end") - F.col("overlap_start")).alias("overlap_us"),
    )


@query(
    "q34_bucketed_range_join",
    oracle=f"""
WITH iv AS ({SQL_IV_C}),
ev AS (SELECT epoch_us(ts) AS ts_us, user_id % 5 AS grp, value FROM events)
SELECT iv.category,
       COUNT(*) AS n,
       CAST(SUM(CAST(ev.value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
FROM ev JOIN iv
  ON ev.grp = iv.grp AND ev.ts_us >= iv.start_us AND ev.ts_us < iv.end_us
GROUP BY iv.category
""",
)
def q34_bucketed_range_join(spark, sf_dir):
    """Large x large range join via fixed-width bucketing (the scale path).

    Same point-in-interval semantics as q30, but executed as an equi-join
    on (grp, floor(pos/B)) with interval explosion to spanned buckets and
    a residual range refine — a shuffle hash join that partitions evenly,
    instead of the O(n*m) nested-loop a naive large x large range join
    degenerates to. This is the strategy SURVEY.md §4 requires for
    large interval x interval workloads at 100 TB.
    """
    ev = events_points(spark, sf_dir).select("ts_us", "grp", "value")
    iv = intervals_c(spark)
    joined = bucketed_point_in_interval_join(
        ev, iv, "ts_us", bucket_width=HOUR, keys=["grp"],
        start_col="start_us", end_col="end_us",
    )
    return joined.groupBy("category").agg(
        cnt("n"), F.sum(dec("value")).cast("double").alias("value_sum")
    )


@query(
    "q134_auto_bucketed_interval_join",
    oracle=f"""
WITH iv AS ({SQL_IV_C}),
ev AS (SELECT epoch_us(ts) AS ts_us, user_id % 5 AS grp, value FROM events)
SELECT iv.category,
       COUNT(*) AS n,
       CAST(SUM(CAST(ev.value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
FROM ev JOIN iv
  ON ev.grp = iv.grp AND ev.ts_us >= iv.start_us AND ev.ts_us < iv.end_us
GROUP BY iv.category
""",
)
def q134_auto_bucketed_interval_join(spark, sf_dir):
    """q34's bucketed range join with the bucket width chosen from DATA
    STATISTICS instead of a hand constant: `choose_bucket_width` takes
    the interval-length median via an approx-quantile sketch (one
    map-side-combinable pass) and clamps to a power of two — the knee of
    the explosion-factor / bucket-occupancy cost curve. Same answer as
    q34 by construction; what is under test is that the width dial the
    fixed-width plan documents as "pick by hand" is computed, making the
    operator self-tuning at any scale (ROADMAP item 1 in operator form).
    """
    ev = events_points(spark, sf_dir).select("ts_us", "grp", "value")
    iv = intervals_c(spark)
    joined = auto_bucketed_point_in_interval_join(
        ev, iv, "ts_us", keys=["grp"], start_col="start_us", end_col="end_us"
    )
    return joined.groupBy("category").agg(
        cnt("n"), F.sum(dec("value")).cast("double").alias("value_sum")
    )


@query(
    "q35_count_bases",
    oracle=f"""
WITH iv AS ({SQL_IV_A})
SELECT category, CAST(SUM(end_us - start_us) AS BIGINT) AS covered_us, COUNT(*) AS n_intervals
FROM iv GROUP BY category
""",
)
def q35_count_bases(spark, sf_dir):
    """Covered-length aggregate: Σ(end-start) per annotation category.

    `count_bases_in_bed_file` (`run_no_gt_report.py:281`, pinned
    `test/unit/joint/test_gvcf_bed.py:19-20`).
    """
    iv = intervals_a(spark)
    return count_bases(iv, group_cols=["category"], start_col="start_us", end_col="end_us").withColumnsRenamed(
        {"n_bases": "covered_us"}
    ).join(
        iv.groupBy("category").agg(cnt("n_intervals")), "category"
    )


@query(
    "q36_asof_join",
    oracle="""
WITH ev AS (
  -- microseconds: DuckDB truncates nanosecond parquet timestamps to us,
  -- so us is the common exact unit for OUTPUT columns on both engines
  SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
  FROM events WHERE event_type IN ('signup', 'purchase')
),
tagged AS (
  SELECT event_id, user_id, event_type, ts_us,
         last_value(CASE WHEN event_type = 'signup' THEN ts_us END IGNORE NULLS)
           OVER (PARTITION BY user_id
                 ORDER BY ts_us, CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_us
  FROM ev
)
SELECT event_id, user_id, ts_us, last_signup_us,
       ts_us - last_signup_us AS lag_us
FROM tagged WHERE event_type = 'purchase'
""",
)
def q36_asof_join(spark, sf_dir):
    """As-of (most-recent-prior) join — purchases matched to the latest
    preceding signup of the same user.

    The reference has no temporal as-of, but this is the canonical custom
    operator Spark lacks natively (guide §"As-of / range join"):
    implemented as union-tag + running `last(ignorenulls)` window — one
    shuffle on (user), no nested loop; equal-timestamp ties resolve
    signup-before-purchase on both engines.
    """
    from pyspark.sql import Window as W

    ev = (
        events_points(spark, sf_dir)
        .where(F.col("event_type").isin("signup", "purchase"))
        .select("event_id", "user_id", "event_type", "ts_us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", F.when(F.col("event_type") == "signup", 0).otherwise(1))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tagged = ev.withColumn(
        "last_signup_us",
        F.last(
            F.when(F.col("event_type") == "signup", F.col("ts_us")), ignorenulls=True
        ).over(w),
    )
    return tagged.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts_us",
        "last_signup_us",
        (F.col("ts_us") - F.col("last_signup_us")).alias("lag_us"),
    )


@query(
    "q96_interval_map_agg",
    oracle=f"""
WITH iv AS ({SQL_IV_A}),
e AS (SELECT user_id % 5 AS grp, epoch_us(ts) AS ts_us, value FROM events)
SELECT iv.iv_id,
       iv.category,
       COUNT(e.ts_us) AS n_points,
       CAST(SUM(CAST(e.value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum,
       CAST(MAX(e.value) AS DOUBLE) AS value_max
FROM iv LEFT JOIN e
  ON e.grp = iv.grp AND e.ts_us >= iv.start_us AND e.ts_us < iv.end_us
GROUP BY iv.iv_id, iv.category
""",
)
def q96_interval_map_agg(spark, sf_dir):
    """Per-interval aggregation of overlapping points — the
    `bedtools map` shape (mean/sum/max of depth per target interval;
    the per-interval flavor of the coverage histograms at
    `coverage_analysis.py:745-795`). Empty intervals must survive with
    zero counts (bedtools emits '.'), but an outer join can only
    broadcast its NON-preserved side — a naive `iv LEFT JOIN events`
    would broadcast the fact table. So: inner broadcast join + partial
    aggregate (the fact scan never shuffles), then reattach empty
    intervals by joining the per-interval aggregate (|intervals| rows)
    back to the interval table — both tiny. DECIMAL sum ->
    order-independent, engine-exact."""
    ev = events_points(spark, sf_dir).select("grp", "ts_us", "value")
    iv = intervals_a(spark)
    hit = ev.join(
        F.broadcast(iv),
        (ev["grp"] == iv["grp"])
        & (ev["ts_us"] >= iv["start_us"])
        & (ev["ts_us"] < iv["end_us"]),
        "inner",
    )
    agg = hit.groupBy("iv_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("value_sum"),
        F.max("value").cast("double").alias("value_max"),
    )
    return iv.join(agg, "iv_id", "left").select(
        "iv_id",
        "category",
        F.coalesce("n_points", F.lit(0)).alias("n_points"),
        "value_sum",
        "value_max",
    )


@query(
    "q37_reciprocal_overlap",
    oracle=f"""
WITH a AS ({SQL_IV_A}), b AS ({SQL_IV_B})
SELECT a.iv_id, b.iv_id_b,
       GREATEST(LEAST(a.end_us, b.end_us) - GREATEST(a.start_us, b.start_us), 0) AS ov_us,
       ROUND(GREATEST(LEAST(a.end_us, b.end_us) - GREATEST(a.start_us, b.start_us), 0)
             / CAST(a.end_us - a.start_us AS DOUBLE), 6) AS frac_a,
       ROUND(GREATEST(LEAST(a.end_us, b.end_us) - GREATEST(a.start_us, b.start_us), 0)
             / CAST(b.end_us - b.start_us AS DOUBLE), 6) AS frac_b
FROM a JOIN b
  ON a.grp = b.grp
 AND a.start_us < b.end_us AND b.start_us < a.end_us
WHERE GREATEST(LEAST(a.end_us, b.end_us) - GREATEST(a.start_us, b.start_us), 0)
        >= 0.5 * (a.end_us - a.start_us)
  AND GREATEST(LEAST(a.end_us, b.end_us) - GREATEST(a.start_us, b.start_us), 0)
        >= 0.5 * (b.end_us - b.start_us)
""",
)
def q37_reciprocal_overlap(spark, sf_dir):
    """Reciprocal-overlap interval matching (`bedtools intersect -f 0.5
    -r` — the SV truth-matching criterion behind the base/calls keys of
    `sv_stats_collect.py:160-206`): pairs overlapping >= 50% of BOTH
    lengths, with exact integer overlap arithmetic. The overlap join is
    an equi-join on grp refined by range predicates; the smaller family
    broadcasts."""
    a = intervals_a(spark)
    b = intervals_b(spark)
    ov = F.greatest(
        F.least(a["end_us"], b["end_us"]) - F.greatest(a["start_us"], b["start_us"]),
        F.lit(0),
    )
    len_a = a["end_us"] - a["start_us"]
    len_b = b["end_us"] - b["start_us"]
    return (
        a.join(
            F.broadcast(b),
            (a["grp"] == b["grp"])
            & (a["start_us"] < b["end_us"])
            & (b["start_us"] < a["end_us"]),
        )
        .where((ov >= 0.5 * len_a) & (ov >= 0.5 * len_b))
        .select(
            a["iv_id"],
            b["iv_id_b"],
            ov.alias("ov_us"),
            F.round(ov / len_a.cast("double"), 6).alias("frac_a"),
            F.round(ov / len_b.cast("double"), 6).alias("frac_b"),
        )
    )


@query(
    "q38_closest_interval",
    oracle=f"""
WITH iv AS ({SQL_IV_A}),
e AS (SELECT event_id, user_id % 5 AS grp, epoch_us(ts) AS ts_us FROM events),
d AS (
  SELECT e.event_id, e.ts_us, iv.iv_id,
         CASE WHEN e.ts_us >= iv.start_us AND e.ts_us < iv.end_us THEN 0
              WHEN e.ts_us < iv.start_us THEN iv.start_us - e.ts_us
              ELSE e.ts_us - iv.end_us + 1 END AS dist_us
  FROM e JOIN iv ON e.grp = iv.grp
)
SELECT event_id, ts_us, iv_id, dist_us FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY dist_us, iv_id) AS rn
  FROM d
) WHERE rn = 1
""",
)
def q38_closest_interval(spark, sf_dir):
    """Closest-interval annotation (`bedtools closest` — the nearest-
    feature lookup genomics uses for 'assign variant to nearest gene'):
    per point, the minimum-distance interval in its group with
    deterministic id tie-break. The interval side broadcasts; ranking
    shuffles only (point × per-group-intervals) scored rows. At genome
    scale the refinement is to pre-bucket intervals so each point scores
    only its neighborhood — same output, bounded fan-out."""
    from pyspark.sql import Window as W

    ev = events_points(spark, sf_dir).select("event_id", "grp", "ts_us")
    iv = intervals_a(spark)
    dist = (
        F.when(
            (ev["ts_us"] >= iv["start_us"]) & (ev["ts_us"] < iv["end_us"]), F.lit(0)
        )
        .when(ev["ts_us"] < iv["start_us"], iv["start_us"] - ev["ts_us"])
        .otherwise(ev["ts_us"] - iv["end_us"] + 1)
    )
    d = ev.join(F.broadcast(iv), ev["grp"] == iv["grp"]).select(
        "event_id", "ts_us", "iv_id", dist.alias("dist_us")
    )
    w = W.partitionBy("event_id").orderBy("dist_us", "iv_id")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "q39_interval_complement",
    oracle=f"""
WITH iv AS ({SQL_IV_C}),
merged AS (
  SELECT grp, island, MIN(start_us) AS m_start, MAX(end_us) AS m_end
  FROM (
    SELECT grp, start_us, end_us,
           SUM(is_new) OVER (PARTITION BY grp ORDER BY start_us, end_us
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
    FROM (
      SELECT grp, start_us, end_us,
             CASE WHEN start_us > MAX(end_us) OVER
                    (PARTITION BY grp ORDER BY start_us, end_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(end_us) OVER
                    (PARTITION BY grp ORDER BY start_us, end_us
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS is_new
      FROM iv
    )
  ) GROUP BY grp, island
)
SELECT grp,
       LAG(m_end) OVER (PARTITION BY grp ORDER BY m_start) AS gap_start_us,
       m_start AS gap_end_us
FROM merged
QUALIFY LAG(m_end) OVER (PARTITION BY grp ORDER BY m_start) IS NOT NULL
""",
)
def q39_interval_complement(spark, sf_dir):
    """Interval complement (`bedtools complement` / the gaps the HCR
    files exclude): merge overlapping intervals per group
    (gaps-and-islands), then each island's gap to its predecessor.
    Two window passes over the interval table only — never the point
    table; partitioned by grp so no global sort."""
    from pyspark.sql import Window as W

    iv = intervals_c(spark)
    order = [F.col("start_us"), F.col("end_us")]
    w_prev = (
        W.partitionBy("grp").orderBy(*order).rowsBetween(W.unboundedPreceding, -1)
    )
    w_run = W.partitionBy("grp").orderBy(*order).rowsBetween(W.unboundedPreceding, 0)
    prev_max = F.max("end_us").over(w_prev)
    flagged = iv.select(
        "grp",
        "start_us",
        "end_us",
        F.when(
            prev_max.isNull() | (F.col("start_us") > prev_max), 1
        ).otherwise(0).alias("is_new"),
    ).withColumn("island", F.sum("is_new").over(w_run))
    merged = flagged.groupBy("grp", "island").agg(
        F.min("start_us").alias("m_start"), F.max("end_us").alias("m_end")
    )
    w_gap = W.partitionBy("grp").orderBy("m_start")
    return (
        merged.select(
            "grp",
            F.lag("m_end").over(w_gap).alias("gap_start_us"),
            F.col("m_start").alias("gap_end_us"),
        )
        .where(F.col("gap_start_us").isNotNull())
    )


@query(
    "q268_liftover",
    oracle=f"""
WITH chain AS (
  SELECT iv_id, start_us, end_us, grp, category,
         start_us + (iv_id % 7 - 3) * {HOUR} AS dst_start
  FROM ({SQL_IV_A}) iv
),
ev AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id % 5 AS grp FROM events),
mapped AS (
  SELECT c.category,
         e.ts_us - c.start_us + c.dst_start AS dst_pos
  FROM ev e JOIN chain c
    ON e.grp = c.grp AND e.ts_us >= c.start_us AND e.ts_us < c.end_us
),
m AS (
  SELECT category,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(dst_pos) AS BIGINT) AS sum_dst_pos,
         CAST(MIN(dst_pos) AS BIGINT) AS min_dst_pos,
         CAST(MAX(dst_pos) AS BIGINT) AS max_dst_pos
  FROM mapped GROUP BY category
),
um AS (
  SELECT '__unmapped__' AS category,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(NULL AS BIGINT) AS sum_dst_pos,
         CAST(NULL AS BIGINT) AS min_dst_pos,
         CAST(NULL AS BIGINT) AS max_dst_pos
  FROM ev e
  WHERE NOT EXISTS (
    SELECT 1 FROM chain c
    WHERE e.grp = c.grp AND e.ts_us >= c.start_us AND e.ts_us < c.end_us
  )
)
SELECT * FROM m UNION ALL SELECT * FROM um
""",
)
def q268_liftover(spark, sf_dir):
    """COORDINATE LIFTOVER through a chain table (UCSC liftOver /
    CrossMap shape, `bedtools shift` semantics per block): each chain
    block maps its source interval to a destination offset; points
    landing in a block are remapped pos -> pos - src_start + dst_start,
    points outside every block are reported '__unmapped__' — the
    assembly-migration operator the interval family was still missing
    (annotate q30, semi q31, subtract q32 — this one REWRITES the
    coordinate).

    Scale discipline: the chain table is genome-annotation-sized
    (thousands of blocks), so it broadcasts; the point side never
    shuffles — plan = scan -> broadcast range join -> arithmetic
    projection -> 5-group aggregate, plus one broadcast anti-join for
    the unmapped ledger. The remap itself is pure int64 arithmetic.
    All positions stay BIGINT-exact; sums stay under 2^63 by
    construction (us-epoch * row counts)."""
    ev = events_points(spark, sf_dir).select("event_id", "ts_us", "grp")
    chain = intervals_a(spark).withColumn(
        "dst_start",
        F.col("start_us") + (F.col("iv_id") % 7 - 3) * F.lit(HOUR),
    )
    hit = point_in_interval_join(
        ev, chain, "ts_us", keys=["grp"], start_col="start_us", end_col="end_us"
    ).select(
        "category",
        (F.col("ts_us") - F.col("start_us") + F.col("dst_start")).alias("dst_pos"),
    )
    m = hit.groupBy("category").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("dst_pos").cast("bigint").alias("sum_dst_pos"),
        F.min("dst_pos").cast("bigint").alias("min_dst_pos"),
        F.max("dst_pos").cast("bigint").alias("max_dst_pos"),
    )
    um = (
        point_in_interval_join(
            ev, chain, "ts_us", keys=["grp"], how="left_anti",
            start_col="start_us", end_col="end_us",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            F.lit("__unmapped__").alias("category"),
            "n",
            F.lit(None).cast("bigint").alias("sum_dst_pos"),
            F.lit(None).cast("bigint").alias("min_dst_pos"),
            F.lit(None).cast("bigint").alias("max_dst_pos"),
        )
    )
    return m.unionByName(um)


@query(
    "q271_max_interval_overlap",
    oracle=f"""
WITH iv AS ({SQL_IV_C}),
pts AS (
  SELECT grp, start_us AS pos, 1 AS delta FROM iv
  UNION ALL
  SELECT grp, end_us AS pos, -1 AS delta FROM iv
),
netted AS (
  SELECT grp, pos, SUM(delta) AS net FROM pts GROUP BY grp, pos
),
swept AS (
  SELECT grp, pos,
         SUM(net) OVER (
           PARTITION BY grp ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS depth
  FROM netted
)
SELECT grp,
       CAST(MAX(depth) AS BIGINT) AS max_depth,
       CAST(COUNT(*) AS BIGINT) AS n_breakpoints,
       CAST(MIN(CASE WHEN depth = 0 THEN pos END) AS BIGINT) AS first_gap_pos
FROM swept GROUP BY grp
""",
)
def q271_max_interval_overlap(spark, sf_dir):
    """MAXIMUM INTERVAL OVERLAP by sweep line — `bedtools genomecov`'s
    peak-depth statistic computed WITHOUT expanding per-base rows: each
    interval contributes +1 at start and -1 at end, breakpoints are
    netted per position, and a per-contig ordered cumsum is the depth
    profile; its max is the peak pileup, the first zero-depth
    breakpoint the first coverage gap. The missing member of the
    interval family: merge (q42) finds the islands, covered-bases
    (q35) the total, THIS one the depth profile's extremes.

    Scale discipline: the sweep is 2 rows per interval regardless of
    interval LENGTH (the per-base explode a naive genomecov would do is
    the anti-pattern); netting is a map-side-combinable (grp, pos)
    aggregate and the running sum partitions by contig — no window
    spans more than one grp. All integer-exact."""
    iv = intervals_c(spark)
    pts = iv.select(
        "grp", F.col("start_us").alias("pos"), F.lit(1).alias("delta")
    ).unionByName(
        iv.select("grp", F.col("end_us").alias("pos"), F.lit(-1).alias("delta"))
    )
    netted = pts.groupBy("grp", "pos").agg(F.sum("delta").alias("net"))
    from pyspark.sql import Window as W

    w = (
        W.partitionBy("grp")
        .orderBy("pos")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    swept = netted.select("grp", "pos", F.sum("net").over(w).alias("depth"))
    return swept.groupBy("grp").agg(
        F.max("depth").cast("bigint").alias("max_depth"),
        F.count(F.lit(1)).cast("bigint").alias("n_breakpoints"),
        F.min(F.when(F.col("depth") == 0, F.col("pos"))).cast("bigint").alias(
            "first_gap_pos"
        ),
    )


@query(
    "q397_activity_selection",
    oracle="""
WITH RECURSIVE iv AS MATERIALIZED (
  SELECT user_id % 5 AS grp,
         epoch_us(ts) AS s,
         epoch_us(ts) + CAST(ROUND(CAST(value AS DECIMAL(12,2)) * 1000000)
                             AS BIGINT) AS e,
         event_id
  FROM events WHERE event_type IN ('view', 'click')
),
r AS MATERIALIZED (
  SELECT grp, s, e, event_id,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY e, s, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY grp) AS n
  FROM iv
),
walk AS (
  SELECT grp, 0 AS rn, CAST(-9223372036854775808 AS BIGINT) AS last_end,
         CAST(NULL AS BIGINT) AS kept_id, n
  FROM (SELECT DISTINCT grp, n FROM r)
  UNION ALL
  SELECT r.grp, r.rn,
         CASE WHEN r.s >= w.last_end THEN r.e ELSE w.last_end END,
         CASE WHEN r.s >= w.last_end THEN r.event_id END,
         w.n
  FROM walk w JOIN r ON r.grp = w.grp AND r.rn = w.rn + 1
  WHERE w.rn < w.n
)
SELECT w.grp, r.event_id, r.s AS start_us, r.e AS end_us
FROM walk w JOIN r ON r.grp = w.grp AND r.rn = w.rn
WHERE w.kept_id IS NOT NULL
""",
)
def q397_activity_selection(spark, sf_dir):
    """INTERVAL SCHEDULING (activity selection — the earliest-end
    greedy that provably maximizes the count of non-overlapping
    intervals; the SELECTION member of the interval family: q41
    dedups by running extent, q42 merges, q271 stabs, THIS picks the
    max non-overlapping set, i.e. probe/primer/exon-tiling selection):
    per group, keep an interval iff it starts at-or-after the last
    KEPT interval's end, scanning in (end, start, id) order.

    The feedback loop (the threshold depends on what was KEPT, not on
    all earlier rows) makes this a sequential kernel, not a window —
    per-group ``applyInPandas`` (q52's shape), groups independent.
    The ORACLE replays the identical walk as a recursive CTE stepping
    the per-group rank. Integer microsecond arithmetic throughout."""
    import pandas as pd

    ev = events_points(spark, sf_dir).where(
        F.col("event_type").isin("view", "click")
    )
    iv = ev.select(
        "grp",
        F.col("ts_us").alias("s"),
        (
            F.col("ts_us")
            + F.round(F.col("value").cast("decimal(12,2)") * 1000000).cast(
                "bigint"
            )
        ).alias("e"),
        "event_id",
    )

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["e", "s", "event_id"], kind="mergesort"
        )
        kept = []
        last_end = None
        for s, e, eid in zip(pdf["s"], pdf["e"], pdf["event_id"]):
            if last_end is None or s >= last_end:
                kept.append((int(pdf["grp"].iloc[0]), int(eid), int(s), int(e)))
                last_end = e
        return pd.DataFrame(
            kept, columns=["grp", "event_id", "start_us", "end_us"]
        )

    return iv.groupBy("grp").applyInPandas(
        per_group, schema="grp long, event_id long, start_us long, end_us long"
    )


_COVER_LO, _COVER_HI = 26_000_000, 29_000_000  # microsecond target span


@query(
    "q419_interval_cover",
    oracle=f"""
WITH RECURSIVE iv AS MATERIALIZED (
  SELECT epoch_us(ts) % 10000000 + 20000000 AS s,
         epoch_us(ts) % 10000000 + 20000000
           + CAST(ROUND(CAST(value AS DECIMAL(12,2)) * 10000) AS BIGINT) AS e,
         event_id
  FROM events WHERE event_type IN ('view', 'click')
),
walk AS (
  SELECT 0 AS step, CAST({_COVER_LO} AS BIGINT) AS covered_to,
         CAST(NULL AS BIGINT) AS picked_id,
         CAST(NULL AS BIGINT) AS picked_s, CAST(NULL AS BIGINT) AS picked_e
  UNION ALL
  SELECT w.step + 1, b.e, b.event_id, b.s, b.e
  FROM walk w,
  LATERAL (
    SELECT i.e, i.event_id, i.s FROM iv i
    WHERE i.s <= w.covered_to AND i.e > w.covered_to
    ORDER BY i.e DESC, i.event_id LIMIT 1
  ) b
  WHERE w.covered_to < {_COVER_HI} AND w.step < 64
)
SELECT CAST(step AS INT) AS step, picked_id AS event_id,
       picked_s AS start_us, picked_e AS end_us,
       LEAST(covered_to, {_COVER_HI}) AS covered_to
FROM walk WHERE step > 0
""",
)
def q419_interval_cover(spark, sf_dir):
    """MINIMUM INTERVAL COVER (the farthest-reach greedy — provably
    minimal: among intervals starting at-or-before the current
    frontier, take the one reaching FARTHEST; the covering dual of
    q397's packing-style activity selection, i.e. probe selection for
    a target region): cover [26e6, 29e6) us with event intervals,
    emitting each pick and the advancing frontier.

    The frontier feedback makes this sequential — but each step is
    ONE distributed argmax (TakeOrdered over the candidates the
    frontier admits), so the driver holds only the frontier scalar
    (bounded by cover size, the Lloyd's pattern); the ORACLE replays
    the walk with a LATERAL argmax per recursive step. Integer
    microseconds; ties break (reach DESC, event_id)."""
    from variantcalling_spark.queries._helpers import managed_persist

    ev = events_points(spark, sf_dir).where(
        F.col("event_type").isin("view", "click")
    )
    iv = ev.select(
        (F.col("ts_us") % 10000000 + 20000000).alias("s"),
        (
            F.col("ts_us") % 10000000
            + 20000000
            + F.round(F.col("value").cast("decimal(12,2)") * 10000).cast("bigint")
        ).alias("e"),
        "event_id",
    ).transform(managed_persist)
    covered = _COVER_LO
    rows = []
    step = 0
    while covered < _COVER_HI and step < 64:
        cand = (
            iv.where((F.col("s") <= covered) & (F.col("e") > covered))
            .orderBy(F.col("e").desc(), "event_id")
            .limit(1)
            .collect()
        )
        if not cand:
            break
        step += 1
        r = cand[0]
        rows.append(
            (step, int(r.event_id), int(r.s), int(r.e),
             min(int(r.e), _COVER_HI))
        )
        covered = int(r.e)
    return spark.createDataFrame(
        rows,
        "step int, event_id bigint, start_us bigint, end_us bigint, covered_to bigint",
    )
