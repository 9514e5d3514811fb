"""Relational core: scans, filters, projections, joins, aggregations,
sorts, top-k, set ops (SURVEY.md §2.2, §2.3, §2.4, §2.6, §2.7).

Each query mirrors an operator family of the reference engine
(Ultimagen/VariantCalling); docstrings cite the reference call site whose
semantics the query re-expresses over the driver's TPC-H-ish tables.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from variantcalling_spark.queries import query
from variantcalling_spark.queries._helpers import cnt, dec, dsum, dsum_col, managed_persist
from variantcalling_spark.sources import load_table
from variantcalling_spark._persist import lineage_cut


# --------------------------------------------------------------------------
# Aggregation core
# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle="""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l_discount AS DECIMAL(12,2)))
           * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-06-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def q01_pricing_summary(spark, sf_dir):
    """Flagship grouped aggregation (TPC-H Q1 shape).

    Mirrors the reference's multi-measure grouped summaries, e.g. the
    accuracy-metric aggregation `ugvc/reports/report_utils.py:449-468` and
    histogram concat+groupby `ugvc/pipelines/coverage_analysis.py:491-520`:
    one wide scan -> partial (map-side) aggregation per group -> final agg.
    Filter + column pruning push down to the parquet scan; sums run in
    DECIMAL for order-independent exactness at any partition count.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))
    charge = disc_price * (F.lit(1) + dec("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("2001-06-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum_col("l_quantity", "sum_qty"),
            dsum_col("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            cnt("count_order"),
        )
    )


@query(
    "q06_revenue_forecast",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def q06_revenue_forecast(spark, sf_dir):
    """Selective conjunctive filter + global aggregate (TPC-H Q6 shape).

    The reference's manual scan-level predicates (bcftools `-i`
    expressions, samtools `-q/-Q`: `correct_genotypes_by_imputation.py:
    141-148`, `coverage_analysis.py:362-384`) become Catalyst predicate
    pushdown: all four predicates reach the parquet reader.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(dec("l_extendedprice") * dec("l_discount"), "revenue"))
    )


@query(
    "q20_value_counts",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
GROUP BY o_orderpriority
""",
)
def q20_value_counts(spark, sf_dir):
    """value_counts: `sv_stats_collect.py:45-46,203-205` (SV type counts)."""
    return load_table(spark, sf_dir, "orders").groupBy("o_orderpriority").agg(cnt("n"))


@query(
    "q15_distinct",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def q15_distinct(spark, sf_dir):
    """distinct: unique variant types `run_no_gt_report.py:81`."""
    return load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@query(
    "q21_cube_rollup",
    oracle="""
SELECT
  COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
  COUNT(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def q21_cube_rollup(spark, sf_dir):
    """Multi-level summary in one pass via CUBE.

    The reference loops filtered aggregations per category
    (`report_utils.py:206-222`, `sv_stats_collect.py:176-202`); grouping
    sets produce the same result lattice in a single shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(dsum_col("l_quantity", "sum_qty"), cnt("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@query(
    "q10_pivot_fixed_domain",
    oracle="""
SELECT
  l_returnflag,
  COUNT(*) FILTER (WHERE l_linestatus = 'O') AS cnt_open,
  COUNT(*) FILTER (WHERE l_linestatus = 'F') AS cnt_filled,
  CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(12,2))) FILTER (WHERE l_linestatus = 'O'), 0) AS DOUBLE) AS qty_open,
  CAST(COALESCE(SUM(CAST(l_quantity AS DECIMAL(12,2))) FILTER (WHERE l_linestatus = 'F'), 0) AS DOUBLE) AS qty_filled
FROM lineitem
GROUP BY l_returnflag
""",
)
def q10_pivot_fixed_domain(spark, sf_dir):
    """Fixed-domain pivot to a wide matrix.

    Mirrors `groupby([...]).size().unstack()` + reindex-to-fixed-labels
    (`sv_stats_collect.py:48-52`, motif matrix `run_no_gt_report.py:
    145-171`). Explicit pivot values keep the plan single-pass (no extra
    job to discover the domain) — exactly the reference's fixed label set.
    """
    li = load_table(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(cnt("cnt"), F.coalesce(F.sum(dec("l_quantity")), F.lit(0)).cast("double").alias("qty"))
    )
    return piv.select(
        "l_returnflag",
        F.coalesce("O_cnt", F.lit(0)).alias("cnt_open"),
        F.coalesce("F_cnt", F.lit(0)).alias("cnt_filled"),
        F.col("O_qty").alias("qty_open"),
        F.col("F_qty").alias("qty_filled"),
    )


@query(
    "q09_confusion_matrix",
    oracle="""
WITH classified AS (
  SELECT CASE
           WHEN l_returnflag = 'N' AND l_linestatus = 'O' THEN 'tp'
           WHEN l_returnflag = 'R' THEN 'fp'
           ELSE 'fn'
         END AS classify,
         l_quantity
  FROM lineitem
)
SELECT
  COUNT(*) FILTER (WHERE classify = 'tp') AS tp,
  COUNT(*) FILTER (WHERE classify = 'fp') AS fp,
  COUNT(*) FILTER (WHERE classify = 'fn') AS fn,
  ROUND(COUNT(*) FILTER (WHERE classify = 'tp')
        / CAST(COUNT(*) FILTER (WHERE classify = 'tp')
               + COUNT(*) FILTER (WHERE classify = 'fp') AS DOUBLE), 6) AS precision,
  ROUND(COUNT(*) FILTER (WHERE classify = 'tp')
        / CAST(COUNT(*) FILTER (WHERE classify = 'tp')
               + COUNT(*) FILTER (WHERE classify = 'fn') AS DOUBLE), 6) AS recall
FROM classified
""",
)
def q09_confusion_matrix(spark, sf_dir):
    """Confusion-matrix aggregate + precision/recall scalars.

    Re-expresses `report_utils.py:449-468` (tp/fp/fn counts under filter
    conditions) and the scalar kernels `ugvc/utils/stats_utils.py:76-138`
    as a single `sum(when(...))` pass — no per-category loop, one shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    classify = (
        F.when((F.col("l_returnflag") == "N") & (F.col("l_linestatus") == "O"), "tp")
        .when(F.col("l_returnflag") == "R", "fp")
        .otherwise("fn")
    )
    agg = li.select(classify.alias("classify")).agg(
        F.count(F.when(F.col("classify") == "tp", 1)).alias("tp"),
        F.count(F.when(F.col("classify") == "fp", 1)).alias("fp"),
        F.count(F.when(F.col("classify") == "fn", 1)).alias("fn"),
    )
    return agg.select(
        "tp",
        "fp",
        "fn",
        F.round(F.col("tp") / (F.col("tp") + F.col("fp")).cast("double"), 6).alias("precision"),
        F.round(F.col("tp") / (F.col("tp") + F.col("fn")).cast("double"), 6).alias("recall"),
    )


@query(
    "q11_binning_ladder",
    oracle="""
SELECT CASE
         WHEN o_totalprice < 50000 THEN '0-50k'
         WHEN o_totalprice < 100000 THEN '50k-100k'
         WHEN o_totalprice < 200000 THEN '100k-200k'
         WHEN o_totalprice < 400000 THEN '200k-400k'
         ELSE '400k+'
       END AS price_bin,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
FROM orders
GROUP BY 1
""",
)
def q11_binning_ladder(spark, sf_dir):
    """Fixed-width binning ladder (pd.cut with labeled bins).

    Mirrors `pd.cut(abs(svlen), bins=SVBINS, labels=SVLABELS)`
    (`sv_stats_collect.py:12-13,39-44`), pinned by
    `test/unit/reports/test_sv_stats_collect.py:63-111`: a CASE WHEN
    ladder evaluated inside whole-stage codegen.
    """
    orders = load_table(spark, sf_dir, "orders")
    bin_col = (
        F.when(F.col("o_totalprice") < 50000, "0-50k")
        .when(F.col("o_totalprice") < 100000, "50k-100k")
        .when(F.col("o_totalprice") < 200000, "100k-200k")
        .when(F.col("o_totalprice") < 400000, "200k-400k")
        .otherwise("400k+")
    )
    return (
        orders.groupBy(bin_col.alias("price_bin"))
        .agg(cnt("n"), dsum_col("o_totalprice", "total"))
    )


@query(
    "q12_numeric_histogram",
    oracle="""
SELECT event_type,
       CAST(FLOOR(value / 20.0) AS BIGINT) AS bin,
       COUNT(*) AS n
FROM events
GROUP BY event_type, CAST(FLOOR(value / 20.0) AS BIGINT)
-- (events.ts is nanosecond-precision; Spark side reads it as int64 ns)
""",
)
def q12_numeric_histogram(spark, sf_dir):
    """Fixed-bin numeric histogram per group.

    Mirrors `np.histogram(af, bins=linspace(0,1,101))` per variant_type
    (`run_no_gt_report.py:72-87`, pinned `test_run_no_gt_report.py:15-28`)
    and the depth histogram `coverage_analysis.py:491-520`: binning is a
    scalar floor expression + groupBy count (map-side partial agg).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") / F.lit(20.0)).cast("bigint").alias("bin"),
        )
        .agg(cnt("n"))
    )


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------
@query(
    "q03_shipping_priority",
    oracle="""
SELECT l.l_orderkey,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
       CAST(o.o_orderdate AS DATE) AS o_date,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q03_shipping_priority(spark, sf_dir):
    """Multi-table equi-join + grouped agg + deterministic top-k.

    The join pattern mirrors the callset<->truth hit join
    (`variant_hit_fraction_caller.py:40`, inner equi-join on composite
    key) composed with grouped aggregation. Catalyst picks broadcast for
    the filtered customer side; ties broken by key for stable top-k
    (reference `head -{max_vars}` `training_set_consistency_check.py:69`).
    """
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_date"), "o_orderpriority")
        .agg(dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_date", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q05_local_supplier_volume",
    oracle="""
SELECT n.n_name AS nation,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l.l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('AMERICA', 'ASIA')
GROUP BY n.n_name
""",
)
def q05_local_supplier_volume(spark, sf_dir):
    """Star-schema join chain with broadcast dimensions (TPC-H Q5 shape).

    Mirrors the reference keeping small lookup tables in memory
    (region lists `convert_haploid_regions.py:79-96`, centromere dfs
    `coverage_analysis.py:1082-1104`) — here made explicit with
    `broadcast()`: the fact table never shuffles for dimension joins,
    which is the 100 TB-critical property.
    """
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name").isin("AMERICA", "ASIA"))
    dim = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(F.broadcast(dim), li.l_suppkey == dim.s_suppkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(dsum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")), "revenue"))
    )


@query(
    "q04_order_priority_semijoin",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1997-06-01 00:00:00'
  )
GROUP BY o_orderpriority
""",
)
def q04_order_priority_semijoin(spark, sf_dir):
    """Left-semi join (EXISTS) + count per category.

    Mirrors `bedtools intersect -u` semantics — emit the left row once if
    any match exists (`lpr/train_lib_prep_recalibration_model.py:112`) —
    as a `left_semi` join: no row duplication, no distinct needed.
    """
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1997-06-01").cast("timestamp")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(cnt("order_count"))
    )


@query(
    "q07_customers_without_orders",
    oracle="""
SELECT c.c_mktsegment, COUNT(*) AS n_customers
FROM customer c
ANTI JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""",
)
def q07_customers_without_orders(spark, sf_dir):
    """Left-anti join (NOT EXISTS / complement).

    Mirrors `bcftools isec -C` complement sets (`vcfeval_flavors.py:
    136-143`) and `bedtools subtract` (`create_somatic_gt_file.py:
    274-284`): rows of the left with no key match on the right.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(cnt("n_customers"))
    )


@query(
    "q08_two_granularity_match",
    oracle="""
WITH a AS (SELECT DISTINCT l_orderkey, l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
     b AS (SELECT DISTINCT l_orderkey, l_partkey, l_suppkey FROM lineitem WHERE l_returnflag = 'A')
SELECT
  (SELECT COUNT(*) FROM a JOIN b USING (l_orderkey, l_partkey, l_suppkey)) AS exact_match,
  (SELECT COUNT(*) FROM (SELECT DISTINCT l_orderkey FROM a INTERSECT SELECT DISTINCT l_orderkey FROM b)) AS position_match
""",
)
def q08_two_granularity_match(spark, sf_dir):
    """Two-granularity set matching (exact-allele vs position-only).

    Mirrors `bcftools isec -c none` (match on (chrom,pos,ref,alt)) vs
    `-c all` (match on (chrom,pos)) — `create_somatic_gt_file.py:76-126`:
    the same pair of tables intersected at two key granularities.
    """
    li = load_table(spark, sf_dir, "lineitem")
    a = li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_partkey", "l_suppkey").distinct()
    b = li.where(F.col("l_returnflag") == "A").select("l_orderkey", "l_partkey", "l_suppkey").distinct()
    exact = a.join(b, ["l_orderkey", "l_partkey", "l_suppkey"]).agg(cnt("exact_match"))
    pos = (
        a.select("l_orderkey")
        .intersect(b.select("l_orderkey"))
        .agg(cnt("position_match"))
    )
    return exact.crossJoin(pos)


# --------------------------------------------------------------------------
# Set operations
# --------------------------------------------------------------------------
@query(
    "q16_set_intersect",
    oracle="""
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
INTERSECT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
""",
)
def q16_set_intersect(spark, sf_dir):
    """INTERSECT by key: `bcftools isec` shared sets (`create_somatic_gt_file.py:76-126`)."""
    o = load_table(spark, sf_dir, "orders")
    y97 = o.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    y98 = o.where(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y97.intersect(y98)


@query(
    "q17_set_except",
    oracle="""
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
EXCEPT
SELECT o_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
""",
)
def q17_set_except(spark, sf_dir):
    """EXCEPT: private-set complement (`bcftools isec -C`, `vcfeval_flavors.py:136-143`)."""
    o = load_table(spark, sf_dir, "orders")
    y97 = o.where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_custkey")
    y98 = o.where(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    ).select("o_custkey")
    return y97.subtract(y98)


@query(
    "q18_union_concat",
    oracle="""
SELECT src, COUNT(*) AS n FROM (
  SELECT 'hi' AS src, l_orderkey FROM lineitem WHERE l_quantity >= 45
  UNION ALL
  SELECT 'lo' AS src, l_orderkey FROM lineitem WHERE l_quantity <= 5
)
GROUP BY src
""",
)
def q18_union_concat(spark, sf_dir):
    """UNION ALL row concat: `pd.concat` of per-region frames (`coverage_analysis.py:492-504`)."""
    li = load_table(spark, sf_dir, "lineitem")
    hi = li.where(F.col("l_quantity") >= 45).select(F.lit("hi").alias("src"), "l_orderkey")
    lo = li.where(F.col("l_quantity") <= 5).select(F.lit("lo").alias("src"), "l_orderkey")
    return hi.unionByName(lo).groupBy("src").agg(cnt("n"))


# --------------------------------------------------------------------------
# Filters / projections / null handling
# --------------------------------------------------------------------------
@query(
    "q02_filter_projection",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE (l_returnflag = 'A' OR l_returnflag = 'N')
  AND l_linestatus = 'F'
  AND l_quantity BETWEEN 10 AND 12
""",
)
def q02_filter_projection(spark, sf_dir):
    """Compound boolean-mask filter + column projection.

    Mirrors the PASS-filter string predicates
    (`df.query("(filter=='PASS') | (filter=='')")`,
    `sv_stats_collect.py:37`) and fixed projection lists
    (`report_data_loader.py:66-104`). Both the disjunctive predicate and
    the 4-column ReadSchema push down to the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.where(
        ((F.col("l_returnflag") == "A") | (F.col("l_returnflag") == "N"))
        & (F.col("l_linestatus") == "F")
        & F.col("l_quantity").between(10, 12)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


@query(
    "q22_null_defaulting",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       ROUND(CAST(SUM(CASE WHEN o_totalprice > 300000 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS frac_big
FROM orders
GROUP BY o_orderstatus
""",
)
def q22_null_defaulting(spark, sf_dir):
    """Conditional column + safe ratio (np.where / safe_divide).

    Mirrors `np.where(cond, a, b)` (`denovo_refinement.py:56-58`) and
    `safe_divide` (`ugvc/utils/math_utils.py:9-28`) as `when().otherwise()`
    expressions inside one aggregation.
    """
    o = load_table(spark, sf_dir, "orders")
    big = F.when(F.col("o_totalprice") > 300000, 1).otherwise(0)
    return (
        o.groupBy("o_orderstatus")
        .agg(cnt("n"), F.sum(big).cast("bigint").alias("n_big"))
        .select(
            "o_orderstatus",
            "n",
            "n_big",
            F.round(F.col("n_big").cast("double") / F.col("n"), 6).alias("frac_big"),
        )
    )


# --------------------------------------------------------------------------
# Sorts / top-k
# --------------------------------------------------------------------------
@query(
    "q19_topk_per_group",
    oracle="""
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice
FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         ROW_NUMBER() OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
         ) AS rn
  FROM lineitem
)
WHERE rn <= 3
""",
)
def q19_topk_per_group(spark, sf_dir):
    """Deterministic top-k per stratum.

    Mirrors the per-(length,nuc) stratified sampling `collect_hpol_table.
    py:105-115` and best-match argmax `quick_fingerprinter.py:114-118`;
    full key tie-break makes the result reproducible across partitionings.

    One ranked window + rank filter is the whole query: Spark's
    WindowGroupLimit (SPARK-37099, 3.5+) plants a PARTIAL group limit
    on the map side of the window's exchange, so each input partition
    ships at most k rows per group — the shuffle carries <= k * M rows
    no matter the input size, and the per-group final sort ranks those
    survivors only. (r11: this replaced a hand-rolled two-phase
    per-(group, spark_partition_id) pre-prune that duplicated exactly
    that optimization at the price of a second Exchange and two extra
    sorts — plan went 2 Exchange -> 1, see plans/r11/.)
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    order = [F.desc("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")]
    w2 = W.partitionBy("l_returnflag").orderBy(*order)
    return (
        li.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice")
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= 3)
        .drop("rn")
    )


BASKET_MIN_SUPPORT = 3


@query(
    "q194_association_rules",
    oracle=f"""
WITH items AS (
  SELECT DISTINCT l_orderkey AS basket, l_partkey % 200 AS item
  FROM lineitem
),
n_b AS (SELECT CAST(COUNT(DISTINCT basket) AS BIGINT) AS n FROM items),
item_n AS (SELECT item, COUNT(*) AS c FROM items GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS support
  FROM items a JOIN items b ON a.basket = b.basket AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
)
SELECT p.item_a, p.item_b, CAST(p.support AS BIGINT) AS support,
       ROUND(p.support / CAST(ca.c AS DOUBLE), 6) AS confidence,
       ROUND((p.support * (SELECT n FROM n_b))
             / (CAST(ca.c AS DOUBLE) * cb.c), 6) AS lift
FROM pairs p
JOIN item_n ca ON ca.item = p.item_a
JOIN item_n cb ON cb.item = p.item_b
""",
)
def q194_association_rules(spark, sf_dir):
    """Market-basket association rules (support / confidence / lift) —
    the classic co-occurrence mining op, run here over order baskets
    (parts bucketed to 200 classes): which item classes ship together
    more than chance. Scale shape: the pair self-join is ON THE BASKET
    KEY, so pair count is Σ basket_size² (TPC-H orders hold ≤ 7
    lines — bounded fan-out, never an item×item cross); the support
    floor prunes before the stats joins, and item counts + basket
    total broadcast. Lift's numerator is an exact integer product —
    one rounded division per rule on both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    items = (
        li.select(
            F.col("l_orderkey").alias("basket"),
            (F.col("l_partkey") % 200).alias("item"),
        )
        .distinct()
        .transform(managed_persist)
    )
    n_b = items.agg(F.count_distinct("basket").cast("bigint").alias("n"))
    item_n = items.groupBy("item").agg(cnt("c"))
    a = items.select("basket", F.col("item").alias("item_a"))
    b = items.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(cnt("support"))
        .where(F.col("support") >= BASKET_MIN_SUPPORT)
    )
    return (
        pairs.join(
            F.broadcast(item_n.select(F.col("item").alias("item_a"), F.col("c").alias("ca"))),
            "item_a",
        )
        .join(
            F.broadcast(item_n.select(F.col("item").alias("item_b"), F.col("c").alias("cb"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n_b))
        .select(
            "item_a",
            "item_b",
            F.col("support").cast("bigint").alias("support"),
            F.round(F.col("support") / F.col("ca").cast("double"), 6).alias(
                "confidence"
            ),
            F.round(
                (F.col("support") * F.col("n"))
                / (F.col("ca").cast("double") * F.col("cb")),
                6,
            ).alias("lift"),
        )
    )


@query(
    "q195_pareto_concentration",
    oracle="""
WITH cust AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS rev_c
  FROM orders GROUP BY o_custkey
),
r AS (
  SELECT o_custkey, rev_c,
         ROW_NUMBER() OVER (ORDER BY rev_c DESC, o_custkey) AS rnk,
         COUNT(*) OVER () AS n,
         SUM(rev_c) OVER () AS tot
  FROM cust
)
SELECT CAST(n AS BIGINT) AS n_customers, CAST(tot AS BIGINT) AS total_rev_cents,
       CAST(SUM(CASE WHEN rnk * 10 <= n THEN rev_c ELSE 0 END) AS BIGINT)
         AS top10pct_rev_cents,
       ROUND(SUM(CASE WHEN rnk * 10 <= n THEN rev_c ELSE 0 END)
             / CAST(tot AS DOUBLE), 6) AS top10pct_share,
       CAST(SUM(CASE WHEN rnk * 5 <= n THEN rev_c ELSE 0 END) AS BIGINT)
         AS top20pct_rev_cents,
       ROUND(SUM(CASE WHEN rnk * 5 <= n THEN rev_c ELSE 0 END)
             / CAST(tot AS DOUBLE), 6) AS top20pct_share
FROM r GROUP BY n, tot
""",
)
def q195_pareto_concentration(spark, sf_dir):
    """Pareto (80/20) revenue concentration: what share of revenue the
    top 10% / 20% of customers carry — the concentration report that
    pairs with q172's Gini (Gini grades the whole curve; this reads
    two named points off it). Revenue stays in exact DECIMAL cents;
    rank thresholds are integer cross-multiplications (rnk·10 ≤ n);
    the customer rank is a DISTRIBUTED row number (revenue-bucket
    prefix + bucket-local window — r7: the previous global rank window
    and whole-relation count/sum windows were single-partition over the
    customer domain, the SCALE.md:134-139 straggler)."""
    from variantcalling_spark.operators.ordered import distributed_row_number

    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("rev_c")
    )
    tots = cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("rev_c").alias("tot"),
    )
    r = distributed_row_number(
        cust,
        [F.desc("rev_c"), F.col("o_custkey")],
        F.expr("-rev_c DIV 100000"),
        out_col="rnk",
    ).crossJoin(F.broadcast(tots))
    top10 = F.sum(F.when(F.col("rnk") * 10 <= F.col("n"), F.col("rev_c")).otherwise(0))
    top20 = F.sum(F.when(F.col("rnk") * 5 <= F.col("n"), F.col("rev_c")).otherwise(0))
    return r.groupBy("n", "tot").agg(
        top10.cast("bigint").alias("top10pct_rev_cents"),
        F.round(top10 / F.col("tot").cast("double"), 6).alias("top10pct_share"),
        top20.cast("bigint").alias("top20pct_rev_cents"),
        F.round(top20 / F.col("tot").cast("double"), 6).alias("top20pct_share"),
    ).select(
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("tot").alias("total_rev_cents"),
        "top10pct_rev_cents",
        "top10pct_share",
        "top20pct_rev_cents",
        "top20pct_share",
    )


@query(
    "q196_skyline_2d",
    oracle="""
WITH p AS (
  SELECT p_partkey,
         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS price_c,
         CAST(p_size AS BIGINT) AS psize
  FROM part
),
w AS (
  SELECT p_partkey, price_c, psize,
         MAX(psize) OVER (ORDER BY price_c
           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_cheaper
  FROM p
)
SELECT p_partkey, price_c, psize
FROM w
WHERE best_cheaper IS NULL OR psize >= best_cheaper
""",
)
def q196_skyline_2d(spark, sf_dir):
    """2-D skyline (Pareto-optimal set): parts where no STRICTLY
    cheaper part offers a STRICTLY larger size — the multi-criteria
    shortlist query (price/quality frontiers, model-selection
    curves). The naive form is an O(n²) dominance self-join; this is
    ONE range-frame window: sorted by price, a part survives iff its
    size is ≥ the best size seen at strictly lower prices
    (RANGE .. 1 PRECEDING excludes equal-price peers, which cannot
    strictly under-price). Exact DECIMAL cents as the range key. The
    dominance scan runs over the PRE-AGGREGATED (price, max size)
    relation — the distinct-price-cents domain, never the part rows
    (r7: the q167 histogram discipline, previously only promised in
    this docstring) — then broadcasts back to the parts."""
    from pyspark.sql import Window as W

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        (F.col("p_retailprice").cast("decimal(18,2)") * 100)
        .cast("bigint")
        .alias("price_c"),
        F.col("p_size").cast("bigint").alias("psize"),
    )
    per_price = p.groupBy("price_c").agg(F.max("psize").alias("__mx"))
    wr = W.orderBy("price_c").rangeBetween(W.unboundedPreceding, -1)
    frontier = per_price.select(
        "price_c", F.max("__mx").over(wr).alias("best_cheaper")
    )
    w = p.join(F.broadcast(frontier), "price_c")
    return w.where(
        F.col("best_cheaper").isNull() | (F.col("psize") >= F.col("best_cheaper"))
    ).select("p_partkey", "price_c", "psize")


@query(
    "q252_scd2_dimension",
    oracle="""
WITH changes AS (
  SELECT user_id,
         epoch_us(ts) AS ts_us,
         event_id,
         CASE CAST(FLOOR(value) AS INT) % 4
              WHEN 0 THEN 'bronze' WHEN 1 THEN 'silver'
              WHEN 2 THEN 'gold' ELSE 'platinum' END AS tier
  FROM events WHERE event_type IN ('signup', 'purchase')
),
dedup AS (
  -- collapse consecutive same-value changes (no-op updates make no version)
  SELECT * FROM (
    SELECT user_id, ts_us, event_id, tier,
           LAG(tier) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
             AS prev_tier
    FROM changes
  ) WHERE prev_tier IS NULL OR tier <> prev_tier
),
scd AS (
  SELECT user_id, tier,
         ts_us AS valid_from,
         LEAD(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
           AS valid_to,
         CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts_us, event_id)
              AS INT) AS version
  FROM dedup
)
SELECT user_id, version, tier, valid_from, valid_to,
       valid_to IS NULL AS is_current
FROM scd
""",
)
def q252_scd2_dimension(spark, sf_dir):
    """SLOWLY-CHANGING-DIMENSION TYPE 2 BUILD — the warehouse pattern
    behind every dimension table with history (Kimball SCD2; the
    batch twin of the results catalog's version chain,
    pipelines/results.py): an attribute-change event stream becomes
    validity-interval rows (valid_from / valid_to / version /
    is_current), with NO-OP updates collapsed first so only real
    transitions mint versions (the LAG-compare idempotence rule that
    keeps reprocessed feeds from inflating history).

    Scale shape: two windows partitioned by the dimension key — the
    canonical distribute-by-entity pattern; no window spans the
    table, no joins. Deterministic: (ts, event_id) total order."""
    from pyspark.sql import Window as W

    from variantcalling_spark.queries.intervals import events_points

    ev = events_points(spark, sf_dir)
    changes = ev.where(F.col("event_type").isin("signup", "purchase")).select(
        "user_id",
        "ts_us",
        "event_id",
        F.element_at(
            F.array(F.lit("bronze"), F.lit("silver"), F.lit("gold"), F.lit("platinum")),
            (F.floor("value").cast("int") % 4) + 1,
        ).alias("tier"),
    )
    wo = W.partitionBy("user_id").orderBy("ts_us", "event_id")
    dedup = (
        changes.withColumn("prev_tier", F.lag("tier").over(wo))
        .where(F.col("prev_tier").isNull() | (F.col("tier") != F.col("prev_tier")))
        .drop("prev_tier")
    )
    scd = dedup.select(
        "user_id",
        "tier",
        F.col("ts_us").alias("valid_from"),
        F.lead("ts_us").over(wo).alias("valid_to"),
        F.row_number().over(wo).cast("int").alias("version"),
    )
    return scd.select(
        "user_id",
        "version",
        "tier",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    )


def _q256_oracle() -> str:
    from variantcalling_spark.queries import _REGISTRY

    scd = _REGISTRY["q252_scd2_dimension"].oracle
    return f"""
WITH scd AS ({scd}),
ev AS (
  SELECT user_id, epoch_us(ts) AS ts_us, value
  FROM events WHERE event_type = 'click'
),
hit AS (
  SELECT e.user_id, e.ts_us, e.value, s.tier
  FROM ev e JOIN scd s
    ON s.user_id = e.user_id
   AND e.ts_us >= s.valid_from
   AND (s.valid_to IS NULL OR e.ts_us < s.valid_to)
)
SELECT tier,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
FROM hit GROUP BY tier
UNION ALL
SELECT 'no_dimension_row' AS tier,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS value_sum
FROM ev e
WHERE NOT EXISTS (
  SELECT 1 FROM scd s
  WHERE s.user_id = e.user_id AND e.ts_us >= s.valid_from
    AND (s.valid_to IS NULL OR e.ts_us < s.valid_to)
)
"""


@query("q256_temporal_lookup", oracle=_q256_oracle())
def q256_temporal_lookup(spark, sf_dir):
    """POINT-IN-VALIDITY TEMPORAL LOOKUP — the canonical SCD2 consumer
    (every fact row asks 'what was the dimension worth WHEN THIS
    HAPPENED?'): click events joined against q252's versioned tier
    dimension on (entity key, validity interval), open-ended current
    rows included, with facts predating any version surfaced as
    no_dimension_row (silently dropping them is the classic temporal
    join bug). Output: value mass by as-was tier.

    Scale shape: the join is EQUI on the entity key — per-entity
    version chains are short, so the interval predicate is a cheap
    residual filter on co-partitioned rows (no range-bucketing
    needed when the entity key already bounds the candidates); both
    aggregates are DECIMAL-exact."""
    from variantcalling_spark.queries import _REGISTRY
    from variantcalling_spark.queries.intervals import events_points

    scd = _REGISTRY["q252_scd2_dimension"].fn(spark, sf_dir).transform(
        managed_persist
    )
    ev = (
        events_points(spark, sf_dir)
        .where(F.col("event_type") == "click")
        .select("user_id", "ts_us", "value")
        .transform(managed_persist)
    )
    cond = (
        (F.col("e.user_id") == F.col("s.user_id"))
        & (F.col("e.ts_us") >= F.col("s.valid_from"))
        & (F.col("s.valid_to").isNull() | (F.col("e.ts_us") < F.col("s.valid_to")))
    )
    hit = ev.alias("e").join(scd.alias("s"), cond).select(
        "s.tier", "e.value"
    )
    matched = hit.groupBy("tier").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("value_sum"),
    )
    unmatched = (
        ev.alias("e")
        .join(scd.alias("s"), cond, "left_anti")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("value_sum"),
        )
        .select(F.lit("no_dimension_row").alias("tier"), "n_events", "value_sum")
    )
    return matched.unionByName(unmatched)


# --------------------------------------------------------------------------
# Data-quality statistics (round 6, second half)
# --------------------------------------------------------------------------
# Benford first-digit probabilities, inlined as identical double literals
# on both engines (libm log10 could differ by 1 ulp between JVM and
# DuckDB; a shared literal table cannot).
_BENFORD_P = {d: __import__("math").log10(1.0 + 1.0 / d) for d in range(1, 10)}
_BENFORD_SQL_CASE = "CASE digit " + " ".join(
    f"WHEN '{d}' THEN CAST({p!r} AS DOUBLE)" for d, p in _BENFORD_P.items()
) + " END"


@query(
    "q260_benford_digit_test",
    oracle=f"""
WITH digits AS (
  SELECT l_returnflag AS flag,
         substr(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS VARCHAR), 1, 1) AS digit
  FROM lineitem
  WHERE l_extendedprice >= 1
),
counts AS (
  SELECT flag, digit, CAST(COUNT(*) AS BIGINT) AS n_obs
  FROM digits GROUP BY flag, digit
),
with_n AS (
  SELECT flag, digit, n_obs,
         SUM(n_obs) OVER (PARTITION BY flag) AS n_total,
         {_BENFORD_SQL_CASE} AS p_exp
  FROM counts
),
contrib AS (
  SELECT flag, digit, n_obs, n_total, p_exp,
         ROUND((n_obs - n_total * p_exp) * (n_obs - n_total * p_exp)
               / (n_total * p_exp), 10) AS contrib
  FROM with_n
)
SELECT flag, digit, n_obs,
       ROUND(CAST(n_obs AS DOUBLE) / n_total, 6) AS p_obs,
       ROUND(p_exp, 6) AS p_benford,
       ROUND(CAST(SUM(CAST(contrib AS DECIMAL(22,10)))
                  OVER (PARTITION BY flag) AS DOUBLE), 6) AS chi2_flag
FROM contrib
""",
)
def q260_benford_digit_test(spark, sf_dir):
    """BENFORD'S-LAW FIRST-DIGIT TEST per return flag — the classic
    numeric-data-quality / fraud screen (a synthetic-data detector in a
    training-data pipeline: generated numbers rarely follow Benford;
    complements the distribution-drift monitor q161 and the dispersion
    index q178). chi-squared goodness-of-fit of the leading-digit
    histogram against p_d = log10(1 + 1/d).

    Scale discipline: one map-side digit projection + one (flag, digit)
    groupBy (27 groups) — the fact table is touched once, everything
    after the first aggregate is constant-size. The expected-probability
    table is an inlined literal CASE (9 rows), not a join. chi2 is a
    window SUM over DECIMAL-snapped contributions, so the 9-term sum is
    summation-order independent."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    digits = li.where(F.col("l_extendedprice") >= 1).select(
        F.col("l_returnflag").alias("flag"),
        F.substring(
            F.floor("l_extendedprice").cast("bigint").cast("string"), 1, 1
        ).alias("digit"),
    )
    counts = digits.groupBy("flag", "digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs")
    )
    p_exp = F.coalesce(
        *[
            F.when(F.col("digit") == str(d), F.lit(p))
            for d, p in _BENFORD_P.items()
        ]
    )
    w_flag = W.partitionBy("flag")
    with_n = counts.withColumn("n_total", F.sum("n_obs").over(w_flag)).withColumn(
        "p_exp", p_exp
    )
    contrib = with_n.withColumn(
        "contrib",
        F.round(
            (F.col("n_obs") - F.col("n_total") * F.col("p_exp"))
            * (F.col("n_obs") - F.col("n_total") * F.col("p_exp"))
            / (F.col("n_total") * F.col("p_exp")),
            10,
        ),
    )
    return contrib.select(
        "flag",
        "digit",
        "n_obs",
        F.round(F.col("n_obs").cast("double") / F.col("n_total"), 6).alias("p_obs"),
        F.round("p_exp", 6).alias("p_benford"),
        F.round(
            F.sum(F.col("contrib").cast("decimal(22,10)")).over(w_flag).cast("double"),
            6,
        ).alias("chi2_flag"),
    )


@query(
    "q272_winsorized_means",
    oracle="""
WITH v AS (
  SELECT l_returnflag AS flag, l_extendedprice AS price FROM lineitem
),
ranked AS (
  SELECT flag, price,
         ROW_NUMBER() OVER (PARTITION BY flag ORDER BY price) AS rn,
         COUNT(*) OVER (PARTITION BY flag) AS n
  FROM v
),
cuts AS (
  SELECT flag,
         MAX(n) AS n,
         MAX(CASE WHEN rn = (n + 19) // 20 THEN price END) AS p05,
         MAX(CASE WHEN rn = (19 * n + 19) // 20 THEN price END) AS p95
  FROM ranked GROUP BY flag
),
clipped AS (
  SELECT r.flag, r.price, c.p05, c.p95,
         GREATEST(c.p05, LEAST(r.price, c.p95)) AS wprice
  FROM ranked r JOIN cuts c USING (flag)
)
SELECT flag,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MAX(p05), 2) AS p05,
       ROUND(MAX(p95), 2) AS p95,
       ROUND(CAST(SUM(CAST(price AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS mean_raw,
       ROUND(CAST(SUM(CAST(wprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*), 6) AS mean_winsorized,
       CAST(SUM(CASE WHEN price < p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
       CAST(SUM(CASE WHEN price > p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high
FROM clipped GROUP BY flag
""",
)
def q272_winsorized_means(spark, sf_dir):
    """WINSORIZED MEAN per group — the robust-aggregation companion of
    the MAD report (q183) and weighted quantiles (q163): clip each
    group's values at exact p05/p95 and report raw vs winsorized means
    with clip counts (the outlier-robust metric a reward-model or
    quality-score aggregation should publish instead of a raw mean).

    Scale discipline: exact percentiles via integer-rank selection
    ((n+19)//20 — INTEGER arithmetic, no float quantile epsilon, so
    both engines select the identical element); one window per group +
    one 3-row cut table joined back broadcast; means are DECIMAL-exact.
    The window is the unavoidable exact-quantile sort, partitioned by
    group — at 100 TB swap in the histogram-inversion percentile (q44)
    for the approximate path, unchanged downstream."""
    from pyspark.sql import Window as W

    v = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"), F.col("l_extendedprice").alias("price")
    )
    ranked = v.select(
        "flag",
        "price",
        F.row_number().over(W.partitionBy("flag").orderBy("price")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("flag")).alias("n"),
    )
    cuts = ranked.groupBy("flag").agg(
        F.max(F.when(F.col("rn") == (F.col("n") + 19).cast("bigint") / 20, None)).alias("_drop"),
        F.max(
            F.when(F.col("rn") == F.floor((F.col("n") + 19) / 20), F.col("price"))
        ).alias("p05"),
        F.max(
            F.when(
                F.col("rn") == F.floor((19 * F.col("n") + 19) / 20), F.col("price")
            )
        ).alias("p95"),
    ).drop("_drop")
    clipped = ranked.join(F.broadcast(cuts), "flag").select(
        "flag",
        "price",
        "p05",
        "p95",
        F.greatest(F.col("p05"), F.least(F.col("price"), F.col("p95"))).alias("wprice"),
    )
    return clipped.groupBy("flag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.round(F.max("p05"), 2).alias("p05"),
        F.round(F.max("p95"), 2).alias("p95"),
        F.round(
            F.sum(dec("price")).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_raw"),
        F.round(
            F.sum(dec("wprice")).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_winsorized"),
        F.sum(F.when(F.col("price") < F.col("p05"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("price") > F.col("p95"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_high"),
    )


@query(
    "q290_quantile_normalization",
    oracle="""
WITH ranked AS (
  SELECT source, n_chars,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM documents
),
binned AS (
  SELECT source,
         (100 * (rn - 1)) // n AS pct_bin,
         n_chars
  FROM ranked
),
cell AS (
  SELECT source, pct_bin,
         ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS m_sb
  FROM binned GROUP BY source, pct_bin
)
SELECT pct_bin,
       CAST(COUNT(*) AS BIGINT) AS n_sources,
       ROUND(CAST(SUM(CAST(m_sb AS DECIMAL(20,6))) AS DOUBLE) / COUNT(*), 6)
         AS reference_value,
       ROUND(MAX(m_sb) - MIN(m_sb), 6) AS cross_source_spread
FROM cell GROUP BY pct_bin
""",
)
def q290_quantile_normalization(spark, sf_dir):
    """QUANTILE NORMALIZATION REFERENCE PROFILE (the microarray /
    RNA-seq batch-harmonization classic — Bolstad 2003): rank each
    group's values, bucket ranks into percentiles, and define the
    reference distribution as the cross-group mean at each percentile
    — the mapping table that replaces each group's p-th quantile with
    the consensus value, removing batch effects while preserving rank
    order. The batch-correction complement of the drift monitor
    (q161) and ANOVA (q277).

    Scale discipline: one rank window per group (the exact-quantile
    sort, partitioned by group), integer percentile bucketing
    ((100*(rn-1))//n — no float ranks), then two tiny aggregates
    (group x 100 cells, then 100 rows). Per-cell means snap at 6
    before the cross-group DECIMAL mean."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    ranked = docs.select(
        "source",
        "n_chars",
        F.row_number()
        .over(W.partitionBy("source").orderBy("n_chars", "doc_id"))
        .alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("source")).alias("n"),
    )
    binned = ranked.select(
        "source",
        F.floor((100 * (F.col("rn") - 1)) / F.col("n")).alias("pct_bin"),
        "n_chars",
    )
    cell = binned.groupBy("source", "pct_bin").agg(
        F.round(F.sum("n_chars").cast("double") / F.count(F.lit(1)), 6).alias("m_sb")
    )
    return cell.groupBy("pct_bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        F.round(
            F.sum(F.col("m_sb").cast("decimal(20,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("reference_value"),
        F.round(F.max("m_sb") - F.min("m_sb"), 6).alias("cross_source_spread"),
    )


_SF_TABLES = ("lineitem", "orders", "events", "documents")
_SF_TARGET_ROWS = 500_000  # compaction target: rows per output file


_SF_GATE_DIR = "/root/testdata/sf0.01"  # the driver's fixed t2 gate


@query(
    "q358_small_files_report",
    oracle="""
WITH files AS MATERIALIZED (
  SELECT 'lineitem' AS tbl,
         regexp_extract(filename, '[^/]+$') AS file, COUNT(*) AS n
  FROM read_parquet('/root/testdata/sf0.01/lineitem.parquet', filename = true) GROUP BY 1, 2
  UNION ALL
  SELECT 'orders', regexp_extract(filename, '[^/]+$'), COUNT(*)
  FROM read_parquet('/root/testdata/sf0.01/orders.parquet', filename = true) GROUP BY 1, 2
  UNION ALL
  SELECT 'events', regexp_extract(filename, '[^/]+$'), COUNT(*)
  FROM read_parquet('/root/testdata/sf0.01/events.parquet', filename = true) GROUP BY 1, 2
  UNION ALL
  SELECT 'documents', regexp_extract(filename, '[^/]+$'), COUNT(*)
  FROM read_parquet('/root/testdata/sf0.01/documents.parquet', filename = true) GROUP BY 1, 2
)
SELECT tbl,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(MIN(n) AS BIGINT) AS min_file_rows,
       CAST(MAX(n) AS BIGINT) AS max_file_rows,
       ROUND(MAX(n) / CAST(MIN(n) AS DOUBLE), 4) AS file_skew,
       CAST(GREATEST(1, CEIL(SUM(n) / 500000.0)) AS BIGINT)
         AS recommended_files,
       CASE WHEN COUNT(*) > GREATEST(1, CEIL(SUM(n) / 500000.0))
            THEN 1 ELSE 0 END AS compaction_recommended
FROM files GROUP BY tbl
""",
)
def q358_small_files_report(spark, sf_dir):
    """SMALL-FILES / COMPACTION REPORT (the lakehouse-ops health check
    every table-maintenance job runs: per table, file count, row
    skew across files, and whether compacting toward a
    rows-per-file target would shrink the file count — THE operational
    complement of the q252/q256 SCD and the results-catalog
    maintenance in pipelines/results.py): computed from the engine's
    own scan metadata via input_file_name(), no filesystem walking.

    NOTE: the DuckDB oracle must read files WITH filenames, which
    views cannot expose, so it pins the driver's fixed sf0.01 gate
    directory — running this one query's oracle check at another sf
    mismatches BY CONSTRUCTION (loudly, not silently).

    Scale discipline: one aggregate per table keyed on the file name
    the scan already carries — at 100 TB this is exactly the query a
    compaction scheduler runs before OPTIMIZE, and it reads only
    row-group metadata paths, never extra columns."""
    outs = None
    for t in _SF_TABLES:
        df = load_table(spark, sf_dir, t).select(
            F.lit(t).alias("tbl"),
            F.regexp_extract(F.input_file_name(), "[^/]+$", 0).alias("file"),
        )
        g = df.groupBy("tbl", "file").agg(F.count(F.lit(1)).alias("n"))
        outs = g if outs is None else outs.unionByName(g)
    return outs.groupBy("tbl").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("n").cast("bigint").alias("n_rows"),
        F.min("n").cast("bigint").alias("min_file_rows"),
        F.max("n").cast("bigint").alias("max_file_rows"),
        F.round(F.max("n") / F.min("n").cast("double"), 4).alias("file_skew"),
        F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(F.sum("n") / F.lit(float(_SF_TARGET_ROWS))).cast("bigint"),
        ).alias("recommended_files"),
        F.when(
            F.count(F.lit(1))
            > F.greatest(
                F.lit(1).cast("bigint"),
                F.ceil(F.sum("n") / F.lit(float(_SF_TARGET_ROWS))).cast("bigint"),
            ),
            1,
        )
        .otherwise(0)
        .alias("compaction_recommended"),
    )


_CF_MIN_CO = 3


@query(
    "q360_item_item_cf",
    oracle=f"""
WITH baskets AS MATERIALIZED (
  SELECT DISTINCT l_orderkey AS basket, l_partkey % 200 AS item
  FROM lineitem
),
item_n AS MATERIALIZED (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS n FROM baskets GROUP BY item
),
co AS MATERIALIZED (
  SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS n_co
  FROM baskets a JOIN baskets b
    ON b.basket = a.basket AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= {_CF_MIN_CO}
)
SELECT c.item_a, c.item_b, c.n_co, na.n AS n_a, nb.n AS n_b,
       ROUND(c.n_co / (sqrt(CAST(na.n AS DOUBLE)) * sqrt(CAST(nb.n AS DOUBLE))), 6)
         AS cosine,
       ROUND(c.n_co / CAST(na.n + nb.n - c.n_co AS DOUBLE), 6) AS jaccard,
       CAST(ROW_NUMBER() OVER (
         ORDER BY ROUND(c.n_co / (sqrt(CAST(na.n AS DOUBLE))
                                  * sqrt(CAST(nb.n AS DOUBLE))), 6) DESC,
                  c.item_a, c.item_b) AS INT) AS rk
FROM co c
JOIN item_n na ON na.item = c.item_a
JOIN item_n nb ON nb.item = c.item_b
QUALIFY rk <= 25
""",
)
def q360_item_item_cf(spark, sf_dir):
    """ITEM-ITEM COLLABORATIVE FILTERING (the Amazon-2003 classic:
    "customers who bought X also bought Y" from basket co-occurrence
    cosine — THE recommender baseline, and the lift-free similarity
    complement of q194's confidence/lift association rules): co-count
    over shared baskets, cosine = n_co / sqrt(n_a * n_b), top-25
    pairs with Jaccard alongside.

    Scale discipline: candidate pairs come from the basket SELF-JOIN
    keyed on basket id — Sum(basket_size^2), never item^2 (the q194
    banding); min-support prunes before the similarity math; item
    marginals broadcast. Exact integer counts, two rounded
    divisions."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    baskets = li.select(
        F.col("l_orderkey").alias("basket"),
        (F.col("l_partkey") % 200).alias("item"),
    ).distinct().transform(managed_persist)
    item_n = baskets.groupBy("item").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    co = (
        baskets.join(
            baskets.select("basket", F.col("item").alias("item_b")), "basket"
        )
        .where(F.col("item") < F.col("item_b"))
        .groupBy(F.col("item").alias("item_a"), "item_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_co"))
        .where(F.col("n_co") >= _CF_MIN_CO)
    )
    scored = (
        co.join(
            F.broadcast(item_n.select(F.col("item").alias("item_a"), F.col("n").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(item_n.select(F.col("item").alias("item_b"), F.col("n").alias("n_b"))),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "n_co",
            "n_a",
            "n_b",
            F.round(
                F.col("n_co")
                / (
                    F.sqrt(F.col("n_a").cast("double"))
                    * F.sqrt(F.col("n_b").cast("double"))
                ),
                6,
            ).alias("cosine"),
            F.round(
                F.col("n_co")
                / (F.col("n_a") + F.col("n_b") - F.col("n_co")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    top = scored.orderBy(F.col("cosine").desc(), "item_a", "item_b").limit(25)
    return top.select(
        "item_a",
        "item_b",
        "n_co",
        "n_a",
        "n_b",
        "cosine",
        "jaccard",
        F.row_number()
        .over(W.orderBy(F.col("cosine").desc(), "item_a", "item_b"))
        .cast("int")
        .alias("rk"),
    )


@query(
    "q366_data_profile",
    oracle="""
WITH src AS MATERIALIZED (
  SELECT event_id, user_id, event_type, value, props FROM events
),
n AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM src),
profile AS (
  SELECT 'event_id' AS col, 'bigint' AS dtype,
         CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null,
         CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_distinct,
         CAST(MIN(event_id) AS VARCHAR) AS min_val,
         CAST(MAX(event_id) AS VARCHAR) AS max_val
  FROM src
  UNION ALL
  SELECT 'user_id', 'bigint',
         CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT user_id) AS BIGINT),
         CAST(MIN(user_id) AS VARCHAR), CAST(MAX(user_id) AS VARCHAR)
  FROM src
  UNION ALL
  SELECT 'event_type', 'string',
         CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT event_type) AS BIGINT),
         MIN(event_type), MAX(event_type)
  FROM src
  UNION ALL
  SELECT 'value', 'double',
         CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT value) AS BIGINT),
         CAST(ROUND(MIN(value), 2) AS VARCHAR), CAST(ROUND(MAX(value), 2) AS VARCHAR)
  FROM src
  UNION ALL
  SELECT 'props', 'string',
         CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         CAST(COUNT(DISTINCT props) AS BIGINT),
         MIN(props), MAX(props)
  FROM src
)
SELECT p.col, p.dtype, p.n_null, p.n_distinct, p.min_val, p.max_val,
       ROUND(p.n_null / CAST((SELECT n FROM n) AS DOUBLE), 6) AS null_rate,
       ROUND(p.n_distinct / CAST((SELECT n FROM n) AS DOUBLE), 6)
         AS distinct_rate,
       CASE WHEN p.n_distinct = (SELECT n FROM n) AND p.n_null = 0
            THEN 1 ELSE 0 END AS is_unique_key
FROM profile p
""",
)
def q366_data_profile(spark, sf_dir):
    """DATA-QUALITY COLUMN PROFILE (the Great Expectations /
    dbt-test shape every ingestion gate runs: per column, null rate,
    exact distinct count, min/max, and a unique-key verdict — the
    expectations that catch schema drift and silent upstream nulls
    BEFORE the 352 analytical queries downstream consume the table):
    the events table profiled column by column.

    Scale discipline: one pass per column family over the same scan
    (Catalyst shares it), each an exact map-side-combinable aggregate;
    min/max surfaced as strings so heterogeneous columns union into
    one report relation — the profiler's standard trick."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    ).transform(managed_persist)
    n = ev.count()

    def prof(col, dtype, fmt=None):
        mn = F.min(col)
        mx = F.max(col)
        if fmt == "round2":
            mn, mx = F.round(mn, 2), F.round(mx, 2)
        return ev.agg(
            F.lit(col).alias("col"),
            F.lit(dtype).alias("dtype"),
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_null"),
            F.countDistinct(col).cast("bigint").alias("n_distinct"),
            mn.cast("string").alias("min_val"),
            mx.cast("string").alias("max_val"),
        )

    out = (
        prof("event_id", "bigint")
        .unionByName(prof("user_id", "bigint"))
        .unionByName(prof("event_type", "string"))
        .unionByName(prof("value", "double", fmt="round2"))
        .unionByName(prof("props", "string"))
    )
    return out.select(
        "col",
        "dtype",
        "n_null",
        "n_distinct",
        "min_val",
        "max_val",
        F.round(F.col("n_null") / F.lit(float(n)), 6).alias("null_rate"),
        F.round(F.col("n_distinct") / F.lit(float(n)), 6).alias("distinct_rate"),
        F.when((F.col("n_distinct") == n) & (F.col("n_null") == 0), 1)
        .otherwise(0)
        .alias("is_unique_key"),
    )


@query(
    "q401_data_quality_gate",
    oracle="""
WITH r1 AS (
  SELECT 'quantity_in_range' AS rule,
         CAST(COUNT(*) AS BIGINT) AS n_checked,
         CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
  FROM lineitem
),
r2 AS (
  SELECT 'orderkey_not_null',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
),
r3 AS (
  SELECT 'orderkey_referential',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey
),
r4 AS (
  SELECT 'line_pk_unique',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(c - 1) AS BIGINT)
  FROM (SELECT COUNT(*) AS c FROM lineitem
        GROUP BY l_orderkey, l_linenumber)
),
r5 AS (
  SELECT 'unit_price_at_least_one',
         CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CASE WHEN l_extendedprice < l_quantity THEN 1 ELSE 0 END)
              AS BIGINT)
  FROM lineitem
),
u AS (
  SELECT * FROM r1 UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
  UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r5
)
SELECT rule, n_checked, n_violations,
       n_violations = 0 AS passed,
       ROUND(n_violations / CAST(n_checked AS DOUBLE), 6) AS violation_rate
FROM u
""",
)
def q401_data_quality_gate(spark, sf_dir):
    """DATA-QUALITY GATE LEDGER (the expectations-suite primitive every
    ingest runs before promoting a batch — range, not-null,
    referential-integrity, primary-key-uniqueness, and cross-column
    consistency checks, emitted as one pass/fail ledger; the ASSERTING
    face of q366's descriptive profile): five rules over the lineitem
    batch with exact violation counts.

    Scale shape: three rules fold into ONE scan's conditional
    aggregates; referential integrity is a broadcast-or-shuffle LEFT
    join counting orphans; uniqueness is a keyed groupBy counting
    surplus rows. Nothing collects; the gate output is rule-bounded."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")

    r1 = li.agg(
        F.lit("quantity_in_range").alias("rule"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        F.sum(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
            .otherwise(0)
        ).cast("bigint").alias("n_violations"),
    )
    r2 = li.agg(
        F.lit("orderkey_not_null").alias("rule"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_violations"),
    )
    r3 = (
        li.join(
            o.select(F.col("o_orderkey").alias("__ok")),
            li.l_orderkey == F.col("__ok"),
            "left",
        )
        .agg(
            F.lit("orderkey_referential").alias("rule"),
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            F.sum(F.when(F.col("__ok").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_violations"),
        )
    )
    r4 = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(
            F.lit("line_pk_unique").alias("rule"),
            F.count(F.lit(1)).cast("bigint").alias("n_checked"),
            F.sum(F.col("c") - 1).cast("bigint").alias("n_violations"),
        )
    )
    r5 = li.agg(
        F.lit("unit_price_at_least_one").alias("rule"),
        F.count(F.lit(1)).cast("bigint").alias("n_checked"),
        F.sum(
            F.when(F.col("l_extendedprice") < F.col("l_quantity"), 1).otherwise(0)
        ).cast("bigint").alias("n_violations"),
    )
    u = r1.unionByName(r2).unionByName(r3).unionByName(r4).unionByName(r5)
    return u.select(
        "rule",
        "n_checked",
        "n_violations",
        (F.col("n_violations") == 0).alias("passed"),
        F.round(
            F.col("n_violations") / F.col("n_checked").cast("double"), 6
        ).alias("violation_rate"),
    )


@query(
    "q403_json_props_extraction",
    oracle="""
WITH p AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS INT) AS k
  FROM events WHERE props IS NOT NULL
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unparsed,
       CAST(MIN(k) AS INT) AS min_k,
       CAST(MAX(k) AS INT) AS max_k,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       CAST(COUNT(DISTINCT k) AS BIGINT) AS n_distinct_k
FROM p GROUP BY event_type
""",
)
def q403_json_props_extraction(spark, sf_dir):
    """SCHEMA-ON-READ JSON EXTRACTION from the events ``props`` column
    (the semi-structured ingestion axis: event properties, crawl
    metadata, and jsonl training records all arrive as JSON strings
    whose schema the engine imposes at read time — the one column of
    the fixture tables no query had touched): ``from_json`` with an
    explicit schema (malformed rows parse to NULL, counted, never
    thrown) and per-type aggregates over the extracted field.

    Scale shape: JSON parsing is a scan-time JVM projection (Jackson
    under whole-stage codegen, no UDF); the aggregate is map-side
    combinable. The oracle uses DuckDB's json_extract on the identical
    strings."""
    ev = load_table(spark, sf_dir, "events").where(F.col("props").isNotNull())
    parsed = ev.select(
        "event_type",
        F.from_json(F.col("props"), "k INT")["k"].alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_unparsed"),
        F.min("k").cast("int").alias("min_k"),
        F.max("k").cast("int").alias("max_k"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.count_distinct(F.col("k")).cast("bigint").alias("n_distinct_k"),
    )


@query(
    "q416_theil_decomposition",
    oracle="""
WITH cust AS (
  SELECT c.c_nationkey AS nation,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS rev
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey
  HAVING SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) > 0
),
percust AS (
  SELECT c.c_nationkey AS nation, o.o_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT) AS x
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey, o.o_custkey
),
tot AS (
  SELECT CAST(SUM(x) AS BIGINT) AS xt, CAST(COUNT(*) AS BIGINT) AS n
  FROM percust
),
gstat AS (
  SELECT nation, CAST(SUM(x) AS BIGINT) AS xg, CAST(COUNT(*) AS BIGINT) AS ng
  FROM percust GROUP BY nation
),
t_within AS (
  SELECT p.nation,
         CAST(SUM(CAST(ROUND((p.x / CAST(g.xg AS DOUBLE))
                 * ln(p.x * g.ng / CAST(g.xg AS DOUBLE)), 12)
                 AS DECIMAL(20,12))) AS DOUBLE) AS t_g
  FROM percust p JOIN gstat g ON g.nation = p.nation
  WHERE p.x > 0 GROUP BY p.nation
),
parts AS (
  SELECT g.nation,
         g.xg / CAST(t.xt AS DOUBLE) AS wg,
         ROUND((g.xg / CAST(t.xt AS DOUBLE))
               * ln((g.xg / CAST(t.xt AS DOUBLE)) * t.n / g.ng), 12) AS tb_g,
         ROUND((g.xg / CAST(t.xt AS DOUBLE)) * tw.t_g, 12) AS twc_g
  FROM gstat g JOIN t_within tw ON tw.nation = g.nation CROSS JOIN tot t
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
       ROUND(CAST(SUM(CAST(tb_g AS DECIMAL(20,12))) AS DOUBLE), 6)
         AS theil_between,
       ROUND(CAST(SUM(CAST(twc_g AS DECIMAL(20,12))) AS DOUBLE), 6)
         AS theil_within,
       ROUND(CAST(SUM(CAST(tb_g AS DECIMAL(20,12))) AS DOUBLE)
             + CAST(SUM(CAST(twc_g AS DECIMAL(20,12))) AS DOUBLE), 6)
         AS theil_total
FROM parts
""",
)
def q416_theil_decomposition(spark, sf_dir):
    """THEIL-T INEQUALITY DECOMPOSITION (the inequality index that —
    unlike q172's Gini — splits EXACTLY into between-group +
    within-group components: how much revenue concentration is
    across nations vs inside them, the disparity-attribution query):
    per-customer revenue in exact cents, per-nation Theil components,
    share-weighted pooling.

    Exactness: revenues are BIGINT cents; every x/X * ln(x n / X)
    term snaps at 12 dp into DECIMAL sums (order-free); zero-revenue
    customers drop from the log on both engines. Scale: two grouped
    aggregates + arithmetic on the nation-bounded ledger."""
    o = load_table(spark, sf_dir, "orders")
    cst = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_nationkey").alias("nation")
    )
    percust = (
        o.join(cst, o.o_custkey == cst.c_custkey)
        .groupBy("nation", "o_custkey")
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("x")
        )
        .transform(managed_persist)
    )
    tot = percust.agg(
        F.sum("x").cast("bigint").alias("xt"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    gstat = percust.groupBy("nation").agg(
        F.sum("x").cast("bigint").alias("xg"),
        F.count(F.lit(1)).cast("bigint").alias("ng"),
    )
    t_within = (
        percust.where(F.col("x") > 0)
        .join(F.broadcast(gstat), "nation")
        .groupBy("nation")
        .agg(
            F.sum(
                F.round(
                    (F.col("x") / F.col("xg").cast("double"))
                    * F.log(F.col("x") * F.col("ng") / F.col("xg").cast("double")),
                    12,
                ).cast("decimal(20,12)")
            )
            .cast("double")
            .alias("t_g")
        )
    )
    wg = F.col("xg") / F.col("xt").cast("double")
    parts = (
        gstat.join(t_within, "nation")
        .crossJoin(F.broadcast(tot))
        .select(
            F.round(
                wg * F.log(wg * F.col("n") / F.col("ng")), 12
            ).alias("tb_g"),
            F.round(wg * F.col("t_g"), 12).alias("twc_g"),
        )
    )
    tb = F.sum(F.col("tb_g").cast("decimal(20,12)")).cast("double")
    tw = F.sum(F.col("twc_g").cast("decimal(20,12)")).cast("double")
    return parts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.round(tb, 6).alias("theil_between"),
        F.round(tw, 6).alias("theil_within"),
        F.round(tb + tw, 6).alias("theil_total"),
    )


@query(
    "q426_benford_test",
    oracle="""
WITH d AS (
  SELECT CAST(substr(CAST(l_extendedprice AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM lineitem
),
o AS (SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY digit),
t AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM o),
g AS (
  SELECT gs.digit, COALESCE(o.n_obs, 0) AS n_obs, t.n
  FROM (SELECT unnest(generate_series(1, 9)) AS digit) gs
  LEFT JOIN o ON o.digit = gs.digit CROSS JOIN t
)
SELECT digit,
       CAST(n_obs AS BIGINT) AS n_obs,
       ROUND(n * log10(1.0 + 1.0 / digit), 6) AS expected,
       ROUND(POW(n_obs - n * log10(1.0 + 1.0 / digit), 2)
             / (n * log10(1.0 + 1.0 / digit)), 6) AS chi2_term
FROM g
""",
)
def q426_benford_test(spark, sf_dir):
    """BENFORD FIRST-DIGIT TEST over lineitem prices (the classic
    fabricated-data screen a data-quality gate runs on any numeric
    feed): observed first-significant-digit counts vs the Benford
    expectation n*log10(1+1/d), with the per-digit chi-square term.
    The digit comes from the DECIMAL's canonical string form (both
    engines render DECIMAL(12,2) identically), never from float
    log10-of-value arithmetic — so the bucketing is engine-exact and
    only the two ROUND(…,6) output expressions touch doubles.

    Scale shape: one scan -> 9-group aggregate (map-side combinable);
    the 9-row domain join is a broadcast of a literal range."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.select(
        F.substring(F.col("l_extendedprice").cast("string"), 1, 1)
        .cast("bigint")
        .alias("digit")
    )
    o = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    t = o.agg(F.sum("n_obs").cast("bigint").alias("n"))
    dom = spark.range(1, 10).select(F.col("id").alias("digit"))
    g = (
        dom.join(F.broadcast(o), "digit", "left")
        .crossJoin(F.broadcast(t))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
            "n",
        )
    )
    exp_ = F.col("n") * F.log10(1.0 + 1.0 / F.col("digit"))
    return g.select(
        "digit",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.round(exp_, 6).alias("expected"),
        F.round(F.pow(F.col("n_obs") - exp_, 2) / exp_, 6).alias("chi2_term"),
    )


_FK_RELATIONS = [
    # (label, child table, child key, parent table, parent key)
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem.partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders.custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer.nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("events.user_id->customer", "events", "user_id", "customer", "c_custkey"),
]


def _refint_oracle_sql() -> str:
    arms = "\nUNION ALL\n".join(
        f"""SELECT '{label}' AS relation,
       CAST((SELECT COUNT(*) FROM {ct}) AS BIGINT) AS n_child,
       CAST((SELECT COUNT(*) FROM {ct} c
             WHERE NOT EXISTS (SELECT 1 FROM {pt} p
                               WHERE p.{pk} = c.{ck})) AS BIGINT) AS n_orphans"""
        for label, ct, ck, pt, pk in _FK_RELATIONS
    )
    return f"""
SELECT relation, n_child, n_orphans,
       ROUND(n_orphans / CAST(n_child AS DOUBLE), 6) AS orphan_rate
FROM ({arms})
"""


@query("q427_referential_integrity", oracle=_refint_oracle_sql())
def q427_referential_integrity(spark, sf_dir):
    """REFERENTIAL-INTEGRITY AUDIT across the warehouse's foreign keys
    (the ingest gate that catches a broken upstream export before a
    training job joins against it — the relational sibling of q401's
    expectations ledger): for each declared child->parent relation, the
    child row count, orphan count (child keys with no parent), and
    orphan rate. All six relations audit clean on the generated data —
    the gate's value is that the ZERO is now a certified, hash-checked
    invariant rather than an assumption.

    Scale shape: each arm is one LEFT ANTI join on the key (broadcast
    where the parent is small, shuffle-hash otherwise — Catalyst's
    choice) + a count; arms are independent and union at the end."""
    rows = None
    for label, ct, ck, pt, pk in _FK_RELATIONS:
        child = load_table(spark, sf_dir, ct)
        parent = load_table(spark, sf_dir, pt)
        n_child = child.agg(F.count(F.lit(1)).cast("bigint").alias("n_child"))
        orphans = (
            child.join(parent, child[ck] == parent[pk], "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
        )
        arm = (
            n_child.crossJoin(orphans)
            .select(
                F.lit(label).alias("relation"),
                "n_child",
                "n_orphans",
                F.round(
                    F.col("n_orphans") / F.col("n_child").cast("double"), 6
                ).alias("orphan_rate"),
            )
        )
        rows = arm if rows is None else rows.unionByName(arm)
    return rows


_IPF_ITERS = 3


def _ipf_oracle_sql() -> str:
    parts = ["""
cells AS (
  SELECT CAST(regexp_extract(source, '[0-9]+') AS BIGINT) % 4 AS sg,
         LEAST(n_chars // 1000, 3) AS lb,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM documents GROUP BY 1, 2
),
tot AS (SELECT SUM(n) AS n FROM cells),
w0 AS (SELECT sg, lb, n, n AS w FROM cells)"""]
    prev = "w0"
    for it in range(1, _IPF_ITERS + 1):
        parts.append(f"""
r{it} AS (
  SELECT p.sg, p.lb, p.n,
         ROUND(p.w * ((SELECT n FROM tot) / 4.0)
               / SUM(p.w) OVER (PARTITION BY p.sg), 9) AS w
  FROM {prev} p
),
c{it} AS (
  SELECT sg, lb, n,
         ROUND(w * ((SELECT n FROM tot) / 4.0)
               / SUM(w) OVER (PARTITION BY lb), 9) AS w
  FROM r{it}
)""")
        prev = f"c{it}"
    return ("WITH " + ",".join(parts) + f"""
SELECT CAST(sg AS BIGINT) AS source_group, CAST(lb AS BIGINT) AS length_bucket,
       CAST(n AS BIGINT) AS n_docs,
       ROUND(w, 6) AS raked_weighted_count,
       ROUND(w / n, 6) AS rake_factor
FROM {prev}
""")


@query("q443_raking_ipf", oracle=_ipf_oracle_sql())
def q443_raking_ipf(spark, sf_dir):
    """ITERATIVE PROPORTIONAL FITTING (raking) of the corpus
    (source-group x length-bucket) table to uniform target margins —
    the survey-weighting / data-rebalancing primitive an LLM pipeline
    uses to hit a prescribed source x length mixture without
    resampling (q300's temperature mixture reweights ONE margin; IPF
    satisfies BOTH simultaneously): {_IPF_ITERS} row-scale/column-scale
    sweeps over the 16-cell contingency table, each scaled weight
    snapped to 9dp so the multiplicative walk is engine-exact.

    Scale shape: the only data-sized pass is the contingency count;
    the sweeps run on the cell relation (bounded by the category
    domains), partitioned windows only."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy(
        (F.regexp_extract("source", "[0-9]+", 0).cast("bigint") % 4).alias("sg"),
        F.least(F.expr("n_chars DIV 1000"), F.lit(3)).alias("lb"),
    ).agg(F.count(F.lit(1)).cast("double").alias("n"))
    cells = cells.transform(managed_persist)
    tot = cells.agg(F.sum("n").alias("t"))
    w = cells.select("sg", "lb", "n", F.col("n").alias("w")).crossJoin(
        F.broadcast(tot)
    )
    for _ in range(_IPF_ITERS):
        w = w.withColumn(
            "w",
            F.round(
                F.col("w")
                * (F.col("t") / 4.0)
                / F.sum("w").over(W.partitionBy("sg")),
                9,
            ),
        )
        w = w.withColumn(
            "w",
            F.round(
                F.col("w")
                * (F.col("t") / 4.0)
                / F.sum("w").over(W.partitionBy("lb")),
                9,
            ),
        )
    return w.select(
        F.col("sg").cast("bigint").alias("source_group"),
        F.col("lb").cast("bigint").alias("length_bucket"),
        F.col("n").cast("bigint").alias("n_docs"),
        F.round("w", 6).alias("raked_weighted_count"),
        F.round(F.col("w") / F.col("n"), 6).alias("rake_factor"),
    )


@query(
    "q444_capture_recapture",
    oracle="""
WITH h AS (
  SELECT doc_id,
         (list_reduce(list_transform(
            string_split(substr(md5(CAST(doc_id AS VARCHAR) || ':a'), 1, 8), ''),
            c -> CAST(CASE WHEN ascii(c) >= 97 THEN ascii(c) - 87
                           ELSE ascii(c) - 48 END AS BIGINT)),
            (a, x) -> a * 16 + x) % 2147483647) / 2147483647.0 AS ua,
         (list_reduce(list_transform(
            string_split(substr(md5(CAST(doc_id AS VARCHAR) || ':b'), 1, 8), ''),
            c -> CAST(CASE WHEN ascii(c) >= 97 THEN ascii(c) - 87
                           ELSE ascii(c) - 48 END AS BIGINT)),
            (a, x) -> a * 16 + x) % 2147483647) / 2147483647.0 AS ub
  FROM documents
),
marks AS (
  SELECT doc_id, CASE WHEN ua < 0.6 THEN 1 ELSE 0 END AS in_a,
         CASE WHEN ub < 0.5 THEN 1 ELSE 0 END AS in_b
  FROM h
),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_true,
         CAST(SUM(in_a) AS BIGINT) AS n_a,
         CAST(SUM(in_b) AS BIGINT) AS n_b,
         CAST(SUM(in_a * in_b) AS BIGINT) AS m
  FROM marks
)
SELECT n_true, n_a, n_b, m,
       ROUND((n_a + 1.0) * (n_b + 1.0) / (m + 1.0) - 1.0, 6) AS chapman_n,
       ROUND((n_a + 1.0) * (n_b + 1.0) * (n_a - m) * (n_b - m)
             / ((m + 1.0) * (m + 1.0) * (m + 2.0)), 6) AS chapman_var,
       ROUND(((n_a + 1.0) * (n_b + 1.0) / (m + 1.0) - 1.0 - n_true)
             / n_true, 6) AS rel_err
FROM t
""",
)
def q444_capture_recapture(spark, sf_dir):
    """CAPTURE-RECAPTURE CORPUS-SIZE ESTIMATION (Chapman's
    bias-corrected Lincoln-Petersen — 'how many unique documents exist
    out there, given two overlapping crawls?': the question a crawl
    planner answers before paying for a third pass, and the
    statistical face of the q122 incremental-dedup overlap): two
    deterministic hash-marked 'crawls' (60% and 50% inclusion), the
    overlap m from one integer aggregate, Chapman estimate + variance,
    and the relative error against the known universe — so the
    estimator itself is value-certified, not just computed.

    Scale shape: one scan, three integer sums; the estimate is a
    scalar expression. The crawl marks reuse the q246 portable-md5
    uniform so both engines mark identical docs."""
    from variantcalling_spark.operators.dedup import (
        MERSENNE31,
        portable_string_hash,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def mark(tag, frac):
        return (
            portable_string_hash(
                F.concat(F.col("doc_id").cast("string"), F.lit(":" + tag))
            )
            / F.lit(float(MERSENNE31))
            < frac
        ).cast("int")

    t = docs.select(
        mark("a", 0.6).alias("in_a"), mark("b", 0.5).alias("in_b")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true"),
        F.sum("in_a").cast("bigint").alias("n_a"),
        F.sum("in_b").cast("bigint").alias("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("m"),
    )
    na, nb, m, nt = F.col("n_a"), F.col("n_b"), F.col("m"), F.col("n_true")
    chap = (na + 1.0) * (nb + 1.0) / (m + 1.0) - 1.0
    return t.select(
        "n_true",
        "n_a",
        "n_b",
        "m",
        F.round(chap, 6).alias("chapman_n"),
        F.round(
            (na + 1.0)
            * (nb + 1.0)
            * (na - m)
            * (nb - m)
            / ((m + 1.0) * (m + 1.0) * (m + 2.0)),
            6,
        ).alias("chapman_var"),
        F.round((chap - nt) / nt, 6).alias("rel_err"),
    )


@query(
    "q462_price_elasticity",
    oracle="""
WITH li AS (
  SELECT p.p_type AS category,
         CAST(l.l_extendedprice AS DOUBLE) / l.l_quantity AS unit_price,
         CAST(l.l_quantity AS DOUBLE) AS qty
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
xy AS (
  SELECT category,
         ROUND(ln(unit_price), 10) AS x,
         ROUND(ln(qty), 10) AS y
  FROM li WHERE unit_price > 0 AND qty > 0
),
mom AS (
  SELECT category, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS DECIMAL(20,10))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(20,10))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * x, 12) AS DECIMAL(26,12))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(x * y, 12) AS DECIMAL(26,12))) AS DOUBLE) AS sxy
  FROM xy GROUP BY category
)
SELECT category, n,
       ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS elasticity,
       ROUND(sy / n - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx / n, 6)
         AS log_intercept
FROM mom
""",
)
def q462_price_elasticity(spark, sf_dir):
    """LOG-LOG PRICE ELASTICITY per part category (the demand-curve
    slope d ln(qty)/d ln(price) — the pricing-analytics regression a
    revenue warehouse runs per assortment; a elasticity near −1 is
    unit-elastic, the q168 group-OLS shape pointed at the econ
    question): OLS of ln quantity on ln unit price in closed form from
    10dp-snapped DECIMAL moment sums, per category.

    Scale shape: one broadcast part join + one combinable moment
    aggregate; the regression is a projection over the category
    domain."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    base = li.join(
        F.broadcast(part.select("p_partkey", F.col("p_type").alias("category"))),
        li.l_partkey == F.col("p_partkey"),
    ).select(
        "category",
        (F.col("l_extendedprice").cast("double") / F.col("l_quantity")).alias(
            "unit_price"
        ),
        F.col("l_quantity").cast("double").alias("qty"),
    )
    xy = base.where((F.col("unit_price") > 0) & (F.col("qty") > 0)).select(
        "category",
        F.round(F.log("unit_price"), 10).alias("x"),
        F.round(F.log("qty"), 10).alias("y"),
    )
    x, y = F.col("x"), F.col("y")
    mom = xy.groupBy("category").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(x.cast("decimal(20,10)")).cast("double").alias("sx"),
        F.sum(y.cast("decimal(20,10)")).cast("double").alias("sy"),
        F.sum(F.round(x * x, 12).cast("decimal(26,12)")).cast("double").alias("sxx"),
        F.sum(F.round(x * y, 12).cast("decimal(26,12)")).cast("double").alias("sxy"),
    )
    n = F.col("n")
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / n
    )
    return mom.select(
        "category",
        "n",
        F.round(slope, 6).alias("elasticity"),
        F.round(F.col("sy") / n - slope * F.col("sx") / n, 6).alias(
            "log_intercept"
        ),
    )


@query(
    "q464_abc_classification",
    oracle="""
WITH rev AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DECIMAL(18,4))
           AS revenue
  FROM lineitem GROUP BY l_partkey
),
bk AS (
  SELECT l_partkey, revenue,
         CAST(revenue * 10000 AS BIGINT) AS cents,
         (CAST(revenue * 10000 AS BIGINT)) // 6553600 AS bucket
  FROM rev
),
bsum AS (
  SELECT bucket, CAST(SUM(cents) AS BIGINT) AS bc,
         CAST(COUNT(*) AS BIGINT) AS bn
  FROM bk GROUP BY bucket
),
bpre AS (
  SELECT bucket,
         COALESCE(CAST(SUM(bc) OVER (ORDER BY bucket DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           AS pre
  FROM bsum
),
tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM bk),
ranked AS (
  SELECT k.l_partkey, k.cents,
         p.pre + CAST(SUM(k.cents) OVER (PARTITION BY k.bucket
           ORDER BY k.cents DESC, k.l_partkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS cum_cents
  FROM bk k JOIN bpre p ON p.bucket = k.bucket
),
classed AS (
  SELECT l_partkey, cents, cum_cents,
         CASE WHEN (cum_cents - cents) * 100 < t.t * 80 THEN 'A'
              WHEN (cum_cents - cents) * 100 < t.t * 95 THEN 'B'
              ELSE 'C' END AS abc
  FROM ranked CROSS JOIN tot t
)
SELECT abc,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(cents) AS BIGINT) AS revenue_e4,
       ROUND(SUM(cents) / CAST((SELECT t FROM tot) AS DOUBLE), 6)
         AS revenue_share
FROM classed GROUP BY abc
""",
)
def q464_abc_classification(spark, sf_dir):
    """ABC INVENTORY CLASSIFICATION (the 80/15/5 Pareto partition every
    warehouse runs on its assortment — q195 reports the concentration
    NUMBER, this ASSIGNS the classes, which requires the global
    revenue-ranked cumulative share, i.e. the distributed-cumsum
    problem): per-part discounted revenue in exact cents, descending
    cumulative share via the TWO-LEVEL BUCKET-PREFIX cumsum (bucket
    partial sums -> tiny bucket prefix -> bucket-local windows; the
    class rule uses the PRE-part cumulative, so a part straddling 80%
    stays in A — the standard convention), classes counted with their
    revenue shares.

    Exactness: revenue in DECIMAL -> integer cents; every comparison
    is an integer cross-product (cum*100 < t*80)."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            dec("l_extendedprice") * (1 - dec("l_discount"))
        )
        .cast("decimal(18,4)")
        .alias("revenue")
    )
    # revenue has exactly 4 decimal places, so *10000 is an EXACT
    # integer — no decimal->bigint cast ambiguity (DuckDB rounds,
    # Spark truncates; measured one-unit drifts before this)
    bk = rev.select(
        "l_partkey",
        (F.col("revenue") * 10000).cast("bigint").alias("cents"),
    ).withColumn("bucket", F.expr("cents DIV 6553600"))
    bsum = bk.groupBy("bucket").agg(F.sum("cents").cast("bigint").alias("bc"))
    w_pre = W.orderBy(F.col("bucket").desc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    bpre = bsum.select(
        "bucket",
        F.coalesce(F.sum("bc").over(w_pre), F.lit(0)).cast("bigint").alias("pre"),
    )
    tot = bk.agg(F.sum("cents").cast("bigint").alias("t"))
    w_loc = W.partitionBy("bucket").orderBy(
        F.col("cents").desc(), "l_partkey"
    ).rowsBetween(W.unboundedPreceding, 0)
    ranked = bk.join(F.broadcast(bpre), "bucket").select(
        "l_partkey",
        "cents",
        (F.col("pre") + F.sum("cents").over(w_loc)).cast("bigint").alias(
            "cum_cents"
        ),
    )
    classed = ranked.crossJoin(F.broadcast(tot)).select(
        "cents",
        F.when((F.col("cum_cents") - F.col("cents")) * 100 < F.col("t") * 80, "A")
        .when((F.col("cum_cents") - F.col("cents")) * 100 < F.col("t") * 95, "B")
        .otherwise("C")
        .alias("abc"),
        "t",
    )
    return classed.groupBy("abc").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_parts"),
        F.sum("cents").cast("bigint").alias("revenue_e4"),
        F.round(
            F.sum("cents") / F.max("t").cast("double"), 6
        ).alias("revenue_share"),
    )


_SKEW_KEYS = [
    ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
    ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
    ("orders.o_custkey", "orders", "o_custkey"),
    ("events.user_id", "events", "user_id"),
    ("events.event_type", "events", "event_type"),
]


def _skew_oracle_sql() -> str:
    arms = "\nUNION ALL\n".join(
        f"""SELECT '{label}' AS join_key, n_rows, n_keys, max_key_rows, p50_key_rows
FROM (
  SELECT CAST(SUM(c) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(MAX(c) AS BIGINT) AS max_key_rows,
         CAST(MAX(CASE WHEN rn = CAST(CEIL(nk / 2.0) AS BIGINT) THEN c END)
              AS BIGINT) AS p50_key_rows
  FROM (
    SELECT c, ROW_NUMBER() OVER (ORDER BY c, k) AS rn,
           COUNT(*) OVER () AS nk
    FROM (SELECT CAST({col} AS VARCHAR) AS k, COUNT(*) AS c
          FROM {tbl} GROUP BY 1)
  )
)"""
        for label, tbl, col in _SKEW_KEYS
    )
    return f"""
SELECT join_key, n_rows, n_keys, max_key_rows, p50_key_rows,
       ROUND(max_key_rows / CAST(n_rows AS DOUBLE), 6) AS top_key_share,
       ROUND(max_key_rows / CAST(p50_key_rows AS DOUBLE), 6) AS skew_ratio
FROM ({arms})
"""


@query("q465_join_skew_audit", oracle=_skew_oracle_sql())
def q465_join_skew_audit(spark, sf_dir):
    """JOIN-KEY SKEW AUDIT (the pre-shuffle planning gate THE 100 TB
    target cares about most: a shuffle join on a key whose hottest
    value owns 10% of the rows stalls the whole stage on one task —
    this is the table AQE's skew-join splitting reads implicitly, made
    an explicit certified artifact): per candidate join key the row
    count, distinct keys, hottest-key rows, median-key rows (rank-
    exact over the key-histogram), top-key share, and max/median skew
    ratio.

    Scale shape: per key ONE combinable count aggregate + a median
    window over the key-histogram relation (bounded by distinct
    keys). The arms are independent scans — Catalyst prunes each to
    its one column."""
    from variantcalling_spark.operators.ordered import value_at_rank_bucketed

    out = None
    for label, tbl, col in _SKEW_KEYS:
        t = load_table(spark, sf_dir, tbl)
        # lazy checkpoint: each key's histogram feeds the rank pick and
        # the stats aggregate (and h.count() below materializes it
        # immediately anyway) — cuts the per-arm subtree re-inline
        # (was 126 Exchange nodes; the campaign recipe)
        h = t.groupBy(F.col(col).cast("string").alias("k")).agg(
            F.count(F.lit(1)).alias("c")
        ).transform(lineage_cut)
        # median key-size via the bucketed global-rank operator — a
        # plain ordered window here would single-partition the key
        # histogram (150k+ keys for l_orderkey; the class the r7 plan
        # audit exists to kill). nk is a bounded driver scalar.
        nk = h.count()
        ranks = t.sparkSession.createDataFrame(
            [((nk + 1) // 2,)], "k bigint"
        )
        p50 = value_at_rank_bucketed(
            h, "c", ranks, bucket_width=16.0
        ).select(F.col("value_at_rank").cast("bigint").alias("p50_key_rows"))
        arm = (
            h.agg(
                F.lit(label).alias("join_key"),
                F.sum("c").cast("bigint").alias("n_rows"),
                F.lit(nk).cast("bigint").alias("n_keys"),
                F.max("c").cast("bigint").alias("max_key_rows"),
            )
            .crossJoin(F.broadcast(p50))
        )
        out = arm if out is None else out.unionByName(arm)
    return out.select(
        "*",
        F.round(
            F.col("max_key_rows") / F.col("n_rows").cast("double"), 6
        ).alias("top_key_share"),
        F.round(
            F.col("max_key_rows") / F.col("p50_key_rows").cast("double"), 6
        ).alias("skew_ratio"),
    )


@query(
    "q499_salted_skew_join",
    oracle="""
WITH fact AS (
  SELECT CASE WHEN l_orderkey % 10 < 7 THEN 0
              ELSE CAST(l_orderkey % 97 AS BIGINT) END AS k,
         CAST(ROUND(l_quantity * 100) AS BIGINT) AS qty_c
  FROM lineitem
),
dim AS (
  SELECT DISTINCT k, k * 3 + 1 AS weight FROM fact
)
SELECT f.k,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(f.qty_c * d.weight) AS BIGINT) AS weighted_qty_c
FROM fact f JOIN dim d ON d.k = f.k
GROUP BY f.k
""",
)
def q499_salted_skew_join(spark, sf_dir):
    """SKEW-SALTED EQUI-JOIN as a first-class query (the operator
    tests/test_plans.py pins for output equality, now value-oracled on
    a PLANTED 70%-hot key — the 'one straggler reducer owns the whole
    stage' shape that AQE's runtime split can miss when the skew is
    known in advance): the fact side sprays each key over 8 salts, the
    dim side replicates per salt, so the hot key occupies 8 reducers;
    output is exactly the unsalted inner join (every salt of a key
    carries the full dim row, so salt assignment — including under
    task retry — cannot change the result, which is what the oracle
    proves end-to-end).

    Scale shape: shuffle keys become (k, __salt) — the hot key's rows
    split n_salts ways at the exchange; the dim replication is
    |dim| x n_salts rows (bounded); the post-join aggregate is
    map-side combinable; all sums exact integer cents x weights."""
    from variantcalling_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem")
    fact = li.select(
        F.when(F.col("l_orderkey") % 10 < 7, F.lit(0).cast("bigint"))
        .otherwise((F.col("l_orderkey") % 97).cast("bigint"))
        .alias("k"),
        F.round(F.col("l_quantity") * 100).cast("bigint").alias("qty_c"),
    )
    dim = fact.select("k").distinct().select(
        "k", (F.col("k") * 3 + 1).alias("weight")
    )
    joined = salted_join(fact, dim, ["k"], n_salts=8)
    return joined.groupBy("k").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("qty_c") * F.col("weight")).cast("bigint").alias(
            "weighted_qty_c"
        ),
    )


@query(
    "q518_matthews_correlation",
    oracle="""
WITH cells AS (
  SELECT
    CAST(COUNT(*) FILTER (WHERE l_returnflag = 'N' AND l_linestatus = 'O') AS BIGINT) AS tp,
    CAST(COUNT(*) FILTER (WHERE l_returnflag = 'N' AND l_linestatus <> 'O') AS BIGINT) AS fp,
    CAST(COUNT(*) FILTER (WHERE l_returnflag <> 'N' AND l_linestatus = 'O') AS BIGINT) AS fn,
    CAST(COUNT(*) FILTER (WHERE l_returnflag <> 'N' AND l_linestatus <> 'O') AS BIGINT) AS tn
  FROM lineitem
)
SELECT tp, fp, fn, tn,
       ROUND((CAST(tp AS DOUBLE) * tn - CAST(fp AS DOUBLE) * fn)
             / sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE)
                    * CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 6)
         AS mcc,
       ROUND(CAST(tp + tn AS DOUBLE) / (tp + fp + fn + tn), 6) AS accuracy
FROM cells
""",
)
def q518_matthews_correlation(spark, sf_dir):
    """MATTHEWS CORRELATION COEFFICIENT over the full 2x2 confusion
    (predicted = returnflag N, actual = linestatus O) — the
    class-imbalance-robust single-number score the q09 P/R/F1 ledger
    and q203's kappa lack: MCC uses ALL FOUR cells (including TN,
    which precision/recall ignore), so a degenerate
    predict-the-majority classifier scores ~0 instead of inheriting
    the base rate. Chicco & Jurman 2020's recommendation for binary
    eval ledgers.

    Exactness: the four cells are integer counts; the MCC expression
    is written identically on both engines (fixed multiply order,
    doubles — the cell products exceed bigint range at corpus scale,
    and IEEE doubles evaluate bit-identically for the same expression
    shape), rounded at 6 dp.

    Scale shape: one conditional-aggregate scan — four
    map-side-combinable counts, nothing else."""
    cells = load_table(spark, sf_dir, "lineitem").agg(
        F.sum(
            F.when((F.col("l_returnflag") == "N") & (F.col("l_linestatus") == "O"), 1).otherwise(0)
        ).cast("bigint").alias("tp"),
        F.sum(
            F.when((F.col("l_returnflag") == "N") & (F.col("l_linestatus") != "O"), 1).otherwise(0)
        ).cast("bigint").alias("fp"),
        F.sum(
            F.when((F.col("l_returnflag") != "N") & (F.col("l_linestatus") == "O"), 1).otherwise(0)
        ).cast("bigint").alias("fn"),
        F.sum(
            F.when((F.col("l_returnflag") != "N") & (F.col("l_linestatus") != "O"), 1).otherwise(0)
        ).cast("bigint").alias("tn"),
    )
    return cells.select(
        "tp",
        "fp",
        "fn",
        "tn",
        F.round(
            (F.col("tp").cast("double") * F.col("tn") - F.col("fp").cast("double") * F.col("fn"))
            / F.sqrt(
                (F.col("tp") + F.col("fp")).cast("double")
                * (F.col("tp") + F.col("fn")).cast("double")
                * (F.col("tn") + F.col("fp")).cast("double")
                * (F.col("tn") + F.col("fn")).cast("double")
            ),
            6,
        ).alias("mcc"),
        F.round(
            (F.col("tp") + F.col("tn")).cast("double")
            / (F.col("tp") + F.col("fp") + F.col("fn") + F.col("tn")),
            6,
        ).alias("accuracy"),
    )
