"""Genomic scalar functions + stateful kernels as checkable queries
(SURVEY.md §2.5 kernels, §2.8 scalar library).

The driver tables carry no genomic columns, so genomic shapes are derived
deterministically (same derivation on both engines): DNA sequences from
document text via character translation, gVCF-like records from events.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from variantcalling_spark.functions.dna import canonical_trinuc, hmer_run_length, revcomp
from variantcalling_spark.functions.genotypes import (
    classify_genotype_error,
    genotype_ordering,
    pl_compress3,
)
from variantcalling_spark.functions.math import phred, unphred
from variantcalling_spark.operators.kernels import (
    compress_gvcf_blocks,
    overlap_buffer_filter,
)
from variantcalling_spark.queries import query
from variantcalling_spark.queries._helpers import cnt, managed_persist
from variantcalling_spark.queries.intervals import events_points
from variantcalling_spark.sources import load_table

# a-z + space -> ACGT cyclic (same 27-char translate on both engines)
DNA_FROM = "abcdefghijklmnopqrstuvwxyz "
DNA_TO = "ACGTACGTACGTACGTACGTACGTACG"


def docs_as_dna(spark, sf_dir):
    """documents.text -> deterministic DNA-like sequences (both engines)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.translate(F.substring("text", 1, 24), DNA_FROM, DNA_TO).alias("seq"),
    )


SQL_DOCS_DNA = f"""
  SELECT doc_id,
         translate(substr(text, 1, 24), '{DNA_FROM}', '{DNA_TO}') AS seq
  FROM documents
"""


@query(
    "q50_phred_math",
    oracle="""
SELECT event_id,
       ROUND(-10 * log10((value + 1) / 1000.0), 6) + 0.0 AS phred_q,
       ROUND(POW(10.0, -((value + 1) / 10.0)), 9) AS unphred_p
FROM events
""",
)
def q50_phred_math(spark, sf_dir):
    """Phred/unphred scalar math (`ugvc/utils/math_utils.py:31-101`,
    pinned `test/unit/utils/test_math_utils.py:10-23`) as codegen'd
    log10/pow expressions over 10k rows."""
    ev = events_points(spark, sf_dir)
    p = (F.col("value") + 1) / 1000.0
    return ev.select(
        "event_id",
        # + 0.0 on both engines: value=999 makes p exactly 1, and
        # DuckDB's ROUND keeps the -0.0 from -10*log10(1) (r7 verdict)
        (F.round(phred(p), 6) + F.lit(0.0)).alias("phred_q"),
        F.round(unphred(F.col("value") + 1), 9).alias("unphred_p"),
    )


@query(
    "q51_dna_scalars",
    oracle=f"""
WITH d AS ({SQL_DOCS_DNA})
SELECT doc_id, seq,
       translate(reverse(seq), 'ACGTacgt', 'TGCAtgca') AS rc,
       CAST(length(seq) - length(ltrim(seq, substr(seq, 1, 1))) AS INT) AS hmer_len
FROM d
""",
)
def q51_dna_scalars(spark, sf_dir):
    """Reverse-complement + homopolymer run length as string expressions
    (`revcomp` use `run_no_gt_report.py:165`; hmer detection
    `calibrate_bridging_snvs.py:9-66`, `collect_hpol_table.py:99-104`)."""
    d = docs_as_dna(spark, sf_dir)
    return d.select(
        "doc_id",
        "seq",
        revcomp(F.col("seq")).alias("rc"),
        hmer_run_length(F.col("seq")).alias("hmer_len"),
    )


@query(
    "q55_trinuc_spectrum",
    oracle=f"""
WITH d AS ({SQL_DOCS_DNA}),
m AS (
  SELECT substr(seq, 5, 3) AS motif, substr(seq, 9, 1) AS alt FROM d
  WHERE length(seq) >= 9
),
canon AS (
  SELECT CASE WHEN substr(motif, 2, 1) IN ('A', 'G')
              THEN translate(reverse(motif), 'ACGTacgt', 'TGCAtgca') ELSE motif END AS motif,
         CASE WHEN substr(motif, 2, 1) IN ('A', 'G')
              THEN translate(alt, 'ACGTacgt', 'TGCAtgca') ELSE alt END AS alt
  FROM m
)
SELECT motif, alt, COUNT(*) AS n
FROM canon GROUP BY motif, alt
""",
)
def q55_trinuc_spectrum(spark, sf_dir):
    """Trinucleotide mutation-spectrum aggregation with reverse-complement
    canonicalization to pyrimidine-centered classes (`snp_statistics`,
    `run_no_gt_report.py:90-172`, pinned `test_run_no_gt_report.py:
    100-110`): string exprs + groupBy count, no UDF."""
    d = docs_as_dna(spark, sf_dir).where(F.length("seq") >= 9)
    m = d.select(
        F.substring("seq", 5, 3).alias("motif"), F.substring("seq", 9, 1).alias("alt")
    )
    canon_motif, canon_alt = canonical_trinuc(F.col("motif"), F.col("alt"))
    return (
        m.select(canon_motif.alias("motif"), canon_alt.alias("alt"))
        .groupBy("motif", "alt")
        .agg(cnt("n"))
    )


@query(
    "q56_pl_compress3",
    oracle="""
WITH pls AS (
  SELECT o_orderkey,
         CAST(o_orderkey % 97 AS INT) AS pl0,
         CAST(o_custkey % 89 AS INT) AS pl1,
         CAST(o_orderkey % 83 AS INT) AS pl2,
         CAST(o_custkey % 79 AS INT) AS pl3,
         CAST(o_orderkey % 73 AS INT) AS pl4,
         CAST(o_custkey % 71 AS INT) AS pl5
  FROM orders
)
SELECT o_orderkey,
       pl0 AS c_rr,
       CAST(LEAST(pl1, pl3) AS INTEGER) AS c_ra,
       CAST(LEAST(pl2, pl4, pl5) AS INTEGER) AS c_aa
FROM pls
""",
)
def q56_pl_compress3(spark, sf_dir):
    """PL 3-value compression of a triallelic layout.

    `get_compressed_pl_into_3_values` (`compress_gvcf.py:28-60`, goldens
    `test_compress_gvcf.py:13-22`): index 0 = (0,0); het-ref genotypes
    (0,k) at k(k+1)/2 -> {1,3}; non-ref pairs -> {2,4,5}. The Spark side
    uses the generic higher-order-function implementation over an
    ArrayType column; the oracle spells out the n=3 case with LEAST.
    """
    o = load_table(spark, sf_dir, "orders")
    pl = F.array(
        (F.col("o_orderkey") % 97).cast("int"),
        (F.col("o_custkey") % 89).cast("int"),
        (F.col("o_orderkey") % 83).cast("int"),
        (F.col("o_custkey") % 79).cast("int"),
        (F.col("o_orderkey") % 73).cast("int"),
        (F.col("o_custkey") % 71).cast("int"),
    )
    compressed = pl_compress3(pl, F.lit(3))
    return o.select(
        "o_orderkey",
        F.element_at(compressed, 1).alias("c_rr"),
        F.element_at(compressed, 2).alias("c_ra"),
        F.element_at(compressed, 3).alias("c_aa"),
    )


@query(
    "q57_genotype_ordering",
    oracle="""
SELECT n.n AS n_alleles,
       CAST(k.k * (k.k + 1) / 2 + j.j AS INT) AS pl_index,
       j.j AS allele_1,
       k.k AS allele_2
FROM generate_series(2, 8) n(n)
JOIN generate_series(0, 7) k(k) ON k.k < n.n
JOIN generate_series(0, 7) j(j) ON j.j <= k.k
""",
)
def q57_genotype_ordering(spark, sf_dir):
    """VCF diploid genotype-ordering lookup table: genotype (j,k) at PL
    index k(k+1)/2+j (`correct_genotypes_by_imputation.py:227`, pinned
    `test_correct_genotypes_by_imputation.py:8-44`) — generated once and
    joined, never recomputed per record."""
    return genotype_ordering(spark, max_alleles=8)


@query(
    "q58_genotype_error_classify",
    oracle="""
WITH g AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_orderkey % 2 AS INT) AS t1,
         CAST(l_partkey % 3 AS INT) AS t2,
         CAST(l_suppkey % 2 AS INT) AS c1,
         CAST(l_quantity AS INT) % 3 AS c2
  FROM lineitem
),
cls AS (
  SELECT CASE
    WHEN LEAST(t1, t2) = LEAST(c1, c2) AND GREATEST(t1, t2) = GREATEST(c1, c2) THEN 'TP'
    WHEN c1 <> t1 AND c1 <> t2 AND c2 <> t1 AND c2 <> t2 THEN 'NOISE'
    WHEN t1 = t2 AND c1 <> c2 THEN 'HOM_TO_HET'
    WHEN t1 <> t2 AND c1 = c2 THEN 'HET_TO_HOM'
    ELSE 'WRONG_ALLELE' END AS error_type
  FROM g
)
SELECT error_type, COUNT(*) AS n FROM cls GROUP BY error_type
""",
)
def q58_genotype_error_classify(spark, sf_dir):
    """Genotype-error taxonomy (NOISE / HOM_TO_HET / HET_TO_HOM /
    WRONG_ALLELE) over synthetic diploid pairs — the set-algebra
    classifier `report_data_loader.py:106-126` + its aggregate
    `report_utils.py:459-463` as pure CASE/LEAST expressions."""
    li = load_table(spark, sf_dir, "lineitem")
    g = li.select(
        (F.col("l_orderkey") % 2).cast("int").alias("t1"),
        (F.col("l_partkey") % 3).cast("int").alias("t2"),
        (F.col("l_suppkey") % 2).cast("int").alias("c1"),
        (F.col("l_quantity").cast("int") % 3).alias("c2"),
    )
    cls = g.select(
        classify_genotype_error(
            F.col("t1"), F.col("t2"), F.col("c1"), F.col("c2")
        ).alias("error_type")
    )
    return cls.groupBy("error_type").agg(cnt("n"))


@query(
    "q52_gvcf_compress",
    oracle="""
SELECT * FROM (VALUES
  ('c0', 358, CAST(750 AS BIGINT), CAST(69 AS BIGINT), CAST(1000 AS BIGINT), CAST(75999 AS BIGINT), CAST(12775 AS BIGINT)),
  ('c1', 357, CAST(750 AS BIGINT), CAST(68 AS BIGINT), CAST(1000 AS BIGINT), CAST(75999 AS BIGINT), CAST(13332 AS BIGINT)),
  ('c2', 358, CAST(750 AS BIGINT), CAST(68 AS BIGINT), CAST(1000 AS BIGINT), CAST(75999 AS BIGINT), CAST(13183 AS BIGINT)),
  ('c3', 358, CAST(750 AS BIGINT), CAST(68 AS BIGINT), CAST(1000 AS BIGINT), CAST(75999 AS BIGINT), CAST(12773 AS BIGINT))
) AS t(chrom, n_blocks, n_input_records, n_variant, first_pos, last_stop, gq_total)
""",
)
def q52_gvcf_compress(spark, sf_dir):
    """gVCF block merge — the path-dependent sessionization kernel.

    `compress_gvcf.py:81-216` (pinned 4438->1184,
    `test_compress_gvcf.py:5-11`): merge RefCall runs while the running
    GQ spread stays under threshold, breaking on PASS/low-GQ records.
    Not SQL-expressible (break condition depends on running state) ->
    `applyInPandas` per contig (exact semantics pinned by
    tests/test_kernels.py).

    The input is a fixed deterministic synthetic gVCF (3000 records, 4
    contigs, GQ derivation that exercises merge runs, spread breaks, and
    low-GQ flushes; 750 records -> ~358 blocks per contig). The oracle is
    the literal expected aggregate, computed by an independent sequential
    pure-Python reference of the documented semantics — so the driver's
    hash check verifies the distributed Arrow kernel (partitioning, ties,
    per-contig ordering) against a known-good sequential scan. Real-data
    invariants stay pinned in tests/test_kernels.py.
    """
    n = spark.range(3000).select(F.col("id").cast("int").alias("i"))
    j = F.floor(F.col("i") / 4)
    gq = F.when(j % 31 == 0, 15).otherwise(
        (24 + 12 * ((F.floor(j / 25) % 3)) + (j * 5) % 7).cast("int")
    )
    g = n.select(
        F.concat(F.lit("c"), (F.col("i") % 4).cast("string")).alias("chrom"),
        (1000 + j * 100).cast("long").alias("pos"),
        (1000 + j * 100 + 99).cast("long").alias("stop"),
        F.when(F.col("i") % 11 == 0, "PASS")
        .when(F.col("i") % 7 == 3, "LowQual")
        .otherwise("RefCall")
        .alias("filter"),
        gq.cast("int").alias("gq"),
        F.when(F.col("i") % 13 == 0, F.lit(None).cast("int"))
        .otherwise((F.col("i") % 40 + 10).cast("int"))
        .alias("min_dp"),
        (F.col("i") % 50 + 12).cast("int").alias("dp"),
        F.array(
            (F.col("i") * 3 % 30).cast("int"),
            (F.col("i") * 5 % 45).cast("int"),
            (F.col("i") * 7 % 60).cast("int"),
        ).alias("pl"),
    )
    blocks = compress_gvcf_blocks(g, refcall_gq_threshold=22, merge_gq_threshold=10)
    return (
        blocks.groupBy("chrom")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_blocks"),
            F.sum("n_merged").alias("n_input_records"),
            F.count(F.when(F.col("is_variant"), 1)).alias("n_variant"),
            F.min("pos").alias("first_pos"),
            F.max("stop").alias("last_stop"),
            F.sum(F.col("gq").cast("bigint")).alias("gq_total"),
        )
        .orderBy("chrom")
    )


@query(
    "q53_overlap_cleanup",
    oracle="""
WITH r AS (
  SELECT 'c' || CAST(user_id % 4 AS VARCHAR) AS chrom,
         epoch_us(ts) AS pos,
         epoch_us(ts) + CAST(ROUND(value * 1000000) AS BIGINT) AS stop,
         event_type = 'purchase' AND value > 50 AS is_deletion,
         event_type = 'view' AS is_null_gt
  FROM events
),
flagged AS (
  SELECT chrom, is_null_gt,
         NOT (is_null_gt AND EXISTS (
           SELECT 1 FROM r d
           WHERE d.chrom = r.chrom AND d.is_deletion
             AND d.pos < r.pos AND r.pos <= d.stop
         )) AS kept
  FROM r
)
SELECT chrom,
       COUNT(*) AS n_total,
       COUNT(*) FILTER (WHERE NOT kept) AS n_removed
FROM flagged GROUP BY chrom
""",
)
def q53_overlap_cleanup(spark, sf_dir):
    """Overlap-buffer filter: drop null-GT records inside earlier deletion
    spans (`cleanup_gvcf_before_calling.py:11-86`, pinned 93620/17
    `test_cleanup_gvcf_before_joint.py:8-13`).

    Spark side runs the sequential `applyInPandas` kernel (running
    deletion extent per contig); the oracle states the equivalent
    declarative form (EXISTS over strictly-earlier deletions) — the two
    agreeing is itself the correctness argument for the kernel.
    """
    ev = events_points(spark, sf_dir)
    r = ev.select(
        F.concat(F.lit("c"), (F.col("user_id") % 4).cast("string")).alias("chrom"),
        F.col("ts_us").alias("pos"),
        (F.col("ts_us") + F.round(F.col("value") * 1000000).cast("bigint")).alias("stop"),
        ((F.col("event_type") == "purchase") & (F.col("value") > 50)).alias("is_deletion"),
        (F.col("event_type") == "view").alias("is_null_gt"),
    )
    flagged = overlap_buffer_filter(r)
    return flagged.groupBy("chrom").agg(
        cnt("n_total"),
        F.count(F.when(~F.col("kept"), 1)).alias("n_removed"),
    )


# Shared call/truth derivation for the penalty-flavor metrics (the q27
# shape: position key k, small-domain allele).
SQL_CALLS_TRUTH = """
calls AS (
  SELECT l_orderkey AS k, CAST(MIN(l_partkey) % 4 AS INT) AS allele
  FROM lineitem WHERE l_quantity > 10 GROUP BY l_orderkey
),
truth AS (
  SELECT o_orderkey AS k, CAST(o_custkey % 4 AS INT) AS allele
  FROM orders WHERE o_totalprice > 50000
),
j AS (
  SELECT c.k AS ck, t.k AS tk, c.allele AS call_allele, t.allele AS truth_allele
  FROM calls c FULL OUTER JOIN truth t ON c.k = t.k
),
counts AS (
  SELECT
    COUNT(*) FILTER (WHERE call_allele = truth_allele) AS tp,
    COUNT(*) FILTER (WHERE call_allele IS NOT NULL AND truth_allele IS NOT NULL
                       AND call_allele <> truth_allele) AS ae,
    COUNT(*) FILTER (WHERE truth_allele IS NULL) AS fp_clean,
    COUNT(*) FILTER (WHERE call_allele IS NULL) AS fn_clean
  FROM j
)
"""


@query(
    "q91_vcfeval_penalty_flavors",
    oracle=f"""
WITH {SQL_CALLS_TRUTH},
m AS (
  SELECT p.penalty,
         CAST(tp AS DOUBLE)
           + CASE WHEN p.penalty = -1 THEN CAST(ae AS DOUBLE) ELSE 0.0 END AS tp,
         CAST(fp_clean AS DOUBLE)
           + CASE WHEN p.penalty = 2 THEN CAST(ae AS DOUBLE)
                  WHEN p.penalty = 1 THEN CAST(ae AS DOUBLE) / 2.0
                  ELSE 0.0 END AS fp,
         CAST(fn_clean AS DOUBLE)
           + CASE WHEN p.penalty = 2 THEN CAST(ae AS DOUBLE)
                  WHEN p.penalty = 1 THEN CAST(ae AS DOUBLE) / 2.0
                  ELSE 0.0 END AS fn
  FROM counts CROSS JOIN (SELECT UNNEST([2, 1, 0, -1]) AS penalty) p
)
SELECT penalty, tp, fp, fn,
       ROUND(100.0 * tp / (tp + fp), 4) AS precision,
       ROUND(100.0 * tp / (tp + fn), 4) AS recall,
       ROUND(2.0 * (100.0 * tp / (tp + fp)) * (100.0 * tp / (tp + fn))
             / ((100.0 * tp / (tp + fp)) + (100.0 * tp / (tp + fn))), 4) AS f1
FROM m
""",
)
def q91_vcfeval_penalty_flavors(spark, sf_dir):
    """Penalty-parameterized concordance metrics (`vcfeval_flavors.py:
    56-66,146-166`, pinned 4-mode matrix `test/system/test_vcfeval_
    flavors.py:10-50`): an allele/genotype error is an FP whose position
    exists in truth (and the matching FN) — penalty 2 counts it twice
    (plain vcfeval), 1 half-cancels it, 0 cancels it, -1 additionally
    rewards a TP. One classify join, one aggregate row, four metric rows
    exploded from literals — the whole flavor sweep is a single pass
    regardless of callset size (the reference re-runs bcftools per mode).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    calls = (
        li.where(F.col("l_quantity") > 10)
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg((F.min("l_partkey") % 4).cast("int").alias("call_allele"))
    )
    truth = o.where(F.col("o_totalprice") > 50000).select(
        F.col("o_orderkey").alias("tk"),
        (F.col("o_custkey") % 4).cast("int").alias("truth_allele"),
    )
    j = calls.join(truth, calls["k"] == truth["tk"], "full")
    counts = j.agg(
        F.count(F.when(F.col("call_allele") == F.col("truth_allele"), 1)).alias("tp"),
        F.count(
            F.when(
                F.col("call_allele").isNotNull()
                & F.col("truth_allele").isNotNull()
                & (F.col("call_allele") != F.col("truth_allele")),
                1,
            )
        ).alias("ae"),
        F.count(F.when(F.col("truth_allele").isNull(), 1)).alias("fp_clean"),
        F.count(F.when(F.col("call_allele").isNull(), 1)).alias("fn_clean"),
    )
    tp, ae = F.col("tp").cast("double"), F.col("ae").cast("double")
    fp_c, fn_c = F.col("fp_clean").cast("double"), F.col("fn_clean").cast("double")

    def mode(p):
        extra = (
            ae if p == 2 else (ae / F.lit(2.0) if p == 1 else F.lit(0.0))
        )
        return F.struct(
            F.lit(p).alias("penalty"),
            (tp + (ae if p == -1 else F.lit(0.0))).alias("tp"),
            (fp_c + extra).alias("fp"),
            (fn_c + extra).alias("fn"),
        )

    m = counts.select(
        F.explode(F.array(*[mode(p) for p in (2, 1, 0, -1)])).alias("m")
    ).select("m.penalty", "m.tp", "m.fp", "m.fn")
    pr = F.lit(100.0) * F.col("tp") / (F.col("tp") + F.col("fp"))
    rc = F.lit(100.0) * F.col("tp") / (F.col("tp") + F.col("fn"))
    return m.select(
        "penalty",
        "tp",
        "fp",
        "fn",
        F.round(pr, 4).alias("precision"),
        F.round(rc, 4).alias("recall"),
        F.round(F.lit(2.0) * pr * rc / (pr + rc), 4).alias("f1"),
    )


@query(
    "q92_split_multiallelic",
    oracle="""
WITH v AS (
  SELECT o_orderkey AS k,
         CAST(1 + o_orderkey % 3 AS INT) AS n_alt,
         [CAST((o_orderkey * 7 + j * 13) % 100 AS INT)
          for j in generate_series(0, ((1 + o_orderkey % 3) + 1) * ((1 + o_orderkey % 3) + 2) // 2 - 1)] AS pl,
         [CAST((o_custkey + j * 11) % 50 AS INT)
          for j in generate_series(0, 1 + o_orderkey % 3)] AS ad
  FROM orders
),
split AS (
  SELECT k, n_alt, CAST(i AS INT) AS alt_index,
         pl[1] AS pl0,
         pl[i * (i + 1) // 2 + 1] AS pl1,
         pl[i * (i + 1) // 2 + i + 1] AS pl2,
         ad[1] AS ad_ref,
         ad[i + 1] AS ad_alt
  FROM v, UNNEST(generate_series(1, n_alt)) AS t(i)
)
SELECT k, n_alt, alt_index, pl0, pl1, pl2, ad_ref, ad_alt,
       CAST(CASE WHEN pl0 <= pl1 AND pl0 <= pl2 THEN 0
                 WHEN pl1 <= pl2 THEN 1 ELSE 2 END AS INT) AS gt_index
FROM split
""",
)
def q92_split_multiallelic(spark, sf_dir):
    """Split a multiallelic record into one biallelic row per alt allele
    (the inverse of `bcftools norm -m` collapse used at
    `correct_genotypes_by_imputation.py:425-432`; golden split frames
    `test/resources/unit/filtering/expected_result_split_multiallelic.
    pkl`). For alt i the diploid PL layout (`genotype_ordering`, pinned
    `test/unit/pipelines/test_correct_genotypes_by_imputation.py:8-44`)
    places (0/0, 0/i, i/i) at indices (0, i(i+1)/2, i(i+1)/2 + i); AD
    keeps (ref, alt_i). posexplode + array indexing, no UDF — splitting
    parallelizes per record at any scale.
    """
    o = load_table(spark, sf_dir, "orders")
    n_alt = (F.lit(1) + F.col("o_orderkey") % 3).cast("int")
    n_gt = ((n_alt + 1) * (n_alt + 2) / 2).cast("int")
    v = o.select(
        F.col("o_orderkey").alias("k"),
        n_alt.alias("n_alt"),
        F.transform(
            F.sequence(F.lit(0), n_gt - 1),
            lambda j: ((F.col("k") * 7 + j * 13) % 100).cast("int"),
        ).alias("pl"),
        F.transform(
            F.sequence(F.lit(0), n_alt),
            lambda j: ((F.col("o_custkey") + j * 11) % 50).cast("int"),
        ).alias("ad"),
    )
    # NB: F.col("k") inside the lambda binds to the select's output column
    # (same trick documented in queries/similarity.py::neardup_corpus)
    s = v.select(
        "k",
        "n_alt",
        F.explode(F.sequence(F.lit(1), F.col("n_alt"))).alias("i"),
        "pl",
        "ad",
    )
    i = F.col("i")
    off = (i * (i + 1) / 2).cast("int")
    split = s.select(
        "k",
        "n_alt",
        i.cast("int").alias("alt_index"),
        F.element_at("pl", 1).alias("pl0"),
        F.element_at("pl", off + 1).alias("pl1"),
        F.element_at("pl", (off + i + 1).cast("int")).alias("pl2"),
        F.element_at("ad", 1).alias("ad_ref"),
        F.element_at("ad", (i + 1).cast("int")).alias("ad_alt"),
    )
    return split.select(
        "*",
        F.when(
            (F.col("pl0") <= F.col("pl1")) & (F.col("pl0") <= F.col("pl2")), 0
        )
        .when(F.col("pl1") <= F.col("pl2"), 1)
        .otherwise(2)
        .cast("int")
        .alias("gt_index"),
    )


@query(
    "q95_collapse_multiallelic",
    oracle="""
WITH split AS (
  SELECT o_orderkey AS k,
         CAST(1 + o_orderkey % 3 AS INT) AS n_alt,
         CAST(i AS INT) AS alt_index,
         'ALT' || CAST(i AS VARCHAR) AS alt,
         CAST((o_custkey + 0 * 11) % 50 AS INT) AS ad_ref,
         CAST((o_custkey + i * 11) % 50 AS INT) AS ad_alt
  FROM orders, UNNEST(generate_series(1, 1 + o_orderkey % 3)) t(i)
)
SELECT k,
       CAST(COUNT(*) AS INT) AS n_alt,
       array_to_string(list(alt ORDER BY alt_index), ',') AS alts,
       MIN(ad_ref) AS ad_ref,
       array_to_string(list(CAST(ad_alt AS VARCHAR) ORDER BY alt_index), ',') AS ad_alts,
       CAST(MIN(ad_ref) + SUM(ad_alt) AS BIGINT) AS dp
FROM split GROUP BY k
""",
)
def q95_collapse_multiallelic(spark, sf_dir):
    """Collapse biallelic rows back into one multiallelic record per
    site (`bcftools norm -m+` as used at `correct_genotypes_by_
    imputation.py:425-432`): alts gathered in allele order, shared
    ref-depth kept once, per-alt depths as an array, DP recomputed.
    The same synthetic split rows as q92, so q92 ∘ q95 is a round-trip.
    One groupBy on the site key; allele order restored with
    sort_array(collect_list(struct(idx, ...))) — deterministic under
    any partitioning. The gathered arrays are emitted comma-joined
    (array_join / array_to_string on both sides): same values, but
    hashable rows for the driver's order-insensitive canonicalizer."""
    o = load_table(spark, sf_dir, "orders")
    n_alt = (F.lit(1) + F.col("o_orderkey") % 3).cast("int")
    split = o.select(
        F.col("o_orderkey").alias("k"),
        F.explode(F.sequence(F.lit(1), n_alt)).alias("i"),
        F.col("o_custkey"),
    ).select(
        "k",
        F.col("i").cast("int").alias("alt_index"),
        F.concat(F.lit("ALT"), F.col("i").cast("string")).alias("alt"),
        ((F.col("o_custkey") + 0 * 11) % 50).cast("int").alias("ad_ref"),
        ((F.col("o_custkey") + F.col("i") * 11) % 50).cast("int").alias("ad_alt"),
    )
    g = split.groupBy("k").agg(
        F.count(F.lit(1)).cast("int").alias("n_alt"),
        F.sort_array(F.collect_list(F.struct("alt_index", "alt"))).alias("sa"),
        F.min("ad_ref").alias("ad_ref"),
        F.sort_array(F.collect_list(F.struct("alt_index", "ad_alt"))).alias("sd"),
        (F.min("ad_ref") + F.sum("ad_alt")).cast("bigint").alias("dp"),
    )
    return g.select(
        "k",
        "n_alt",
        F.array_join(F.col("sa.alt"), ",").alias("alts"),
        "ad_ref",
        F.array_join(F.col("sd.ad_alt").cast("array<string>"), ",").alias("ad_alts"),
        "dp",
    )


@query(
    "q47_score_calibration",
    oracle="""
WITH scored AS (
  SELECT ROUND(LEAST(GREATEST((l_orderkey % 101) / 100.0, 0.0), 1.0), 2) AS score,
         CASE WHEN (l_partkey + l_orderkey) % 3 = 0 THEN 1 ELSE 0 END AS is_tp
  FROM lineitem
),
b AS (
  SELECT CAST(FLOOR(score * 10) AS INT) AS bin, is_tp FROM scored
)
SELECT CASE WHEN bin > 9 THEN 9 ELSE bin END AS bin,
       COUNT(*) AS n,
       CAST(SUM(is_tp) AS BIGINT) AS n_tp,
       ROUND(SUM(is_tp) / CAST(COUNT(*) AS DOUBLE), 6) AS observed_rate
FROM b GROUP BY 1
""",
)
def q47_score_calibration(spark, sf_dir):
    """Score-calibration (reliability) table: predicted-score deciles vs
    observed TP fraction — the tree_score calibration check behind the
    filtering-model reports (`report_utils.py:435-446`, model scoring
    `docs/filter_variants_pipeline.md`). One conditional aggregate per
    bin; at callset scale this is a single map-side-combinable pass."""
    li = load_table(spark, sf_dir, "lineitem")
    score = F.round(
        F.least(F.greatest((F.col("l_orderkey") % 101) / 100.0, F.lit(0.0)), F.lit(1.0)), 2
    )
    is_tp = F.when((F.col("l_partkey") + F.col("l_orderkey")) % 3 == 0, 1).otherwise(0)
    b = li.select(
        F.floor(score * 10).cast("int").alias("bin"), is_tp.alias("is_tp")
    ).withColumn("bin", F.when(F.col("bin") > 9, 9).otherwise(F.col("bin")))
    return b.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("is_tp").cast("bigint").alias("n_tp"),
        F.round(F.sum("is_tp") / F.count(F.lit(1)).cast("double"), 6).alias(
            "observed_rate"
        ),
    )


@query(
    "q48_cumulative_coverage",
    oracle="""
WITH depth AS (
  -- FLOOR before the int cast: DuckDB rounds double->int, Spark truncates
  SELECT CAST(FLOOR(value) AS INT) % 60 AS d FROM events
),
hist AS (SELECT d, COUNT(*) AS n FROM depth GROUP BY d),
tot AS (SELECT SUM(n) AS t FROM hist)
SELECT d AS depth,
       CAST(SUM(n) OVER (ORDER BY d DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_at_least,
       ROUND(SUM(n) OVER (ORDER BY d DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             / CAST(tot.t AS DOUBLE), 6) AS frac_at_least
FROM hist CROSS JOIN tot
""",
)
def q48_cumulative_coverage(spark, sf_dir):
    """Cumulative coverage curve: fraction of positions with depth >= d
    (the 'genome fraction at 10x/20x/30x' QC metric, companion to the
    histogram/percentile outputs of `coverage_analysis.py:491-534`).
    Computed from the depth HISTOGRAM — the window runs over ≤ max-depth
    rows regardless of genome size, so the curve costs one small-table
    scan after the one-pass histogram aggregate."""
    from pyspark.sql import Window as W

    ev = events_points(spark, sf_dir)
    depth = ev.select((F.floor("value").cast("int") % 60).alias("d"))
    hist = depth.groupBy("d").agg(F.count(F.lit(1)).alias("n"))
    tot = hist.agg(F.sum("n").alias("t"))
    w = W.orderBy(F.desc("d")).rowsBetween(W.unboundedPreceding, 0)
    return (
        hist.crossJoin(F.broadcast(tot))
        .select(
            F.col("d").alias("depth"),
            F.sum("n").over(w).cast("bigint").alias("n_at_least"),
            F.round(
                F.sum("n").over(w) / F.col("t").cast("double"), 6
            ).alias("frac_at_least"),
        )
    )


@query(
    "q49_titv_ratio",
    oracle=f"""
WITH d AS ({SQL_DOCS_DNA}),
snp AS (
  SELECT substr(seq, 5, 1) AS ref, substr(seq, 9, 1) AS alt,
         CAST(doc_id % 4 AS INT) AS qual_bin
  FROM d WHERE length(seq) >= 9 AND substr(seq, 5, 1) <> substr(seq, 9, 1)
),
cls AS (
  SELECT qual_bin,
         CASE WHEN (ref = 'A' AND alt = 'G') OR (ref = 'G' AND alt = 'A')
                OR (ref = 'C' AND alt = 'T') OR (ref = 'T' AND alt = 'C')
              THEN 1 ELSE 0 END AS is_ti
  FROM snp
)
SELECT qual_bin,
       CAST(SUM(is_ti) AS BIGINT) AS n_ti,
       CAST(SUM(1 - is_ti) AS BIGINT) AS n_tv,
       ROUND(CASE WHEN SUM(1 - is_ti) = 0 THEN 0.0
                  ELSE SUM(is_ti) / CAST(SUM(1 - is_ti) AS DOUBLE) END, 6) AS titv
FROM cls GROUP BY qual_bin
""",
)
def q49_titv_ratio(spark, sf_dir):
    """Transition/transversion ratio per quality bin — the canonical VCF
    callset QC statistic (expected ~2.0-2.1 genome-wide; deviations flag
    artifact-heavy bins; the variant-type stratifications of
    `report_utils.py:508-538` feed the same reports). Pure conditional
    aggregation over the ref/alt pair."""
    d = docs_as_dna(spark, sf_dir).where(F.length("seq") >= 9)
    snp = d.select(
        F.substring("seq", 5, 1).alias("ref"),
        F.substring("seq", 9, 1).alias("alt"),
        (F.col("doc_id") % 4).cast("int").alias("qual_bin"),
    ).where(F.col("ref") != F.col("alt"))
    is_ti = (
        F.when(
            ((F.col("ref") == "A") & (F.col("alt") == "G"))
            | ((F.col("ref") == "G") & (F.col("alt") == "A"))
            | ((F.col("ref") == "C") & (F.col("alt") == "T"))
            | ((F.col("ref") == "T") & (F.col("alt") == "C")),
            1,
        ).otherwise(0)
    )
    cls = snp.select("qual_bin", is_ti.alias("is_ti"))
    n_tv = F.sum(F.lit(1) - F.col("is_ti"))
    return cls.groupBy("qual_bin").agg(
        F.sum("is_ti").cast("bigint").alias("n_ti"),
        n_tv.cast("bigint").alias("n_tv"),
        F.round(
            F.when(n_tv == 0, 0.0).otherwise(
                F.sum("is_ti") / n_tv.cast("double")
            ),
            6,
        ).alias("titv"),
    )


@query(
    "q100_hardy_weinberg",
    oracle="""
WITH gt AS (
  SELECT l_orderkey % 50 AS site,
         CASE CAST(l_partkey + l_suppkey AS BIGINT) % 10
              WHEN 0 THEN 2 WHEN 1 THEN 2 WHEN 2 THEN 2 WHEN 3 THEN 2
              WHEN 4 THEN 1 WHEN 5 THEN 1 WHEN 6 THEN 1
              ELSE 0 END AS n_ref  -- 2=hom-ref, 1=het, 0=hom-alt
  FROM lineitem
),
counts AS (
  SELECT site,
         COUNT(*) AS n,
         COUNT(*) FILTER (WHERE n_ref = 2) AS n_aa,
         COUNT(*) FILTER (WHERE n_ref = 1) AS n_ab,
         COUNT(*) FILTER (WHERE n_ref = 0) AS n_bb
  FROM gt GROUP BY site
),
freq AS (
  SELECT *, (2.0 * n_aa + n_ab) / (2.0 * n) AS p FROM counts
),
expect AS (
  SELECT site, n, n_aa, n_ab, n_bb, p,
         n * p * p AS e_aa,
         n * 2.0 * p * (1.0 - p) AS e_ab,
         n * (1.0 - p) * (1.0 - p) AS e_bb
  FROM freq
)
SELECT site, n, n_aa, n_ab, n_bb,
       ROUND(p, 6) AS ref_af,
       ROUND(CASE WHEN e_aa = 0 OR e_ab = 0 OR e_bb = 0 THEN 0.0
                  ELSE (n_aa - e_aa) * (n_aa - e_aa) / e_aa
                     + (n_ab - e_ab) * (n_ab - e_ab) / e_ab
                     + (n_bb - e_bb) * (n_bb - e_bb) / e_bb END, 6) AS hwe_chi2
FROM expect
""",
)
def q100_hardy_weinberg(spark, sf_dir):
    """Hardy-Weinberg equilibrium chi-square per site — the genotype-
    frequency QC behind the HW priors the imputation rescale applies
    (`correct_genotypes_by_imputation.py:189-206`, q54): observed
    hom-ref/het/hom-alt counts vs p², 2pq, q² expectations. One
    conditional aggregate per site; identical expression tree on both
    engines keeps the chi-square bit-exact."""
    li = load_table(spark, sf_dir, "lineitem")
    code = (F.col("l_partkey") + F.col("l_suppkey")).cast("bigint") % 10
    n_ref = (
        F.when(code <= 3, 2).when(code <= 6, 1).otherwise(0)
    )
    gt = li.select((F.col("l_orderkey") % 50).alias("site"), n_ref.alias("n_ref"))
    c = gt.groupBy("site").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("n_ref") == 2, 1)).alias("n_aa"),
        F.count(F.when(F.col("n_ref") == 1, 1)).alias("n_ab"),
        F.count(F.when(F.col("n_ref") == 0, 1)).alias("n_bb"),
    )
    p = (2.0 * F.col("n_aa") + F.col("n_ab")) / (2.0 * F.col("n"))
    e_aa = F.col("n") * p * p
    e_ab = F.col("n") * 2.0 * p * (F.lit(1.0) - p)
    e_bb = F.col("n") * (F.lit(1.0) - p) * (F.lit(1.0) - p)
    chi2 = (
        (F.col("n_aa") - e_aa) * (F.col("n_aa") - e_aa) / e_aa
        + (F.col("n_ab") - e_ab) * (F.col("n_ab") - e_ab) / e_ab
        + (F.col("n_bb") - e_bb) * (F.col("n_bb") - e_bb) / e_bb
    )
    return c.select(
        "site",
        "n",
        "n_aa",
        "n_ab",
        "n_bb",
        F.round(p, 6).alias("ref_af"),
        F.round(
            F.when((e_aa == 0) | (e_ab == 0) | (e_bb == 0), 0.0).otherwise(chi2), 6
        ).alias("hwe_chi2"),
    )


@query(
    "q101_mendel_violation_rate",
    oracle="""
WITH trio AS (
  SELECT o_orderkey AS site,
         CAST(o_orderkey % 3 AS INT) AS gt_father,    -- 0/1/2 alt-allele dosage
         CAST(o_custkey % 3 AS INT) AS gt_mother,
         CAST((o_orderkey + o_custkey) % 3 AS INT) AS gt_child,
         CAST(o_orderkey % 4 AS INT) AS chrom_bin
  FROM orders
),
checked AS (
  SELECT chrom_bin,
         CASE
           -- child allele dosage must be expressible as one allele from
           -- each parent: child in [floor(f/2)+floor(m/2), ceil(f/2)+ceil(m/2)]
           WHEN gt_child < (gt_father // 2) + (gt_mother // 2)
             OR gt_child > ((gt_father + 1) // 2) + ((gt_mother + 1) // 2)
           THEN 1 ELSE 0 END AS violation
  FROM trio
)
SELECT chrom_bin,
       COUNT(*) AS n_sites,
       CAST(SUM(violation) AS BIGINT) AS n_violations,
       ROUND(SUM(violation) / CAST(COUNT(*) AS DOUBLE), 6) AS violation_rate
FROM checked GROUP BY chrom_bin
""",
)
def q101_mendel_violation_rate(spark, sf_dir):
    """Mendelian-consistency rate over trio genotypes — the coarse QC
    companion to the de-novo refinement pipeline (`denovo_refinement.py`,
    q90): a child's alt-allele dosage must be attainable from one allele
    of each parent (hom parents contribute fixed alleles, het parents
    either). Pure conditional aggregation per chromosome bin."""
    o = load_table(spark, sf_dir, "orders")
    f_gt = (F.col("o_orderkey") % 3).cast("int")
    m_gt = (F.col("o_custkey") % 3).cast("int")
    c_gt = ((F.col("o_orderkey") + F.col("o_custkey")) % 3).cast("int")
    lo = (f_gt / 2).cast("int") + (m_gt / 2).cast("int")
    hi = ((f_gt + 1) / 2).cast("int") + ((m_gt + 1) / 2).cast("int")
    violation = F.when((c_gt < lo) | (c_gt > hi), 1).otherwise(0)
    t = o.select(
        (F.col("o_orderkey") % 4).cast("int").alias("chrom_bin"),
        violation.alias("violation"),
    )
    return t.groupBy("chrom_bin").agg(
        F.count(F.lit(1)).alias("n_sites"),
        F.sum("violation").cast("bigint").alias("n_violations"),
        F.round(
            F.sum("violation") / F.count(F.lit(1)).cast("double"), 6
        ).alias("violation_rate"),
    )


def _run_len_sql(side: str, alt: str = "alt") -> str:
    """Cumulative-AND run length of the alt base next to the variant
    position (1-based pos 12, window 4) as portable SQL: sum of
    prefix-AND indicators — identical text runs on both engines."""
    idxs = [11, 10, 9, 8] if side == "up" else [13, 14, 15, 16]
    terms = []
    for depth in range(1, 5):
        cond = " AND ".join(f"substr(seq, {i}, 1) = {alt}" for i in idxs[:depth])
        terms.append(f"CAST(({cond}) AS INT)")
    return "(" + " + ".join(terms) + ")"


@query(
    "q125_bridging_snv_calibration",
    oracle=f"""
WITH d AS ({SQL_DOCS_DNA}),
v AS (
  SELECT doc_id, seq,
         substr(seq, 12, 1) AS ref,
         translate(substr(seq, 12, 1), 'ACGT', 'CGTA') AS alt,
         CAST(n_chars % 100 AS INT) AS qual,
         doc_id % 3 <> 0 AS is_filtered
  FROM d JOIN documents USING (doc_id)
  WHERE length(seq) >= 16
),
runs AS (
  SELECT doc_id, ref, alt, qual, is_filtered,
         {_run_len_sql("up")} AS up_len,
         {_run_len_sql("down")} AS down_len,
         substr(seq, 11 - {_run_len_sql("up")}, 1) AS base_before,
         substr(seq, 13 + {_run_len_sql("down")}, 1) AS base_after
  FROM v
)
SELECT doc_id, ref, alt, qual, up_len, down_len,
       1 + up_len + down_len AS hmer_size,
       (base_before = base_after AND base_before = ref
        AND up_len = down_len) AS is_tandem,
       (is_filtered AND qual >= 30
        AND 1 + up_len + down_len >= 3
        AND NOT (base_before = base_after AND base_before = ref
                 AND up_len = down_len)
        AND LEAST(up_len, down_len) >= 1) AS rescued
FROM runs
""",
)
def q125_bridging_snv_calibration(spark, sf_dir):
    """Bridging-SNV recalibration (reference `pipelines/vcfbed/
    calibrate_bridging_snvs.py:9-66`): a filtered SNP whose ALT base
    extends a reference homopolymer on both sides ("bridges" it) is a
    flow-technology artifact candidate and gets rescued — unless the
    context is a symmetric tandem repeat (base-before == base-after ==
    REF with equal arm lengths), the reference's explicit exclusion.
    Re-expressed as pure string expressions over the deterministic
    docs-DNA sequences: up/downstream run lengths are cumulative-AND
    prefix indicators (fixed window 4 — the same generated expression
    text runs on both engines), hmer arithmetic and the tandem/edge
    rules are plain CASE algebra. Zero shuffles: pipelines with the
    scan at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs_as_dna(spark, sf_dir).join(docs.select("doc_id", "n_chars"), "doc_id")
    v = d.where(F.length("seq") >= 16).select(
        "doc_id",
        "seq",
        F.expr("substr(seq, 12, 1)").alias("ref"),
        F.expr("translate(substr(seq, 12, 1), 'ACGT', 'CGTA')").alias("alt"),
        (F.col("n_chars") % 100).cast("int").alias("qual"),
        (F.col("doc_id") % 3 != 0).alias("is_filtered"),
    )
    up, down = _run_len_sql("up"), _run_len_sql("down")
    runs = v.select(
        "doc_id",
        "ref",
        "alt",
        "qual",
        "is_filtered",
        F.expr(up).alias("up_len"),
        F.expr(down).alias("down_len"),
        F.expr(f"substr(seq, 11 - {up}, 1)").alias("base_before"),
        F.expr(f"substr(seq, 13 + {down}, 1)").alias("base_after"),
    )
    tandem = (
        (F.col("base_before") == F.col("base_after"))
        & (F.col("base_before") == F.col("ref"))
        & (F.col("up_len") == F.col("down_len"))
    )
    hmer = 1 + F.col("up_len") + F.col("down_len")
    return runs.select(
        "doc_id",
        "ref",
        "alt",
        "qual",
        "up_len",
        "down_len",
        hmer.alias("hmer_size"),
        tandem.alias("is_tandem"),
        (
            F.col("is_filtered")
            & (F.col("qual") >= 30)
            & (hmer >= 3)
            & ~tandem
            & (F.least("up_len", "down_len") >= 1)
        ).alias("rescued"),
    )


MINIMIZER_K = 5
MINIMIZER_W = 4
_MM_HASH_SQL = (
    "list_reduce(list_transform(string_split(substr(md5(k), 1, 8), ''), "
    "c -> CAST(CASE WHEN ascii(c) >= 97 THEN ascii(c) - 87 "
    "ELSE ascii(c) - 48 END AS BIGINT)), (a, b) -> a * 16 + b) % 2147483647"
)


@query(
    "q157_minimizer_sketch",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         translate(substr(text, 1, 120), '{DNA_FROM}', '{DNA_TO}') AS seq
  FROM documents
),
km AS (
  SELECT doc_id,
         CASE WHEN length(seq) >= {MINIMIZER_K}
              THEN [substr(seq, i, {MINIMIZER_K})
                    for i in generate_series(1, length(seq) - {MINIMIZER_K} + 1)]
              ELSE [] END AS kmers
  FROM d
),
hs AS (
  SELECT doc_id, kmers,
         list_transform(kmers, k -> {_MM_HASH_SQL}) AS hashes
  FROM km
),
mins AS (
  SELECT doc_id,
         len(kmers) AS n_kmers,
         CASE WHEN len(kmers) >= {MINIMIZER_W}
              THEN list_distinct([
                kmers[list_position(hashes[j:j+{MINIMIZER_W}-1],
                                    list_min(hashes[j:j+{MINIMIZER_W}-1])) + j - 1]
                for j in generate_series(1, len(kmers) - {MINIMIZER_W} + 1)])
              ELSE [] END AS sketch
  FROM hs
)
SELECT doc_id,
       CAST(n_kmers AS INT) AS n_kmers,
       CAST(len(sketch) AS INT) AS sketch_size,
       ROUND(len(sketch) / CAST(n_kmers AS DOUBLE), 6) AS density,
       list_aggregate(sketch, 'min') AS sketch_min,
       list_aggregate(sketch, 'max') AS sketch_max
FROM mins WHERE n_kmers >= {MINIMIZER_W}
""",
)
def q157_minimizer_sketch(spark, sf_dir):
    """(w,k)-minimizer sketch per sequence — the seeding primitive of
    minimap2-class read mappers and of k-mer-based sequence dedup: in
    every window of {MINIMIZER_W} consecutive {MINIMIZER_K}-mers keep
    the k-mer with the minimum hash (leftmost on ties), distinct per
    sequence. Both engines select minimizers with the shared portable
    md5 hash, so window argmin choices — not just sizes — are
    value-proven via the per-doc sketch size and density (expected
    ~2/(w+1)). Pure per-row array algebra: k-mers, hashes, and window
    argmins build as CHAINED projections (each array referenced 2+
    times, so CollapseProject keeps the stages — the q78/rowwise-
    signature rule); no explode, no shuffle at all — scan-speed at any
    corpus size, the same shape the streaming ingest path could map
    over document batches."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.translate(F.substring("text", 1, 120), DNA_FROM, DNA_TO).alias("seq"),
    )
    seq = F.col("seq")
    k, w = MINIMIZER_K, MINIMIZER_W
    km = d.select(
        "doc_id",
        F.when(
            F.length(seq) >= k,
            F.transform(
                F.sequence(F.lit(1), F.length(seq) - k + 1),
                lambda i: seq.substr(i, F.lit(k)),
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("kmers"),
    )
    from variantcalling_spark.operators.dedup import portable_string_hash

    hs = km.select(
        "doc_id",
        "kmers",
        F.transform("kmers", portable_string_hash).alias("hashes"),
    )
    kmers, hashes = F.col("kmers"), F.col("hashes")

    def win_min(j):
        sl = F.slice(hashes, j, w)
        return F.element_at(
            kmers, (F.array_position(sl, F.array_min(sl)) + j - 1).cast("int")
        )

    mins = hs.select(
        "doc_id",
        F.size(kmers).alias("n_kmers"),
        F.when(
            F.size(kmers) >= w,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size(kmers) - w + 1), win_min
                )
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("sketch"),
    )
    return mins.where(F.col("n_kmers") >= w).select(
        "doc_id",
        F.col("n_kmers").cast("int").alias("n_kmers"),
        F.size("sketch").cast("int").alias("sketch_size"),
        F.round(F.size("sketch") / F.col("n_kmers").cast("double"), 6).alias(
            "density"
        ),
        F.array_min("sketch").alias("sketch_min"),
        F.array_max("sketch").alias("sketch_max"),
    )


KSPEC_K = 8


@query(
    "q185_kmer_spectrum",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         translate(substr(text, 1, 120), '{DNA_FROM}', '{DNA_TO}') AS seq
  FROM documents
),
km AS (
  SELECT unnest([substr(seq, i, {KSPEC_K})
                 for i in generate_series(1, length(seq) - {KSPEC_K} + 1)]) AS kmer
  FROM d WHERE length(seq) >= {KSPEC_K}
),
cnts AS (SELECT kmer, COUNT(*) AS mult FROM km GROUP BY kmer)
SELECT CAST(mult AS BIGINT) AS multiplicity,
       COUNT(*) AS n_kmers,
       CAST(SUM(mult) AS BIGINT) AS total_occurrences
FROM cnts GROUP BY mult
""",
)
def q185_kmer_spectrum(spark, sf_dir):
    """k-mer multiplicity spectrum (the jellyfish-histo / GenomeScope
    curve): how many distinct {KSPEC_K}-mers occur exactly m times —
    the error-vs-repeat profile genome assemblers and coverage
    estimators read first (the m=1 spike is sequencing error; the main
    mode sits at the true coverage depth). Plan: per-row k-mer arrays
    off the staged sequence (q157's projection chain without the
    hashing), one explode, the k-mer count groupBy (map-side
    combinable; 4^k-bounded key space), then a SECOND groupBy over one
    row per DISTINCT k-mer — each stage's shuffle is orders of
    magnitude smaller than the last, the canonical two-level histogram
    shape."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        F.translate(F.substring("text", 1, 120), DNA_FROM, DNA_TO).alias("seq")
    )
    seq = F.col("seq")
    k = KSPEC_K
    km = (
        d.where(F.length(seq) >= k)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.length(seq) - k + 1),
                    lambda i: seq.substr(i, F.lit(k)),
                )
            ).alias("kmer")
        )
    )
    cnts = km.groupBy("kmer").agg(cnt("mult"))
    return cnts.groupBy(F.col("mult").cast("bigint").alias("multiplicity")).agg(
        cnt("n_kmers"),
        F.sum("mult").cast("bigint").alias("total_occurrences"),
    )


@query(
    "q189_n50_stats",
    oracle="""
WITH runs AS (
  SELECT concat('c', CAST(l_orderkey % 4 AS VARCHAR)) AS chrom,
         CAST(20 + (l_orderkey * 7 + l_linenumber * 13) % 980 AS BIGINT) AS len
  FROM lineitem WHERE l_partkey % 5 = 0
),
h AS (SELECT chrom, len, COUNT(*) AS c FROM runs GROUP BY chrom, len),
cum AS (
  SELECT chrom, len, c,
         SUM(c * len) OVER (PARTITION BY chrom ORDER BY len DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumbp,
         SUM(c * len) OVER (PARTITION BY chrom) AS totbp,
         SUM(c) OVER (PARTITION BY chrom) AS n
  FROM h
)
SELECT chrom,
       CAST(MAX(n) AS BIGINT) AS n_segments,
       CAST(MAX(totbp) AS BIGINT) AS total_bp,
       CAST(MAX(CASE WHEN cumbp * 2 >= totbp THEN len END) AS BIGINT) AS n50,
       CAST(MAX(CASE WHEN cumbp * 10 >= totbp * 9 THEN len END) AS BIGINT) AS n90
FROM cum GROUP BY chrom
""",
)
def q189_n50_stats(spark, sf_dir):
    """N50/N90 per contig — assembly's headline statistic (the length L
    such that segments ≥ L hold half / 90% of the total bases), applied
    to the high-confidence-region segment lengths a callset QC report
    summarizes. Same histogram discipline as the weighted quantiles:
    per-(chrom, length) counts, a descending cumulative base-pair
    window over the tiny length domain, integer threshold tests
    (cumbp·2 ≥ tot; ·10 ≥ 9·tot) — the pick is MAX(len) among
    qualifying lengths because the walk is descending. No row sort,
    no floats in the statistic."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    runs = li.where(F.col("l_partkey") % 5 == 0).select(
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias("chrom"),
        (20 + (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 980)
        .cast("bigint")
        .alias("len"),
    )
    h = runs.groupBy("chrom", "len").agg(cnt("c"))
    wd = (
        W.partitionBy("chrom")
        .orderBy(F.desc("len"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wt = W.partitionBy("chrom")
    cum = h.select(
        "chrom",
        "len",
        F.sum(F.col("c") * F.col("len")).over(wd).alias("cumbp"),
        F.sum(F.col("c") * F.col("len")).over(wt).alias("totbp"),
        F.sum("c").over(wt).alias("n"),
    )
    return cum.groupBy("chrom").agg(
        F.max("n").cast("bigint").alias("n_segments"),
        F.max("totbp").cast("bigint").alias("total_bp"),
        F.max(F.when(F.col("cumbp") * 2 >= F.col("totbp"), F.col("len")))
        .cast("bigint")
        .alias("n50"),
        F.max(F.when(F.col("cumbp") * 10 >= F.col("totbp") * 9, F.col("len")))
        .cast("bigint")
        .alias("n90"),
    )


MASH_MIN_SHARED = 3
MASH_K = 8  # 4^8 possible k-mers: k=5 over the 4-letter alphabet has only
MASH_W = 4  # 1024 and the minimizer join degenerates toward all-pairs


@query(
    "q207_mash_distance",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         translate(substr(text, 1, 120), '{DNA_FROM}', '{DNA_TO}') AS seq
  FROM documents
),
km AS (
  SELECT doc_id,
         CASE WHEN length(seq) >= {MASH_K}
              THEN [substr(seq, i, {MASH_K})
                    for i in generate_series(1, length(seq) - {MASH_K} + 1)]
              ELSE [] END AS kmers
  FROM d
),
hs AS (
  SELECT doc_id, kmers,
         list_transform(kmers, k -> {_MM_HASH_SQL}) AS hashes
  FROM km
),
mins AS (
  SELECT doc_id,
         CASE WHEN len(kmers) >= {MASH_W}
              THEN list_distinct([
                kmers[list_position(hashes[j:j+{MASH_W}-1],
                                    list_min(hashes[j:j+{MASH_W}-1])) + j - 1]
                for j in generate_series(1, len(kmers) - {MASH_W} + 1)])
              ELSE [] END AS sketch
  FROM hs WHERE len(kmers) >= {MASH_W}
),
sk AS (SELECT doc_id, unnest(sketch) AS m FROM mins),
sizes AS (SELECT doc_id, COUNT(*) AS n_sk FROM sk GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS sh
  FROM sk a JOIN sk b ON a.m = b.m AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {MASH_MIN_SHARED}
)
SELECT s.doc_a, s.doc_b, CAST(s.sh AS BIGINT) AS n_shared,
       CAST(za.n_sk AS BIGINT) AS n_a, CAST(zb.n_sk AS BIGINT) AS n_b,
       ROUND(-ln(2.0 * s.sh / (za.n_sk + zb.n_sk)) / {MASH_K}, 6) + 0.0
         AS mash_distance
FROM shared s
JOIN sizes za ON za.doc_id = s.doc_a
JOIN sizes zb ON zb.doc_id = s.doc_b
""",
)
def q207_mash_distance(spark, sf_dir):
    """Mash-style sketch distance between sequences — the k-mer-sketch
    ANI estimator (Mash 2016): D = −ln(2j/(1+j))/k over the minimizer
    sketches q157 builds, which ALGEBRAICALLY COLLAPSES — with
    j = sh/(n_a+n_b−sh), 2j/(1+j) = 2·sh/(n_a+n_b) — to a single ln
    of an exact integer ratio, so the whole distance is one rounded
    expression cross-engine. Discovery is the sketch equi-join ON THE
    MINIMIZER (pairs only where sketches actually collide — the
    sketch-space analogue of the shingle PPJoin), floored at
    {MASH_MIN_SHARED} shared minimizers; sketch sizes join back
    broadcast. The genomics twin of the document near-dup chain: same
    plan shapes, sequence alphabet."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.translate(F.substring("text", 1, 120), DNA_FROM, DNA_TO).alias("seq"),
    )
    seq = F.col("seq")
    k, w = MASH_K, MASH_W
    km = d.where(F.length(seq) >= k).select(
        "doc_id",
        F.transform(
            F.sequence(F.lit(1), F.length(seq) - k + 1),
            lambda i: seq.substr(i, F.lit(k)),
        ).alias("kmers"),
    )
    from variantcalling_spark.operators.dedup import portable_string_hash

    hs = km.select(
        "doc_id", "kmers", F.transform("kmers", portable_string_hash).alias("hashes")
    )
    kmers, hashes = F.col("kmers"), F.col("hashes")

    def win_min(j):
        sl = F.slice(hashes, j, w)
        return F.element_at(
            kmers, (F.array_position(sl, F.array_min(sl)) + j - 1).cast("int")
        )

    # persist BEFORE the explode: Generate inlines a generated-array
    # expression into its own evaluation, so without the barrier the
    # whole window-argmin chain re-evaluates once per OUTPUT row
    # (~40x per doc — measured 94s -> 4s at sf0.01; the cdc_chunks
    # counter-lesson at operators/dedup.py applied to explode)
    mins = hs.where(F.size(kmers) >= w).select(
        "doc_id",
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), F.size(kmers) - w + 1), win_min)
        ).alias("sketch"),
    ).transform(managed_persist)
    sk = mins.select("doc_id", F.explode("sketch").alias("m")).transform(
        managed_persist
    )
    sizes = sk.groupBy("doc_id").agg(cnt("n_sk"))
    a = sk.select("m", F.col("doc_id").alias("doc_a"))
    b = sk.select("m", F.col("doc_id").alias("doc_b"))
    shared = (
        a.join(b, "m")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(cnt("sh"))
        .where(F.col("sh") >= MASH_MIN_SHARED)
    )
    return (
        shared.join(
            F.broadcast(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sk").alias("n_a"))),
            "doc_a",
        )
        .join(
            F.broadcast(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sk").alias("n_b"))),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.col("sh").cast("bigint").alias("n_shared"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            # + 0.0 canonicalizes IEEE -0.0 -> +0.0 on BOTH engines
            # (identical twin in the oracle): DuckDB's ROUND propagates
            # the sign of zero from -ln(1), Spark's does not, and the
            # driver's byte-level hash sees the sign bit (r7 verdict)
            (
                F.round(
                    -F.log(2.0 * F.col("sh") / (F.col("n_a") + F.col("n_b")))
                    / F.lit(float(k)),
                    6,
                )
                + F.lit(0.0)
            ).alias("mash_distance"),
        )
    )


# ---------------------------------------------------------------------------
# Round 6: variant-annotation statistics (GATK annotation parity shapes)
# ---------------------------------------------------------------------------

def _fisher_pmf(k: str) -> str:
    """Hypergeometric pmf of a 2x2 table with cell (alt_fwd) = ``k``,
    margins r1/r2/c1/c2 and total nn, as IEEE-deterministic SQL: all
    factorials are <= 16! (cells capped at 4), every factorial <= 18!
    is an EXACT double, and products/divisions are correctly-rounded
    IEEE ops — so Spark and DuckDB produce bit-identical doubles for
    the identically-parenthesized expression."""
    def f(x: str) -> str:
        # DuckDB's factorial is INTEGER-only and lambda vars are BIGINT
        return f"factorial(CAST({x} AS INT))"

    return (
        f"((((CAST({f('r1')} AS DOUBLE) * {f('r2')}) * {f('c1')})"
        f" * {f('c2')})"
        f" / ((((CAST({f('nn')} AS DOUBLE)"
        f" * {f(k)}) * {f(f'r1 - ({k})')})"
        f" * {f(f'c1 - ({k})')}) * {f(f'(r2 - c1) + ({k})')}))"
    )


_FISHER_CELLS_SQL = """
  SELECT site,
         CAST(LEAST(SUM(CASE WHEN is_alt AND fwd THEN 1 ELSE 0 END), 4) AS INT) AS alt_fwd,
         CAST(LEAST(SUM(CASE WHEN is_alt AND NOT fwd THEN 1 ELSE 0 END), 4) AS INT) AS alt_rev,
         CAST(LEAST(SUM(CASE WHEN NOT is_alt AND fwd THEN 1 ELSE 0 END), 4) AS INT) AS ref_fwd,
         CAST(LEAST(SUM(CASE WHEN NOT is_alt AND NOT fwd THEN 1 ELSE 0 END), 4) AS INT) AS ref_rev
  FROM (
    SELECT event_id % 250 AS site,
           (event_id // 250) % 2 = 0 AS fwd,
           value > 10 AS is_alt
    FROM events
  ) GROUP BY site
"""


@query(
    "q213_fisher_strand",
    oracle=f"""
WITH cells AS ({_FISHER_CELLS_SQL}),
m AS (
  SELECT site, alt_fwd, alt_rev, ref_fwd, ref_rev,
         alt_fwd + alt_rev AS r1, ref_fwd + ref_rev AS r2,
         alt_fwd + ref_fwd AS c1, alt_rev + ref_rev AS c2,
         alt_fwd + alt_rev + ref_fwd + ref_rev AS nn
  FROM cells
),
m2 AS (SELECT *, {_fisher_pmf('alt_fwd')} AS pobs FROM m),
p AS (
  SELECT *,
    list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(
          list_filter(generate_series(GREATEST(0, c1 - r2), LEAST(r1, c1)),
                      k -> {_fisher_pmf('k')} <= pobs * 1.0000000001),
          k -> {_fisher_pmf('k')})),
      (acc, x) -> acc + x) AS p_two
  FROM m2
)
SELECT site, alt_fwd, alt_rev, ref_fwd, ref_rev,
       ROUND(p_two, 10) AS p_fisher,
       ROUND(-10 * log10(p_two), 4) + 0.0 AS fs_phred,
       ROUND(
         ln(((ref_fwd + 1.0) * (alt_rev + 1.0)) / ((alt_fwd + 1.0) * (ref_rev + 1.0))
            + ((alt_fwd + 1.0) * (ref_rev + 1.0)) / ((ref_fwd + 1.0) * (alt_rev + 1.0)))
         + ln(LEAST(ref_fwd + 1.0, ref_rev + 1.0) / GREATEST(ref_fwd + 1.0, ref_rev + 1.0))
         - ln(LEAST(alt_fwd + 1.0, alt_rev + 1.0) / GREATEST(alt_fwd + 1.0, alt_rev + 1.0)),
         6) AS sor
FROM p
""",
)
def q213_fisher_strand(spark, sf_dir):
    """Strand-bias annotations — the exact FISHER'S TEST (GATK
    FisherStrand/FS) and STRAND ODDS RATIO (GATK StrandOddsRatio/SOR)
    the reference pipeline consumes as VCF INFO columns for filtering
    (`vcf_pipeline_utils.py` INFO annotations; SB/FS usage in the
    filtering models). Per site: the 2x2 (alt/ref x fwd/rev) read-count
    table -> two-sided Fisher exact p (sum of all hypergeometric tables
    at-or-below the observed pmf) -> PHRED scale, plus the GATK SOR
    (ln symmetric odds ratio with +1 pseudocounts, ref/alt ratio
    corrected).

    Exactness at scale: cells are capped at 4 (GATK itself downsamples
    the SB table), so every factorial is <= 16! — exactly representable
    doubles — and the pmf is a fixed tree of correctly-rounded IEEE
    mul/div: bit-identical on any engine, any partitioning. The tail
    sum folds the <=17-element k-range in ascending order (seeded with
    0.0 on both engines), so even the double SUM is order-fixed. One
    scan + one map-side-combinable groupBy; the Fisher machinery is a
    pure projection — no shuffle after the cell aggregate, and the
    LEAST() cap makes per-site state O(1) regardless of depth (100 TB
    of reads still aggregates to 4x4-bounded tables)."""
    ev = load_table(spark, sf_dir, "events")
    reads = ev.select(
        (F.col("event_id") % 250).alias("site"),
        (F.expr("event_id DIV 250") % 2 == 0).alias("fwd"),
        (F.col("value") > 10).alias("is_alt"),
    )

    def _cell(cond, name):
        return F.least(
            F.sum(F.when(cond, 1).otherwise(0)), F.lit(4)
        ).cast("int").alias(name)

    cells = reads.groupBy("site").agg(
        _cell(F.col("is_alt") & F.col("fwd"), "alt_fwd"),
        _cell(F.col("is_alt") & ~F.col("fwd"), "alt_rev"),
        _cell(~F.col("is_alt") & F.col("fwd"), "ref_fwd"),
        _cell(~F.col("is_alt") & ~F.col("fwd"), "ref_rev"),
    )
    m = cells.select(
        "*",
        (F.col("alt_fwd") + F.col("alt_rev")).alias("r1"),
        (F.col("ref_fwd") + F.col("ref_rev")).alias("r2"),
        (F.col("alt_fwd") + F.col("ref_fwd")).alias("c1"),
        (F.col("alt_rev") + F.col("ref_rev")).alias("c2"),
        (
            F.col("alt_fwd") + F.col("alt_rev") + F.col("ref_fwd") + F.col("ref_rev")
        ).alias("nn"),
    )
    # stage pobs as a column FIRST: referencing it inside the lambdas
    # below is a trivial capture (the repo's HOF-lambda rule — a
    # non-trivial captured expression re-evaluates per element)
    m2 = m.withColumn("pobs", F.expr(_fisher_pmf("alt_fwd")))
    p = m2.withColumn(
        "p_two",
        F.expr(
            f"""aggregate(
              filter(sequence(greatest(0, c1 - r2), least(r1, c1)),
                     k -> {_fisher_pmf('k')} <= pobs * 1.0000000001),
              cast(0.0 as double), (acc, x) -> acc + {_fisher_pmf('x')})"""
        ),
    )
    one = F.lit(1.0)
    rf, rr = F.col("ref_fwd") + one, F.col("ref_rev") + one
    af, ar = F.col("alt_fwd") + one, F.col("alt_rev") + one
    return p.select(
        "site",
        "alt_fwd",
        "alt_rev",
        "ref_fwd",
        "ref_rev",
        F.round("p_two", 10).alias("p_fisher"),
        # + 0.0: canonicalize -0.0 (p_two can be exactly 1 when every
        # table in the support passes the pobs filter) — see q207 note
        (F.round(-10.0 * F.log10("p_two"), 4) + F.lit(0.0)).alias("fs_phred"),
        F.round(
            F.log((rf * ar) / (af * rr) + (af * rr) / (rf * ar))
            + F.log(F.least(rf, rr) / F.greatest(rf, rr))
            - F.log(F.least(af, ar) / F.greatest(af, ar)),
            6,
        ).alias("sor"),
    )


@query(
    "q214_bqsr_table",
    oracle=f"""
WITH dna AS ({SQL_DOCS_DNA}),
d AS (
  SELECT dna.doc_id, dna.seq, doc.source AS rg,
         20 + (dna.doc_id % 4) * 5 AS reported_q
  FROM dna JOIN documents doc ON doc.doc_id = dna.doc_id
  WHERE length(dna.seq) >= 2
),
obs AS (
  SELECT rg, reported_q,
         (pos - 2) // 8 AS cycle_bin,
         substr(seq, CAST(pos - 1 AS INT), 2) AS context,
         CASE WHEN (doc_id * 31 + pos) % 23 = 0 THEN 1 ELSE 0 END AS is_err
  FROM d, unnest(generate_series(2, length(seq))) AS t(pos)
)
SELECT rg, reported_q, cycle_bin, context,
       COUNT(*) AS n_obs,
       CAST(SUM(is_err) AS BIGINT) AS n_err,
       ROUND(-10 * log10((SUM(is_err) + 1.0) / (COUNT(*) + 2.0)), 4)
         AS empirical_q,
       ROUND(-10 * log10((SUM(is_err) + 1.0) / (COUNT(*) + 2.0)) - reported_q, 4)
         AS delta_q
FROM obs
GROUP BY rg, reported_q, cycle_bin, context
""",
)
def q214_bqsr_table(spark, sf_dir):
    """BASE-QUALITY RECALIBRATION TABLE (GATK BQSR GatherBqsrReports
    shape; the reference's flow-based pipeline consumes recalibrated
    qualities upstream of calling): bin every observed base by
    (read group, reported quality, cycle bin, dinucleotide context)
    and compute the empirical quality with the +1/+2 Yates shrink,
    plus the reported-vs-empirical delta the recalibration applies.

    This is THE canonical map-side-combinable pipeline: one scan over
    reads (here the deterministic DNA derivation of documents),
    per-base explode is a pure projection, and the state per group is
    two counters — the 100 TB shape is a partial-agg tree whose final
    table is (RG x Q x cycle x 16 contexts)-bounded, i.e. tiny, no
    matter how many bases were scanned. Reference cites:
    recalibration consumers in `lpr/train_lib_prep_recalibration_model.py`,
    flow-quality handling in the ppmSeq/flow utils."""
    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs_as_dna(spark, sf_dir)
        .join(docs.select("doc_id", F.col("source").alias("rg")), "doc_id")
        .withColumn("reported_q", (20 + (F.col("doc_id") % 4) * 5).cast("bigint"))
        .where(F.length("seq") >= 2)
    )
    obs = d.select(
        "rg",
        "reported_q",
        F.explode(F.sequence(F.lit(2), F.length("seq"))).alias("pos"),
        "doc_id",
        "seq",
    ).select(
        "rg",
        "reported_q",
        F.expr("(pos - 2) DIV 8").alias("cycle_bin"),
        F.expr("substr(seq, CAST(pos - 1 AS INT), 2)").alias("context"),
        F.when((F.col("doc_id") * 31 + F.col("pos")) % 23 == 0, 1)
        .otherwise(0)
        .alias("is_err"),
    )
    emp = -10.0 * F.log10((F.sum("is_err") + F.lit(1.0)) / (F.count(F.lit(1)) + F.lit(2.0)))
    return obs.groupBy("rg", "reported_q", "cycle_bin", "context").agg(
        cnt("n_obs"),
        F.sum("is_err").cast("bigint").alias("n_err"),
        F.round(emp, 4).alias("empirical_q"),
        F.round(emp - F.col("reported_q"), 4).alias("delta_q"),
    )


def _nw_wavefront_oracle_sql(match: int = 2, mismatch: int = -1, gap: int = -2) -> str:
    """Needleman-Wunsch as a WAVEFRONT recursive CTE: anti-diagonal d+1
    is a pure map over diagonals d (cur) and d-1 (prev) — the within-row
    left-dependency that makes row-order DP sequential disappears on
    anti-diagonals, which is exactly why wavefront alignment
    parallelizes. Cell (i, j=d+1-i); boundaries are gap*i / gap*j; the
    final diagonal d = n+m holds the single cell (n, m)."""
    val = f"""
      CASE WHEN i = 0 THEN CAST({gap} * (d + 1) AS INT)
           WHEN d + 1 - i = 0 THEN CAST({gap} * i AS INT)
           ELSE GREATEST(
             prev[CAST(i - GREATEST(0, d - 1 - m) AS INT)]
               + CASE WHEN substr(a, CAST(i AS INT), 1) = substr(b, CAST(d + 1 - i AS INT), 1)
                      THEN {match} ELSE {mismatch} END,
             cur[CAST(i - GREATEST(0, d - m) AS INT)] + {gap},
             cur[CAST(i + 1 - GREATEST(0, d - m) AS INT)] + {gap})
      END"""
    return f"""
WITH RECURSIVE dna AS ({SQL_DOCS_DNA}),
pairs AS (
  SELECT ea.doc_id // 2 AS pair_id, ea.seq AS a, eb.seq AS b,
         CAST(length(ea.seq) AS INT) AS n, CAST(length(eb.seq) AS INT) AS m
  FROM dna ea JOIN dna eb ON eb.doc_id = ea.doc_id + 1
  WHERE ea.doc_id % 2 = 0
),
rec AS (
  SELECT pair_id, a, b, n, m, 0 AS d,
         [CAST(0 AS INT)] AS cur, CAST(NULL AS INT[]) AS prev
  FROM pairs
  UNION ALL
  SELECT pair_id, a, b, n, m, d + 1,
         list_transform(generate_series(GREATEST(0, d + 1 - m), LEAST(n, d + 1)),
                        i -> {val}) AS cur,
         cur AS prev
  FROM rec WHERE d < n + m
)
SELECT pair_id, n, m,
       cur[1] AS nw_score,
       ROUND(cur[1] / CAST(GREATEST(n, m, 1) AS DOUBLE), 6) AS norm_score
FROM rec WHERE d = n + m
"""


@query("q219_nw_alignment", oracle=_nw_wavefront_oracle_sql())
def q219_nw_alignment(spark, sf_dir):
    """PAIRWISE GLOBAL ALIGNMENT (Needleman-Wunsch, match +2 /
    mismatch -1 / gap -2) over the derived DNA corpus: consecutive
    document pairs align and report the DP score plus a
    length-normalized identity proxy — the alignment primitive under
    read scoring and haplotype comparison (the reference delegates to
    external aligners/vcfeval; the concordance replay family
    q110-q127 consumes alignment equivalence downstream; built-in
    levenshtein covers unit-cost only, q180).

    Engine side: Arrow kernel with per-row numpy vectorization (the
    left-gap chain solved by a running max — no per-cell Python); the
    ORACLE replays the identical DP as a wavefront recursive CTE where
    every anti-diagonal is a pure map over the previous two, so all
    O(n*m) cell recurrences are value-pinned, not just the end score.
    Integer DP throughout -> bit-exact on both engines. Scale: each
    pair is independent (pure mapInPandas, no shuffle); memory is two
    DP rows per pair."""
    from variantcalling_spark.operators.kernels import nw_align_scores

    dna = docs_as_dna(spark, sf_dir).transform(managed_persist)
    a = dna.where(F.col("doc_id") % 2 == 0).select(
        F.expr("doc_id DIV 2").alias("pair_id"), F.col("seq").alias("a")
    )
    b = dna.select(
        F.expr("(doc_id - 1) DIV 2").alias("pair_id"),
        F.col("seq").alias("b"),
        (F.col("doc_id") % 2).alias("par"),
    ).where(F.col("par") == 1).drop("par")
    pairs = a.join(b, "pair_id")
    return nw_align_scores(pairs)


@query(
    "q225_vqsr_tranches",
    oracle="""
WITH calls AS (
  SELECT event_id, value AS score, event_id % 7 = 0 AS is_truth
  FROM events
),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_truth FROM calls WHERE is_truth),
tr AS (
  SELECT score,
         ROW_NUMBER() OVER (ORDER BY score DESC, event_id) AS rn
  FROM calls WHERE is_truth
),
targets AS (SELECT unnest([900, 950, 990, 999]) AS target_permille),
thr AS (
  SELECT t.target_permille, tr.score AS min_score
  FROM targets t CROSS JOIN nt
  JOIN tr ON tr.rn = CAST(CEIL(t.target_permille * nt.n_truth / 1000.0) AS BIGINT)
),
agg AS (
  SELECT thr.target_permille, thr.min_score,
         CAST(COUNT(*) AS BIGINT) AS n_total_ge,
         CAST(COUNT(*) FILTER (WHERE c.is_truth) AS BIGINT) AS n_truth_ge
  FROM thr JOIN calls c ON c.score >= thr.min_score
  GROUP BY thr.target_permille, thr.min_score
)
SELECT a.target_permille, ROUND(a.min_score, 6) AS min_score,
       nt.n_truth, a.n_truth_ge, a.n_total_ge,
       ROUND(a.n_truth_ge / CAST(nt.n_truth AS DOUBLE), 6) AS truth_sensitivity,
       ROUND(a.n_truth_ge / CAST(a.n_total_ge AS DOUBLE), 6) AS truth_precision
FROM agg a CROSS JOIN nt
""",
)
def q225_vqsr_tranches(spark, sf_dir):
    """VQSR TRANCHE TABLE (GATK ApplyVQSR/.tranches artifact — the
    reference's filtering layer consumes tranche-style
    sensitivity-indexed thresholds; cf. the threshold machinery in
    `filtering/` and q40's PR curve): for each truth-sensitivity
    target (90/95/99/99.9%), the minimal score threshold retaining
    that fraction of truth sites, plus the retained-call counts and
    the realized sensitivity/precision at that cut — the table that
    turns a continuous recalibration score into named filter levels.

    Scale shape: one window over the TRUTH subset (truth-set-sized,
    not callset-sized) picks the thresholds by rank; the 4-row
    threshold table broadcasts against the callset for the retained
    counts (one scan, map-side combinable). Determinism: thresholds
    are data values picked by integer rank (full tie-break), counts
    are exact."""
    from variantcalling_spark.operators.ordered import value_at_rank_bucketed

    ev = load_table(spark, sf_dir, "events")
    calls = ev.select(
        "event_id",
        F.col("value").alias("score"),
        (F.col("event_id") % 7 == 0).alias("is_truth"),
    ).transform(managed_persist)
    truth = calls.where("is_truth")
    nt = truth.agg(F.count(F.lit(1)).cast("bigint").alias("n_truth"))
    targets = spark.createDataFrame(
        [(900,), (950,), (990,), (999,)], ["target_permille"]
    ).select(F.col("target_permille").cast("int").alias("target_permille"))
    # threshold = score at DESCENDING truth-rank k — picked by a bucketed
    # distinct-score CDF instead of a truth-set-wide single-partition
    # Window (VERDICT r6 fix: truth is a constant fraction of the
    # callset, i.e. row-sized; the rank tie-break cannot change the
    # SCORE at the rank, so the CDF pick is exact).
    ranks = targets.crossJoin(F.broadcast(nt)).select(
        "target_permille",
        F.ceil(F.col("target_permille") * F.col("n_truth") / 1000.0)
        .cast("bigint")
        .alias("k"),
    )
    thr = value_at_rank_bucketed(
        truth.select("score"), "score", ranks, rank_col="k",
        bucket_width=16.0, descending=True,
    ).select("target_permille", F.col("value_at_rank").alias("min_score"))
    agg = (
        calls.crossJoin(F.broadcast(thr))
        .where(F.col("score") >= F.col("min_score"))
        .groupBy("target_permille", "min_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_total_ge"),
            F.sum(F.when(F.col("is_truth"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_truth_ge"),
        )
    )
    return agg.crossJoin(F.broadcast(nt)).select(
        "target_permille",
        F.round("min_score", 6).alias("min_score"),
        "n_truth",
        "n_truth_ge",
        "n_total_ge",
        F.round(F.col("n_truth_ge") / F.col("n_truth").cast("double"), 6).alias(
            "truth_sensitivity"
        ),
        F.round(F.col("n_truth_ge") / F.col("n_total_ge").cast("double"), 6).alias(
            "truth_precision"
        ),
    )


@query(
    "q229_hpol_table",
    oracle=f"""
WITH dna AS ({SQL_DOCS_DNA}),
d AS (SELECT doc_id, seq, length(seq) AS n FROM dna WHERE length(seq) >= 1),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total_len FROM d),
ch AS (
  SELECT doc_id, n, pos, substr(seq, CAST(pos AS INT), 1) AS base,
         CASE WHEN pos = 1 OR substr(seq, CAST(pos AS INT), 1) <> substr(seq, CAST(pos - 1 AS INT), 1)
              THEN 1 ELSE 0 END AS is_start
  FROM d, unnest(generate_series(1, n)) AS t(pos)
),
runs0 AS (
  SELECT doc_id, n, pos, base,
         SUM(is_start) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
  FROM ch
),
runs AS (
  SELECT doc_id, MAX(n) AS n, run_id, MIN(pos) AS pos, MAX(base) AS base,
         CAST(COUNT(*) AS INT) AS hlen
  FROM runs0 GROUP BY doc_id, run_id
),
q AS (
  SELECT r.doc_id, r.pos, r.hlen, r.base,
         CAST(CEIL(20.0 * r.n / tot.total_len) AS BIGINT) AS take,
         ROW_NUMBER() OVER (PARTITION BY r.doc_id, r.hlen, r.base
                            ORDER BY md5(CAST(r.doc_id AS VARCHAR) || ':' || CAST(r.pos AS VARCHAR)), r.pos)
           AS rn
  FROM runs r CROSS JOIN tot
  WHERE r.hlen <= 8
)
SELECT doc_id, pos, hlen, base FROM q WHERE rn <= take
""",
)
def q229_hpol_table(spark, sf_dir):
    """HOMOPOLYMER LOCATION TABLE (`scripts/collect_hpol_table.py:65-120`
    — the reference samples up to N homopolymer loci per (length,
    nucleotide) stratum from its reference genome, proportionally to
    interval length, for the hmer-calibration pipelines that q13/q51
    consume downstream): RLE the derived DNA corpus into runs
    (gaps-and-islands on the char-change flag — the same machinery as
    q42/q211), then take a per-(sequence, length, base) quota
    proportional to sequence length, picked by deterministic md5 rank
    (the engine's seeded stand-in for the reference's
    random.shuffle).

    Scale shape: per-base explode is a projection; the run window
    partitions by sequence (never the table); the quota rank windows
    partition by (sequence, length, base) — bounded strata. One-pass,
    no joins except the 1-row total-length broadcast."""
    from pyspark.sql import Window as W

    d = docs_as_dna(spark, sf_dir).where(F.length("seq") >= 1).select(
        "doc_id", "seq", F.length("seq").alias("n")
    )
    tot = d.agg(F.sum("n").cast("double").alias("total_len"))
    ch = d.select(
        "doc_id",
        "n",
        "seq",
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("pos"),
    ).select(
        "doc_id",
        "n",
        "pos",
        F.expr("substr(seq, CAST(pos AS INT), 1)").alias("base"),
        F.expr(
            """CASE WHEN pos = 1 OR substr(seq, CAST(pos AS INT), 1) <> substr(seq, CAST(pos - 1 AS INT), 1)
               THEN 1 ELSE 0 END"""
        ).alias("is_start"),
    )
    runs0 = ch.withColumn(
        "run_id", F.sum("is_start").over(W.partitionBy("doc_id").orderBy("pos"))
    )
    runs = runs0.groupBy("doc_id", "run_id").agg(
        F.max("n").alias("n"),
        F.min("pos").alias("pos"),
        F.max("base").alias("base"),
        F.count(F.lit(1)).cast("int").alias("hlen"),
    )
    q = (
        runs.where(F.col("hlen") <= 8)
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "pos",
            "hlen",
            "base",
            F.ceil(20.0 * F.col("n") / F.col("total_len")).cast("bigint").alias("take"),
            F.row_number()
            .over(
                W.partitionBy("doc_id", "hlen", "base").orderBy(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("doc_id").cast("string"),
                            F.col("pos").cast("string"),
                        )
                    ),
                    "pos",
                )
            )
            .alias("rn"),
        )
    )
    return q.where(F.col("rn") <= F.col("take")).select(
        "doc_id", F.col("pos").cast("bigint").alias("pos"), "hlen", "base"
    )


_SOMATIC_CALLS_SQL = """
  SELECT (user_id % 4) AS chrom,
         event_id AS pos,
         CASE WHEN event_id % 11 = 0
              THEN substr('ACGT', CAST(event_id % 4 + 1 AS INT), 1) || 'A'
              ELSE substr('ACGT', CAST(event_id % 4 + 1 AS INT), 1) END AS ref,
         substr('ACGT', CAST((event_id // 4) % 4 + 1 AS INT), 1) AS alt
  FROM events WHERE {side}
"""


@query(
    "q230_somatic_gt_subtraction",
    oracle=f"""
WITH tumor AS ({_SOMATIC_CALLS_SQL.format(side="value > 8")}),
normal AS ({_SOMATIC_CALLS_SQL.format(side="value <= 8 OR event_id % 3 = 0")}),
shared AS (
  SELECT t.chrom, t.pos,
         MAX(CASE WHEN t.ref = n.ref AND t.alt = n.alt THEN 1 ELSE 0 END)
           AS any_same_allele,
         MAX(CASE WHEN length(t.ref) > length(t.alt)
                   AND length(n.ref) > length(n.alt) THEN 1 ELSE 0 END)
           AS both_del
  FROM (SELECT DISTINCT chrom, pos, ref, alt FROM tumor) t
  JOIN (SELECT DISTINCT chrom, pos, ref, alt FROM normal) n
    ON n.chrom = t.chrom AND n.pos = t.pos
  GROUP BY t.chrom, t.pos
)
SELECT t.chrom, t.pos, t.ref, t.alt,
       CASE WHEN s.pos IS NULL THEN 'somatic_kept'
            WHEN s.any_same_allele = 1 THEN 'problematic_shared_allele'
            WHEN s.both_del = 1 THEN 'problematic_both_deletion'
            ELSE 'somatic_kept_shared_pos' END AS class
FROM tumor t
LEFT JOIN shared s ON s.chrom = t.chrom AND s.pos = t.pos
""",
)
def q230_somatic_gt_subtraction(spark, sf_dir):
    """SOMATIC GROUND-TRUTH SUBTRACTION
    (`scripts/create_somatic_gt_file.py:50-126,273-328` — build the
    tumor-minus-normal truth set for Mutect comparison): tumor calls
    classified against the normal callset at POSITION granularity,
    with the reference's two problematic-position rules — a shared
    position carrying ANY identical allele is removed (germline
    leak-through), and a position where BOTH callsets hold a deletion
    is removed (alignment-ambiguous) — while shared positions with
    disjoint alleles stay in the subtraction. The class column is the
    union of the reference's two outputs (the gt VCF rows =
    somatic_kept*, the problematic BED = problematic_*).

    Scale shape: the tumor side is scanned once; the per-position
    overlap summary is a (chrom, pos)-grouped aggregate of the
    position-granularity join (q08's isec machinery, -c all flavor),
    then a single left join back — both shuffles on the same
    (chrom, pos) key so AQE can reuse the partitioning; no broadcast
    assumption on either callset (tumor and normal are both
    full-size)."""
    ev = load_table(spark, sf_dir, "events")

    def calls(cond):
        return ev.where(cond).select(
            (F.col("user_id") % 4).alias("chrom"),
            F.col("event_id").alias("pos"),
            F.when(
                F.col("event_id") % 11 == 0,
                F.concat(
                    F.expr("substr('ACGT', CAST(event_id % 4 + 1 AS INT), 1)"),
                    F.lit("A"),
                ),
            )
            .otherwise(F.expr("substr('ACGT', CAST(event_id % 4 + 1 AS INT), 1)"))
            .alias("ref"),
            F.expr("substr('ACGT', CAST((event_id DIV 4) % 4 + 1 AS INT), 1)").alias(
                "alt"
            ),
        )

    tumor = calls(F.col("value") > 8).transform(managed_persist)
    normal = calls((F.col("value") <= 8) | (F.col("event_id") % 3 == 0))
    t = tumor.select("chrom", "pos", "ref", "alt").distinct().alias("t")
    n = normal.select("chrom", "pos", "ref", "alt").distinct().alias("n")
    shared = (
        t.join(n, ["chrom", "pos"])
        .groupBy("chrom", "pos")
        .agg(
            F.max(
                F.when(
                    (F.col("t.ref") == F.col("n.ref"))
                    & (F.col("t.alt") == F.col("n.alt")),
                    1,
                ).otherwise(0)
            ).alias("any_same_allele"),
            F.max(
                F.when(
                    (F.length("t.ref") > F.length("t.alt"))
                    & (F.length("n.ref") > F.length("n.alt")),
                    1,
                ).otherwise(0)
            ).alias("both_del"),
        )
        .withColumn("shared_flag", F.lit(1))
    )
    return tumor.join(shared, ["chrom", "pos"], "left").select(
        "chrom",
        "pos",
        "ref",
        "alt",
        F.when(F.col("shared_flag").isNull(), "somatic_kept")
        .when(F.col("any_same_allele") == 1, "problematic_shared_allele")
        .when(F.col("both_del") == 1, "problematic_both_deletion")
        .otherwise("somatic_kept_shared_pos")
        .alias("class"),
    )


@query(
    "q232_leftalign_hmer_indels",
    oracle=f"""
WITH dna AS ({SQL_DOCS_DNA}),
d AS (SELECT doc_id, seq, length(seq) AS n FROM dna WHERE length(seq) >= 4),
ch AS (
  SELECT doc_id, pos, substr(seq, CAST(pos AS INT), 1) AS base,
         CASE WHEN pos = 1 OR substr(seq, CAST(pos AS INT), 1) <> substr(seq, CAST(pos - 1 AS INT), 1)
              THEN 1 ELSE 0 END AS is_start
  FROM d, unnest(generate_series(1, n)) AS t(pos)
),
runs0 AS (
  SELECT doc_id, pos, base,
         SUM(is_start) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
  FROM ch
),
runs AS (
  SELECT doc_id, run_id, MIN(pos) AS run_start, MAX(base) AS base,
         CAST(COUNT(*) AS INT) AS run_len
  FROM runs0 GROUP BY doc_id, run_id
),
calls AS (
  -- deterministic 1-bp hmer deletions: delete the base at position
  -- 2 + (doc_id % (n-2)) of each sequence
  SELECT doc_id, 2 + (doc_id % (n - 2)) AS pos,
         substr(seq, CAST(2 + (doc_id % (n - 2)) AS INT), 1) AS del_base
  FROM d
),
loc AS (
  SELECT c.doc_id, c.pos, c.del_base, r.run_start, r.run_len
  FROM calls c
  JOIN runs0 p ON p.doc_id = c.doc_id AND p.pos = c.pos
  JOIN runs r ON r.doc_id = c.doc_id AND r.run_id = p.run_id
)
SELECT doc_id, pos AS raw_pos, del_base,
       run_start AS aligned_pos, run_len,
       CAST(pos - run_start AS INT) AS shift,
       pos <> run_start AS was_shifted
FROM loc
""",
)
def q232_leftalign_hmer_indels(spark, sf_dir):
    """LEFT-ALIGN HOMOPOLYMER INDELS (`bcftools norm` /
    LeftAlignAndTrimVariants semantics, specialized to the hmer
    indels that dominate flow-based error profiles — the reference's
    entire hmer machinery q13/q29/q51 assumes canonical positions):
    a 1-bp deletion inside a homopolymer run is representationally
    ambiguous anywhere in the run; the canonical (left-aligned) form
    places it at the RUN START. Joining each indel to its containing
    run (the q229 RLE machinery) gives the canonical position in one
    equi-join — no per-variant iterative shifting loop.

    Scale shape: runs build per-sequence (bounded windows); the
    indel->run join is an equi-join on (sequence, run id) after a
    position lookup — hash-partitioned, no broadcast assumption.
    Output pins shift distance and whether normalization moved the
    call — the audit columns a normalization pass reports."""
    from pyspark.sql import Window as W

    d = docs_as_dna(spark, sf_dir).where(F.length("seq") >= 4).select(
        "doc_id", "seq", F.length("seq").alias("n")
    ).transform(managed_persist)
    ch = d.select(
        "doc_id",
        "seq",
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("pos"),
    ).select(
        "doc_id",
        "pos",
        F.expr("substr(seq, CAST(pos AS INT), 1)").alias("base"),
        F.expr(
            """CASE WHEN pos = 1 OR substr(seq, CAST(pos AS INT), 1) <> substr(seq, CAST(pos - 1 AS INT), 1)
               THEN 1 ELSE 0 END"""
        ).alias("is_start"),
    )
    runs0 = ch.withColumn(
        "run_id", F.sum("is_start").over(W.partitionBy("doc_id").orderBy("pos"))
    ).transform(managed_persist)
    runs = runs0.groupBy("doc_id", "run_id").agg(
        F.min("pos").alias("run_start"),
        F.max("base").alias("base"),
        F.count(F.lit(1)).cast("int").alias("run_len"),
    )
    calls = d.select(
        "doc_id",
        (2 + (F.col("doc_id") % (F.col("n") - 2))).alias("pos"),
        F.expr("substr(seq, CAST(2 + (doc_id % (n - 2)) AS INT), 1)").alias("del_base"),
    )
    loc = (
        calls.join(
            runs0.select("doc_id", "pos", "run_id"), ["doc_id", "pos"]
        )
        .join(runs.select("doc_id", "run_id", "run_start", "run_len"), ["doc_id", "run_id"])
    )
    return loc.select(
        "doc_id",
        F.col("pos").alias("raw_pos"),
        "del_base",
        F.col("run_start").cast("bigint").alias("aligned_pos"),
        "run_len",
        (F.col("pos") - F.col("run_start")).cast("int").alias("shift"),
        (F.col("pos") != F.col("run_start")).alias("was_shifted"),
    )


@query(
    "q233_fastqc_per_cycle",
    oracle=f"""
WITH dna AS ({SQL_DOCS_DNA}),
d AS (SELECT doc_id, seq, length(seq) AS n FROM dna WHERE length(seq) >= 1),
obs AS (
  SELECT pos AS cycle,
         20 + (doc_id * 7 + pos * 13) % 20 - (pos // 6) AS q
  FROM d, unnest(generate_series(1, n)) AS t(pos)
),
r AS (
  SELECT cycle, q,
         ROW_NUMBER() OVER (PARTITION BY cycle ORDER BY q) AS rn,
         COUNT(*) OVER (PARTITION BY cycle) AS n
  FROM obs
),
qs AS (
  SELECT cycle, n,
         MAX(CASE WHEN rn = (n + 3) // 4 THEN q END) AS q1,
         MAX(CASE WHEN rn = (n + 1) // 2 THEN q END) AS median_q,
         MAX(CASE WHEN rn = (3 * n + 1) // 4 THEN q END) AS q3
  FROM r GROUP BY cycle, n
),
s AS (
  SELECT cycle,
         ROUND(CAST(SUM(CAST(q AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 4) AS mean_q,
         MIN(q) AS min_q, MAX(q) AS max_q
  FROM obs GROUP BY cycle
)
SELECT qs.cycle, CAST(qs.n AS BIGINT) AS n_reads,
       qs.q1, qs.median_q, qs.q3, s.mean_q, s.min_q, s.max_q,
       s.mean_q < 25 AS warn_low_quality
FROM qs JOIN s USING (cycle)
""",
)
def q233_fastqc_per_cycle(spark, sf_dir):
    """PER-CYCLE QUALITY TABLE (FastQC 'per base sequence quality' —
    the first QC report every sequencing run gets, and the
    cycle-degradation signal BQSR's cycle covariate (q214) corrects):
    per read cycle the exact lower quartile / median / upper quartile
    (picked by integer rank — no interpolation semantics to disagree
    on), DECIMAL-exact mean, min/max, and FastQC's warn flag.

    Scale shape: one per-base projection; quartiles use per-cycle
    rank windows (cycle-count-bounded partitions, never the whole
    table in one window); the mean rides a separate
    map-side-combinable aggregate joined back on the tiny cycle key."""
    from pyspark.sql import Window as W

    d = docs_as_dna(spark, sf_dir).where(F.length("seq") >= 1).select(
        "doc_id", F.length("seq").alias("n")
    )
    obs = d.select(
        "doc_id",
        "n",
        F.explode(F.sequence(F.lit(1), F.col("n"))).alias("pos"),
    ).select(
        F.col("pos").alias("cycle"),
        (
            20
            + (F.col("doc_id") * 7 + F.col("pos") * 13) % 20
            - F.expr("pos DIV 6")
        ).alias("q"),
    ).transform(managed_persist)
    r = obs.select(
        "cycle",
        "q",
        F.row_number().over(W.partitionBy("cycle").orderBy("q")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("cycle")).alias("n"),
    )
    qs = r.groupBy("cycle", "n").agg(
        F.max(F.when(F.col("rn") == F.expr("(n + 3) DIV 4"), F.col("q"))).alias("q1"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("q"))).alias(
            "median_q"
        ),
        F.max(F.when(F.col("rn") == F.expr("(3 * n + 1) DIV 4"), F.col("q"))).alias(
            "q3"
        ),
    )
    s = obs.groupBy("cycle").agg(
        F.round(
            F.sum(F.col("q").cast("decimal(18,2)")).cast("double") / F.count(F.lit(1)),
            4,
        ).alias("mean_q"),
        F.min("q").alias("min_q"),
        F.max("q").alias("max_q"),
    )
    return qs.join(s, "cycle").select(
        F.col("cycle").cast("bigint").alias("cycle"),
        F.col("n").cast("bigint").alias("n_reads"),
        "q1",
        "median_q",
        "q3",
        "mean_q",
        "min_q",
        "max_q",
        (F.col("mean_q") < 25).alias("warn_low_quality"),
    )


_ADAPTERS = ("ACGT", "GTAC", "TTAA")


@query(
    "q234_adapter_scan",
    oracle=f"""
WITH dna AS ({SQL_DOCS_DNA}),
d AS (
  SELECT dna.doc_id, dna.seq, doc.source
  FROM dna JOIN documents doc ON doc.doc_id = dna.doc_id
  WHERE length(dna.seq) >= 4
),
a AS (SELECT unnest(['{_ADAPTERS[0]}', '{_ADAPTERS[1]}', '{_ADAPTERS[2]}']) AS adapter),
m AS (
  SELECT d.source, a.adapter,
         CASE WHEN position(a.adapter IN d.seq) > 0 THEN 1 ELSE 0 END AS has_full,
         CASE WHEN substr(d.seq, length(d.seq) - 2, 3) = substr(a.adapter, 1, 3) THEN 3
              WHEN substr(d.seq, length(d.seq) - 1, 2) = substr(a.adapter, 1, 2) THEN 2
              WHEN substr(d.seq, length(d.seq), 1) = substr(a.adapter, 1, 1) THEN 1
              ELSE 0 END AS partial_3p
  FROM d CROSS JOIN a
)
SELECT source, adapter,
       CAST(COUNT(*) AS BIGINT) AS n_reads,
       CAST(SUM(has_full) AS BIGINT) AS n_full_match,
       ROUND(SUM(has_full) / CAST(COUNT(*) AS DOUBLE), 6) AS full_rate,
       CAST(SUM(CASE WHEN partial_3p >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_partial_3p,
       ROUND(SUM(partial_3p) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_3p_overlap
FROM m GROUP BY source, adapter
""",
)
def q234_adapter_scan(spark, sf_dir):
    """ADAPTER-CONTAMINATION SCAN (cutadapt / FastQC 'overrepresented
    sequences' shape): per (read group, adapter) the full-match rate
    anywhere in the read and the 3'-end PARTIAL-overlap profile (an
    adapter running into the read end matches only its prefix — the
    k>=1 suffix-prefix overlap cutadapt trims). Library-prep QC
    sibling of q220's insert-size report: short inserts show up here
    first.

    Scale shape: a 3-row adapter table cross-joined (broadcast) into
    one scan projection, then a map-side-combinable (source, adapter)
    aggregate — contaminant screening at scan speed with bounded
    output. Integer counts, single IEEE divisions."""
    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs_as_dna(spark, sf_dir)
        .join(docs.select("doc_id", "source"), "doc_id")
        .where(F.length("seq") >= 4)
    )
    a = spark.createDataFrame([(x,) for x in _ADAPTERS], ["adapter"])
    m = d.crossJoin(F.broadcast(a)).select(
        "source",
        "adapter",
        F.when(F.expr("position(adapter IN seq)") > 0, 1).otherwise(0).alias(
            "has_full"
        ),
        F.expr(
            """CASE WHEN substr(seq, length(seq) - 2, 3) = substr(adapter, 1, 3) THEN 3
                    WHEN substr(seq, length(seq) - 1, 2) = substr(adapter, 1, 2) THEN 2
                    WHEN substr(seq, length(seq), 1) = substr(adapter, 1, 1) THEN 1
                    ELSE 0 END"""
        ).alias("partial_3p"),
    )
    return m.groupBy("source", "adapter").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reads"),
        F.sum("has_full").cast("bigint").alias("n_full_match"),
        F.round(F.sum("has_full") / F.count(F.lit(1)).cast("double"), 6).alias(
            "full_rate"
        ),
        F.sum(F.when(F.col("partial_3p") >= 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_partial_3p"),
        F.round(F.sum("partial_3p") / F.count(F.lit(1)).cast("double"), 6).alias(
            "mean_3p_overlap"
        ),
    )


@query(
    "q236_transmission_phasing",
    oracle="""
WITH trio AS (
  SELECT CAST(o_orderkey % 5 AS INT) AS trio_id,
         CAST(o_orderkey % 3 AS INT) AS f,
         CAST(o_custkey % 3 AS INT) AS m,
         CAST((o_orderkey + o_custkey) % 3 AS INT) AS c
  FROM orders
),
cls AS (
  SELECT trio_id,
         CASE
           WHEN c < (f // 2) + (m // 2)
             OR c > ((f + 1) // 2) + ((m + 1) // 2) THEN 'mendel_violation'
           WHEN c <> 1 THEN 'hom_uninformative'
           WHEN f >= 1 AND m <= 1 AND NOT (m >= 1 AND f <= 1)
             THEN 'phased_paternal_alt'
           WHEN m >= 1 AND f <= 1 AND NOT (f >= 1 AND m <= 1)
             THEN 'phased_maternal_alt'
           ELSE 'unphaseable_both_het'
         END AS class
  FROM trio
)
SELECT trio_id,
       COUNT(*) AS n_sites,
       COUNT(*) FILTER (WHERE class = 'phased_paternal_alt') AS n_paternal,
       COUNT(*) FILTER (WHERE class = 'phased_maternal_alt') AS n_maternal,
       COUNT(*) FILTER (WHERE class = 'unphaseable_both_het') AS n_unphaseable,
       COUNT(*) FILTER (WHERE class = 'hom_uninformative') AS n_uninformative,
       COUNT(*) FILTER (WHERE class = 'mendel_violation') AS n_violations,
       ROUND((COUNT(*) FILTER (WHERE class LIKE 'phased%'))
             / CAST(NULLIF(COUNT(*) FILTER (WHERE class LIKE 'phased%')
                           + COUNT(*) FILTER (WHERE class = 'unphaseable_both_het'), 0)
                    AS DOUBLE), 6) AS het_phaseable_fraction
FROM cls GROUP BY trio_id
""",
)
def q236_transmission_phasing(spark, sf_dir):
    """PHASE-BY-TRANSMISSION (the trio phasing whatshap/GATK
    PhaseByTransmission perform, upstream of q202's switch-error
    metric and beside q90/q101's trio machinery): a het child site is
    phased when exactly one parent can have donated the alt allele
    (alt-carrier parent x ref-capable parent); both-het trios are the
    classic unphaseable configuration; hom child sites are
    uninformative; impossible dosages are Mendel violations (q101's
    bound test). Per trio: the transmission ledger and the
    het-phaseable fraction — the number that says how much of the
    genome transmission phasing resolves before read-backed phasing
    must take over.

    Scale shape: pure conditional aggregation over one scan — the
    same partial-agg tree as q101, with a 5-class CASE instead of a
    bound test."""
    o = load_table(spark, sf_dir, "orders")
    f = (F.col("o_orderkey") % 3).cast("int")
    m = (F.col("o_custkey") % 3).cast("int")
    c = ((F.col("o_orderkey") + F.col("o_custkey")) % 3).cast("int")
    lo = (f / 2).cast("int") + (m / 2).cast("int")
    hi = ((f + 1) / 2).cast("int") + ((m + 1) / 2).cast("int")
    pat = (f >= 1) & (m <= 1)
    mat = (m >= 1) & (f <= 1)
    cls = o.select(
        (F.col("o_orderkey") % 5).cast("int").alias("trio_id"),
        F.when((c < lo) | (c > hi), "mendel_violation")
        .when(c != 1, "hom_uninformative")
        .when(pat & ~mat, "phased_paternal_alt")
        .when(mat & ~pat, "phased_maternal_alt")
        .otherwise("unphaseable_both_het")
        .alias("class"),
    )
    ccount = lambda name: F.sum(  # noqa: E731
        F.when(F.col("class") == name, 1).otherwise(0)
    ).cast("bigint")
    phased = F.sum(
        F.when(F.col("class").startswith("phased"), 1).otherwise(0)
    ).cast("bigint")
    unph = ccount("unphaseable_both_het")
    return cls.groupBy("trio_id").agg(
        F.count(F.lit(1)).alias("n_sites"),
        ccount("phased_paternal_alt").alias("n_paternal"),
        ccount("phased_maternal_alt").alias("n_maternal"),
        unph.alias("n_unphaseable"),
        ccount("hom_uninformative").alias("n_uninformative"),
        ccount("mendel_violation").alias("n_violations"),
        F.round(
            phased / F.nullif(phased + unph, F.lit(0)).cast("double"), 6
        ).alias("het_phaseable_fraction"),
    )


# Tajima constants for n = 12 chromosomes (6 diploid samples), computed
# once: a1 = sum 1/i, e1 = c1/a1, e2 = c2/(a1^2 + a2) per Tajima (1989).
_TAJ_N = 12
_TAJ_A1 = "3.0198773448773446"
_TAJ_E1 = "0.02079558537315068"
_TAJ_E2 = "0.004887841156061376"


@query(
    "q237_prs_score",
    oracle="""
WITH gt AS (
  SELECT CAST(l_suppkey % 8 AS INT) AS sample_id,
         l_orderkey % 500 AS site,
         MIN(CAST(l_partkey % 3 AS INT)) AS dosage
  FROM lineitem GROUP BY 1, 2
),
w AS (
  SELECT DISTINCT site,
         CAST((site * 31) % 7 - 3 AS DECIMAL(5,1)) / 10 AS beta
  FROM gt
),
s AS (
  SELECT g.sample_id,
         CAST(COUNT(*) AS BIGINT) AS n_sites,
         CAST(SUM(w.beta * g.dosage) AS DOUBLE) AS prs
  FROM gt g JOIN w USING (site)
  GROUP BY g.sample_id
)
SELECT sample_id, n_sites, ROUND(prs, 6) AS prs,
       CAST(ROW_NUMBER() OVER (ORDER BY prs DESC, sample_id) AS INT) AS risk_rank
FROM s
""",
)
def q237_prs_score(spark, sf_dir):
    """POLYGENIC RISK SCORE (PLINK ``--score`` semantics: per sample
    the effect-size-weighted sum of alt-allele dosages over a weight
    panel): the downstream consumer of the GWAS-prep funnel
    q199/q200 — its pruned, associated sites become the beta panel.
    Exact: betas are one-decimal DECIMALs, dosage is integer, so the
    DECIMAL sum is order-independent and the risk ranking is
    partition-invariant with full tie-breaks.

    Scale shape: genotypes aggregate per (sample, site) once
    (map-side combinable); the weight panel is site-keyed and rides
    the same shuffle key — at biobank scale (millions of samples x
     1M panel sites) this is one co-partitioned join + one
    per-sample sum, the canonical PRS batch job."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    gt = li.groupBy(
        (F.col("l_suppkey") % 8).cast("int").alias("sample_id"),
        (F.col("l_orderkey") % 500).alias("site"),
    ).agg(F.min((F.col("l_partkey") % 3).cast("int")).alias("dosage"))
    gt = gt.transform(managed_persist)
    w = gt.select("site").distinct().select(
        "site",
        (
            ((F.col("site") * 31) % 7 - 3).cast("decimal(5,1)") / 10
        ).alias("beta"),
    )
    s = (
        gt.join(w, "site")
        .groupBy("sample_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sites"),
            F.sum(F.col("beta") * F.col("dosage")).cast("double").alias("prs"),
        )
    )
    # risk ranking as a DISTRIBUTED row number (PRS-bucket prefix +
    # bucket-local window, r7): at biobank scale the sample ledger is
    # row-sized, so a global rank window would single-partition it
    from variantcalling_spark.operators.ordered import distributed_row_number

    return distributed_row_number(
        s.select("sample_id", "n_sites", F.round("prs", 6).alias("prs")),
        [F.col("prs").desc(), F.col("sample_id")],
        F.floor(-F.col("prs") * 4).cast("bigint"),
        out_col="__rn",
    ).select(
        "sample_id",
        "n_sites",
        "prs",
        F.col("__rn").cast("int").alias("risk_rank"),
    )


@query(
    "q238_tajimas_d",
    oracle=f"""
WITH gt AS (
  SELECT CAST(l_suppkey % 6 AS INT) AS sample_id,
         l_orderkey % 2000 AS site,
         MIN(CAST(l_partkey % 3 AS INT)) AS dosage
  FROM lineitem GROUP BY 1, 2
),
ac AS (
  SELECT site, CAST(SUM(dosage) AS BIGINT) AS ac
  FROM gt GROUP BY site
  HAVING COUNT(*) = 6
),
seg AS (
  SELECT site // 100 AS win, ac,
         2 * ac * ({_TAJ_N} - ac) AS pi_num
  FROM ac WHERE ac > 0 AND ac < {_TAJ_N}
),
w AS (
  SELECT win,
         CAST(COUNT(*) AS BIGINT) AS s_sites,
         CAST(SUM(pi_num) AS BIGINT) AS pi_num_sum
  FROM seg GROUP BY win
)
SELECT win,
       s_sites,
       ROUND(pi_num_sum / CAST({_TAJ_N} * ({_TAJ_N} - 1) AS DOUBLE), 6) AS pi,
       ROUND(s_sites / CAST({_TAJ_A1} AS DOUBLE), 6) AS theta_w,
       ROUND(
         (pi_num_sum / CAST({_TAJ_N} * ({_TAJ_N} - 1) AS DOUBLE)
          - s_sites / CAST({_TAJ_A1} AS DOUBLE))
         / sqrt(CAST({_TAJ_E1} AS DOUBLE) * s_sites
                + CAST({_TAJ_E2} AS DOUBLE) * s_sites * (s_sites - 1)),
         6) AS tajima_d
FROM w WHERE s_sites >= 2
""",
)
def q238_tajimas_d(spark, sf_dir):
    """TAJIMA'S D per genomic window (vcftools ``--TajimaD`` shape —
    the classic neutrality test contrasting pairwise diversity pi
    against Watterson's theta from the segregating-site count; joins
    the cohort population-genetics family q100/q153/q155/q198):
    per-site alt-allele counts over a complete 6-sample (n=12
    chromosome) cohort, windowed sums, and the D statistic with the
    Tajima (1989) variance constants precomputed for n=12.

    Exactness: pi's numerator stays an INTEGER sum (2*AC*(n-AC)
    summed as bigint) and divides by n(n-1) exactly once at the end;
    the constants are compile-time literals identical in both
    engines; sqrt/divisions are single IEEE ops. Scale shape: one
    genotype aggregate -> one site aggregate -> one window aggregate,
    all map-side combinable; no windows over the row stream."""
    li = load_table(spark, sf_dir, "lineitem")
    n = _TAJ_N
    gt = li.groupBy(
        (F.col("l_suppkey") % 6).cast("int").alias("sample_id"),
        (F.col("l_orderkey") % 2000).alias("site"),
    ).agg(F.min((F.col("l_partkey") % 3).cast("int")).alias("dosage"))
    ac = (
        gt.groupBy("site")
        .agg(
            F.sum("dosage").cast("bigint").alias("ac"),
            F.count(F.lit(1)).alias("n_samples"),
        )
        .where(F.col("n_samples") == 6)
    )
    seg = ac.where((F.col("ac") > 0) & (F.col("ac") < n)).select(
        F.expr("site DIV 100").alias("win"),
        (2 * F.col("ac") * (n - F.col("ac"))).alias("pi_num"),
    )
    w = seg.groupBy("win").agg(
        F.count(F.lit(1)).cast("bigint").alias("s_sites"),
        F.sum("pi_num").cast("bigint").alias("pi_num_sum"),
    )
    pi = F.col("pi_num_sum") / F.lit(float(n * (n - 1)))
    th = F.col("s_sites") / F.lit(float(_TAJ_A1))
    denom = F.sqrt(
        F.lit(float(_TAJ_E1)) * F.col("s_sites")
        + F.lit(float(_TAJ_E2)) * F.col("s_sites") * (F.col("s_sites") - 1)
    )
    return w.where(F.col("s_sites") >= 2).select(
        "win",
        "s_sites",
        F.round(pi, 6).alias("pi"),
        F.round(th, 6).alias("theta_w"),
        F.round((pi - th) / denom, 6).alias("tajima_d"),
    )


def _sw_wavefront_oracle_sql(match: int = 2, mismatch: int = -1, gap: int = -2) -> str:
    """q219's wavefront CTE with the Smith-Waterman local clamp
    (GREATEST(0, ...)) per cell and a best-so-far fold carried through
    the recursion (local alignments end anywhere, so the answer is the
    max over every diagonal, not the final cell)."""
    val = f"""
      CASE WHEN i = 0 OR d + 1 - i = 0 THEN 0
           ELSE GREATEST(0,
             prev[CAST(i - GREATEST(0, d - 1 - m) AS INT)]
               + CASE WHEN substr(a, CAST(i AS INT), 1) = substr(b, CAST(d + 1 - i AS INT), 1)
                      THEN {match} ELSE {mismatch} END,
             cur[CAST(i - GREATEST(0, d - m) AS INT)] + {gap},
             cur[CAST(i + 1 - GREATEST(0, d - m) AS INT)] + {gap})
      END"""
    return f"""
WITH RECURSIVE dna AS ({SQL_DOCS_DNA}),
pairs AS (
  SELECT ea.doc_id // 2 AS pair_id, ea.seq AS a, eb.seq AS b,
         CAST(length(ea.seq) AS INT) AS n, CAST(length(eb.seq) AS INT) AS m
  FROM dna ea JOIN dna eb ON eb.doc_id = ea.doc_id + 1
  WHERE ea.doc_id % 2 = 0
),
rec AS (
  SELECT pair_id, a, b, n, m, 0 AS d,
         [CAST(0 AS INT)] AS cur, CAST(NULL AS INT[]) AS prev,
         CAST(0 AS INT) AS best
  FROM pairs
  UNION ALL
  SELECT pair_id, a, b, n, m, d + 1,
         nxt.cur2 AS cur, cur AS prev,
         GREATEST(best, CAST(COALESCE(list_max(nxt.cur2), 0) AS INT)) AS best
  FROM rec,
  LATERAL (
    SELECT list_transform(generate_series(GREATEST(0, d + 1 - m), LEAST(n, d + 1)),
                          i -> {val}) AS cur2
  ) nxt
  WHERE d < n + m
)
SELECT pair_id, n, m, best AS sw_score
FROM rec WHERE d = n + m
"""


@query("q247_sw_local_alignment", oracle=_sw_wavefront_oracle_sql())
def q247_sw_local_alignment(spark, sf_dir):
    """SMITH-WATERMAN local alignment score over the q219 pair frame —
    the LOCAL twin of the global NW alignment (alignments start and
    end anywhere: cells clamp at 0, the score is the max over all
    cells), i.e. the scoring core of BLAST seeds and soft-clip-aware
    read alignment. Together q219+q247 close the classic alignment
    pair.

    Same architecture as q219: Arrow kernel with the running-max
    closed form (the zero-clamp composes with it because a clamped
    cell's gap chain 0 + gap*k is always dominated by the final
    clamp), wavefront recursive-CTE oracle with a best-so-far fold —
    every cell value-pinned. Integer DP, zero shuffle, pairs
    partition freely."""
    from variantcalling_spark.operators.kernels import sw_align_scores

    dna = docs_as_dna(spark, sf_dir).transform(managed_persist)
    a = dna.where(F.col("doc_id") % 2 == 0).select(
        F.expr("doc_id DIV 2").alias("pair_id"), F.col("seq").alias("a")
    )
    b = dna.select(
        F.expr("(doc_id - 1) DIV 2").alias("pair_id"),
        F.col("seq").alias("b"),
        (F.col("doc_id") % 2).alias("par"),
    ).where(F.col("par") == 1).drop("par")
    return sw_align_scores(a.join(b, "pair_id"))


@query(
    "q250_str_catalog",
    oracle=f"""
WITH d AS (
  -- STR-prone derivation: a 3-letter cyclic alphabet over 40 chars
  -- (the 4-letter 24-char docs_as_dna map almost never produces
  -- >= 3-copy tandem repeats — a vacuous catalog, the q201 lesson)
  SELECT doc_id,
         translate(substr(text, 1, 40), 'abcdefghijklmnopqrstuvwxyz ',
                   'ACGACGACGACGACGACGACGACGACG') AS seq,
         length(translate(substr(text, 1, 40), 'abcdefghijklmnopqrstuvwxyz ',
                   'ACGACGACGACGACGACGACGACGACG')) AS n
  FROM documents
  WHERE length(text) >= 6
),
per AS (SELECT unnest([2, 3]) AS p),
m AS (
  SELECT d.doc_id, d.seq, d.n, per.p, pos,
         CASE WHEN substr(d.seq, CAST(pos AS INT), 1)
                 = substr(d.seq, CAST(pos + per.p AS INT), 1)
              THEN 1 ELSE 0 END AS mt
  FROM d CROSS JOIN per, unnest(generate_series(1, d.n - per.p)) AS t(pos)
),
flg AS (
  SELECT doc_id, seq, p, pos, mt,
         CASE WHEN pos = 1 OR mt <> LAG(mt) OVER (PARTITION BY doc_id, p ORDER BY pos)
                   OR LAG(pos) OVER (PARTITION BY doc_id, p ORDER BY pos) <> pos - 1
              THEN 1 ELSE 0 END AS brk
  FROM m
),
runs0 AS (
  SELECT doc_id, seq, p, pos, mt,
         SUM(brk) OVER (PARTITION BY doc_id, p ORDER BY pos) AS rid
  FROM flg
),
runs AS (
  SELECT doc_id, MAX(seq) AS seq, p, rid, MIN(pos) AS start_pos,
         CAST(COUNT(*) AS INT) AS run_len
  FROM runs0 WHERE mt = 1
  GROUP BY doc_id, p, rid
),
str_cand AS (
  SELECT doc_id, p AS period, start_pos,
         run_len + p AS region_len,
         (run_len + p) // p AS n_copies,
         substr(seq, CAST(start_pos AS INT), CAST(p AS INT)) AS unit
  FROM runs
  WHERE (run_len + p) // p >= 3
)
SELECT doc_id, period, CAST(start_pos AS BIGINT) AS start_pos,
       CAST(region_len AS INT) AS region_len,
       CAST(n_copies AS INT) AS n_copies, unit
FROM str_cand
WHERE NOT (period > 1 AND substr(unit, 1, 1) = substr(unit, 2, 1))
""",
)
def q250_str_catalog(spark, sf_dir):
    """SHORT-TANDEM-REPEAT CATALOG (Tandem Repeats Finder / HipSTR
    reference-panel shape — STR loci are the hmer family's big
    sibling and a flow-sequencing error hotspot, cf. q13/q229): detect
    period-2/3 tandem repeats via the classic SELF-SIMILARITY trick —
    seq[i] == seq[i+p] flags, whose maximal runs of length L mark a
    repeat region of length L+p with >= (L+p)/p unit copies — then
    gaps-and-islands the flags (q211/q229 machinery), keep >= 3
    copies, and drop degenerate homopolymer units (those belong to
    q229).

    Scale shape: per-(sequence, period) flag projection; run windows
    partition by (sequence, period) — bounded; no joins. The flag
    trick makes period detection a PROJECTION instead of substring
    cross-matching."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    str_map = "ACGACGACGACGACGACGACGACGACG"
    d = (
        docs.where(F.length("text") >= 6)
        .select(
            "doc_id",
            F.translate(F.substring("text", 1, 40), DNA_FROM, str_map).alias("seq"),
        )
        .select("doc_id", "seq", F.length("seq").alias("n"))
    )
    per = spark.createDataFrame([(2,), (3,)], ["p"]).select(
        F.col("p").cast("int").alias("p")
    )
    m = (
        d.crossJoin(F.broadcast(per))
        .select(
            "doc_id",
            "seq",
            "p",
            F.explode(F.sequence(F.lit(1), F.col("n") - F.col("p"))).alias("pos"),
        )
        .select(
            "doc_id",
            "seq",
            "p",
            "pos",
            F.when(
                F.expr("substr(seq, CAST(pos AS INT), 1)")
                == F.expr("substr(seq, CAST(pos + p AS INT), 1)"),
                1,
            )
            .otherwise(0)
            .alias("mt"),
        )
    )
    wo = W.partitionBy("doc_id", "p").orderBy("pos")
    flg = m.select(
        "*",
        F.when(
            (F.col("pos") == 1)
            | (F.col("mt") != F.lag("mt").over(wo))
            | (F.lag("pos").over(wo) != F.col("pos") - 1),
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    runs0 = flg.withColumn("rid", F.sum("brk").over(wo))
    runs = (
        runs0.where(F.col("mt") == 1)
        .groupBy("doc_id", "p", "rid")
        .agg(
            F.max("seq").alias("seq"),
            F.min("pos").alias("start_pos"),
            F.count(F.lit(1)).cast("int").alias("run_len"),
        )
    )
    cand = runs.select(
        "doc_id",
        F.col("p").alias("period"),
        F.col("start_pos").cast("bigint").alias("start_pos"),
        (F.col("run_len") + F.col("p")).cast("int").alias("region_len"),
        F.expr("CAST((run_len + p) DIV p AS INT)").alias("n_copies"),
        F.expr("substr(seq, CAST(start_pos AS INT), CAST(p AS INT))").alias("unit"),
    ).where(F.col("n_copies") >= 3)
    return cand.where(
        ~((F.col("period") > 1) & (F.expr("substr(unit, 1, 1) = substr(unit, 2, 1)")))
    )


@query(
    "q261_n50_stats",
    oracle="""
WITH contigs AS (
  SELECT source, doc_id, n_chars AS clen FROM documents
),
ranked AS (
  SELECT source, clen,
         SUM(clen) OVER (
           PARTITION BY source ORDER BY clen DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         SUM(clen) OVER (PARTITION BY source) AS total,
         ROW_NUMBER() OVER (
           PARTITION BY source ORDER BY clen DESC, doc_id) AS rnk
  FROM contigs
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_contigs,
       CAST(MAX(total) AS BIGINT) AS total_bases,
       CAST(MAX(clen) AS BIGINT) AS max_len,
       CAST(MAX(CASE WHEN 2 * cum >= total THEN clen END) AS BIGINT) AS n50,
       CAST(MIN(CASE WHEN 2 * cum >= total THEN rnk END) AS BIGINT) AS l50,
       CAST(MAX(CASE WHEN 10 * cum >= 9 * total THEN clen END) AS BIGINT) AS n90
FROM ranked
GROUP BY source
""",
)
def q261_n50_stats(spark, sf_dir):
    """N50 / L50 / N90 ASSEMBLY-CONTIGUITY STATISTICS per source — the
    canonical genome-assembly QC table (QUAST / assembly-stats shape):
    N50 = the contig length at which the descending-length cumulative
    sum first covers half the assembly; L50 = how many contigs that
    takes; N90 the 90% analog. Document lengths stand in for contig
    lengths, grouped per source (one assembly per source).

    Scale discipline: one window over (source) ordered by length — the
    partition key is the assembly, so no window spans more than one
    group; all arithmetic is BIGINT-exact (`2*cum >= total` instead of
    a float 0.5 threshold), so the result is bit-stable under any
    partitioning; the final aggregate is 5 rows. At 100 TB the window
    shuffles each assembly's contig list once — the minimum any exact
    N50 needs — and conditional MAX/MIN aggregates avoid a second
    pass."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.col("n_chars").alias("clen")
    )
    w_ord = (
        W.partitionBy("source")
        .orderBy(F.col("clen").desc(), "doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    ranked = docs.select(
        "source",
        "clen",
        F.sum("clen").over(w_ord).alias("cum"),
        F.sum("clen").over(W.partitionBy("source")).alias("total"),
        F.row_number()
        .over(W.partitionBy("source").orderBy(F.col("clen").desc(), "doc_id"))
        .alias("rnk"),
    )
    half = 2 * F.col("cum") >= F.col("total")
    ninety = 10 * F.col("cum") >= 9 * F.col("total")
    return ranked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_contigs"),
        F.max("total").cast("bigint").alias("total_bases"),
        F.max("clen").cast("bigint").alias("max_len"),
        F.max(F.when(half, F.col("clen"))).cast("bigint").alias("n50"),
        F.min(F.when(half, F.col("rnk"))).cast("bigint").alias("l50"),
        F.max(F.when(ninety, F.col("clen"))).cast("bigint").alias("n90"),
    )


_DEPTH_BIN_US = 600_000_000  # 10-minute "positions" on the event timeline


@query(
    "q275_wgs_uniformity_metrics",
    oracle=f"""
WITH depth AS (
  SELECT user_id % 5 AS grp,
         epoch_us(ts) // {_DEPTH_BIN_US} AS bin,
         CAST(COUNT(*) AS BIGINT) AS d
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT grp, d,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY d, bin) AS rn,
         COUNT(*) OVER (PARTITION BY grp) AS n,
         SUM(d) OVER (PARTITION BY grp) AS total
  FROM depth
)
SELECT grp,
       CAST(MAX(n) AS BIGINT) AS n_bins,
       ROUND(CAST(MAX(total) AS DOUBLE) / MAX(n), 6) AS mean_depth,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN d END) AS BIGINT) AS median_depth,
       CAST(MAX(CASE WHEN rn = (n + 4) // 5 THEN d END) AS BIGINT) AS p20_depth,
       ROUND((CAST(MAX(total) AS DOUBLE) / MAX(n))
             / MAX(CASE WHEN rn = (n + 4) // 5 THEN d END), 6) AS fold80,
       CAST(SUM(CASE WHEN d >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_5x,
       CAST(SUM(CASE WHEN d >= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_ge_10x
FROM ranked GROUP BY grp
""",
)
def q275_wgs_uniformity_metrics(spark, sf_dir):
    """COVERAGE-UNIFORMITY METRICS (Picard CollectWgsMetrics shape —
    the fold-80 penalty report `coverage_analysis.py` renders): per
    contig, the binned depth profile's mean, exact median, exact 20th
    percentile, fold80 = mean/p20 (how much extra sequencing uniform
    coverage would need), and >=5x / >=10x callable-bin counts.

    Scale discipline: depth comes from a (grp, bin) COUNT — 2 integer
    projections and one map-side-combinable aggregate, never per-base
    rows; the exact percentiles use integer-rank selection over the
    BINNED profile (bins-per-contig is bounded), partitioned per
    contig. Identical rank arithmetic both engines: (n+1)//2 and
    (n+4)//5, no float quantiles."""
    from pyspark.sql import Window as W

    ev = events_points(spark, sf_dir)
    depth = ev.groupBy(
        F.col("grp"), F.expr(f"ts_us DIV {_DEPTH_BIN_US}").alias("bin")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    ranked = depth.select(
        "grp",
        "d",
        F.row_number().over(W.partitionBy("grp").orderBy("d", "bin")).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("grp")).alias("n"),
        F.sum("d").over(W.partitionBy("grp")).alias("total"),
    )
    med_rank = F.floor((F.col("n") + 1) / 2)
    p20_rank = F.floor((F.col("n") + 4) / 5)
    return ranked.groupBy("grp").agg(
        F.max("n").cast("bigint").alias("n_bins"),
        F.round(F.max("total").cast("double") / F.max("n"), 6).alias("mean_depth"),
        F.max(F.when(F.col("rn") == med_rank, F.col("d")))
        .cast("bigint")
        .alias("median_depth"),
        F.max(F.when(F.col("rn") == p20_rank, F.col("d")))
        .cast("bigint")
        .alias("p20_depth"),
        F.round(
            (F.max("total").cast("double") / F.max("n"))
            / F.max(F.when(F.col("rn") == p20_rank, F.col("d"))),
            6,
        ).alias("fold80"),
        F.sum(F.when(F.col("d") >= 5, 1).otherwise(0)).cast("bigint").alias("n_ge_5x"),
        F.sum(F.when(F.col("d") >= 10, 1).otherwise(0)).cast("bigint").alias("n_ge_10x"),
    )


_DS_TARGET = 4  # target mean depth per bin
_DS_HASH_MOD = 10_000


@query(
    "q276_depth_normalization",
    oracle=f"""
WITH ev AS (
  SELECT event_id, user_id % 5 AS grp,
         epoch_us(ts) // {_DEPTH_BIN_US} AS bin,
         list_reduce(list_transform(string_split(substr(md5(CAST(event_id AS VARCHAR)), 1, 8), ''),
           c -> CAST(CASE WHEN ascii(c) >= 97 THEN ascii(c) - 87
                ELSE ascii(c) - 48 END AS BIGINT)), (a, b) -> a * 16 + b)
           % 2147483647 % {_DS_HASH_MOD} AS hmod
  FROM events
),
depth AS (
  SELECT grp, bin, CAST(COUNT(*) AS BIGINT) AS d FROM ev GROUP BY grp, bin
),
keep AS (
  SELECT e.grp, e.bin,
         CASE WHEN e.hmod < ({_DS_TARGET} * {_DS_HASH_MOD}) // d.d
              THEN 1 ELSE 0 END AS kept
  FROM ev e JOIN depth d ON e.grp = d.grp AND e.bin = d.bin
),
after AS (
  SELECT grp, bin, CAST(SUM(kept) AS BIGINT) AS d_after
  FROM keep GROUP BY grp, bin
),
j AS (
  SELECT d.grp, d.d, a.d_after FROM depth d JOIN after a
    ON a.grp = d.grp AND a.bin = d.bin
)
SELECT grp,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       ROUND(CAST(SUM(d) AS DOUBLE) / COUNT(*), 6) AS mean_before,
       ROUND(CAST(SUM(d_after) AS DOUBLE) / COUNT(*), 6) AS mean_after,
       CAST(MAX(d) AS BIGINT) AS max_before,
       CAST(MAX(d_after) AS BIGINT) AS max_after
FROM j GROUP BY grp
""",
)
def q276_depth_normalization(spark, sf_dir):
    """DETERMINISTIC DOWNSAMPLING TO TARGET DEPTH (samtools view -s /
    GATK DownsampleSam shape, and equally the per-domain document
    subsampling of a corpus-mixing pipeline q115): per (contig, bin),
    keep each read with probability target/depth — decided by a
    PORTABLE HASH of the read id against the per-bin threshold, so the
    'sample' is a pure function of the data (reproducible across
    engines, runs, and partitionings; no RNG state). Reports the
    before/after depth profile.

    Scale discipline: one depth aggregate, one equi-join of reads to
    their bin's threshold (both sides hash on (grp, bin) — at genome
    scale the depth table is small per contig and AQE broadcasts it),
    one filtered re-aggregate. The keep decision is integer arithmetic
    on an md5-derived hash — the same engine-portable hash the dedup
    family uses."""
    from variantcalling_spark.operators.dedup import portable_string_hash

    ev = events_points(spark, sf_dir).select(
        "event_id",
        "grp",
        F.expr(f"ts_us DIV {_DEPTH_BIN_US}").alias("bin"),
        (portable_string_hash(F.col("event_id").cast("string")) % _DS_HASH_MOD).alias(
            "hmod"
        ),
    ).transform(managed_persist)
    depth = ev.groupBy("grp", "bin").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    keep = ev.join(depth, ["grp", "bin"]).select(
        "grp",
        "bin",
        F.when(
            F.col("hmod") < F.floor(F.lit(_DS_TARGET * _DS_HASH_MOD) / F.col("d")), 1
        )
        .otherwise(0)
        .alias("kept"),
    )
    after = keep.groupBy("grp", "bin").agg(
        F.sum("kept").cast("bigint").alias("d_after")
    )
    j = depth.join(after, ["grp", "bin"])
    return j.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.round(F.sum("d").cast("double") / F.count(F.lit(1)), 6).alias("mean_before"),
        F.round(F.sum("d_after").cast("double") / F.count(F.lit(1)), 6).alias(
            "mean_after"
        ),
        F.max("d").cast("bigint").alias("max_before"),
        F.max("d_after").cast("bigint").alias("max_after"),
    )


@query(
    "q285_cochran_armitage",
    oracle=f"""
WITH geno AS (
  SELECT CASE WHEN substr(seq, 1, 1) = 'G' THEN 1 ELSE 0 END
         + CASE WHEN substr(seq, 2, 1) = 'G' THEN 1 ELSE 0 END AS g,
         CAST(doc_id % 2 AS BIGINT) AS is_case
  FROM ({SQL_DOCS_DNA}) d WHERE length(seq) >= 2
),
counts AS (
  SELECT g,
         CAST(SUM(is_case) AS BIGINT) AS r_g,
         CAST(COUNT(*) AS BIGINT) AS n_g
  FROM geno GROUP BY g
),
tot AS (
  SELECT CAST(SUM(r_g) AS BIGINT) AS r,
         CAST(SUM(n_g) AS BIGINT) AS n,
         CAST(SUM(g * r_g) AS BIGINT) AS swr,
         CAST(SUM(g * n_g) AS BIGINT) AS swn,
         CAST(SUM(g * g * n_g) AS BIGINT) AS swwn
  FROM counts
)
SELECT n, r,
       CAST(n * swr - r * swn AS BIGINT) AS t_num,
       ROUND((CAST(r AS DOUBLE) * (n - r) / n)
             * (CAST(n AS DOUBLE) * swwn - CAST(swn AS DOUBLE) * swn), 4) AS v_scaled,
       ROUND((CAST(n AS DOUBLE) * swr - CAST(r AS DOUBLE) * swn)
             / sqrt((CAST(r AS DOUBLE) * (n - r) / n)
                    * (CAST(n AS DOUBLE) * swwn - CAST(swn AS DOUBLE) * swn)), 6)
         AS z_trend,
       ROUND(POW(CAST(n AS DOUBLE) * swr - CAST(r AS DOUBLE) * swn, 2)
             / ((CAST(r AS DOUBLE) * (n - r) / n)
                * (CAST(n AS DOUBLE) * swwn - CAST(swn AS DOUBLE) * swn)), 6)
         AS chi2_trend
FROM tot
""",
)
def q285_cochran_armitage(spark, sf_dir):
    """COCHRAN-ARMITAGE TREND TEST — the GWAS per-variant association
    workhorse (the additive-model test plink runs at every site; joins
    the population-genetics stats family: HWE q153, FST q239, LD q240,
    Tajima's D q238): dose weights w = g in (0,1,2) over genotype
    copy-count vs case/control, T = N*Sum(w r_g) - R*Sum(w n_g),
    Var ~ R(N-R)/N * (N*Sum(w^2 n_g) - Sum(w n_g)^2), Z = T/sqrt(V).

    Scale discipline: the whole test reduces to FIVE integer moments
    of the 3-row genotype-count table — one map-side-combinable
    aggregate over the callset, then scalar arithmetic; at biobank
    scale this runs per-variant as a grouped aggregate with the same
    shape. T is reported as an exact BIGINT numerator; Z/chi2 are
    single double expressions snapped at 6."""
    d = docs_as_dna(spark, sf_dir).where(F.length("seq") >= 2)
    geno = d.select(
        (
            F.when(F.substring("seq", 1, 1) == "G", 1).otherwise(0)
            + F.when(F.substring("seq", 2, 1) == "G", 1).otherwise(0)
        ).alias("g"),
        (F.col("doc_id") % 2).cast("bigint").alias("is_case"),
    )
    counts = geno.groupBy("g").agg(
        F.sum("is_case").cast("bigint").alias("r_g"),
        F.count(F.lit(1)).cast("bigint").alias("n_g"),
    )
    tot = counts.agg(
        F.sum("r_g").cast("bigint").alias("r"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum(F.col("g") * F.col("r_g")).cast("bigint").alias("swr"),
        F.sum(F.col("g") * F.col("n_g")).cast("bigint").alias("swn"),
        F.sum(F.col("g") * F.col("g") * F.col("n_g")).cast("bigint").alias("swwn"),
    )
    t_num = F.col("n") * F.col("swr") - F.col("r") * F.col("swn")
    v = (
        F.col("r").cast("double") * (F.col("n") - F.col("r")) / F.col("n")
    ) * (
        F.col("n").cast("double") * F.col("swwn")
        - F.col("swn").cast("double") * F.col("swn")
    )
    t_dbl = (
        F.col("n").cast("double") * F.col("swr")
        - F.col("r").cast("double") * F.col("swn")
    )
    return tot.select(
        "n",
        "r",
        t_num.cast("bigint").alias("t_num"),
        F.round(v, 4).alias("v_scaled"),
        F.round(t_dbl / F.sqrt(v), 6).alias("z_trend"),
        F.round(F.pow(t_dbl, 2) / v, 6).alias("chi2_trend"),
    )


@query(
    "q291_callable_loci",
    oracle=f"""
WITH depth AS (
  SELECT user_id % 5 AS grp,
         epoch_us(ts) // {_DEPTH_BIN_US} AS bin,
         CAST(COUNT(*) AS BIGINT) AS d
  FROM events GROUP BY 1, 2
),
classified AS (
  SELECT grp, bin,
         CASE WHEN d < 2 THEN 'LOW_COVERAGE'
              WHEN d <= 10 THEN 'CALLABLE'
              ELSE 'EXCESSIVE_COVERAGE' END AS state
  FROM depth
),
islands AS (
  SELECT grp, state, bin,
         bin - ROW_NUMBER() OVER (PARTITION BY grp, state ORDER BY bin) AS island
  FROM classified
),
segs AS (
  SELECT grp, state, island,
         CAST(COUNT(*) AS BIGINT) AS seg_bins,
         CAST(MIN(bin) AS BIGINT) AS seg_start
  FROM islands GROUP BY grp, state, island
)
SELECT grp, state,
       CAST(COUNT(*) AS BIGINT) AS n_segments,
       CAST(SUM(seg_bins) AS BIGINT) AS total_bins,
       CAST(MAX(seg_bins) AS BIGINT) AS longest_segment,
       CAST(MIN(seg_start) AS BIGINT) AS first_segment_start
FROM segs GROUP BY grp, state
""",
)
def q291_callable_loci(spark, sf_dir):
    """CALLABLE-LOCI SEGMENTATION (GATK CallableLoci shape — classify
    the genome by depth, then emit RUN-LENGTH segments per state:
    LOW_COVERAGE / CALLABLE / EXCESSIVE_COVERAGE): the classified
    complement of the uniformity metrics (q275 grades the depth
    distribution; this one says WHERE the genome is usable, the BED
    file a caller consumes as its confident-region mask, cf. the
    gVCF->HCR bed of q123).

    Scale discipline: depth from a binned count (never per-base); the
    state classification is a map-side CASE; contiguous same-state
    runs via the gaps-and-islands idiom with the island key
    bin - row_number PARTITIONED BY (contig, state) — coverage gaps
    break runs automatically because missing bins shift the
    difference; two bounded aggregates end the plan. Everything
    integer-exact."""
    from pyspark.sql import Window as W

    ev = events_points(spark, sf_dir)
    depth = ev.groupBy(
        "grp", F.expr(f"ts_us DIV {_DEPTH_BIN_US}").alias("bin")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    classified = depth.select(
        "grp",
        "bin",
        F.when(F.col("d") < 2, "LOW_COVERAGE")
        .when(F.col("d") <= 10, "CALLABLE")
        .otherwise("EXCESSIVE_COVERAGE")
        .alias("state"),
    )
    islands = classified.select(
        "grp",
        "state",
        "bin",
        (
            F.col("bin")
            - F.row_number().over(W.partitionBy("grp", "state").orderBy("bin"))
        ).alias("island"),
    )
    segs = islands.groupBy("grp", "state", "island").agg(
        F.count(F.lit(1)).cast("bigint").alias("seg_bins"),
        F.min("bin").cast("bigint").alias("seg_start"),
    )
    return segs.groupBy("grp", "state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_segments"),
        F.sum("seg_bins").cast("bigint").alias("total_bins"),
        F.max("seg_bins").cast("bigint").alias("longest_segment"),
        F.min("seg_start").cast("bigint").alias("first_segment_start"),
    )


@query(
    "q312_fastq_roundtrip",
    oracle=f"""
WITH dna AS ({SQL_DOCS_DNA}),
d AS (SELECT doc_id, seq, length(seq) AS n FROM dna WHERE length(seq) >= 1),
q AS (
  SELECT doc_id, n,
         CAST(SUM(20 + (doc_id * 7 + pos * 13) % 20 - (pos // 6)) AS BIGINT)
           AS sq
  FROM d, unnest(generate_series(1, n)) AS t(pos)
  GROUP BY doc_id, n
)
SELECT 'r' || CAST(d.doc_id AS VARCHAR) AS read_id,
       CAST(d.n AS BIGINT) AS read_len,
       CAST(length(d.seq)
            - length(replace(replace(d.seq, 'G', ''), 'C', '')) AS BIGINT)
         AS gc_count,
       ROUND(q.sq / CAST(d.n AS DOUBLE), 4) AS mean_q
FROM d JOIN q ON q.doc_id = d.doc_id
""",
)
def q312_fastq_roundtrip(spark, sf_dir):
    """FASTQ CODEC, value-proven end-to-end (the raw-reads leg that
    completes the alignment-format family: text SAM/mpileup q111,
    binary BAM/BGZF q118, and now the pre-alignment FASTQ those
    pipelines consume upstream): each executor batch FORMATS its
    derived reads into real 4-line Phred+33 FASTQ text and immediately
    re-parses it with the SAME grammar the sharded file scan
    (`sources/fastq.py::read_fastq`) uses; per-read stats (length, GC
    count, mean quality) then come from the PARSED records while the
    oracle recomputes them from the generating arithmetic — any codec
    defect (header token split, +separator, seq/qual alignment,
    Phred+33 offset) breaks the value hash.

    Scale discipline: format+parse ride ONE Arrow mapInPandas stage
    (zero shuffle added); quality decode is a JVM-side char fold
    (`qual_to_phred`), and the file sink/scan pair is record-aligned
    sharded text — fully parallel both directions, single-writer
    concatenation explicitly out of the engine."""
    from variantcalling_spark.sources.fastq import (
        FASTQ_SCHEMA,
        parse_fastq_text,
        qual_to_phred,
    )

    dna = docs_as_dna(spark, sf_dir).where(F.length("seq") >= 1)
    reads = dna.select(
        F.concat(F.lit("r"), F.col("doc_id").cast("string")).alias("read_id"),
        "seq",
        F.expr(
            "array_join(transform(sequence(1, length(seq)),"
            " i -> char(33 + 20 + (doc_id * 7 + i * 13) % 20 - (i DIV 6))), '')"
        ).alias("qual"),
    )

    import pandas as pd  # noqa: F811

    def roundtrip(batches):
        for pdf in batches:
            frag = "\n".join(
                f"@{r}\n{s}\n+\n{q}"
                for r, s, q in zip(pdf["read_id"], pdf["seq"], pdf["qual"])
            )
            recs = parse_fastq_text(frag) if len(pdf) else []
            yield pd.DataFrame(
                {
                    "read_id": [r[0] for r in recs],
                    "seq": [r[1] for r in recs],
                    "qual": [r[2] for r in recs],
                }
            )

    parsed = reads.mapInPandas(roundtrip, schema=FASTQ_SCHEMA)
    return parsed.select(
        "read_id",
        F.length("seq").cast("bigint").alias("read_len"),
        (F.length("seq") - F.length(F.translate("seq", "GC", "")))
        .cast("bigint")
        .alias("gc_count"),
        F.round(
            F.aggregate(
                qual_to_phred("qual"), F.lit(0).cast("bigint"), lambda a, x: a + x
            )
            / F.length("qual").cast("double"),
            4,
        ).alias("mean_q"),
    )


_LC_ITERS = 12

_LC_READS_SQL = """
  SELECT l_returnflag AS library,
         concat('c', CAST(l_orderkey % 4 AS VARCHAR)) AS chrom,
         (l_orderkey * 7 + l_linenumber * 13) % 50000 AS start,
         (l_orderkey * 7 + l_linenumber * 13) % 50000
           + (20 + CAST(l_quantity AS BIGINT) % 30) + (1 + l_linenumber % 3) AS fin
  FROM lineitem
  WHERE l_linenumber % 7 <> 0 AND l_partkey % 60 >= 20
"""


def _library_complexity_oracle_sql() -> str:
    parts = [
        f"""
WITH reads AS MATERIALIZED ({_LC_READS_SQL}),
counts AS MATERIALIZED (
  SELECT library,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT (chrom, start, fin)) AS BIGINT) AS c
  FROM reads GROUP BY library
),
i0 AS (SELECT library, n, c, CAST(c AS DOUBLE) AS x FROM counts)"""
    ]
    prev = "i0"
    for k in range(1, _LC_ITERS + 1):
        parts.append(
            f""",
i{k} AS (
  SELECT library, n, c,
         ROUND(c / (1 - exp(-(n / x))), 6) AS x
  FROM {prev}
)"""
        )
        prev = f"i{k}"
    parts.append(
        f"""
SELECT library, n AS n_reads, c AS n_unique,
       ROUND(1 - c / CAST(n AS DOUBLE), 6) AS dup_rate,
       ROUND(x, 2) AS est_library_size,
       ROUND(x * (1 - exp(-(2.0 * n / x))), 2) AS est_unique_at_2x,
       ROUND(c / x, 6) AS saturation
FROM {prev}
"""
    )
    return "".join(parts)


@query("q324_library_complexity", oracle=_library_complexity_oracle_sql())
def q324_library_complexity(spark, sf_dir):
    """LIBRARY COMPLEXITY EXTRAPOLATION (Picard
    EstimateLibraryComplexity / preseq shape — the Lander-Waterman
    question behind every 'should we sequence deeper' decision): from
    observed reads n and unique fragments c per library, solve
    c = X(1 - exp(-n/X)) for the library size X by 12 fixed-point
    iterations, then report the duplication rate, X, the predicted
    unique yield at 2x depth, and current saturation c/X — the
    forward model whose OBSERVED side q188's MarkDuplicates computes.

    Scale discipline: the corpus reduces to per-library (n, c) in one
    aggregate; the iteration is a PURE PROJECTION over that
    library-domain table (no joins, no shuffle — 12 withColumn steps
    that Catalyst collapses into one stage), with round(,6) snaps
    making every step engine-identical; exp is the shared-libm pin."""
    li = load_table(spark, sf_dir, "lineitem")
    reads = li.where(
        (F.col("l_linenumber") % 7 != 0) & (F.col("l_partkey") % 60 >= 20)
    ).select(
        F.col("l_returnflag").alias("library"),
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias(
            "chrom"
        ),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000).alias(
            "start"
        ),
        (
            (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000
            + (20 + F.col("l_quantity").cast("bigint") % 30)
            + (1 + F.col("l_linenumber") % 3)
        ).alias("fin"),
    )
    counts = reads.groupBy("library").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("chrom", "start", "fin").cast("bigint").alias("c"),
    )
    cur = counts.withColumn("x", F.col("c").cast("double"))
    for _ in range(_LC_ITERS):
        cur = cur.withColumn(
            "x",
            F.round(F.col("c") / (1 - F.exp(-(F.col("n") / F.col("x")))), 6),
        )
    return cur.select(
        "library",
        F.col("n").alias("n_reads"),
        F.col("c").alias("n_unique"),
        F.round(1 - F.col("c") / F.col("n").cast("double"), 6).alias("dup_rate"),
        F.round(F.col("x"), 2).alias("est_library_size"),
        F.round(
            F.col("x") * (1 - F.exp(-(2.0 * F.col("n") / F.col("x")))), 2
        ).alias("est_unique_at_2x"),
        F.round(F.col("c") / F.col("x"), 6).alias("saturation"),
    )


def _gotoh_wavefront_oracle_sql(
    match: int = 2, mismatch: int = -1, go: int = -4, ge: int = -1
) -> str:
    from variantcalling_spark.operators.kernels import GOTOH_NEG

    NEG = GOTOH_NEG
    # cell (i, j = d+1-i); prev* = diagonal d-1 lists, cur* = diagonal d
    pi = "CAST(i - GREATEST(0, d - 1 - m) AS INT)"       # (i-1, j-1) on d-1
    ci1 = "CAST(i - GREATEST(0, d - m) AS INT)"          # (i-1, j)   on d
    ci = "CAST(i + 1 - GREATEST(0, d - m) AS INT)"       # (i,   j-1) on d
    sub = f"""CASE WHEN substr(a, CAST(i AS INT), 1)
                   = substr(b, CAST(d + 1 - i AS INT), 1)
              THEN {match} ELSE {mismatch} END"""
    m_val = f"""
      CASE WHEN i = 0 OR d + 1 - i = 0 THEN CAST({NEG} AS BIGINT)
           ELSE ({sub})
                + GREATEST(pm[{pi}], px[{pi}], py[{pi}])
      END"""
    x_val = f"""
      CASE WHEN i = 0 THEN CAST({NEG} AS BIGINT)
           WHEN d + 1 - i = 0 THEN CAST({go} + (i - 1) * {ge} AS BIGINT)
           ELSE GREATEST(cm[{ci1}] + {go}, cx[{ci1}] + {ge})
      END"""
    y_val = f"""
      CASE WHEN d + 1 - i = 0 THEN CAST({NEG} AS BIGINT)
           WHEN i = 0 THEN CAST({go} + d * {ge} AS BIGINT)
           ELSE GREATEST(cm[{ci}] + {go}, cy[{ci}] + {ge})
      END"""
    rng = "generate_series(GREATEST(0, d + 1 - m), LEAST(n, d + 1))"
    return f"""
WITH RECURSIVE dna AS ({SQL_DOCS_DNA}),
pairs AS (
  SELECT ea.doc_id // 2 AS pair_id, ea.seq AS a, eb.seq AS b,
         CAST(length(ea.seq) AS INT) AS n, CAST(length(eb.seq) AS INT) AS m
  FROM dna ea JOIN dna eb ON eb.doc_id = ea.doc_id + 1
  WHERE ea.doc_id % 2 = 0
),
rec AS (
  SELECT pair_id, a, b, n, m, 0 AS d,
         [CAST(0 AS BIGINT)] AS cm,
         [CAST({NEG} AS BIGINT)] AS cx,
         [CAST({NEG} AS BIGINT)] AS cy,
         CAST(NULL AS BIGINT[]) AS pm,
         CAST(NULL AS BIGINT[]) AS px,
         CAST(NULL AS BIGINT[]) AS py
  FROM pairs
  UNION ALL
  SELECT pair_id, a, b, n, m, d + 1,
         list_transform({rng}, i -> {m_val}),
         list_transform({rng}, i -> {x_val}),
         list_transform({rng}, i -> {y_val}),
         cm, cx, cy
  FROM rec WHERE d < n + m
)
SELECT pair_id, n, m,
       CAST(GREATEST(cm[1], cx[1], cy[1]) AS INT) AS affine_score,
       ROUND(GREATEST(cm[1], cx[1], cy[1])
             / CAST(GREATEST(n, m, 1) AS DOUBLE), 6) AS norm_score
FROM rec WHERE d = n + m
"""


@query("q325_gotoh_alignment", oracle=_gotoh_wavefront_oracle_sql())
def q325_gotoh_alignment(spark, sf_dir):
    """AFFINE-GAP GLOBAL ALIGNMENT (Gotoh 1982: open -4, extend -1,
    match +2, mismatch -1) over the derived DNA pairs — the gap model
    real aligners (BWA/minimap2 scoring) actually use, completing the
    alignment DP family: linear-gap global q219, local q247, affine
    global here. Three scattered 1-base gaps cost 3*(-4) = -12 while
    one 3-base run costs -4-1-1 = -6, so contiguous indels win —
    exactly the biological prior the linear model can't express.

    Scale discipline: the kernel vectorizes all three matrices per
    row (Iy's within-row chain solved closed-form as a running max —
    no per-cell Python); integer DP -> bit-exact. The ORACLE carries
    THREE per-diagonal lists through the wavefront recursive CTE (the
    q219 convention, tripled), pinning every M/Ix/Iy cell."""
    from variantcalling_spark.operators.kernels import gotoh_align_scores

    dna = docs_as_dna(spark, sf_dir).transform(managed_persist)
    a = dna.where(F.col("doc_id") % 2 == 0).select(
        F.expr("doc_id DIV 2").alias("pair_id"), F.col("seq").alias("a")
    )
    b = (
        dna.select(
            F.expr("(doc_id - 1) DIV 2").alias("pair_id"),
            F.col("seq").alias("b"),
            (F.col("doc_id") % 2).alias("par"),
        )
        .where(F.col("par") == 1)
        .drop("par")
    )
    pairs = a.join(b, "pair_id")
    out = gotoh_align_scores(pairs)
    return out.select(
        "pair_id",
        "n",
        "m",
        "affine_score",
        F.round(
            F.col("affine_score") / F.greatest(F.col("n"), F.col("m"), F.lit(1)).cast("double"),
            6,
        ).alias("norm_score"),
    )


_TITRATION_FRACS = (25, 50, 75, 100)
_TITRATION_MIN_DEPTH = 3


def _titration_oracle_sql() -> str:
    from variantcalling_spark.operators.dedup import PORTABLE_HASH_SQL

    keep_hash = PORTABLE_HASH_SQL.format(
        col="concat(chrom, ':', CAST(start AS VARCHAR), '-', CAST(fin AS VARCHAR))"
    )
    fracs = ", ".join(f"({f})" for f in _TITRATION_FRACS)
    return f"""
WITH reads AS MATERIALIZED ({_LC_READS_SQL}),
keyed AS MATERIALIZED (
  SELECT chrom, start, fin, ({keep_hash}) % 100 AS coin FROM reads
),
fr AS (SELECT * FROM (VALUES {fracs}) AS t(f)),
kept AS MATERIALIZED (
  SELECT fr.f, k.chrom, k.start, k.fin
  FROM keyed k JOIN fr ON k.coin < fr.f
),
deltas AS (
  SELECT f, chrom, start AS bp, 1 AS dlt FROM kept
  UNION ALL
  SELECT f, chrom, fin AS bp, -1 AS dlt FROM kept
),
agg AS (
  SELECT f, chrom, bp, SUM(dlt) AS d FROM deltas
  GROUP BY f, chrom, bp HAVING SUM(dlt) <> 0
),
cum AS (
  SELECT f, chrom, bp AS s,
         LEAD(bp) OVER (PARTITION BY f, chrom ORDER BY bp) AS e,
         CAST(SUM(d) OVER (PARTITION BY f, chrom ORDER BY bp) AS BIGINT) AS depth
  FROM agg
),
runs AS (
  SELECT f, e - s AS len, depth FROM cum WHERE e IS NOT NULL AND depth > 0
)
SELECT CAST(f AS INT) AS pct_reads,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM kept k WHERE k.f = r.f) AS n_reads,
       CAST(SUM(len) AS BIGINT) AS covered_bases,
       CAST(SUM(CASE WHEN depth >= {_TITRATION_MIN_DEPTH} THEN len ELSE 0 END)
            AS BIGINT) AS callable_bases,
       ROUND(SUM(len * depth) / CAST(SUM(len) AS DOUBLE), 4) AS mean_depth
FROM runs r GROUP BY f
"""


@query("q326_coverage_titration", oracle=_titration_oracle_sql())
def q326_coverage_titration(spark, sf_dir):
    """COVERAGE TITRATION CURVE (the Picard-style downsampling series
    behind "would half the sequencing still call this genome?"): thin
    the read set to 25/50/75/100% with the hash-deterministic coin
    (q276's reproducible thinning — no RNG state), recompute the depth
    profile per fraction, and report covered bases, callable bases
    (depth >= 3) and mean depth — the saturation curve whose
    single-point extrapolation is q324's Lander-Waterman model.

    Scale discipline: ONE read scan fans out through a 4-row fraction
    spine (predicate join, no data duplication before the filter);
    depth is the q118 delta-cumsum shape partitioned by (fraction,
    chrom) — all windows stay contig-bounded; outputs are exact
    integer base counts and one rounded division."""
    from pyspark.sql import Window as W

    from variantcalling_spark.operators.dedup import portable_string_hash

    li = load_table(spark, sf_dir, "lineitem")
    reads = li.where(
        (F.col("l_linenumber") % 7 != 0) & (F.col("l_partkey") % 60 >= 20)
    ).select(
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias(
            "chrom"
        ),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000).alias(
            "start"
        ),
        (
            (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000
            + (20 + F.col("l_quantity").cast("bigint") % 30)
            + (1 + F.col("l_linenumber") % 3)
        ).alias("fin"),
    )
    keyed = reads.select(
        "chrom",
        "start",
        "fin",
        (
            portable_string_hash(
                F.concat(
                    F.col("chrom"),
                    F.lit(":"),
                    F.col("start").cast("string"),
                    F.lit("-"),
                    F.col("fin").cast("string"),
                )
            )
            % 100
        ).alias("coin"),
    ).transform(managed_persist)
    fr = spark.createDataFrame([(f,) for f in _TITRATION_FRACS], "f int")
    kept = keyed.crossJoin(F.broadcast(fr)).where(
        F.col("coin") < F.col("f")
    ).transform(managed_persist)
    deltas = kept.select(
        "f", "chrom", F.col("start").alias("bp"), F.lit(1).alias("dlt")
    ).unionByName(
        kept.select("f", "chrom", F.col("fin").alias("bp"), F.lit(-1).alias("dlt"))
    )
    agg = (
        deltas.groupBy("f", "chrom", "bp")
        .agg(F.sum("dlt").alias("d"))
        .where(F.col("d") != 0)
    )
    w_ord = W.partitionBy("f", "chrom").orderBy("bp")
    cum = agg.select(
        "f",
        F.col("bp").alias("s"),
        F.lead("bp").over(w_ord).alias("e"),
        F.sum("d")
        .over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("depth"),
    )
    runs = cum.where(F.col("e").isNotNull() & (F.col("depth") > 0)).select(
        "f", (F.col("e") - F.col("s")).alias("len"), "depth"
    )
    n_reads = kept.groupBy("f").agg(F.count(F.lit(1)).cast("bigint").alias("n_reads"))
    out = runs.groupBy("f").agg(
        F.sum("len").cast("bigint").alias("covered_bases"),
        F.sum(
            F.when(F.col("depth") >= _TITRATION_MIN_DEPTH, F.col("len")).otherwise(0)
        )
        .cast("bigint")
        .alias("callable_bases"),
        F.round(
            F.sum(F.col("len") * F.col("depth")) / F.sum("len").cast("double"), 4
        ).alias("mean_depth"),
    )
    return out.join(F.broadcast(n_reads), "f").select(
        F.col("f").cast("int").alias("pct_reads"),
        "n_reads",
        "covered_bases",
        "callable_bases",
        "mean_depth",
    )


_GENES_SQL = """
  SELECT p_partkey AS gene_id,
         concat('c', CAST(p_partkey % 4 AS VARCHAR)) AS chrom,
         (p_partkey * 31) % 50000 AS gstart,
         (p_partkey * 31) % 50000 + 500 + (p_partkey % 5) * 300 AS gend
  FROM part WHERE p_partkey % 50 = 0
"""

_VARS_SQL = """
  SELECT l_orderkey * 10 + l_linenumber AS var_id,
         concat('c', CAST(l_orderkey % 4 AS VARCHAR)) AS chrom,
         (l_orderkey * 13 + l_linenumber * 7) % 50000 AS pos,
         (l_partkey % 7) - 3 AS indel_delta
  FROM lineitem WHERE l_linenumber % 3 = 0
"""


@query(
    "q336_consequence_classes",
    oracle=f"""
WITH genes AS MATERIALIZED ({_GENES_SQL}),
vars AS MATERIALIZED ({_VARS_SQL}),
hit AS MATERIALIZED (
  SELECT v.var_id, v.chrom, v.pos, v.indel_delta, g.gene_id, g.gstart, g.gend
  FROM vars v JOIN genes g
    ON g.chrom = v.chrom AND v.pos >= g.gstart AND v.pos < g.gend
),
best AS MATERIALIZED (
  SELECT var_id, chrom, pos, indel_delta, gstart, gend FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY var_id ORDER BY gene_id) AS rk
    FROM hit
  ) WHERE rk = 1
),
classified AS (
  SELECT v.chrom,
         CASE
           WHEN b.var_id IS NULL THEN 'intergenic'
           WHEN v.pos < b.gstart + (b.gend - b.gstart) // 5
                OR v.pos >= b.gend - (b.gend - b.gstart) // 5 THEN 'utr'
           WHEN v.indel_delta = 0 THEN 'coding_snv'
           WHEN v.indel_delta % 3 = 0 THEN 'inframe_indel'
           ELSE 'frameshift'
         END AS consequence
  FROM vars v LEFT JOIN best b ON b.var_id = v.var_id
)
SELECT chrom, consequence, CAST(COUNT(*) AS BIGINT) AS n
FROM classified GROUP BY chrom, consequence
""",
)
def q336_consequence_classes(spark, sf_dir):
    """VARIANT CONSEQUENCE CLASSIFICATION (the VEP/SnpEff triage
    shape: intergenic / UTR / coding SNV / in-frame indel /
    frameshift): variants annotate against a broadcast gene model —
    inner 60% of each gene is CDS, the flanks UTR — with frame
    arithmetic (delta % 3) deciding frameshift vs in-frame, and a
    deterministic smallest-gene-id pick for overlapping genes.

    Scale discipline: the gene model is dimension-sized and
    BROADCASTS (the annotation-transfer shape of q23); the variant
    stream joins once on (chrom, range) and classification is pure
    arithmetic; output is (contig x consequence)-bounded. The
    reference reaches for external annotators here — the triage
    CLASSES and their counts are what its QC reports consume."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    genes = part.where(F.col("p_partkey") % 50 == 0).select(
        F.col("p_partkey").alias("gene_id"),
        F.concat(F.lit("c"), (F.col("p_partkey") % 4).cast("string")).alias("chrom"),
        ((F.col("p_partkey") * 31) % 50000).alias("gstart"),
        (
            (F.col("p_partkey") * 31) % 50000
            + 500
            + (F.col("p_partkey") % 5) * 300
        ).alias("gend"),
    )
    vars_ = li.where(F.col("l_linenumber") % 3 == 0).select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("var_id"),
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias("chrom"),
        ((F.col("l_orderkey") * 13 + F.col("l_linenumber") * 7) % 50000).alias("pos"),
        ((F.col("l_partkey") % 7) - 3).alias("indel_delta"),
    )
    hit = vars_.join(
        F.broadcast(genes),
        (genes.chrom == vars_.chrom)
        & (vars_.pos >= F.col("gstart"))
        & (vars_.pos < F.col("gend")),
    ).select(
        "var_id", "gene_id", "gstart", "gend"
    )
    from pyspark.sql import Window as W

    best = (
        hit.withColumn(
            "rk", F.row_number().over(W.partitionBy("var_id").orderBy("gene_id"))
        )
        .where(F.col("rk") == 1)
        .select("var_id", "gstart", "gend")
    )
    fifth = F.expr("(gend - gstart) DIV 5")
    classified = vars_.join(best, "var_id", "left").select(
        "chrom",
        F.when(F.col("gstart").isNull(), "intergenic")
        .when(
            (F.col("pos") < F.col("gstart") + fifth)
            | (F.col("pos") >= F.col("gend") - fifth),
            "utr",
        )
        .when(F.col("indel_delta") == 0, "coding_snv")
        .when(F.col("indel_delta") % 3 == 0, "inframe_indel")
        .otherwise("frameshift")
        .alias("consequence"),
    )
    return classified.groupBy("chrom", "consequence").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )


_CHROM_LEN = 50000
_SLOP_B = 250
_FLANK_W = 100
_SHIFT_S = 400


@query(
    "q337_interval_slop_flank",
    oracle=f"""
WITH genes AS MATERIALIZED ({_GENES_SQL}),
slop AS (
  SELECT 'slop' AS op,
         GREATEST(0, gstart - {_SLOP_B}) AS s,
         LEAST({_CHROM_LEN}, gend + {_SLOP_B}) AS e,
         CASE WHEN gstart - {_SLOP_B} < 0
                OR gend + {_SLOP_B} > {_CHROM_LEN} THEN 1 ELSE 0 END AS clamped
  FROM genes
),
flank_l AS (
  SELECT 'flank_left' AS op,
         GREATEST(0, gstart - {_FLANK_W}) AS s,
         gstart AS e,
         CASE WHEN gstart - {_FLANK_W} < 0 THEN 1 ELSE 0 END AS clamped
  FROM genes
),
flank_r AS (
  SELECT 'flank_right' AS op,
         gend AS s,
         LEAST({_CHROM_LEN}, gend + {_FLANK_W}) AS e,
         CASE WHEN gend + {_FLANK_W} > {_CHROM_LEN} THEN 1 ELSE 0 END AS clamped
  FROM genes
),
shifted AS (
  SELECT 'shift' AS op,
         LEAST({_CHROM_LEN}, gstart + {_SHIFT_S}) AS s,
         LEAST({_CHROM_LEN}, gend + {_SHIFT_S}) AS e,
         CASE WHEN gend + {_SHIFT_S} > {_CHROM_LEN} THEN 1 ELSE 0 END AS clamped
  FROM genes
),
u AS (
  SELECT * FROM slop UNION ALL SELECT * FROM flank_l
  UNION ALL SELECT * FROM flank_r UNION ALL SELECT * FROM shifted
)
SELECT op,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(e - s) AS BIGINT) AS total_bases,
       CAST(SUM(clamped) AS BIGINT) AS n_clamped,
       CAST(SUM(CASE WHEN e <= s THEN 1 ELSE 0 END) AS BIGINT) AS n_empty
FROM u GROUP BY op
""",
)
def q337_interval_slop_flank(spark, sf_dir):
    """INTERVAL SLOP / FLANK / SHIFT with chromosome-bounds clamping
    (bedtools slop/flank/shift parity — the interval-ARITHMETIC
    complement of the set operations already covered: merge q42,
    intersect q33, subtract q32, closest q38, complement q39,
    map q96): widen by +-250, take 100-bp flanks on each side, shift
    +400, all clamped to [0, chrom_len], with clamp and
    emptied-interval audits per op.

    Scale discipline: four pure projections over the interval table
    unioned and reduced by one aggregate — zero joins, zero windows;
    the audits make the boundary behavior (the part bedtools users
    actually get wrong) an asserted number rather than a comment."""
    part = load_table(spark, sf_dir, "part")
    genes = part.where(F.col("p_partkey") % 50 == 0).select(
        F.concat(F.lit("c"), (F.col("p_partkey") % 4).cast("string")).alias("chrom"),
        ((F.col("p_partkey") * 31) % 50000).alias("gstart"),
        (
            (F.col("p_partkey") * 31) % 50000
            + 500
            + (F.col("p_partkey") % 5) * 300
        ).alias("gend"),
    ).transform(managed_persist)
    gs, ge = F.col("gstart"), F.col("gend")
    L, B, Wd, S = _CHROM_LEN, _SLOP_B, _FLANK_W, _SHIFT_S
    slop = genes.select(
        F.lit("slop").alias("op"),
        F.greatest(F.lit(0), gs - B).alias("s"),
        F.least(F.lit(L), ge + B).alias("e"),
        F.when((gs - B < 0) | (ge + B > L), 1).otherwise(0).alias("clamped"),
    )
    flank_l = genes.select(
        F.lit("flank_left").alias("op"),
        F.greatest(F.lit(0), gs - Wd).alias("s"),
        gs.alias("e"),
        F.when(gs - Wd < 0, 1).otherwise(0).alias("clamped"),
    )
    flank_r = genes.select(
        F.lit("flank_right").alias("op"),
        ge.alias("s"),
        F.least(F.lit(L), ge + Wd).alias("e"),
        F.when(ge + Wd > L, 1).otherwise(0).alias("clamped"),
    )
    shifted = genes.select(
        F.lit("shift").alias("op"),
        F.least(F.lit(L), gs + S).alias("s"),
        F.least(F.lit(L), ge + S).alias("e"),
        F.when(ge + S > L, 1).otherwise(0).alias("clamped"),
    )
    u = slop.unionByName(flank_l).unionByName(flank_r).unionByName(shifted)
    return u.groupBy("op").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.sum(F.col("e") - F.col("s")).cast("bigint").alias("total_bases"),
        F.sum("clamped").cast("bigint").alias("n_clamped"),
        F.sum(F.when(F.col("e") <= F.col("s"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_empty"),
    )


@query(
    "q338_per_cycle_content",
    oracle=f"""
WITH dna AS ({SQL_DOCS_DNA}),
cells AS (
  SELECT pos AS cycle, substr(seq, pos, 1) AS base
  FROM (SELECT seq, length(seq) AS n FROM dna WHERE length(seq) >= 1) d,
       unnest(generate_series(1, d.n)) AS t(pos)
),
counts AS (
  SELECT cycle,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN base = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN base = 'C' THEN 1 ELSE 0 END) AS BIGINT) AS c,
         CAST(SUM(CASE WHEN base = 'G' THEN 1 ELSE 0 END) AS BIGINT) AS g,
         CAST(SUM(CASE WHEN base = 'T' THEN 1 ELSE 0 END) AS BIGINT) AS t
  FROM cells GROUP BY cycle
)
SELECT CAST(cycle AS BIGINT) AS cycle, n,
       ROUND(a / CAST(n AS DOUBLE), 6) AS frac_a,
       ROUND(c / CAST(n AS DOUBLE), 6) AS frac_c,
       ROUND(g / CAST(n AS DOUBLE), 6) AS frac_g,
       ROUND(t / CAST(n AS DOUBLE), 6) AS frac_t,
       ROUND((g + c) / CAST(n AS DOUBLE), 6) AS frac_gc,
       CASE WHEN GREATEST(a, c, g, t) - LEAST(a, c, g, t)
                 > CAST(0.2 * n AS BIGINT) THEN 1 ELSE 0 END AS warn_bias
FROM counts
""",
)
def q338_per_cycle_content(spark, sf_dir):
    """PER-CYCLE BASE CONTENT (FastQC 'per base sequence content' —
    the composition sibling of q233's per-cycle QUALITY panel: primer
    or adapter contamination shows up as position-dependent base bias,
    flagged when the max-min base-count spread exceeds 20% of the
    cycle's reads): A/C/G/T/GC fractions per cycle with the FastQC
    warn flag.

    Scale discipline: one posexplode over the read-length-bounded
    cycle axis, one 5-counter map-side-combinable aggregate; output is
    cycle-bounded. The warn flag compares exact integer counts
    (0.2 * n floored to BIGINT on both engines), never rounded
    fractions."""
    dna = docs_as_dna(spark, sf_dir).where(F.length("seq") >= 1)
    cells = dna.select(
        F.posexplode(F.split(F.col("seq"), "(?!^)(?=.)")).alias("p", "base")
    ).select((F.col("p") + 1).alias("cycle"), "base")
    counts = cells.groupBy("cycle").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("base") == "A", 1).otherwise(0)).cast("bigint").alias("a"),
        F.sum(F.when(F.col("base") == "C", 1).otherwise(0)).cast("bigint").alias("c"),
        F.sum(F.when(F.col("base") == "G", 1).otherwise(0)).cast("bigint").alias("g"),
        F.sum(F.when(F.col("base") == "T", 1).otherwise(0)).cast("bigint").alias("t"),
    )
    n = F.col("n").cast("double")
    return counts.select(
        F.col("cycle").cast("bigint").alias("cycle"),
        "n",
        F.round(F.col("a") / n, 6).alias("frac_a"),
        F.round(F.col("c") / n, 6).alias("frac_c"),
        F.round(F.col("g") / n, 6).alias("frac_g"),
        F.round(F.col("t") / n, 6).alias("frac_t"),
        F.round((F.col("g") + F.col("c")) / n, 6).alias("frac_gc"),
        F.when(
            F.greatest("a", "c", "g", "t") - F.least("a", "c", "g", "t")
            > (F.lit(0.2) * F.col("n")).cast("bigint"),
            1,
        )
        .otherwise(0)
        .alias("warn_bias"),
    )


_BURDEN_AF_MAX = 3  # "rare" = alt-carrier count <= 3 across the cohort


@query(
    "q339_gene_burden",
    oracle=f"""
WITH genes AS MATERIALIZED ({_GENES_SQL}),
vars AS MATERIALIZED ({_VARS_SQL}),
carriers AS MATERIALIZED (
  SELECT chrom, pos,
         CAST(COUNT(*) AS BIGINT) AS ac,
         CAST(SUM(CASE WHEN var_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS ac_case
  FROM vars GROUP BY chrom, pos
),
rare AS MATERIALIZED (
  SELECT * FROM carriers WHERE ac <= {_BURDEN_AF_MAX}
),
burden AS MATERIALIZED (
  SELECT g.gene_id, g.chrom,
         CAST(COUNT(*) AS BIGINT) AS n_rare_sites,
         CAST(SUM(r.ac) AS BIGINT) AS burden_all,
         CAST(SUM(r.ac_case) AS BIGINT) AS burden_case
  FROM rare r JOIN genes g
    ON g.chrom = r.chrom AND r.pos >= g.gstart AND r.pos < g.gend
  GROUP BY g.gene_id, g.chrom
),
tot AS MATERIALIZED (
  SELECT CAST(SUM(burden_all) AS BIGINT) AS t_all,
         CAST(SUM(burden_case) AS BIGINT) AS t_case
  FROM burden
)
SELECT b.gene_id, b.chrom, b.n_rare_sites, b.burden_all, b.burden_case,
       ROUND((b.burden_case
              - b.burden_all * ((SELECT t_case FROM tot)
                                / CAST((SELECT t_all FROM tot) AS DOUBLE)))
             * (b.burden_case
                - b.burden_all * ((SELECT t_case FROM tot)
                                  / CAST((SELECT t_all FROM tot) AS DOUBLE)))
             / (b.burden_all * ((SELECT t_case FROM tot)
                                / CAST((SELECT t_all FROM tot) AS DOUBLE))
                * (1 - (SELECT t_case FROM tot)
                       / CAST((SELECT t_all FROM tot) AS DOUBLE))), 6)
         AS burden_chi2,
       CAST(ROW_NUMBER() OVER (
         ORDER BY (b.burden_case
                   - b.burden_all * ((SELECT t_case FROM tot)
                                     / CAST((SELECT t_all FROM tot) AS DOUBLE)))
                  * (b.burden_case
                     - b.burden_all * ((SELECT t_case FROM tot)
                                       / CAST((SELECT t_all FROM tot) AS DOUBLE)))
                  / (b.burden_all * ((SELECT t_case FROM tot)
                                     / CAST((SELECT t_all FROM tot) AS DOUBLE))
                     * (1 - (SELECT t_case FROM tot)
                            / CAST((SELECT t_all FROM tot) AS DOUBLE)))
           DESC, b.gene_id) AS INT) AS rk
FROM burden b
QUALIFY rk <= 15
""",
)
def q339_gene_burden(spark, sf_dir):
    """GENE-BASED RARE-VARIANT BURDEN TEST (the collapsing test of
    rare-variant association studies — when per-site q285/q153 tests
    are powerless because every site is rare, collapse carriers per
    GENE and ask whether cases carry more than their share): rare
    sites (cohort carrier count <= 3) aggregate per broadcast-model
    gene; the case-excess chi2 (observed case burden vs the pooled
    case share) ranks the top-15 genes.

    Scale discipline: carrier counts are one (chrom, pos) aggregate;
    the rare filter prunes BEFORE the gene range-join (broadcast,
    dimension-sized); burden and the chi2 are gene-bounded arithmetic
    — the variant stream is touched exactly once."""
    from pyspark.sql import Window as W

    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    genes = part.where(F.col("p_partkey") % 50 == 0).select(
        F.col("p_partkey").alias("gene_id"),
        F.concat(F.lit("c"), (F.col("p_partkey") % 4).cast("string")).alias("gchrom"),
        ((F.col("p_partkey") * 31) % 50000).alias("gstart"),
        (
            (F.col("p_partkey") * 31) % 50000
            + 500
            + (F.col("p_partkey") % 5) * 300
        ).alias("gend"),
    )
    vars_ = li.where(F.col("l_linenumber") % 3 == 0).select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("var_id"),
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias("chrom"),
        ((F.col("l_orderkey") * 13 + F.col("l_linenumber") * 7) % 50000).alias("pos"),
    )
    carriers = vars_.groupBy("chrom", "pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("ac"),
        F.sum(F.when(F.col("var_id") % 2 == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("ac_case"),
    )
    rare = carriers.where(F.col("ac") <= _BURDEN_AF_MAX)
    burden = (
        rare.join(
            F.broadcast(genes),
            (F.col("gchrom") == F.col("chrom"))
            & (F.col("pos") >= F.col("gstart"))
            & (F.col("pos") < F.col("gend")),
        )
        .groupBy("gene_id", "chrom")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rare_sites"),
            F.sum("ac").cast("bigint").alias("burden_all"),
            F.sum("ac_case").cast("bigint").alias("burden_case"),
        )
        .transform(managed_persist)
    )
    tot = burden.agg(
        F.sum("burden_all").cast("bigint").alias("t_all"),
        F.sum("burden_case").cast("bigint").alias("t_case"),
    )
    j = burden.crossJoin(F.broadcast(tot))
    share = F.col("t_case") / F.col("t_all").cast("double")
    expected = F.col("burden_all") * share
    chi2 = (F.col("burden_case") - expected) * (
        F.col("burden_case") - expected
    ) / (expected * (1 - share))
    scored = j.select(
        "gene_id",
        "chrom",
        "n_rare_sites",
        "burden_all",
        "burden_case",
        F.round(chi2, 6).alias("burden_chi2"),
        chi2.alias("_raw"),
    )
    top = scored.orderBy(F.col("_raw").desc(), "gene_id").limit(15)
    return top.select(
        "gene_id",
        "chrom",
        "n_rare_sites",
        "burden_all",
        "burden_case",
        "burden_chi2",
        F.row_number()
        .over(W.orderBy(F.col("_raw").desc(), "gene_id"))
        .cast("int")
        .alias("rk"),
    )


_TRIM_W = 4
_TRIM_Q = 25


@query(
    "q343_quality_trimming",
    oracle=f"""
WITH dna AS ({SQL_DOCS_DNA}),
reads AS MATERIALIZED (
  SELECT doc_id, seq, length(seq) AS n,
         [20 + (doc_id * 7 + i * 13) % 20 - (i // 6)
          for i in generate_series(1, length(seq))] AS q
  FROM dna WHERE length(seq) >= 1
),
cut AS (
  SELECT doc_id, n,
         COALESCE(list_min(
           [i for i in generate_series(1, n - {_TRIM_W} + 1)
            if q[i] + q[i + 1] + q[i + 2] + q[i + 3] < {_TRIM_W * _TRIM_Q}]
         ) - 1, n) AS keep_len
  FROM reads
)
SELECT CAST(keep_len AS BIGINT) AS keep_len,
       CAST(COUNT(*) AS BIGINT) AS n_reads,
       CAST(SUM(n) AS BIGINT) AS bases_in,
       CAST(SUM(keep_len) AS BIGINT) AS bases_kept,
       ROUND(SUM(keep_len) / CAST(SUM(n) AS DOUBLE), 6) AS kept_frac,
       CAST(SUM(CASE WHEN keep_len = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dropped
FROM cut GROUP BY keep_len
""",
)
def q343_quality_trimming(spark, sf_dir):
    """SLIDING-WINDOW QUALITY TRIMMING (Trimmomatic
    SLIDINGWINDOW:{_TRIM_W}:{_TRIM_Q} parity — the read-prep step
    between q312's FASTQ ingest and alignment: scan 4-base windows
    left to right, cut the read at the FIRST window whose mean
    quality drops below {_TRIM_Q}): the trim-length histogram with
    kept-base accounting, over the same deterministic quality model
    as q233/q312.

    Scale discipline: the per-read scan is read-length-bounded ARRAY
    ALGEBRA — a filtered index comprehension (Spark: filter over a
    sequence + array_min), zero kernels, zero shuffles before the
    final histogram aggregate; window mean < Q compares INTEGER sums
    (W*Q literal), no division."""
    dna = docs_as_dna(spark, sf_dir).where(F.length("seq") >= 1)
    reads = dna.select(
        "doc_id",
        F.length("seq").alias("n"),
        F.expr(
            "transform(sequence(1, length(seq)),"
            " i -> 20 + (doc_id * 7 + i * 13) % 20 - (i DIV 6))"
        ).alias("q"),
    )
    thresh = _TRIM_W * _TRIM_Q
    fail_idx = F.filter(
        F.sequence(F.lit(1), F.col("n") - (_TRIM_W - 1)),
        lambda i: (
            F.element_at("q", i)
            + F.element_at("q", i + 1)
            + F.element_at("q", i + 2)
            + F.element_at("q", i + 3)
        )
        < F.lit(thresh),
    )
    cut = reads.select(
        "n",
        F.coalesce(F.array_min(fail_idx) - 1, F.col("n")).alias("keep_len"),
    )
    return cut.groupBy(F.col("keep_len").cast("bigint").alias("keep_len")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_reads"),
        F.sum("n").cast("bigint").alias("bases_in"),
        F.sum("keep_len").cast("bigint").alias("bases_kept"),
        F.round(F.sum("keep_len") / F.sum("n").cast("double"), 6).alias(
            "kept_frac"
        ),
        F.sum(F.when(F.col("keep_len") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
    )


@query(
    "q345_bedtools_jaccard",
    oracle=f"""
WITH reads AS MATERIALIZED ({_LC_READS_SQL}),
deltas AS (
  SELECT chrom, start AS bp, 1 AS d FROM reads
  UNION ALL SELECT chrom, fin AS bp, -1 AS d FROM reads
),
agg AS (
  SELECT chrom, bp, SUM(d) AS d FROM deltas GROUP BY chrom, bp
  HAVING SUM(d) <> 0
),
cum AS (
  SELECT chrom, bp AS s,
         LEAD(bp) OVER (PARTITION BY chrom ORDER BY bp) AS e,
         CAST(SUM(d) OVER (PARTITION BY chrom ORDER BY bp) AS BIGINT) AS depth
  FROM agg
),
set_a AS MATERIALIZED (
  SELECT chrom, s, e FROM cum WHERE e IS NOT NULL AND depth >= 2
),
genes AS ({_GENES_SQL}),
gd AS (
  SELECT chrom, gstart AS bp, 1 AS d FROM genes
  UNION ALL SELECT chrom, gend AS bp, -1 AS d FROM genes
),
gagg AS (
  SELECT chrom, bp, SUM(d) AS d FROM gd GROUP BY chrom, bp HAVING SUM(d) <> 0
),
gcum AS (
  SELECT chrom, bp AS s,
         LEAD(bp) OVER (PARTITION BY chrom ORDER BY bp) AS e,
         CAST(SUM(d) OVER (PARTITION BY chrom ORDER BY bp) AS BIGINT) AS cov
  FROM gagg
),
set_b AS MATERIALIZED (
  SELECT chrom, s, e FROM gcum WHERE e IS NOT NULL AND cov > 0
),
bounds AS (
  SELECT chrom, bp, da, db FROM (
    SELECT chrom, s AS bp, 1 AS da, 0 AS db FROM set_a
    UNION ALL SELECT chrom, e, -1, 0 FROM set_a
    UNION ALL SELECT chrom, s, 0, 1 FROM set_b
    UNION ALL SELECT chrom, e, 0, -1 FROM set_b
  )
),
bagg AS (
  SELECT chrom, bp, SUM(da) AS da, SUM(db) AS db
  FROM bounds GROUP BY chrom, bp
),
sweep AS (
  SELECT chrom, bp AS s,
         LEAD(bp) OVER (PARTITION BY chrom ORDER BY bp) AS e,
         CAST(SUM(da) OVER (PARTITION BY chrom ORDER BY bp) AS BIGINT) AS ina,
         CAST(SUM(db) OVER (PARTITION BY chrom ORDER BY bp) AS BIGINT) AS inb
  FROM bagg
)
SELECT chrom,
       CAST(SUM(CASE WHEN ina > 0 AND inb > 0 THEN e - s ELSE 0 END)
            AS BIGINT) AS intersection_bases,
       CAST(SUM(CASE WHEN ina > 0 OR inb > 0 THEN e - s ELSE 0 END)
            AS BIGINT) AS union_bases,
       ROUND(SUM(CASE WHEN ina > 0 AND inb > 0 THEN e - s ELSE 0 END)
             / CAST(SUM(CASE WHEN ina > 0 OR inb > 0 THEN e - s ELSE 0 END)
                    AS DOUBLE), 6) AS jaccard
FROM sweep WHERE e IS NOT NULL
GROUP BY chrom
""",
)
def q345_bedtools_jaccard(spark, sf_dir):
    """SET-LEVEL INTERVAL JACCARD (bedtools jaccard parity — "how
    much do these two annotation tracks agree", the genome-axis
    similarity between WHOLE interval sets rather than q37's per-pair
    reciprocal overlap): well-covered regions (depth >= 2) vs the
    gene track, intersection/union BASES via one boundary-event
    sweep.

    Scale discipline: each set merges through its own delta-cumsum
    (contig-partitioned windows); the set algebra is ONE combined
    boundary sweep carrying two coverage counters — no interval x
    interval join anywhere, all counts exact integer bases."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    reads = li.where(
        (F.col("l_linenumber") % 7 != 0) & (F.col("l_partkey") % 60 >= 20)
    ).select(
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias("chrom"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000).alias("start"),
        (
            (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000
            + (20 + F.col("l_quantity").cast("bigint") % 30)
            + (1 + F.col("l_linenumber") % 3)
        ).alias("fin"),
    )

    def runs(df, s_col, e_col, min_cov):
        deltas = df.select(
            "chrom", F.col(s_col).alias("bp"), F.lit(1).alias("d")
        ).unionByName(
            df.select("chrom", F.col(e_col).alias("bp"), F.lit(-1).alias("d"))
        )
        agg = (
            deltas.groupBy("chrom", "bp")
            .agg(F.sum("d").alias("d"))
            .where(F.col("d") != 0)
        )
        w_ord = W.partitionBy("chrom").orderBy("bp")
        cum = agg.select(
            "chrom",
            F.col("bp").alias("s"),
            F.lead("bp").over(w_ord).alias("e"),
            F.sum("d")
            .over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("bigint")
            .alias("cov"),
        )
        return cum.where(F.col("e").isNotNull() & (F.col("cov") >= min_cov)).select(
            "chrom", "s", "e"
        )

    set_a = runs(reads, "start", "fin", 2).transform(managed_persist)
    genes = part.where(F.col("p_partkey") % 50 == 0).select(
        F.concat(F.lit("c"), (F.col("p_partkey") % 4).cast("string")).alias("chrom"),
        ((F.col("p_partkey") * 31) % 50000).alias("gstart"),
        (
            (F.col("p_partkey") * 31) % 50000
            + 500
            + (F.col("p_partkey") % 5) * 300
        ).alias("gend"),
    )
    set_b = runs(genes, "gstart", "gend", 1).transform(managed_persist)
    bounds = (
        set_a.select("chrom", F.col("s").alias("bp"), F.lit(1).alias("da"), F.lit(0).alias("db"))
        .unionByName(set_a.select("chrom", F.col("e").alias("bp"), F.lit(-1).alias("da"), F.lit(0).alias("db")))
        .unionByName(set_b.select("chrom", F.col("s").alias("bp"), F.lit(0).alias("da"), F.lit(1).alias("db")))
        .unionByName(set_b.select("chrom", F.col("e").alias("bp"), F.lit(0).alias("da"), F.lit(-1).alias("db")))
    )
    bagg = bounds.groupBy("chrom", "bp").agg(
        F.sum("da").alias("da"), F.sum("db").alias("db")
    )
    w_ord = W.partitionBy("chrom").orderBy("bp")
    sweep = bagg.select(
        "chrom",
        F.col("bp").alias("s"),
        F.lead("bp").over(w_ord).alias("e"),
        F.sum("da")
        .over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("ina"),
        F.sum("db")
        .over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow))
        .cast("bigint")
        .alias("inb"),
    ).where(F.col("e").isNotNull())
    seg = F.col("e") - F.col("s")
    inter = F.sum(
        F.when((F.col("ina") > 0) & (F.col("inb") > 0), seg).otherwise(0)
    )
    uni = F.sum(
        F.when((F.col("ina") > 0) | (F.col("inb") > 0), seg).otherwise(0)
    )
    return sweep.groupBy("chrom").agg(
        inter.cast("bigint").alias("intersection_bases"),
        uni.cast("bigint").alias("union_bases"),
        F.round(inter / uni.cast("double"), 6).alias("jaccard"),
    )


_TSS_BIN = 100
_TSS_FLANK = 500


@query(
    "q346_tss_profile",
    oracle=f"""
WITH reads AS MATERIALIZED ({_LC_READS_SQL}),
deltas AS (
  SELECT chrom, start AS bp, 1 AS d FROM reads
  UNION ALL SELECT chrom, fin AS bp, -1 AS d FROM reads
),
agg AS (
  SELECT chrom, bp, SUM(d) AS d FROM deltas GROUP BY chrom, bp
  HAVING SUM(d) <> 0
),
runs AS MATERIALIZED (
  SELECT chrom, bp AS s,
         LEAD(bp) OVER (PARTITION BY chrom ORDER BY bp) AS e,
         CAST(SUM(d) OVER (PARTITION BY chrom ORDER BY bp) AS BIGINT) AS depth
  FROM agg QUALIFY e IS NOT NULL AND depth > 0
),
genes AS MATERIALIZED ({_GENES_SQL}),
anchors AS MATERIALIZED (
  SELECT g.gene_id, g.chrom, g.gstart AS tss,
         b.b AS bin,
         g.gstart + b.b * {_TSS_BIN} AS w_s,
         g.gstart + (b.b + 1) * {_TSS_BIN} AS w_e
  FROM genes g
  CROSS JOIN (SELECT unnest(generate_series(-{_TSS_FLANK // _TSS_BIN},
                                            {_TSS_FLANK // _TSS_BIN} - 1)) AS b) b
),
overlap AS (
  SELECT a.bin,
         CAST(SUM((LEAST(a.w_e, r.e) - GREATEST(a.w_s, r.s)) * r.depth)
              AS BIGINT) AS base_depth
  FROM anchors a JOIN runs r
    ON r.chrom = a.chrom AND r.s < a.w_e AND r.e > a.w_s
  GROUP BY a.bin
),
nanch AS MATERIALIZED (SELECT CAST(COUNT(*) AS BIGINT) AS na FROM genes)
SELECT CAST(o.bin AS INT) AS bin,
       CAST(o.bin * {_TSS_BIN} AS BIGINT) AS offset_bp,
       o.base_depth,
       ROUND(o.base_depth
             / CAST({_TSS_BIN} AS DOUBLE) / (SELECT na FROM nanch), 6)
         AS mean_depth_per_gene
FROM overlap o
""",
)
def q346_tss_profile(spark, sf_dir):
    """TSS METAGENE PROFILE (the deepTools computeMatrix /
    plotProfile shape — average coverage in fixed bins around every
    gene start; THE enrichment diagnostic of ATAC/ChIP pipelines and
    a capture-efficiency QC for panels): 100-bp bins spanning +-500 bp
    of each gene's start, aggregated across all anchors to
    depth-per-gene per bin.

    Scale discipline: the depth profile stays in RUN form (delta-
    cumsum, contig windows) and bins come from a gene x 10-bin spine;
    the overlap join is chrom-keyed with a range residual and
    contributes exact base x depth integers — no per-base explosion
    anywhere; output is bin-bounded."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    reads = li.where(
        (F.col("l_linenumber") % 7 != 0) & (F.col("l_partkey") % 60 >= 20)
    ).select(
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias("chrom"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000).alias("start"),
        (
            (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000
            + (20 + F.col("l_quantity").cast("bigint") % 30)
            + (1 + F.col("l_linenumber") % 3)
        ).alias("fin"),
    )
    deltas = reads.select(
        "chrom", F.col("start").alias("bp"), F.lit(1).alias("d")
    ).unionByName(
        reads.select("chrom", F.col("fin").alias("bp"), F.lit(-1).alias("d"))
    )
    agg = (
        deltas.groupBy("chrom", "bp")
        .agg(F.sum("d").alias("d"))
        .where(F.col("d") != 0)
    )
    w_ord = W.partitionBy("chrom").orderBy("bp")
    runs = (
        agg.select(
            "chrom",
            F.col("bp").alias("s"),
            F.lead("bp").over(w_ord).alias("e"),
            F.sum("d")
            .over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("bigint")
            .alias("depth"),
        )
        .where(F.col("e").isNotNull() & (F.col("depth") > 0))
        .transform(managed_persist)
    )
    genes = part.where(F.col("p_partkey") % 50 == 0).select(
        F.col("p_partkey").alias("gene_id"),
        F.concat(F.lit("c"), (F.col("p_partkey") % 4).cast("string")).alias("chrom"),
        ((F.col("p_partkey") * 31) % 50000).alias("tss"),
    )
    nb = _TSS_FLANK // _TSS_BIN
    bins = spark.range(-nb, nb).select(F.col("id").alias("bin"))
    anchors = genes.crossJoin(F.broadcast(bins)).select(
        "chrom",
        "bin",
        (F.col("tss") + F.col("bin") * _TSS_BIN).alias("w_s"),
        (F.col("tss") + (F.col("bin") + 1) * _TSS_BIN).alias("w_e"),
    )
    overlap = (
        F.broadcast(anchors)
        .join(
            runs,
            (runs.chrom == anchors.chrom)
            & (F.col("s") < F.col("w_e"))
            & (F.col("e") > F.col("w_s")),
        )
        .groupBy("bin")
        .agg(
            F.sum(
                (F.least("w_e", "e") - F.greatest("w_s", "s")) * F.col("depth")
            )
            .cast("bigint")
            .alias("base_depth")
        )
    )
    nanch = genes.agg(F.count(F.lit(1)).cast("bigint").alias("na"))
    return overlap.crossJoin(F.broadcast(nanch)).select(
        F.col("bin").cast("int").alias("bin"),
        (F.col("bin") * _TSS_BIN).cast("bigint").alias("offset_bp"),
        "base_depth",
        F.round(
            F.col("base_depth") / F.lit(float(_TSS_BIN)) / F.col("na"), 6
        ).alias("mean_depth_per_gene"),
    )


_PEAK_FOLD = 2.0
_PEAK_MERGE_GAP = 50


@query(
    "q350_peak_calling",
    oracle=f"""
WITH reads AS MATERIALIZED ({_LC_READS_SQL}),
deltas AS (
  SELECT chrom, start AS bp, 1 AS d FROM reads
  UNION ALL SELECT chrom, fin AS bp, -1 AS d FROM reads
),
agg AS (
  SELECT chrom, bp, SUM(d) AS d FROM deltas GROUP BY chrom, bp
  HAVING SUM(d) <> 0
),
runs AS MATERIALIZED (
  SELECT chrom, bp AS s,
         LEAD(bp) OVER (PARTITION BY chrom ORDER BY bp) AS e,
         CAST(SUM(d) OVER (PARTITION BY chrom ORDER BY bp) AS BIGINT) AS depth
  FROM agg QUALIFY e IS NOT NULL AND depth > 0
),
lam AS MATERIALIZED (
  SELECT chrom,
         ROUND(SUM((e - s) * depth) / CAST(SUM(e - s) AS DOUBLE), 6) AS bg
  FROM runs GROUP BY chrom
),
enriched AS MATERIALIZED (
  SELECT r.chrom, r.s, r.e, r.depth
  FROM runs r JOIN lam l ON l.chrom = r.chrom
  WHERE r.depth >= {_PEAK_FOLD!r} * l.bg
),
islands AS (
  SELECT chrom, s, e, depth,
         CASE WHEN s - LAG(e) OVER (PARTITION BY chrom ORDER BY s)
                   <= {_PEAK_MERGE_GAP} THEN 0 ELSE 1 END AS brk
  FROM enriched
),
pk AS MATERIALIZED (
  SELECT chrom, s, e, depth,
         SUM(brk) OVER (PARTITION BY chrom ORDER BY s) AS peak_id
  FROM islands
)
SELECT p.chrom, CAST(p.peak_id AS BIGINT) AS peak_id,
       CAST(MIN(p.s) AS BIGINT) AS peak_start,
       CAST(MAX(p.e) AS BIGINT) AS peak_end,
       CAST(MAX(p.depth) AS BIGINT) AS summit_depth,
       ROUND(MAX(p.depth) / MAX(l.bg), 4) AS fold_enrichment,
       CAST(SUM(p.e - p.s) AS BIGINT) AS enriched_bases
FROM pk p JOIN lam l ON l.chrom = p.chrom
GROUP BY p.chrom, p.peak_id
""",
)
def q350_peak_calling(spark, sf_dir):
    """PEAK CALLING, MACS-lite (the ChIP/ATAC enrichment caller: a
    peak is a run of coverage >= fold x the chromosome background
    rate, nearby enriched runs merged across <= 50-bp gaps, reported
    with its summit depth and fold enrichment — the caller whose
    INPUT diagnostics q346's TSS profile plots): per-contig Poisson-
    style background from the base-weighted mean depth, 2x threshold,
    gaps-and-islands merge.

    Scale discipline: everything stays in RUN form — background is
    one base-weighted aggregate per contig, enrichment a broadcast-
    threshold filter, peak assembly the standard gaps-and-islands
    window pair; no per-base explosion, exact integer bases and
    depths with two rounded ratios."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    reads = li.where(
        (F.col("l_linenumber") % 7 != 0) & (F.col("l_partkey") % 60 >= 20)
    ).select(
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias("chrom"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000).alias("start"),
        (
            (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000
            + (20 + F.col("l_quantity").cast("bigint") % 30)
            + (1 + F.col("l_linenumber") % 3)
        ).alias("fin"),
    )
    deltas = reads.select(
        "chrom", F.col("start").alias("bp"), F.lit(1).alias("d")
    ).unionByName(
        reads.select("chrom", F.col("fin").alias("bp"), F.lit(-1).alias("d"))
    )
    agg = (
        deltas.groupBy("chrom", "bp")
        .agg(F.sum("d").alias("d"))
        .where(F.col("d") != 0)
    )
    w_ord = W.partitionBy("chrom").orderBy("bp")
    runs = (
        agg.select(
            "chrom",
            F.col("bp").alias("s"),
            F.lead("bp").over(w_ord).alias("e"),
            F.sum("d")
            .over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("bigint")
            .alias("depth"),
        )
        .where(F.col("e").isNotNull() & (F.col("depth") > 0))
        .transform(managed_persist)
    )
    lam = runs.groupBy("chrom").agg(
        F.round(
            F.sum((F.col("e") - F.col("s")) * F.col("depth"))
            / F.sum(F.col("e") - F.col("s")).cast("double"),
            6,
        ).alias("bg")
    )
    enriched = runs.join(F.broadcast(lam), "chrom").where(
        F.col("depth") >= F.lit(_PEAK_FOLD) * F.col("bg")
    )
    ws = W.partitionBy("chrom").orderBy("s")
    islands = enriched.select(
        "chrom",
        "s",
        "e",
        "depth",
        "bg",
        F.when(
            F.col("s") - F.lag("e").over(ws) <= _PEAK_MERGE_GAP, 0
        )
        .otherwise(1)
        .alias("brk"),
    )
    pk = islands.select(
        "chrom",
        "s",
        "e",
        "depth",
        "bg",
        F.sum("brk")
        .over(ws.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("peak_id"),
    )
    return pk.groupBy("chrom", F.col("peak_id").cast("bigint").alias("peak_id")).agg(
        F.min("s").cast("bigint").alias("peak_start"),
        F.max("e").cast("bigint").alias("peak_end"),
        F.max("depth").cast("bigint").alias("summit_depth"),
        F.round(F.max("depth") / F.max("bg"), 4).alias("fold_enrichment"),
        F.sum(F.col("e") - F.col("s")).cast("bigint").alias("enriched_bases"),
    )


_CNV_BIN = 1000
_CNV_CALL_THRESH = 0.3


@query(
    "q353_copy_ratio_segments",
    oracle=f"""
WITH reads AS MATERIALIZED ({_LC_READS_SQL}),
bins AS MATERIALIZED (
  SELECT chrom, (start + (fin - start) // 2) // {_CNV_BIN} AS bin,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM reads GROUP BY chrom, (start + (fin - start) // 2) // {_CNV_BIN}
),
rel AS MATERIALIZED (
  SELECT chrom, cnt,
         ROW_NUMBER() OVER (PARTITION BY chrom ORDER BY bin) AS t,
         SUM(cnt) OVER (PARTITION BY chrom ORDER BY bin) AS cum,
         COUNT(*) OVER (PARTITION BY chrom) AS n,
         SUM(cnt) OVER (PARTITION BY chrom) AS tot
  FROM bins
),
cp1 AS MATERIALIZED (
  SELECT chrom, t AS c1, cum AS cum1, n, tot FROM (
    SELECT chrom, t, cum, n, tot,
           ROW_NUMBER() OVER (PARTITION BY chrom
             ORDER BY ABS(n * cum - t * tot) DESC, t) AS rk
    FROM rel WHERE t < n
  ) WHERE rk = 1
),
cpl AS MATERIALIZED (
  SELECT chrom, t AS cl FROM (
    SELECT r.chrom, r.t,
           ROW_NUMBER() OVER (PARTITION BY r.chrom
             ORDER BY ABS(c.c1 * r.cum - r.t * c.cum1) DESC, r.t) AS rk
    FROM rel r JOIN cp1 c ON c.chrom = r.chrom
    WHERE r.t < c.c1
  ) WHERE rk = 1
),
cpr AS MATERIALIZED (
  SELECT chrom, t AS cr FROM (
    SELECT r.chrom, r.t,
           ROW_NUMBER() OVER (PARTITION BY r.chrom
             ORDER BY ABS((c.n - c.c1) * (r.cum - c.cum1)
                          - (r.t - c.c1) * (c.tot - c.cum1)) DESC, r.t) AS rk
    FROM rel r JOIN cp1 c ON c.chrom = r.chrom
    WHERE r.t > c.c1 AND r.t < c.n
  ) WHERE rk = 1
),
segged AS (
  SELECT r.chrom, r.t, r.cnt, r.n, r.tot,
         CASE WHEN r.t <= l.cl THEN 1
              WHEN r.t <= c.c1 THEN 2
              WHEN r.t <= x.cr THEN 3
              ELSE 4 END AS seg
  FROM rel r
  JOIN cp1 c ON c.chrom = r.chrom
  JOIN cpl l ON l.chrom = r.chrom
  JOIN cpr x ON x.chrom = r.chrom
),
scored AS (
  SELECT chrom, seg,
         CAST(COUNT(*) AS BIGINT) AS n_bins,
         CAST(SUM(cnt) AS BIGINT) AS seg_reads,
         ROUND(CAST(SUM(CAST(ROUND(ln((cnt * n)
                                      / CAST(tot AS DOUBLE)) / ln(2.0), 8)
                             AS DECIMAL(16,8))) AS DOUBLE) / COUNT(*), 6)
           AS mean_log2_ratio
  FROM segged GROUP BY chrom, seg
)
SELECT chrom, CAST(seg AS INT) AS seg, n_bins, seg_reads, mean_log2_ratio,
       CASE WHEN mean_log2_ratio > {_CNV_CALL_THRESH!r} THEN 'gain'
            WHEN mean_log2_ratio < -{_CNV_CALL_THRESH!r} THEN 'loss'
            ELSE 'neutral' END AS call
FROM scored
""",
)
def q353_copy_ratio_segments(spark, sf_dir):
    """COPY-RATIO SEGMENTATION (the GATK ModelSegments / CNV-caller
    shape: bin the genome, log2 the coverage ratio against the contig
    baseline, segment, call gain/loss — q335's binary-segmentation
    machinery composed into the artifact a CNV pipeline actually
    emits): 1-kb read-count bins, depth-2 binseg per contig (integer
    mean-clearing scores on the raw COUNTS — changepoints never touch
    floats), then per-segment mean log2 ratio and a +-0.3 call.

    Scale discipline: binning is one midpoint aggregate; changepoint
    scores are exact-integer windows over bin-domain tables (q335's
    trick); only the REPORTING layer computes log2 ratios — 8-dp
    snapped terms into DECIMAL segment means."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    reads = li.where(
        (F.col("l_linenumber") % 7 != 0) & (F.col("l_partkey") % 60 >= 20)
    ).select(
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias("chrom"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000).alias("start"),
        (
            (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 50000
            + (20 + F.col("l_quantity").cast("bigint") % 30)
            + (1 + F.col("l_linenumber") % 3)
        ).alias("fin"),
    )
    bins = reads.groupBy(
        "chrom",
        F.expr(f"(start + (fin - start) DIV 2) DIV {_CNV_BIN}").alias("bin"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w_ord = W.partitionBy("chrom").orderBy("bin")
    w_all = W.partitionBy("chrom")
    rel = bins.select(
        "chrom",
        "cnt",
        F.row_number().over(w_ord).alias("t"),
        F.sum("cnt")
        .over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow))
        .alias("cum"),
        F.count(F.lit(1)).over(w_all).alias("n"),
        F.sum("cnt").over(w_all).alias("tot"),
    ).transform(managed_persist)
    cp1 = (
        rel.where(F.col("t") < F.col("n"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("chrom").orderBy(
                    F.abs(F.col("n") * F.col("cum") - F.col("t") * F.col("tot")).desc(),
                    "t",
                )
            ),
        )
        .where(F.col("rk") == 1)
        .select("chrom", F.col("t").alias("c1"), F.col("cum").alias("cum1"))
        .transform(managed_persist)
    )
    base = rel.join(F.broadcast(cp1), "chrom")
    cpl = (
        base.where(F.col("t") < F.col("c1"))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("chrom").orderBy(
                    F.abs(F.col("c1") * F.col("cum") - F.col("t") * F.col("cum1")).desc(),
                    "t",
                )
            ),
        )
        .where(F.col("rk") == 1)
        .select("chrom", F.col("t").alias("cl"))
    )
    cpr = (
        base.where((F.col("t") > F.col("c1")) & (F.col("t") < F.col("n")))
        .withColumn(
            "rk",
            F.row_number().over(
                W.partitionBy("chrom").orderBy(
                    F.abs(
                        (F.col("n") - F.col("c1")) * (F.col("cum") - F.col("cum1"))
                        - (F.col("t") - F.col("c1")) * (F.col("tot") - F.col("cum1"))
                    ).desc(),
                    "t",
                )
            ),
        )
        .where(F.col("rk") == 1)
        .select("chrom", F.col("t").alias("cr"))
    )
    segged = (
        base.join(F.broadcast(cpl), "chrom")
        .join(F.broadcast(cpr), "chrom")
        .select(
            "chrom",
            "cnt",
            "n",
            "tot",
            F.when(F.col("t") <= F.col("cl"), 1)
            .when(F.col("t") <= F.col("c1"), 2)
            .when(F.col("t") <= F.col("cr"), 3)
            .otherwise(4)
            .alias("seg"),
        )
    )
    lr = F.round(
        F.log((F.col("cnt") * F.col("n")) / F.col("tot").cast("double"))
        / F.log(F.lit(2.0)),
        8,
    )
    scored = segged.groupBy("chrom", "seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bins"),
        F.sum("cnt").cast("bigint").alias("seg_reads"),
        F.round(
            F.sum(lr.cast("decimal(16,8)")).cast("double") / F.count(F.lit(1)), 6
        ).alias("mean_log2_ratio"),
    )
    th = _CNV_CALL_THRESH
    return scored.select(
        "chrom",
        F.col("seg").cast("int").alias("seg"),
        "n_bins",
        "seg_reads",
        "mean_log2_ratio",
        F.when(F.col("mean_log2_ratio") > th, "gain")
        .when(F.col("mean_log2_ratio") < -th, "loss")
        .otherwise("neutral")
        .alias("call"),
    )


@query(
    "q359_gsea_enrichment",
    oracle=f"""
WITH genes AS MATERIALIZED ({_GENES_SQL}),
vars AS MATERIALIZED ({_VARS_SQL}),
carriers AS (
  SELECT chrom, pos, CAST(COUNT(*) AS BIGINT) AS ac FROM vars
  GROUP BY chrom, pos
),
score AS MATERIALIZED (
  SELECT g.gene_id,
         CAST(SUM(c.ac) AS BIGINT) AS burden,
         CASE WHEN g.gene_id % 100 = 0 THEN 1 ELSE 0 END AS in_set
  FROM genes g JOIN carriers c
    ON c.chrom = g.chrom AND c.pos >= g.gstart AND c.pos < g.gend
  GROUP BY g.gene_id
),
tot AS MATERIALIZED (
  SELECT CAST(SUM(in_set) AS BIGINT) AS n_hit,
         CAST(SUM(1 - in_set) AS BIGINT) AS n_miss,
         CAST(SUM(CASE WHEN in_set = 1 THEN burden ELSE 0 END) AS BIGINT)
           AS hit_mass
  FROM score
),
walk AS (
  SELECT gene_id, in_set, burden,
         SUM(CASE WHEN in_set = 1 THEN burden ELSE 0 END)
           OVER w AS cum_hit_mass,
         SUM(1 - in_set) OVER w AS cum_miss
  FROM score
  WINDOW w AS (ORDER BY burden DESC, gene_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
dev AS (
  SELECT gene_id,
         ROUND(cum_hit_mass / CAST((SELECT hit_mass FROM tot) AS DOUBLE)
               - cum_miss / CAST((SELECT n_miss FROM tot) AS DOUBLE), 8)
           AS d
  FROM walk
)
SELECT
  (SELECT CAST(n_hit AS BIGINT) FROM tot) AS n_set_genes,
  (SELECT CAST(n_miss AS BIGINT) FROM tot) AS n_other_genes,
  ROUND(MAX(d), 6) AS es_pos,
  ROUND(MIN(d), 6) AS es_neg,
  ROUND(CASE WHEN MAX(d) >= ABS(MIN(d)) THEN MAX(d) ELSE MIN(d) END, 6)
    AS enrichment_score,
  CAST(MIN(CASE WHEN d = (SELECT MAX(d2.d) FROM dev d2) THEN gene_id END)
       AS BIGINT) AS peak_gene
FROM dev
""",
)
def q359_gsea_enrichment(spark, sf_dir):
    """GSEA ENRICHMENT SCORE (Subramanian 2005 core statistic — does a
    gene SET cluster at the top of a burden-ranked gene list? The
    weighted Kolmogorov-Smirnov running sum every pathway-enrichment
    report is built on; the permutation p-value is out of scope, the
    STATISTIC and its peak are exact): genes ranked by q339's rare
    burden, set membership = a deterministic id rule, ES = max
    deviation of (weighted hit CDF - miss CDF).

    Scale discipline: the ranked walk is ONE cumulative window over
    the GENE-domain table (dimension-bounded, like every GSEA input);
    masses are exact integers, the deviation snaps at 8 before the
    argmax so the peak gene is engine-identical."""
    from pyspark.sql import Window as W

    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    genes = part.where(F.col("p_partkey") % 50 == 0).select(
        F.col("p_partkey").alias("gene_id"),
        F.concat(F.lit("c"), (F.col("p_partkey") % 4).cast("string")).alias("gchrom"),
        ((F.col("p_partkey") * 31) % 50000).alias("gstart"),
        (
            (F.col("p_partkey") * 31) % 50000
            + 500
            + (F.col("p_partkey") % 5) * 300
        ).alias("gend"),
    )
    vars_ = li.where(F.col("l_linenumber") % 3 == 0).select(
        F.concat(F.lit("c"), (F.col("l_orderkey") % 4).cast("string")).alias("chrom"),
        ((F.col("l_orderkey") * 13 + F.col("l_linenumber") * 7) % 50000).alias("pos"),
    )
    carriers = vars_.groupBy("chrom", "pos").agg(
        F.count(F.lit(1)).cast("bigint").alias("ac")
    )
    score = (
        carriers.join(
            F.broadcast(genes),
            (F.col("gchrom") == F.col("chrom"))
            & (F.col("pos") >= F.col("gstart"))
            & (F.col("pos") < F.col("gend")),
        )
        .groupBy("gene_id")
        .agg(F.sum("ac").cast("bigint").alias("burden"))
        .select(
            "gene_id",
            "burden",
            F.when(F.col("gene_id") % 100 == 0, 1).otherwise(0).alias("in_set"),
        )
        .transform(managed_persist)
    )
    tot = score.agg(
        F.sum("in_set").cast("bigint").alias("n_hit"),
        F.sum(1 - F.col("in_set")).cast("bigint").alias("n_miss"),
        F.sum(F.when(F.col("in_set") == 1, F.col("burden")).otherwise(0))
        .cast("bigint")
        .alias("hit_mass"),
    )
    w = W.orderBy(F.col("burden").desc(), "gene_id").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    walk = score.select(
        "gene_id",
        F.sum(F.when(F.col("in_set") == 1, F.col("burden")).otherwise(0))
        .over(w)
        .alias("cum_hit_mass"),
        F.sum(1 - F.col("in_set")).over(w).alias("cum_miss"),
    )
    dev = walk.crossJoin(F.broadcast(tot)).select(
        "gene_id",
        "n_hit",
        "n_miss",
        F.round(
            F.col("cum_hit_mass") / F.col("hit_mass").cast("double")
            - F.col("cum_miss") / F.col("n_miss").cast("double"),
            8,
        ).alias("d"),
    ).transform(managed_persist)
    mx = dev.agg(
        F.max("d").alias("dmax"),
        F.min("d").alias("dmin"),
        F.max("n_hit").cast("bigint").alias("n_set_genes"),
        F.max("n_miss").cast("bigint").alias("n_other_genes"),
    )
    peak = (
        dev.crossJoin(F.broadcast(mx.select("dmax")))
        .where(F.col("d") == F.col("dmax"))
        .agg(F.min("gene_id").cast("bigint").alias("peak_gene"))
    )
    return mx.crossJoin(F.broadcast(peak)).select(
        "n_set_genes",
        "n_other_genes",
        F.round(F.col("dmax"), 6).alias("es_pos"),
        F.round(F.col("dmin"), 6).alias("es_neg"),
        F.round(
            F.when(
                F.col("dmax") >= F.abs(F.col("dmin")), F.col("dmax")
            ).otherwise(F.col("dmin")),
            6,
        ).alias("enrichment_score"),
        "peak_gene",
    )


_HAP_EM_ITERS = 6
_HAP_MAX_DIST = 10


def _hap_em_oracle_sql() -> str:
    parts = [
        f"""
WITH gt AS MATERIALIZED (
  SELECT CAST(l_suppkey % 6 AS INT) AS sample_id,
         l_orderkey % 2000 AS site,
         MIN(CAST(l_partkey % 3 AS INT)) AS dosage
  FROM lineitem GROUP BY 1, 2
),
sites AS MATERIALIZED (
  SELECT site FROM gt GROUP BY site HAVING COUNT(*) = 6
     AND SUM(dosage) > 0 AND SUM(dosage) < 12
),
prs AS MATERIALIZED (
  SELECT a.site AS sa, b.site AS sb
  FROM sites a JOIN sites b
    ON b.site > a.site AND b.site - a.site <= {_HAP_MAX_DIST}
),
cells AS MATERIALIZED (
  SELECT p.sa, p.sb,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN ga.dosage = 1 AND gb.dosage = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS dh,
         CAST(SUM(2 * (CASE WHEN ga.dosage = 2 AND gb.dosage = 2 THEN 1 ELSE 0 END)
              + (CASE WHEN ga.dosage = 2 AND gb.dosage = 1 THEN 1 ELSE 0 END)
              + (CASE WHEN ga.dosage = 1 AND gb.dosage = 2 THEN 1 ELSE 0 END))
              AS BIGINT) AS c_ab,
         CAST(SUM(2 * (CASE WHEN ga.dosage = 2 AND gb.dosage = 0 THEN 1 ELSE 0 END)
              + (CASE WHEN ga.dosage = 2 AND gb.dosage = 1 THEN 1 ELSE 0 END)
              + (CASE WHEN ga.dosage = 1 AND gb.dosage = 0 THEN 1 ELSE 0 END))
              AS BIGINT) AS c_axb,
         CAST(SUM(2 * (CASE WHEN ga.dosage = 0 AND gb.dosage = 2 THEN 1 ELSE 0 END)
              + (CASE WHEN ga.dosage = 1 AND gb.dosage = 2 THEN 1 ELSE 0 END)
              + (CASE WHEN ga.dosage = 0 AND gb.dosage = 1 THEN 1 ELSE 0 END))
              AS BIGINT) AS c_xab,
         CAST(SUM(2 * (CASE WHEN ga.dosage = 0 AND gb.dosage = 0 THEN 1 ELSE 0 END)
              + (CASE WHEN ga.dosage = 1 AND gb.dosage = 0 THEN 1 ELSE 0 END)
              + (CASE WHEN ga.dosage = 0 AND gb.dosage = 1 THEN 1 ELSE 0 END))
              AS BIGINT) AS c_xaxb
  FROM prs p
  JOIN gt ga ON ga.site = p.sa
  JOIN gt gb ON gb.site = p.sb AND gb.sample_id = ga.sample_id
  GROUP BY p.sa, p.sb
),
e0 AS (SELECT *, CAST(0.5 AS DOUBLE) AS x FROM cells)"""
    ]
    prev = "e0"
    upd = """ROUND(
    ((c_ab + x * dh) * (c_xaxb + x * dh))
    / (((c_ab + x * dh) * (c_xaxb + x * dh))
       + ((c_axb + (1 - x) * dh) * (c_xab + (1 - x) * dh))), 10)"""
    for i in range(1, _HAP_EM_ITERS + 1):
        parts.append(
            f""",
e{i} AS (
  SELECT sa, sb, n, dh, c_ab, c_axb, c_xab, c_xaxb,
         CASE WHEN dh = 0 THEN x ELSE {upd} END AS x
  FROM {prev}
)"""
        )
        prev = f"e{i}"
    parts.append(
        f"""
SELECT sa AS site_a, sb AS site_b, n AS n_samples, dh AS n_double_het,
       ROUND(x, 6) AS p_cis,
       ROUND((c_ab + x * dh) / (2.0 * n), 6) AS hap_ab_freq,
       ROUND((c_ab + x * dh) / (2.0 * n)
             - ((c_ab + x * dh + c_axb + (1 - x) * dh) / (2.0 * n))
               * ((c_ab + x * dh + c_xab + (1 - x) * dh) / (2.0 * n)), 6)
         AS d_coeff
FROM {prev}
WHERE dh > 0
"""
    )
    return "".join(parts)


@query("q361_haplotype_em", oracle=_hap_em_oracle_sql())
def q361_haplotype_em(spark, sf_dir):
    """TWO-SNP HAPLOTYPE-FREQUENCY EM (Hill 1974 / the EM inside every
    unphased-LD estimator: with genotypes only, the double-het cell
    AB/ab vs Ab/aB is ambiguous — iterate the cis-probability
    x = pAB*pab / (pAB*pab + pAb*paB) until the haplotype frequencies
    self-agree; the PHASED-data shortcut q198 takes is exact only when
    phase is known): per nearby site pair, 6 EM iterations, the cis
    probability, haplotype-AB frequency and the LD D coefficient.

    Scale discipline: each pair's EM state is ONE column iterated as a
    pure projection over the pair table (the q324 fixed-point shape —
    no joins, no driver state, Catalyst collapses the 6 steps into one
    stage); cell counts come from a banded distance-bounded pair join
    (the q198 discipline); snap round(,10) per iteration keeps both
    engines in lockstep; dh=0 pairs keep x untouched (no 0/0)."""
    li = load_table(spark, sf_dir, "lineitem")
    gt = li.groupBy(
        (F.col("l_suppkey") % 6).cast("int").alias("sample_id"),
        (F.col("l_orderkey") % 2000).alias("site"),
    ).agg(F.min((F.col("l_partkey") % 3).cast("int")).alias("dosage")).transform(
        managed_persist
    )
    sites = (
        gt.groupBy("site")
        .agg(F.count(F.lit(1)).alias("k"), F.sum("dosage").alias("sd"))
        .where((F.col("k") == 6) & (F.col("sd") > 0) & (F.col("sd") < 12))
        .select("site")
    )
    prs = sites.select(F.col("site").alias("sa")).join(
        sites.select(F.col("site").alias("sb")),
        (F.col("sb") > F.col("sa"))
        & (F.col("sb") - F.col("sa") <= _HAP_MAX_DIST),
    )
    ga = gt.select(F.col("site").alias("sa"), "sample_id", F.col("dosage").alias("da"))
    gb = gt.select(F.col("site").alias("sb"), "sample_id", F.col("dosage").alias("db"))
    da, db = F.col("da"), F.col("db")

    def cell(x, y):
        return F.when((da == x) & (db == y), 1).otherwise(0)

    cells = (
        prs.join(ga, "sa")
        .join(gb, ["sb", "sample_id"])
        .groupBy("sa", "sb")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(cell(1, 1)).cast("bigint").alias("dh"),
            F.sum(2 * cell(2, 2) + cell(2, 1) + cell(1, 2))
            .cast("bigint")
            .alias("c_ab"),
            F.sum(2 * cell(2, 0) + cell(2, 1) + cell(1, 0))
            .cast("bigint")
            .alias("c_axb"),
            F.sum(2 * cell(0, 2) + cell(1, 2) + cell(0, 1))
            .cast("bigint")
            .alias("c_xab"),
            F.sum(2 * cell(0, 0) + cell(1, 0) + cell(0, 1))
            .cast("bigint")
            .alias("c_xaxb"),
        )
    )
    cur = cells.withColumn("x", F.lit(0.5).cast("double"))
    for _ in range(_HAP_EM_ITERS):
        x = F.col("x")
        num = (F.col("c_ab") + x * F.col("dh")) * (
            F.col("c_xaxb") + x * F.col("dh")
        )
        den = num + (F.col("c_axb") + (1 - x) * F.col("dh")) * (
            F.col("c_xab") + (1 - x) * F.col("dh")
        )
        cur = cur.withColumn(
            "x",
            F.when(F.col("dh") == 0, x).otherwise(F.round(num / den, 10)),
        )
    x = F.col("x")
    p_ab = (F.col("c_ab") + x * F.col("dh")) / (2.0 * F.col("n"))
    p_a = (
        F.col("c_ab") + x * F.col("dh") + F.col("c_axb") + (1 - x) * F.col("dh")
    ) / (2.0 * F.col("n"))
    p_b = (
        F.col("c_ab") + x * F.col("dh") + F.col("c_xab") + (1 - x) * F.col("dh")
    ) / (2.0 * F.col("n"))
    return cur.where(F.col("dh") > 0).select(
        F.col("sa").alias("site_a"),
        F.col("sb").alias("site_b"),
        F.col("n").alias("n_samples"),
        F.col("dh").alias("n_double_het"),
        F.round(x, 6).alias("p_cis"),
        F.round(p_ab, 6).alias("hap_ab_freq"),
        F.round(p_ab - p_a * p_b, 6).alias("d_coeff"),
    )


def _rouge_l_wavefront_oracle_sql() -> str:
    """LCS as a WAVEFRONT recursive CTE (q219's anti-diagonal shape
    with the unit-cost recurrence): cell (i, j=d+1-i) is
    max(diag + eq, up, left); boundaries are 0."""
    val = """
      CASE WHEN i = 0 OR d + 1 - i = 0 THEN CAST(0 AS INT)
           ELSE GREATEST(
             prev[CAST(i - GREATEST(0, d - 1 - m) AS INT)]
               + CASE WHEN substr(a, CAST(i AS INT), 1) = substr(b, CAST(d + 1 - i AS INT), 1)
                      THEN 1 ELSE 0 END,
             cur[CAST(i - GREATEST(0, d - m) AS INT)],
             cur[CAST(i + 1 - GREATEST(0, d - m) AS INT)])
      END"""
    return f"""
WITH RECURSIVE dna AS ({SQL_DOCS_DNA}),
pairs AS (
  SELECT ea.doc_id // 2 AS pair_id, ea.seq AS a, eb.seq AS b,
         CAST(length(ea.seq) AS INT) AS n, CAST(length(eb.seq) AS INT) AS m
  FROM dna ea JOIN dna eb ON eb.doc_id = ea.doc_id + 1
  WHERE ea.doc_id % 2 = 0
),
rec AS (
  SELECT pair_id, a, b, n, m, 0 AS d,
         [CAST(0 AS INT)] AS cur, CAST(NULL AS INT[]) AS prev
  FROM pairs
  UNION ALL
  SELECT pair_id, a, b, n, m, d + 1,
         list_transform(generate_series(GREATEST(0, d + 1 - m), LEAST(n, d + 1)),
                        i -> {val}) AS cur,
         cur AS prev
  FROM rec WHERE d < n + m
)
SELECT pair_id, n, m,
       cur[1] AS lcs_len,
       ROUND(CASE WHEN cur[1] = 0 THEN 0.0 ELSE
         2.0 * (cur[1] / CAST(n AS DOUBLE)) * (cur[1] / CAST(m AS DOUBLE))
         / ((cur[1] / CAST(n AS DOUBLE)) + (cur[1] / CAST(m AS DOUBLE))) END, 6)
         AS rouge_l_f
FROM rec WHERE d = n + m
"""


@query("q379_rouge_l", oracle=_rouge_l_wavefront_oracle_sql())
def q379_rouge_l(spark, sf_dir):
    """ROUGE-L (Lin 2004 — LCS-based generation eval, the
    reference-overlap twin of q378's BLEU): per consecutive doc pair,
    the longest-common-subsequence length and the ROUGE-L F-measure
    2PR/(P+R) with P = LCS/|cand|, R = LCS/|ref| — over the derived
    DNA sequences, the same substrate as the alignment family
    q219/q247/q325 (LCS is their unit-cost member).

    Engine side: Arrow ``lcs_lengths`` kernel (per-row numpy, the
    running-max row identity); ORACLE replays every cell as a q219-
    shape wavefront recursive CTE. Integer DP -> bit-exact; the only
    float is the final F expression, rounded once. Scale: pairs are
    independent (pure mapInPandas, no shuffle)."""
    from variantcalling_spark.operators.kernels import lcs_lengths

    dna = docs_as_dna(spark, sf_dir).transform(managed_persist)
    a = dna.where(F.col("doc_id") % 2 == 0).select(
        F.expr("doc_id DIV 2").alias("pair_id"), F.col("seq").alias("a")
    )
    b = dna.select(
        F.expr("(doc_id - 1) DIV 2").alias("pair_id"),
        F.col("seq").alias("b"),
        (F.col("doc_id") % 2).alias("par"),
    ).where(F.col("par") == 1).drop("par")
    out = lcs_lengths(a.join(b, "pair_id"))
    p = F.col("lcs_len") / F.col("n").cast("double")
    r = F.col("lcs_len") / F.col("m").cast("double")
    return out.select(
        "pair_id",
        "n",
        "m",
        "lcs_len",
        F.round(
            F.when(F.col("lcs_len") == 0, F.lit(0.0)).otherwise(
                2.0 * p * r / (p + r)
            ),
            6,
        ).alias("rouge_l_f"),
    )


_GENETIC_CODE = [("AAA", "K"), ("AAC", "N"), ("AAG", "K"), ("AAT", "N"), ("ACA", "T"), ("ACC", "T"), ("ACG", "T"), ("ACT", "T"), ("AGA", "R"), ("AGC", "S"), ("AGG", "R"), ("AGT", "S"), ("ATA", "I"), ("ATC", "I"), ("ATG", "M"), ("ATT", "I"), ("CAA", "Q"), ("CAC", "H"), ("CAG", "Q"), ("CAT", "H"), ("CCA", "P"), ("CCC", "P"), ("CCG", "P"), ("CCT", "P"), ("CGA", "R"), ("CGC", "R"), ("CGG", "R"), ("CGT", "R"), ("CTA", "L"), ("CTC", "L"), ("CTG", "L"), ("CTT", "L"), ("GAA", "E"), ("GAC", "D"), ("GAG", "E"), ("GAT", "D"), ("GCA", "A"), ("GCC", "A"), ("GCG", "A"), ("GCT", "A"), ("GGA", "G"), ("GGC", "G"), ("GGG", "G"), ("GGT", "G"), ("GTA", "V"), ("GTC", "V"), ("GTG", "V"), ("GTT", "V"), ("TAA", "*"), ("TAC", "Y"), ("TAG", "*"), ("TAT", "Y"), ("TCA", "S"), ("TCC", "S"), ("TCG", "S"), ("TCT", "S"), ("TGA", "*"), ("TGC", "C"), ("TGG", "W"), ("TGT", "C"), ("TTA", "L"), ("TTC", "F"), ("TTG", "L"), ("TTT", "F")]


@query(
    "q386_dnds_ratio",
    oracle=f"""
WITH code(codon, aa) AS (VALUES ('AAA', 'K'), ('AAC', 'N'), ('AAG', 'K'), ('AAT', 'N'), ('ACA', 'T'), ('ACC', 'T'), ('ACG', 'T'), ('ACT', 'T'), ('AGA', 'R'), ('AGC', 'S'), ('AGG', 'R'), ('AGT', 'S'), ('ATA', 'I'), ('ATC', 'I'), ('ATG', 'M'), ('ATT', 'I'), ('CAA', 'Q'), ('CAC', 'H'), ('CAG', 'Q'), ('CAT', 'H'), ('CCA', 'P'), ('CCC', 'P'), ('CCG', 'P'), ('CCT', 'P'), ('CGA', 'R'), ('CGC', 'R'), ('CGG', 'R'), ('CGT', 'R'), ('CTA', 'L'), ('CTC', 'L'), ('CTG', 'L'), ('CTT', 'L'), ('GAA', 'E'), ('GAC', 'D'), ('GAG', 'E'), ('GAT', 'D'), ('GCA', 'A'), ('GCC', 'A'), ('GCG', 'A'), ('GCT', 'A'), ('GGA', 'G'), ('GGC', 'G'), ('GGG', 'G'), ('GGT', 'G'), ('GTA', 'V'), ('GTC', 'V'), ('GTG', 'V'), ('GTT', 'V'), ('TAA', '*'), ('TAC', 'Y'), ('TAG', '*'), ('TAT', 'Y'), ('TCA', 'S'), ('TCC', 'S'), ('TCG', 'S'), ('TCT', 'S'), ('TGA', '*'), ('TGC', 'C'), ('TGG', 'W'), ('TGT', 'C'), ('TTA', 'L'), ('TTC', 'F'), ('TTG', 'L'), ('TTT', 'F')),
dna0 AS ({SQL_DOCS_DNA}),
dna AS (SELECT doc_id, upper(seq) AS seq FROM dna0),
pairs AS (
  SELECT ea.doc_id // 2 AS pair_id, ea.seq AS a, eb.seq AS b,
         LEAST(length(ea.seq), length(eb.seq)) // 3 AS n_codons
  FROM dna ea JOIN dna eb ON eb.doc_id = ea.doc_id + 1
  WHERE ea.doc_id % 2 = 0
),
codons AS (
  SELECT pair_id,
         substr(a, CAST(3 * i + 1 AS INT), 3) AS ca,
         substr(b, CAST(3 * i + 1 AS INT), 3) AS cb
  FROM pairs, unnest(generate_series(0, CAST(n_codons - 1 AS BIGINT))) AS t(i)
  WHERE n_codons > 0
),
cls AS (
  SELECT c.pair_id,
         CASE WHEN c.ca = c.cb THEN 0
              WHEN ka.aa = kb.aa THEN 1 ELSE 2 END AS k
  FROM codons c JOIN code ka ON ka.codon = c.ca JOIN code kb ON kb.codon = c.cb
)
SELECT pair_id,
       CAST(COUNT(*) AS BIGINT) AS n_codons,
       CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_syn,
       CAST(SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonsyn,
       ROUND(CASE WHEN SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) > 0
             THEN SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END)
                  / CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS DOUBLE) END, 6)
         AS dnds
FROM cls GROUP BY pair_id
""",
)
def q386_dnds_ratio(spark, sf_dir):
    """CODON-LEVEL dN/dS SUBSTITUTION RATIO (the comparative-genomics
    selection signal: nonsynonymous vs synonymous codon changes
    between paired sequences under the standard genetic code; the
    codon-aware member of the pairwise family q219/q247/q379):
    aligned codon columns over consecutive doc-pair DNA, each
    differing codon classified by the BROADCAST 64-row genetic-code
    map (same literal table on both engines), ratio = n_nonsyn/n_syn
    per pair (the observed-count simplification of NG86, stated — no
    site-count normalization).

    Scale shape: codon explode is one generate+substr projection (no
    shuffle), classification is two broadcast-hash joins on the 64-row
    code, per-pair counts are map-side combinable."""
    code = spark.createDataFrame(_GENETIC_CODE, "codon string, aa string")
    dna = docs_as_dna(spark, sf_dir).select(
        "doc_id", F.upper("seq").alias("seq")
    ).transform(managed_persist)
    a = dna.where(F.col("doc_id") % 2 == 0).select(
        F.expr("doc_id DIV 2").alias("pair_id"), F.col("seq").alias("a")
    )
    b = dna.select(
        F.expr("(doc_id - 1) DIV 2").alias("pair_id"),
        F.col("seq").alias("b"),
        (F.col("doc_id") % 2).alias("par"),
    ).where(F.col("par") == 1).drop("par")
    pairs = a.join(b, "pair_id").select(
        "pair_id", "a", "b",
        F.expr("least(length(a), length(b)) DIV 3").alias("n_codons"),
    )
    codons = pairs.where(F.col("n_codons") > 0).select(
        "pair_id",
        F.explode(F.expr("sequence(0, CAST(n_codons - 1 AS INT))")).alias("i"),
        "a",
        "b",
    ).select(
        "pair_id",
        F.expr("substr(a, 3 * i + 1, 3)").alias("ca"),
        F.expr("substr(b, 3 * i + 1, 3)").alias("cb"),
    )
    ka = code.select(F.col("codon").alias("ca"), F.col("aa").alias("aa_a"))
    kb = code.select(F.col("codon").alias("cb"), F.col("aa").alias("aa_b"))
    cls = (
        codons.join(F.broadcast(ka), "ca")
        .join(F.broadcast(kb), "cb")
        .select(
            "pair_id",
            F.when(F.col("ca") == F.col("cb"), 0)
            .when(F.col("aa_a") == F.col("aa_b"), 1)
            .otherwise(2)
            .alias("k"),
        )
    )
    n_syn = F.sum(F.when(F.col("k") == 1, 1).otherwise(0))
    n_nonsyn = F.sum(F.when(F.col("k") == 2, 1).otherwise(0))
    return cls.groupBy("pair_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_codons"),
        n_syn.cast("bigint").alias("n_syn"),
        n_nonsyn.cast("bigint").alias("n_nonsyn"),
        F.round(
            F.when(n_syn > 0, n_nonsyn / n_syn.cast("double")), 6
        ).alias("dnds"),
    )


@query(
    "q398_gff_gene_model",
    oracle="""
WITH g AS (
  SELECT s_suppkey AS gid, s_suppkey % 4 + 1 AS n_exons FROM supplier
),
exons AS (
  SELECT gid, j,
         CAST(gid * 10000 + j * 1000 + 1 AS BIGINT) AS start,
         CAST(gid * 10000 + j * 1000 + 1 + 400 + (gid * 7 + j * 13) % 200
              AS BIGINT) AS e
  FROM g, unnest(generate_series(1, CAST(n_exons AS BIGINT))) AS t(j)
)
SELECT 'chr' || CAST(gid % 3 + 1 AS STRING) AS seqid,
       'gene:' || CAST(gid AS STRING) AS gene_id,
       CAST(COUNT(*) AS BIGINT) AS n_exons,
       CAST(SUM(e - start + 1) AS BIGINT) AS exon_bases,
       CAST(MIN(start) AS BIGINT) AS gene_start,
       CAST(MAX(e) AS BIGINT) AS gene_end
FROM exons GROUP BY gid
""",
)
def q398_gff_gene_model(spark, sf_dir):
    """GFF3 GENE-MODEL INGEST, end-to-end through the TEXT parser
    (sources/gff.py — the annotation-format boundary q336/q339's
    broadcast gene model abstracts away; the sources-axis sibling of
    the SAM/mpileup text ingests q111): exon features are RENDERED to
    real GFF3 lines (tabs, dot-nulls, `ID=...;Parent=...` attribute
    grammar, a `##gff-version` pragma), parsed back by
    ``parse_gff_lines`` (pure JVM: split + try_element_at + 
    str_to_map), and rolled up per gene via the attribute map.

    The oracle re-derives the gene table arithmetically from the same
    keys — equality proves the render->parse round trip for every
    field AND the attribute-map lookup. Scale: line parsing is
    scan-speed expressions (splittable text source, no UDF); the
    rollup is one map-side-combinable groupBy."""
    from variantcalling_spark.sources.gff import parse_gff_lines

    sup = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("gid"),
        (F.col("s_suppkey") % 4 + 1).alias("n_exons"),
    )
    exons = sup.select(
        "gid",
        F.explode(F.expr("sequence(1, CAST(n_exons AS INT))")).alias("j"),
    ).select(
        "gid",
        "j",
        (F.col("gid") * 10000 + F.col("j") * 1000 + 1).alias("start"),
        (
            F.col("gid") * 10000
            + F.col("j") * 1000
            + 1
            + 400
            + (F.col("gid") * 7 + F.col("j") * 13) % 200
        ).alias("e"),
    )
    lines = exons.select(
        F.concat_ws(
            "\t",
            F.concat(F.lit("chr"), (F.col("gid") % 3 + 1).cast("string")),
            F.lit("synth"),
            F.lit("exon"),
            F.col("start").cast("string"),
            F.col("e").cast("string"),
            F.lit("."),
            F.lit("+"),
            F.lit("."),
            F.concat(
                F.lit("ID=exon:"),
                F.col("gid").cast("string"),
                F.lit(":"),
                F.col("j").cast("string"),
                F.lit(";Parent=gene:"),
                F.col("gid").cast("string"),
            ),
        ).alias("value")
    ).unionByName(
        spark.createDataFrame([("##gff-version 3",)], "value string")
    )
    feats = parse_gff_lines(lines).where(F.col("ftype") == "exon")
    return feats.select(
        "seqid",
        F.col("attributes")["Parent"].alias("gene_id"),
        "start",
        "end",
    ).groupBy("seqid", "gene_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exons"),
        F.sum(F.col("end") - F.col("start") + 1).cast("bigint").alias("exon_bases"),
        F.min("start").cast("bigint").alias("gene_start"),
        F.max("end").cast("bigint").alias("gene_end"),
    )


_DBG_K = 4


@query(
    "q399_debruijn_balance",
    oracle=f"""
WITH dna AS ({{SQL_DOCS_DNA}}),
km AS (
  SELECT substr(seq, CAST(i AS INT), {_DBG_K}) AS kmer
  FROM dna, unnest(generate_series(1, length(seq) - {_DBG_K} + 1)) AS t(i)
  WHERE length(seq) >= {_DBG_K}
),
edges AS (
  SELECT substr(kmer, 1, {_DBG_K - 1}) AS u,
         substr(kmer, 2, {_DBG_K - 1}) AS v,
         CAST(COUNT(*) AS BIGINT) AS mult
  FROM km GROUP BY u, v
),
outd AS (SELECT u AS node, CAST(SUM(mult) AS BIGINT) AS dout FROM edges GROUP BY u),
ind AS (SELECT v AS node, CAST(SUM(mult) AS BIGINT) AS din FROM edges GROUP BY v),
nodes AS (
  SELECT COALESCE(outd.node, ind.node) AS node,
         COALESCE(dout, 0) AS dout, COALESCE(din, 0) AS din
  FROM outd FULL OUTER JOIN ind ON ind.node = outd.node
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM edges) AS n_edges,
       (SELECT CAST(SUM(mult) AS BIGINT) FROM edges) AS n_kmers,
       CAST(SUM(CASE WHEN dout = din THEN 1 ELSE 0 END) AS BIGINT)
         AS n_balanced,
       CAST(SUM(CASE WHEN dout = din + 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_source_like,
       CAST(SUM(CASE WHEN din = dout + 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_sink_like,
       CAST(SUM(CASE WHEN ABS(din - dout) > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unbalanced
FROM nodes
""".format(SQL_DOCS_DNA=SQL_DOCS_DNA),
)
def q399_debruijn_balance(spark, sf_dir):
    """DE BRUIJN GRAPH DEGREE BALANCE (the assembly-feasibility audit:
    an Eulerian path over the k-mer graph — i.e. a single-walk
    reconstruction — exists iff every node is in/out balanced except
    at most one source-like and one sink-like node; the graph-theory
    face of the k-mer family q185/q157/q207): (k-1)-mer nodes,
    multiplicity-weighted k-mer edges, and the degree-balance census.

    Scale shape: one explode->substr projection (no UDF), one edge
    aggregate (map-side combinable), one full-outer degree join on the
    bounded (k-1)-mer domain (4^3 = 64 nodes at k=4) — the census is
    arithmetic over the node ledger."""
    dna = docs_as_dna(spark, sf_dir).where(F.length("seq") >= _DBG_K)
    km = dna.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, length(seq) - {_DBG_K} + 1),"
                f" i -> substr(seq, i, {_DBG_K}))"
            )
        ).alias("kmer")
    )
    edges = km.select(
        F.substring("kmer", 1, _DBG_K - 1).alias("u"),
        F.substring("kmer", 2, _DBG_K - 1).alias("v"),
    ).groupBy("u", "v").agg(F.count(F.lit(1)).cast("bigint").alias("mult"))
    edges = edges.transform(managed_persist)
    outd = edges.groupBy(F.col("u").alias("node")).agg(
        F.sum("mult").cast("bigint").alias("dout")
    )
    ind = edges.groupBy(F.col("v").alias("node")).agg(
        F.sum("mult").cast("bigint").alias("din")
    )
    nodes = outd.join(ind, "node", "full_outer").select(
        F.coalesce(F.col("dout"), F.lit(0)).alias("dout"),
        F.coalesce(F.col("din"), F.lit(0)).alias("din"),
    )
    etot = edges.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        F.sum("mult").cast("bigint").alias("n_kmers"),
    )
    return (
        nodes.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
            F.sum(F.when(F.col("dout") == F.col("din"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_balanced"),
            F.sum(F.when(F.col("dout") == F.col("din") + 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_source_like"),
            F.sum(F.when(F.col("din") == F.col("dout") + 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_sink_like"),
            F.sum(
                F.when(F.abs(F.col("din") - F.col("dout")) > 1, 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_unbalanced"),
        )
        .crossJoin(F.broadcast(etot))
        .select(
            "n_nodes", "n_edges", "n_kmers",
            "n_balanced", "n_source_like", "n_sink_like", "n_unbalanced",
        )
    )


@query(
    "q420_gc_skew",
    oracle=f"""
WITH dna AS ({{SQL_DOCS_DNA}}),
pos AS (
  SELECT doc_id, i,
         CASE substr(seq, CAST(i AS INT), 1)
              WHEN 'G' THEN 1 WHEN 'C' THEN -1 ELSE 0 END AS d
  FROM dna, unnest(generate_series(1, length(seq))) AS t(i)
  WHERE length(seq) > 0
),
cum AS (
  SELECT doc_id, i,
         CAST(SUM(d) OVER (PARTITION BY doc_id ORDER BY i
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS skew
  FROM pos
)
SELECT doc_id,
       CAST(MAX(i) AS BIGINT) AS seq_len,
       CAST(MIN(CASE WHEN skew = mn THEN i END) AS BIGINT) AS ori_pos,
       CAST(MIN(skew) AS BIGINT) AS min_skew,
       CAST(MAX(CASE WHEN i = L THEN skew END) AS BIGINT) AS final_skew
FROM (
  SELECT *, MIN(skew) OVER (PARTITION BY doc_id) AS mn,
         MAX(i) OVER (PARTITION BY doc_id) AS L
  FROM cum
)
GROUP BY doc_id
""".format(SQL_DOCS_DNA=SQL_DOCS_DNA),
)
def q420_gc_skew(spark, sf_dir):
    """CUMULATIVE GC SKEW (the replication-origin locator — the
    (G−C) running sum flips slope at ori/ter because leading and
    lagging strands mutate asymmetrically; the classic one-pass
    genome-landmark analysis beside the k-mer family q185/q399): per
    sequence, the cumulative-skew minimum position (the ori call),
    its depth, and the net end skew.

    Scale shape: positions explode once; the cumulative and extrema
    windows all partition BY SEQUENCE (bounded per-doc lengths, never
    a global sort); counts exact integers."""
    from pyspark.sql import Window as W

    dna = docs_as_dna(spark, sf_dir).where(F.length("seq") > 0)
    pos = dna.select(
        "doc_id",
        F.explode(F.expr("sequence(1, length(seq))")).alias("i"),
        "seq",
    ).select(
        "doc_id",
        "i",
        F.when(F.expr("substr(seq, i, 1)") == "G", 1)
        .when(F.expr("substr(seq, i, 1)") == "C", -1)
        .otherwise(0)
        .alias("d"),
    )
    wcum = W.partitionBy("doc_id").orderBy("i").rowsBetween(
        W.unboundedPreceding, 0
    )
    cum = pos.select(
        "doc_id", "i", F.sum("d").over(wcum).cast("bigint").alias("skew")
    )
    wdoc = W.partitionBy("doc_id")
    x = cum.select(
        "doc_id",
        "i",
        "skew",
        F.min("skew").over(wdoc).alias("mn"),
        F.max("i").over(wdoc).alias("L"),
    )
    return x.groupBy("doc_id").agg(
        F.max("i").cast("bigint").alias("seq_len"),
        F.min(F.when(F.col("skew") == F.col("mn"), F.col("i")))
        .cast("bigint")
        .alias("ori_pos"),
        F.min("skew").cast("bigint").alias("min_skew"),
        F.max(F.when(F.col("i") == F.col("L"), F.col("skew")))
        .cast("bigint")
        .alias("final_skew"),
    )


_SIGFIT_ITERS = 6
# three fixed deterministic "signatures" over the 6 pyrimidine-centered
# substitution classes (C>A C>G C>T T>A T>C T>G): unnormalized integer
# weights (the multiplicative updates renormalize via the column sums)
_SIGFIT_W = {
    "s1": [8, 1, 1, 1, 1, 1],  # C>A-heavy (smoking-like shape)
    "s2": [1, 1, 8, 1, 2, 1],  # C>T-heavy (aging-like shape)
    "s3": [1, 2, 1, 2, 1, 8],  # T>G-heavy
}
_SIGFIT_CLASSES = ["C>A", "C>G", "C>T", "T>A", "T>C", "T>G"]


def _sigfit_oracle_sql() -> str:
    wrows = ", ".join(
        f"('{c}', {_SIGFIT_W['s1'][i]}, {_SIGFIT_W['s2'][i]}, {_SIGFIT_W['s3'][i]})"
        for i, c in enumerate(_SIGFIT_CLASSES)
    )
    colsum = {
        k: sum(v) for k, v in _SIGFIT_W.items()
    }
    parts = [f"""
dna AS ({SQL_DOCS_DNA}),
m AS (
  SELECT substr(seq, 5, 1) AS ref, substr(seq, 9, 1) AS alt
  FROM dna WHERE length(seq) >= 9
),
canon AS (
  SELECT CASE WHEN ref IN ('C','T') THEN ref
              WHEN ref = 'G' THEN 'C' ELSE 'T' END AS cref,
         CASE WHEN ref IN ('C','T') THEN alt
              WHEN alt = 'A' THEN 'T' WHEN alt = 'C' THEN 'G'
              WHEN alt = 'G' THEN 'C' ELSE 'A' END AS calt
  FROM m WHERE ref <> alt
),
v AS (
  SELECT cref || '>' || calt AS cls, CAST(COUNT(*) AS BIGINT) AS n
  FROM canon GROUP BY 1
),
w(cls, w1, w2, w3) AS (VALUES {wrows}),
vv AS (
  SELECT w.cls, w.w1, w.w2, w.w3, COALESCE(v.n, 0) AS n
  FROM w LEFT JOIN v ON v.cls = w.cls
),
h0 AS (SELECT CAST(1.0 AS DOUBLE) AS h1, CAST(1.0 AS DOUBLE) AS h2,
              CAST(1.0 AS DOUBLE) AS h3)"""]
    prev = "h0"
    for it in range(1, _SIGFIT_ITERS + 1):
        parts.append(f"""
r{it} AS (
  SELECT SUM(vv.w1 * vv.n / (vv.w1 * p.h1 + vv.w2 * p.h2 + vv.w3 * p.h3)) AS r1,
         SUM(vv.w2 * vv.n / (vv.w1 * p.h1 + vv.w2 * p.h2 + vv.w3 * p.h3)) AS r2,
         SUM(vv.w3 * vv.n / (vv.w1 * p.h1 + vv.w2 * p.h2 + vv.w3 * p.h3)) AS r3
  FROM vv CROSS JOIN {prev} p
),
h{it} AS (
  SELECT ROUND(p.h1 * r.r1 / {colsum['s1']}, 10) AS h1,
         ROUND(p.h2 * r.r2 / {colsum['s2']}, 10) AS h2,
         ROUND(p.h3 * r.r3 / {colsum['s3']}, 10) AS h3
  FROM {prev} p CROSS JOIN r{it} r
)""")
        prev = f"h{it}"
    return ("WITH " + ",".join(parts) + f"""
SELECT CAST((SELECT SUM(n) FROM vv) AS BIGINT) AS n_mutations,
       ROUND(h1, 6) AS h_s1, ROUND(h2, 6) AS h_s2, ROUND(h3, 6) AS h_s3,
       ROUND(h1 * {colsum['s1']}
             / (h1 * {colsum['s1']} + h2 * {colsum['s2']} + h3 * {colsum['s3']}),
             6) AS frac_s1,
       ROUND(h2 * {colsum['s2']}
             / (h1 * {colsum['s1']} + h2 * {colsum['s2']} + h3 * {colsum['s3']}),
             6) AS frac_s2,
       ROUND(h3 * {colsum['s3']}
             / (h1 * {colsum['s1']} + h2 * {colsum['s2']} + h3 * {colsum['s3']}),
             6) AS frac_s3
FROM {prev}
""")


@query("q439_signature_fit", oracle=_sigfit_oracle_sql())
def q439_signature_fit(spark, sf_dir):
    """MUTATIONAL-SIGNATURE EXPOSURE FIT (the COSMIC-style NNLS: given
    fixed signature profiles, how much of the observed substitution
    spectrum does each signature explain? — the attribution layer above
    q55's raw trinuc spectrum): {_SIGFIT_ITERS} Lee-Seung KL
    multiplicative updates h_k <- h_k ยท Σ_i(W_ik v_i/(Wh)_i)/Σ_i W_ik
    against three fixed integer signature profiles over the 6
    pyrimidine-centered classes, per-iteration 10dp snapping (the q369
    snapped-power-iteration discipline) so the float walk is
    engine-exact; outputs the exposures and explained fractions.

    Scale shape: the spectrum v is ONE combinable count aggregate over
    the corpus (the only data-sized pass); the update loop runs on a
    6-row broadcast relation — at 100 TB the iteration cost does not
    change. Oracle unrolls the identical updates as CTEs."""
    d = docs_as_dna(spark, sf_dir).where(F.length("seq") >= 9)
    m = d.select(
        F.substring("seq", 5, 1).alias("ref"), F.substring("seq", 9, 1).alias("alt")
    ).where(F.col("ref") != F.col("alt"))
    cref = F.when(F.col("ref").isin("C", "T"), F.col("ref")).otherwise(
        F.when(F.col("ref") == "G", F.lit("C")).otherwise(F.lit("T"))
    )
    calt = F.when(F.col("ref").isin("C", "T"), F.col("alt")).otherwise(
        F.when(F.col("alt") == "A", F.lit("T"))
        .when(F.col("alt") == "C", F.lit("G"))
        .when(F.col("alt") == "G", F.lit("C"))
        .otherwise(F.lit("A"))
    )
    v = (
        m.select(F.concat_ws(">", cref, calt).alias("cls"))
        .groupBy("cls")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = spark.createDataFrame(
        [
            (c, _SIGFIT_W["s1"][i], _SIGFIT_W["s2"][i], _SIGFIT_W["s3"][i])
            for i, c in enumerate(_SIGFIT_CLASSES)
        ],
        "cls string, w1 int, w2 int, w3 int",
    )
    vv = (
        w.join(v, "cls", "left")
        .select(
            "cls", "w1", "w2", "w3", F.coalesce("n", F.lit(0)).alias("n")
        )
        .transform(managed_persist)
    )
    cs = {k: sum(vals) for k, vals in _SIGFIT_W.items()}
    h = (1.0, 1.0, 1.0)
    # the h-vector is 3 scalars: pull it to the driver per iteration
    # (bounded driver scalars — the EM/Lloyd's parameter pattern); the
    # data-sized work stays in the ONE spectrum aggregate above
    for _ in range(_SIGFIT_ITERS):
        wh = (
            F.col("w1") * h[0] + F.col("w2") * h[1] + F.col("w3") * h[2]
        )
        r = vv.agg(
            F.sum(F.col("w1") * F.col("n") / wh).alias("r1"),
            F.sum(F.col("w2") * F.col("n") / wh).alias("r2"),
            F.sum(F.col("w3") * F.col("n") / wh).alias("r3"),
        ).collect()[0]
        h = (
            round(h[0] * r.r1 / cs["s1"], 10),
            round(h[1] * r.r2 / cs["s2"], 10),
            round(h[2] * r.r3 / cs["s3"], 10),
        )
    tot = h[0] * cs["s1"] + h[1] * cs["s2"] + h[2] * cs["s3"]
    nmut = vv.agg(F.sum("n").cast("bigint").alias("n_mutations"))
    return nmut.select(
        "n_mutations",
        F.round(F.lit(h[0]), 6).alias("h_s1"),
        F.round(F.lit(h[1]), 6).alias("h_s2"),
        F.round(F.lit(h[2]), 6).alias("h_s3"),
        F.round(F.lit(h[0] * cs["s1"] / tot), 6).alias("frac_s1"),
        F.round(F.lit(h[1] * cs["s2"] / tot), 6).alias("frac_s2"),
        F.round(F.lit(h[2] * cs["s3"] / tot), 6).alias("frac_s3"),
    )


def _cai_oracle_sql() -> str:
    # reuses q386's _GENETIC_CODE list (defined above) — round-8
    # regression lesson: a second same-named module global silently
    # clobbered q386's at import time and the full sweep caught it
    code_rows = ", ".join(f"('{c}', '{a}')" for c, a in sorted(_GENETIC_CODE))
    return f"""
WITH dna AS ({SQL_DOCS_DNA}),
docs2 AS (
  SELECT d.doc_id, dna.seq, doc.source
  FROM dna JOIN documents doc ON doc.doc_id = dna.doc_id
  JOIN (SELECT doc_id FROM documents) d ON d.doc_id = dna.doc_id
  WHERE length(dna.seq) >= 24
),
cod AS (
  SELECT doc_id, source, substr(seq, CAST(1 + 3 * k AS INT), 3) AS codon
  FROM docs2, unnest(generate_series(0, 7)) AS t(k)
),
code(codon, aa) AS (VALUES {code_rows}),
cnt_c AS (
  SELECT c.codon, code.aa, COUNT(*) AS n
  FROM cod c JOIN code ON code.codon = c.codon
  GROUP BY c.codon, code.aa
),
fam AS (
  SELECT aa, MAX(n) AS mx, COUNT(*) AS n_syn FROM cnt_c GROUP BY aa
),
w AS (
  SELECT cnt_c.codon, cnt_c.aa,
         ROUND(cnt_c.n / CAST(fam.mx AS DOUBLE), 10) AS w
  FROM cnt_c JOIN fam ON fam.aa = cnt_c.aa
  WHERE fam.n_syn > 1 AND cnt_c.aa <> '*'
),
scored AS (
  SELECT cod.source,
         CAST(ROUND(ln(w.w), 10) AS DECIMAL(24,10)) AS lw
  FROM cod JOIN w ON w.codon = cod.codon
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_codons,
       ROUND(exp(CAST(SUM(lw) AS DOUBLE) / COUNT(*)), 6) AS cai
FROM scored GROUP BY source
"""


@query("q442_codon_adaptation_index", oracle=_cai_oracle_sql())
def q442_codon_adaptation_index(spark, sf_dir):
    """CODON ADAPTATION INDEX per source (Sharp & Li 1987 — the
    codon-usage-bias readout one level above q386's dN/dS: dN/dS asks
    'is selection acting on the protein', CAI asks 'is the codon
    CHOICE adapted to the reference usage'): corpus codon counts →
    per-amino-acid relative adaptiveness w = n_codon / n_max_synonym →
    per-source CAI = geometric mean of w over codons, with
    single-codon families (Met/Trp) and stops excluded per the
    standard definition.

    Exactness: ln(w) snapped to 10dp and summed in DECIMAL per source
    (order-free), one exp at the end. Scale shape: two combinable
    count aggregates + a broadcast 64-row genetic-code join — the
    whole query is scan-bound."""
    docs = load_table(spark, sf_dir, "documents")
    d = (
        docs_as_dna(spark, sf_dir)
        .join(docs.select("doc_id", "source"), "doc_id")
        .where(F.length("seq") >= 24)
    )
    ks = spark.range(0, 8).select(F.col("id").cast("int").alias("k"))
    cod = d.crossJoin(F.broadcast(ks)).select(
        "source",
        F.expr("substr(seq, 1 + 3 * k, 3)").alias("codon"),
    ).transform(managed_persist)
    code = spark.createDataFrame(
        sorted(_GENETIC_CODE), "codon string, aa string"
    )
    cnt_c = (
        cod.join(F.broadcast(code), "codon")
        .groupBy("codon", "aa")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    fam = cnt_c.groupBy("aa").agg(
        F.max("n").alias("mx"), F.count(F.lit(1)).alias("n_syn")
    )
    w = (
        cnt_c.join(fam, "aa")
        .where((F.col("n_syn") > 1) & (F.col("aa") != "*"))
        .select(
            "codon",
            F.round(F.col("n") / F.col("mx").cast("double"), 10).alias("w"),
        )
    )
    scored = cod.join(F.broadcast(w), "codon").select(
        "source",
        F.round(F.log("w"), 10).cast("decimal(24,10)").alias("lw"),
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_codons"),
        F.round(
            F.exp(F.sum("lw").cast("double") / F.count(F.lit(1))), 6
        ).alias("cai"),
    )


@query(
    "q454_size_factors",
    oracle=f"""
WITH dna AS ({SQL_DOCS_DNA}),
m AS (
  SELECT doc.source, substr(dna.seq, 5, 3) AS motif
  FROM dna JOIN documents doc ON doc.doc_id = dna.doc_id
  WHERE length(dna.seq) >= 7
),
counts AS (
  SELECT source, motif, CAST(COUNT(*) AS BIGINT) AS n
  FROM m GROUP BY source, motif
),
geo AS (
  SELECT motif,
         exp(CAST(SUM(CAST(ROUND(ln(CAST(n AS DOUBLE)), 10)
                           AS DECIMAL(20,10))) AS DOUBLE) / COUNT(*)) AS g,
         CAST(COUNT(*) AS BIGINT) AS n_src,
         (SELECT COUNT(DISTINCT source) FROM counts) AS total_src
  FROM counts GROUP BY motif
),
ratios AS (
  SELECT c.source, c.motif, ROUND(c.n / g.g, 10) AS r
  FROM counts c JOIN geo g ON g.motif = c.motif
  WHERE g.n_src = g.total_src
),
med AS (
  SELECT source, r AS size_factor, n_m FROM (
    SELECT source, r,
           ROW_NUMBER() OVER (PARTITION BY source ORDER BY r, motif) AS rn,
           COUNT(*) OVER (PARTITION BY source) AS n_m
    FROM ratios
  ) WHERE rn = CAST(CEIL(n_m / 2.0) AS BIGINT)
)
SELECT source, CAST(n_m AS BIGINT) AS n_motifs,
       ROUND(size_factor, 6) AS size_factor
FROM med
""",
)
def q454_size_factors(spark, sf_dir):
    """DESeq MEDIAN-OF-RATIOS SIZE FACTORS per source (Anders & Huber
    2010 — the count-normalization standard that q190's quantile
    normalization is NOT: quantile normalization forces identical
    distributions; size factors estimate ONE sequencing-depth scalar
    per sample, robust to a minority of truly-changed features): per
    (source, motif) counts, per-motif geometric mean across sources
    (features present in EVERY source only, the DESeq rule),
    per-source LOWER MEDIAN of the count/geomean ratios under a
    deterministic (r, motif) order.

    Exactness: geomeans via 10dp-snapped DECIMAL ln-sums; ratios
    snapped before the rank-exact median pick. Scale shape: two
    combinable aggregates + a per-source median window over the
    motif-bounded ratio table."""
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    m = (
        docs_as_dna(spark, sf_dir)
        .join(docs.select("doc_id", "source"), "doc_id")
        .where(F.length("seq") >= 7)
        .select("source", F.substring("seq", 5, 3).alias("motif"))
    )
    counts = m.groupBy("source", "motif").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).transform(managed_persist)
    total_src = counts.select("source").distinct().count()
    geo = (
        counts.groupBy("motif")
        .agg(
            F.exp(
                F.sum(
                    F.round(F.log(F.col("n").cast("double")), 10).cast(
                        "decimal(20,10)"
                    )
                ).cast("double")
                / F.count(F.lit(1))
            ).alias("g"),
            F.count(F.lit(1)).alias("n_src"),
        )
        .where(F.col("n_src") == total_src)
    )
    ratios = counts.join(F.broadcast(geo), "motif").select(
        "source", "motif", F.round(F.col("n") / F.col("g"), 10).alias("r")
    )
    ws = W.partitionBy("source")
    med = (
        ratios.select(
            "source",
            "r",
            F.row_number().over(ws.orderBy("r", "motif")).alias("rn"),
            F.count(F.lit(1)).over(ws).alias("n_m"),
        )
        .where(F.col("rn") == F.ceil(F.col("n_m") / 2.0).cast("bigint"))
    )
    return med.select(
        "source",
        F.col("n_m").cast("bigint").alias("n_motifs"),
        F.round(F.col("r"), 6).alias("size_factor"),
    )


@query(
    "q459_allele_balance",
    oracle="""
WITH reads AS (
  SELECT event_id % 250 AS site,
         CASE WHEN value > 10 THEN 1 ELSE 0 END AS is_alt
  FROM events
),
sites AS (
  SELECT site,
         CAST(COUNT(*) AS BIGINT) AS depth,
         CAST(SUM(is_alt) AS BIGINT) AS alt
  FROM reads GROUP BY site
),
het AS (
  SELECT site, depth, alt,
         ROUND(alt / CAST(depth AS DOUBLE), 6) AS ab,
         ROUND((alt - depth / 2.0) / sqrt(depth / 4.0), 6) AS z
  FROM sites
  WHERE alt > 0 AND alt < depth
)
SELECT CAST(FLOOR(alt * 10.0 / depth) AS BIGINT) AS ab_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_sites,
       CAST(SUM(depth) AS BIGINT) AS total_depth,
       ROUND(CAST(SUM(CAST(ab AS DECIMAL(16,6))) AS DOUBLE) / COUNT(*), 6)
         AS mean_ab,
       CAST(SUM(CASE WHEN ABS(z) > 3 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_imbalanced
FROM het GROUP BY 1
""",
)
def q459_allele_balance(spark, sf_dir):
    """ALLELE-BALANCE QC HISTOGRAM (the het-site sanity check every
    caller QC report carries — a clean het sits near AB=0.5; AB pushed
    toward 0/1 flags contamination, mapping bias, or CNV; the
    orthogonal companion to q213's strand bias on the same read
    derivation): per-site depth/alt counts, binomial(0.5) z per het
    site, AB-decile histogram with per-bucket mean AB (DECIMAL-exact)
    and the |z|>3 imbalanced count.

    Scale shape: one combinable (site) aggregate, one 10-bucket
    aggregate — scan-bound at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    reads = ev.select(
        (F.col("event_id") % 250).alias("site"),
        F.when(F.col("value") > 10, 1).otherwise(0).alias("is_alt"),
    )
    sites = reads.groupBy("site").agg(
        F.count(F.lit(1)).cast("bigint").alias("depth"),
        F.sum("is_alt").cast("bigint").alias("alt"),
    )
    het = sites.where(
        (F.col("alt") > 0) & (F.col("alt") < F.col("depth"))
    ).select(
        "site",
        "depth",
        "alt",
        F.round(F.col("alt") / F.col("depth").cast("double"), 6).alias("ab"),
        F.round(
            (F.col("alt") - F.col("depth") / 2.0)
            / F.sqrt(F.col("depth") / 4.0),
            6,
        ).alias("z"),
    )
    return het.groupBy(
        F.floor(F.col("alt") * 10.0 / F.col("depth")).cast("bigint").alias(
            "ab_bucket"
        )
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sites"),
        F.sum("depth").cast("bigint").alias("total_depth"),
        F.round(
            F.sum(F.col("ab").cast("decimal(16,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_ab"),
        F.sum(F.when(F.abs(F.col("z")) > 3, 1).otherwise(0))
        .cast("bigint")
        .alias("n_imbalanced"),
    )


_CPG_WIN = 20


@query(
    "q460_cpg_islands",
    oracle=f"""
WITH dna AS (
  SELECT doc_id,
         translate(substr(text, 1, 120), '{DNA_FROM}', '{DNA_TO}') AS seq
  FROM documents
),
win AS (
  SELECT doc_id, s AS win_start,
         substr(seq, CAST(s AS INT), {_CPG_WIN}) AS w
  FROM dna, unnest(generate_series(1, length(seq) - {_CPG_WIN} + 1, {_CPG_WIN}))
       AS t(s)
  WHERE length(seq) >= {_CPG_WIN}
),
counts AS (
  SELECT doc_id, win_start,
         CAST(length(w) - length(replace(replace(w, 'G', ''), 'C', ''))
              AS BIGINT) AS gc,
         CAST(length(replace(w, 'C', '')) - length(replace(replace(w, 'C', ''), 'G', ''))
              AS BIGINT) AS g_cnt,
         CAST(length(replace(w, 'G', '')) - length(replace(replace(w, 'G', ''), 'C', ''))
              AS BIGINT) AS c_cnt,
         CAST((length(w) - length(replace(w, 'CG', ''))) / 2 AS BIGINT) AS cpg
  FROM win
),
flagged AS (
  SELECT doc_id, win_start, gc, cpg, g_cnt, c_cnt,
         CASE WHEN gc * 2 > {_CPG_WIN}
                   AND g_cnt * c_cnt > 0
                   AND cpg * {_CPG_WIN} * 10 >= 6 * g_cnt * c_cnt
              THEN 1 ELSE 0 END AS is_island
  FROM counts
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_windows,
       CAST(SUM(is_island) AS BIGINT) AS n_island_windows,
       ROUND(SUM(is_island) / CAST(COUNT(*) AS DOUBLE), 6) AS island_frac
FROM flagged GROUP BY doc_id
""",
)
def q460_cpg_islands(spark, sf_dir):
    """CpG-ISLAND WINDOW CENSUS (the Gardiner-Garden & Frommer screen:
    GC fraction > 50% AND observed/expected CpG >= 0.6 — the classic
    promoter-region annotation; the dinucleotide-aware sibling of
    q420's GC skew, which only tracks strand asymmetry): fixed
    {_CPG_WIN}bp tumbling windows per sequence, all counts via
    replace-length string algebra (pure JVM codegen, no explode per
    base), and the obs/exp rule held INTEGER-EXACT by clearing
    denominators: cpg*W*10 >= 6*g*c avoids every float division.

    Scale shape: per-sequence tumbling windows are one generate+substr
    projection; the census is a combinable per-doc aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.translate(F.substring("text", 1, 120), DNA_FROM, DNA_TO).alias("seq"),
    ).where(F.length("seq") >= _CPG_WIN)
    win = d.select(
        "doc_id",
        F.explode(
            F.sequence(
                F.lit(1), F.length("seq") - _CPG_WIN + 1, F.lit(_CPG_WIN)
            )
        ).alias("win_start"),
        "seq",
    ).select(
        "doc_id",
        "win_start",
        F.expr(f"substr(seq, CAST(win_start AS INT), {_CPG_WIN})").alias("w"),
    )
    ln = F.length
    w = F.col("w")
    counts = win.select(
        "doc_id",
        "win_start",
        (ln(w) - ln(F.regexp_replace(w, "[GC]", ""))).cast("bigint").alias("gc"),
        (ln(F.regexp_replace(w, "C", "")) - ln(F.regexp_replace(w, "[CG]", "")))
        .cast("bigint")
        .alias("g_cnt"),
        (ln(F.regexp_replace(w, "G", "")) - ln(F.regexp_replace(w, "[GC]", "")))
        .cast("bigint")
        .alias("c_cnt"),
        ((ln(w) - ln(F.regexp_replace(w, "CG", ""))) / 2)
        .cast("bigint")
        .alias("cpg"),
    )
    island = (
        (F.col("gc") * 2 > _CPG_WIN)
        & (F.col("g_cnt") * F.col("c_cnt") > 0)
        & (
            F.col("cpg") * _CPG_WIN * 10
            >= 6 * F.col("g_cnt") * F.col("c_cnt")
        )
    )
    return counts.select(
        "doc_id", F.when(island, 1).otherwise(0).alias("is_island")
    ).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_windows"),
        F.sum("is_island").cast("bigint").alias("n_island_windows"),
        F.round(
            F.sum("is_island") / F.count(F.lit(1)).cast("double"), 6
        ).alias("island_frac"),
    )


_KV_K = 5


@query(
    "q461_kmer_error_valley",
    oracle=f"""
WITH dna AS ({SQL_DOCS_DNA}),
km AS (
  SELECT substr(seq, CAST(i AS INT), {_KV_K}) AS kmer
  FROM dna, unnest(generate_series(1, length(seq) - {_KV_K} + 1)) AS t(i)
  WHERE length(seq) >= {_KV_K}
),
mult AS (SELECT kmer, CAST(COUNT(*) AS BIGINT) AS m FROM km GROUP BY kmer),
hist AS (
  SELECT m AS multiplicity, CAST(COUNT(*) AS BIGINT) AS n_kmers
  FROM mult GROUP BY m
),
lagged AS (
  SELECT multiplicity, n_kmers,
         LAG(n_kmers) OVER (ORDER BY multiplicity) AS prev_n,
         LEAD(n_kmers) OVER (ORDER BY multiplicity) AS next_n
  FROM hist
),
valley AS (
  SELECT MIN(multiplicity) AS v
  FROM lagged
  WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
    AND n_kmers < prev_n AND n_kmers <= next_n
)
SELECT l.multiplicity, l.n_kmers,
       CAST(l.multiplicity * l.n_kmers AS BIGINT) AS total_kmers,
       CASE WHEN l.multiplicity = (SELECT v FROM valley) THEN 1 ELSE 0 END
         AS is_error_valley,
       CAST((SELECT v FROM valley) AS BIGINT) AS valley_multiplicity
FROM lagged l
""",
)
def q461_kmer_error_valley(spark, sf_dir):
    """K-MER MULTIPLICITY HISTOGRAM + ERROR VALLEY (the coverage-model
    readout genome assemblers run first: sequencing errors pile up at
    multiplicity 1-2, real coverage forms a peak, and the FIRST LOCAL
    MINIMUM between them is the error-trimming threshold — the
    histogram q185's spectrum summarizes, now with the decision point
    extracted): {_KV_K}-mer counts, multiplicity histogram, valley =
    min multiplicity with n < prev and n <= next (exact integers, LAG/
    LEAD over the histogram domain).

    Scale shape: two combinable aggregates; the valley scan runs on
    the multiplicity-domain histogram (allowlist-class window)."""
    from pyspark.sql import Window as W

    d = docs_as_dna(spark, sf_dir).where(F.length("seq") >= _KV_K)
    km = d.select(
        F.explode(
            F.expr(
                f"transform(sequence(1, length(seq) - {_KV_K} + 1),"
                f" i -> substr(seq, CAST(i AS INT), {_KV_K}))"
            )
        ).alias("kmer")
    )
    mult = km.groupBy("kmer").agg(F.count(F.lit(1)).cast("bigint").alias("m"))
    hist = mult.groupBy(F.col("m").alias("multiplicity")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kmers")
    )
    wo = W.orderBy("multiplicity")
    lagged = hist.select(
        "multiplicity",
        "n_kmers",
        F.lag("n_kmers").over(wo).alias("prev_n"),
        F.lead("n_kmers").over(wo).alias("next_n"),
    ).transform(managed_persist)
    valley = lagged.where(
        F.col("prev_n").isNotNull()
        & F.col("next_n").isNotNull()
        & (F.col("n_kmers") < F.col("prev_n"))
        & (F.col("n_kmers") <= F.col("next_n"))
    ).agg(F.min("multiplicity").alias("v"))
    return lagged.crossJoin(F.broadcast(valley)).select(
        "multiplicity",
        "n_kmers",
        (F.col("multiplicity") * F.col("n_kmers")).cast("bigint").alias(
            "total_kmers"
        ),
        F.when(F.col("multiplicity") == F.col("v"), 1)
        .otherwise(0)
        .alias("is_error_valley"),
        F.col("v").cast("bigint").alias("valley_multiplicity"),
    )
