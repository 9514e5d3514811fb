"""CLI dispatcher: ``python -m variantcalling_spark <tool> [args]``.

The reference's UX is a CLI over ~30 pipeline modules
(`ugvc/__main__.py:43-105` builds a simppl CLI and dispatches to
`<module>.run(argv)`); this is the Spark-engine equivalent — each tool
is a thin argparse wrapper that builds the session, composes the
declarative pipeline, and writes named results through the keyed
catalog. Everything between parse and write is a single Catalyst plan.
"""

from __future__ import annotations

import argparse
import sys

from pyspark.sql import functions as F


def _spark():
    from variantcalling_spark.session import get_spark

    return get_spark("variantcalling_spark_cli")


def cmd_evaluate_concordance(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="evaluate-concordance")
    ap.add_argument("--input", required=True, help="parquet concordance table")
    ap.add_argument("--output", required=True, help="results catalog root")
    ap.add_argument("--classify-col", default="classify")
    ap.add_argument("--score-col", default="score")
    ap.add_argument("--category-col", default="category")
    a = ap.parse_args(argv)
    from variantcalling_spark.pipelines.evaluate_concordance import evaluate_concordance
    from variantcalling_spark.pipelines.results import write_results

    spark = _spark()
    df = spark.read.parquet(a.input)
    write_results(
        a.output,
        evaluate_concordance(df, a.classify_col, a.score_col, a.category_col),
    )
    return 0


def cmd_coverage(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="coverage")
    ap.add_argument("--depth", required=True, help="parquet (chrom,pos,depth)")
    ap.add_argument("--intervals", required=True, help="BED file of annotation intervals")
    ap.add_argument("--category", default="intervals", help="category label for the BED")
    ap.add_argument("--output", required=True)
    ap.add_argument("--windows", type=int, nargs="*", default=[100, 1000])
    a = ap.parse_args(argv)
    from variantcalling_spark.pipelines.coverage import coverage_summary, window_binned_depth
    from variantcalling_spark.pipelines.results import write_results
    from variantcalling_spark.sources.bed import read_bed

    spark = _spark()
    depth = spark.read.parquet(a.depth)
    intervals = read_bed(spark, a.intervals).withColumn("category", F.lit(a.category))
    results = {
        "stats": coverage_summary(depth, intervals, keys=["chrom"]),
    }
    for w in a.windows:
        results[f"w{w}"] = window_binned_depth(depth, w, keys=["chrom"])
    write_results(a.output, results)
    return 0


def cmd_compress_gvcf(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="compress-gvcf")
    ap.add_argument("--input", required=True, help="parquet gVCF-shaped table")
    ap.add_argument("--output", required=True, help="parquet output dir")
    ap.add_argument("--refcall-gq-threshold", type=int, default=22)
    ap.add_argument("--merge-gq-threshold", type=int, default=10)
    a = ap.parse_args(argv)
    from variantcalling_spark.operators.kernels import compress_gvcf_blocks

    spark = _spark()
    df = spark.read.parquet(a.input)
    out = compress_gvcf_blocks(df, a.refcall_gq_threshold, a.merge_gq_threshold)
    out.write.mode("overwrite").parquet(a.output)
    return 0


def cmd_denovo_refine(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="denovo-refine")
    ap.add_argument("--child", required=True)
    ap.add_argument("--mother", required=True)
    ap.add_argument("--father", required=True)
    ap.add_argument("--output", required=True)
    a = ap.parse_args(argv)
    from variantcalling_spark.pipelines.denovo import refine_denovo

    spark = _spark()
    out = refine_denovo(
        spark.read.parquet(a.child),
        spark.read.parquet(a.mother),
        spark.read.parquet(a.father),
    )
    out.write.mode("overwrite").parquet(a.output)
    return 0


def cmd_dedup(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="dedup")
    ap.add_argument("--input", required=True, help="parquet (doc_id, text)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--method", choices=["exact", "jaccard", "minhash"], default="exact")
    ap.add_argument("--threshold", type=float, default=0.6)
    a = ap.parse_args(argv)
    from variantcalling_spark.operators.dedup import (
        exact_dedup_clusters,
        jaccard_for_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        prefix_filtered_pairs,
        shingles,
    )

    spark = _spark()
    docs = spark.read.parquet(a.input)
    if a.method == "exact":
        out = exact_dedup_clusters(docs).where(F.col("cluster_size") >= 2)
    else:
        sh = shingles(docs, n=3)
        if a.method == "jaccard":
            cands = prefix_filtered_pairs(sh, a.threshold)
        else:
            sigs = minhash_signatures(sh, num_hashes=32)
            cands = lsh_candidate_pairs(sigs, num_bands=8, rows_per_band=4)
        out = jaccard_for_pairs(cands, sh).where(F.col("jaccard") >= a.threshold)
    out.write.mode("overwrite").parquet(a.output)
    return 0


def cmd_vcf_to_parquet(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="vcf-to-parquet")
    ap.add_argument("--input", required=True, help="VCF text file")
    ap.add_argument("--output", required=True)
    a = ap.parse_args(argv)
    from variantcalling_spark.pipelines.vcf_rewrite import rewrite_vcf

    spark = _spark()
    rewrite_vcf(spark, a.input).write.mode("overwrite").parquet(a.output)
    return 0


def cmd_bam_to_parquet(argv: list[str]) -> int:
    """Binary alignment ingest (the reference's ``samtools view`` pipe as
    an in-engine scan): .bam file(s) -> typed alignment parquet, plus an
    optional depth-runs table in one pass."""
    ap = argparse.ArgumentParser(prog="bam-to-parquet")
    ap.add_argument("--input", required=True, help=".bam file or directory")
    ap.add_argument("--output", required=True)
    ap.add_argument("--depth-output", help="also write RLE depth runs here")
    ap.add_argument("--min-mapq", type=int, default=0)
    a = ap.parse_args(argv)
    from variantcalling_spark.operators.pileup import reads_to_depth_runs
    from variantcalling_spark.sources.bam import read_bam
    from variantcalling_spark.sources.reads import sam_to_read_intervals

    spark = _spark()
    records = read_bam(spark, a.input).persist()
    records.write.mode("overwrite").parquet(a.output)
    if a.depth_output:
        intervals = sam_to_read_intervals(records, min_mapq=a.min_mapq)
        reads_to_depth_runs(intervals).write.mode("overwrite").parquet(
            a.depth_output
        )
    return 0


def cmd_gvcf_hcr(argv: list[str]) -> int:
    """High-confidence-region extraction (reference ``gvcf_hcr`` CLI):
    gVCF block parquet (chrom, start, end, gq, has_gt) -> merged HCR
    BED text."""
    ap = argparse.ArgumentParser(prog="gvcf-hcr")
    ap.add_argument("--input", required=True, help="parquet of gvcf blocks")
    ap.add_argument("--bed", required=True, help="output BED path")
    ap.add_argument("--gq-threshold", type=int, default=20)
    a = ap.parse_args(argv)
    from pyspark.sql import Window as W

    spark = _spark()
    blocks = spark.read.parquet(a.input)
    hc = blocks.where(
        (F.col("gq") >= a.gq_threshold) & F.col("has_gt")
    ).select("chrom", "start", "end")
    w_ord = W.partitionBy("chrom").orderBy("start", "end")
    pm = F.max("end").over(w_ord.rowsBetween(W.unboundedPreceding, -1))
    segd = hc.withColumn(
        "brk", F.when(pm.isNull() | (F.col("start") > pm), 1).otherwise(0)
    ).withColumn("seg", F.sum("brk").over(w_ord.rowsBetween(W.unboundedPreceding, 0)))
    merged = segd.groupBy("chrom", "seg").agg(
        F.min("start").alias("start"), F.max("end").alias("end")
    )
    from variantcalling_spark.sources.bed import to_bed_lines

    to_bed_lines(merged.select("chrom", "start", "end")).coalesce(1).write.mode(
        "overwrite"
    ).text(a.bed)
    return 0


TOOLS = {
    "evaluate-concordance": cmd_evaluate_concordance,
    "coverage": cmd_coverage,
    "compress-gvcf": cmd_compress_gvcf,
    "denovo-refine": cmd_denovo_refine,
    "dedup": cmd_dedup,
    "vcf-to-parquet": cmd_vcf_to_parquet,
    "bam-to-parquet": cmd_bam_to_parquet,
    "gvcf-hcr": cmd_gvcf_hcr,
}


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m variantcalling_spark <tool> [args]")
        print("tools: " + ", ".join(sorted(TOOLS)))
        return 0 if argv else 2
    tool, rest = argv[0], argv[1:]
    if tool not in TOOLS:
        print(f"unknown tool: {tool}; tools: {', '.join(sorted(TOOLS))}")
        return 2
    return TOOLS[tool](rest)


if __name__ == "__main__":
    raise SystemExit(main())
