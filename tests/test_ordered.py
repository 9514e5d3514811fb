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
