"""Quality-at-scale harness (r6 verdict ask #5): run the two recall
harnesses — q217 (ANN recall@10, LSH-bucketed vs exact top-10) and
q356 (MinHash banding recall vs exact PPJoin truth) — at sf0.1 AND at
the 10x scale2 replicas, and print the aggregate recall numbers that
SCALE.md records. The adaptive band rules (q129/q146) change their
answer across this decade (bits = ceil(log2 n) + 2 crosses 17 bits),
so the recall measured HERE is the evidence those rules ride on.

Usage: python tools/recall_at_scale.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from variantcalling_spark.queries import all_queries  # noqa: E402
from variantcalling_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("recall_at_scale")
    reg = all_queries()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf1_dir = os.path.join(repo, "benchdata", "sf1")
    if not os.path.isdir(os.path.join(sf1_dir, "lineitem.parquet")):
        from tools.make_scale import make_scale

        make_scale(spark, "/root/testdata/sf0.1", sf1_dir, factor=10)
    out: dict[str, dict] = {}
    for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("10x", sf1_dir)):
        spark.catalog.clearCache()
        ann = (
            reg["q217_ann_recall_eval"].fn(spark, sf_dir)
            .agg(
                F.count(F.lit(1)).alias("n_queries"),
                F.round(F.avg("recall_at_k"), 4).alias("mean_recall_at_10"),
                F.round(
                    F.sum("n_hit") / F.sum("n_exact").cast("double"), 4
                ).alias("pooled_recall_at_10"),
            )
            .collect()[0]
        )
        mb = (
            reg["q375_ann_recall_multiband"].fn(spark, sf_dir)
            .agg(
                F.round(
                    F.sum("n_hit") / F.sum("n_exact").cast("double"), 4
                ).alias("recall"),
            )
            .collect()[0]
        )
        # IVF alternative (q71's substrate), swept over nprobe — Spark-
        # side measurement only; the per-path value oracles live on
        # q71/q217/q375
        from variantcalling_spark.operators.similarity import (
            cosine_topk,
            ivf_cosine_topk,
            ivf_index,
        )
        from variantcalling_spark.sources import load_table

        emb = load_table(spark, sf_dir, "embeddings").cache()
        q = emb.where(F.col("vec_id") < 40)
        ex = cosine_topk(q, emb, k=10).select("query_id", "cand_id")
        cents, idx = ivf_index(emb, n_centroids=16)
        idx = idx.cache()
        ivf = {}
        for nprobe in (2, 4, 8):
            ap = ivf_cosine_topk(q, idx, cents, k=10, nprobe=nprobe).select(
                "query_id", F.col("cand_id").alias("ac")
            )
            hit = ex.join(
                ap,
                (ex.query_id == ap.query_id) & (ex.cand_id == ap.ac),
                "left",
            )
            ivf[f"nprobe={nprobe}"] = round(
                hit.agg(
                    (
                        F.sum(F.when(F.col("ac").isNotNull(), 1).otherwise(0))
                        / F.count(F.lit(1))
                    ).alias("r")
                ).collect()[0].r,
                4,
            )
        ded = reg["q356_lsh_dedup_eval"].fn(spark, sf_dir).collect()[0]
        out[label] = {
            "ann_n_queries": ann.n_queries,
            "ann_singleband_recall_at_10": ann.pooled_recall_at_10,
            "ann_multiband_recall_at_10": mb.recall,
            "ann_ivf_recall_at_10": ivf,
            "dedup_n_truth_pairs": ded.n_truth,
            "dedup_pair_recall": ded.recall,
            "dedup_candidate_precision": ded.candidate_precision,
            "dedup_verify_workload_ratio": ded.verify_workload_ratio,
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
