"""Generate a larger benchmark scale point by replicating the driver
testdata with per-replica key offsets.

Each replica shifts every entity key by ``replica * OFFSET`` (one offset
per key family), so referential integrity maps replica-to-replica and
every join/aggregate does exactly N x the sf0.1 work with the same
per-key distributions — the honest way to measure whether the engine's
plans AMORTIZE with data volume (the local[32] scheduling floor is
constant, the data plane scales), without synthesizing new value
distributions. Offsets clear the +100000/+200000 id ranges the dedup
queries use for constructed near-duplicates, so augmentation logic
behaves identically per replica.

Usage: python tools/make_scale.py [factor] [out_dir]   (default 10x ->
<repo>/benchdata/sf1). Dimension tables region/nation stay fixed-size.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEY_OFFSET = 10_000_000
DOC_OFFSET = 1_000_000

# key column -> offset family; every listed column shifts by
# replica * offset so FK edges stay within a replica
KEYED = {
    "lineitem": {"l_orderkey": KEY_OFFSET, "l_partkey": KEY_OFFSET, "l_suppkey": KEY_OFFSET},
    "orders": {"o_orderkey": KEY_OFFSET, "o_custkey": KEY_OFFSET},
    "customer": {"c_custkey": KEY_OFFSET},
    "supplier": {"s_suppkey": KEY_OFFSET},
    "part": {"p_partkey": KEY_OFFSET},
    "events": {},
    "documents": {"doc_id": DOC_OFFSET},
    "embeddings": {"vec_id": DOC_OFFSET},
}
FIXED = ("region", "nation")


def make_scale(spark, src_dir: str, out_dir: str, factor: int) -> None:
    from pyspark.sql import functions as F

    from variantcalling_spark.sources.tables import load_table

    os.makedirs(out_dir, exist_ok=True)
    for name in FIXED:
        df = load_table(spark, src_dir, name)
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    for name, keys in KEYED.items():
        if name == "events":
            # raw read (ts stays the int64-nanos physical value) so the
            # scaled copy round-trips through load_table's ts_ns path
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            df = spark.read.parquet(os.path.join(src_dir, "events.parquet"))
        else:
            df = load_table(spark, src_dir, name)
        reps = []
        for r in range(factor):
            rep = df
            for col, off in keys.items():
                rep = rep.withColumn(col, F.col(col) + F.lit(r * off))
            # Replicas must NOT be near-duplicates of each other: verbatim
            # copies would give every doc/vector 10 exact dups, growing
            # near-dup pair counts QUADRATICALLY in the factor — a data
            # artifact that makes dedup queries look superlinear. Perturb
            # ~15-20% of content per replica (deterministically, replica 0
            # verbatim) so cross-replica similarity falls below the 0.6
            # Jaccard / 0.9 cosine thresholds while within-replica
            # structure — and hence dup DENSITY — stays that of sf0.1.
            if name == "documents" and r > 0:
                words = F.split(F.col("text"), " ")
                rep = rep.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            words,
                            lambda w: F.when(
                                F.pmod(F.xxhash64(w) + F.lit(r), F.lit(5)) == 0,
                                F.concat(w, F.lit(f"_x{r}")),
                            ).otherwise(w),
                        ),
                        " ",
                    ),
                )
            if name == "embeddings" and r > 0:
                rep = rep.withColumn(
                    "embedding",
                    F.transform(
                        F.col("embedding"),
                        lambda x, j: F.when(
                            F.pmod(j + F.lit(r * 3), F.lit(7)) == 0, -x
                        ).otherwise(x),
                    ),
                )
            reps.append(rep)
        out = reps[0]
        for rep in reps[1:]:
            out = out.unionByName(rep)
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, "benchdata", "sf1")
    from variantcalling_spark.session import get_spark

    spark = get_spark("make_scale")
    make_scale(spark, "/root/testdata/sf0.1", out_dir, factor)
    print("wrote", out_dir)


if __name__ == "__main__":
    main()
