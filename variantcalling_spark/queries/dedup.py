"""Deduplication queries over an augmented documents corpus.

The driver corpus has no duplicates, so both engines construct the same
augmented corpus: exact copies of every 20th doc (+200000 ids) and
near-copies with the first word dropped for every 10th doc (+100000 ids).
Each dedup flavor then has ground truth to find.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from variantcalling_spark.operators.dedup import (
    exact_dedup_clusters,
    jaccard_for_pairs,
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    prefix_filtered_pairs,
    shingles,
    simhash,
)
from variantcalling_spark.queries import query
from variantcalling_spark.sources import load_table

SQL_CORPUS = """
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 20 = 0
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, substr(text, strpos(text, ' ') + 1) AS text
  FROM documents WHERE doc_id % 10 = 0
"""


def corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = docs.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    near = docs.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.expr("substr(text, instr(text, ' ') + 1)").alias("text"),
    )
    return docs.unionByName(exact).unionByName(near)


@query(
    "q64_exact_dedup",
    oracle=f"""
WITH corpus AS ({SQL_CORPUS})
SELECT md5(text) AS fingerprint,
       COUNT(*) AS cluster_size,
       MIN(doc_id) AS canonical_id
FROM corpus
GROUP BY md5(text)
HAVING COUNT(*) >= 2
""",
)
def q64_exact_dedup(spark, sf_dir):
    """Exact dedup via hash-groupBy on a 128-bit fingerprint: duplicate
    clusters with a deterministic canonical representative (min id). One
    shuffle of (hash, id) pairs regardless of document size."""
    c = corpus(spark, sf_dir)
    return exact_dedup_clusters(c).where(F.col("cluster_size") >= 2)


@query(
    "q65_ngram_jaccard",
    oracle=f"""
WITH corpus AS ({SQL_CORPUS}),
sh AS (
  SELECT DISTINCT doc_id, shingle
  FROM (
    SELECT doc_id,
           unnest([string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
                   for i in generate_series(1, len(string_split(text, ' ')) - 2)]) AS shingle
    FROM corpus
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       sa.n_sh AS n_a, sb.n_sh AS n_b, n_shared,
       n_shared / CAST(sa.n_sh + sb.n_sh - n_shared AS DOUBLE) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_shared / CAST(sa.n_sh + sb.n_sh - n_shared AS DOUBLE) >= 0.6
""",
)
def q65_ngram_jaccard(spark, sf_dir):
    """Exact word-3-gram Jaccard near-duplicate pairs (threshold 0.6).

    Discovery uses lossless prefix + length filtering (PPJoin family):
    the shingle self-join runs only over each doc's rarest
    ``n - ceil(0.6*n) + 1`` shingles, then candidates are verified with
    integer-exact intersection/union arithmetic — identical output to
    the naive all-pairs shingle join (the oracle), at near-linear cost.

    The shingle table feeds three consumers (doc-frequency ranking, the
    prefix self-join, and the verify step) with different partitionings,
    so exchange reuse can't cover them — persist it once instead of
    re-shingling the corpus per consumer. Same story at cluster scale:
    the shingle table is the natural checkpoint of every dedup run (it
    is also what q66's MinHash path consumes).
    """
    sh = shingles(corpus(spark, sf_dir), n=3).persist()
    cands = prefix_filtered_pairs(sh, threshold=0.6)
    return jaccard_for_pairs(cands, sh).where(F.col("jaccard") >= 0.6).select(
        "doc_a", "doc_b", "n_a", "n_b", "n_shared", "jaccard"
    )


@query("q66_minhash_lsh", oracle=None)
def q66_minhash_lsh(spark, sf_dir):
    """MinHash-LSH near-duplicate discovery (the 100 TB dedup path):
    32 min-hashes per doc -> 8 bands x 4 rows -> banded bucket self-join
    -> exact Jaccard verification of candidates only. Discovery is linear
    in corpus size; no all-pairs pass (validated against exact Jaccard
    ground truth in tests/test_dedup_similarity.py)."""
    c = corpus(spark, sf_dir)
    # persisted for the same reason as q65 — and because the logical plan
    # is identical, a run that already executed q65 reuses its cache.
    sh = shingles(c, n=3).persist()
    sigs = minhash_signatures(sh, num_hashes=32)
    cands = lsh_candidate_pairs(sigs, num_bands=8, rows_per_band=4)
    verified = jaccard_for_pairs(cands, sh).where(F.col("jaccard") >= 0.6)
    return verified.select("doc_a", "doc_b", "n_shared", "jaccard")


@query("q67_simhash", oracle=None)
def q67_simhash(spark, sf_dir):
    """SimHash near-duplicate discovery: 32-bit weighted word-hash
    signature, banded on 4x8-bit sub-signatures, Hamming distance <= 4.
    (Signature semantics pinned in tests/test_dedup_similarity.py.)"""
    c = corpus(spark, sf_dir)
    sig = simhash(c, bits=32)
    # band on 8-bit slices: near-dups (hamming<=4) collide on >=1 of 4+ slices
    bands = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", b * 8).bitwiseAND(F.lit(255)).alias("slice"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", "bb.band", "bb.slice")
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.slice") == F.col("b.slice"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return pairs.where(F.col("hamming") <= 4)
