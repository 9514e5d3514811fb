"""q157 cross-validation against an independent naive reference.

The DuckDB oracle mirrors the array-algebra construction, so a
semantic error (off-by-one window, wrong tie-break) could pass both
engines. This naive Python implementation — plain loops, no shared
code — pins the (w,k)-minimizer SEMANTICS: every window of w
consecutive k-mers contributes its min-hash k-mer, leftmost on ties.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
MERSENNE31 = 2_147_483_647


def _phash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % MERSENNE31


def _naive_sketch(seq: str, k: int, w: int) -> tuple[int, list[str]]:
    kmers = [seq[i : i + k] for i in range(len(seq) - k + 1)] if len(seq) >= k else []
    if len(kmers) < w:
        return len(kmers), []
    sketch: list[str] = []
    for j in range(len(kmers) - w + 1):
        window = kmers[j : j + w]
        hashes = [_phash(x) for x in window]
        pick = window[hashes.index(min(hashes))]  # leftmost min
        if pick not in sketch:
            sketch.append(pick)
    return len(kmers), sketch


def test_q157_matches_naive_reference(spark):
    from variantcalling_spark.queries import all_queries
    from variantcalling_spark.queries.genomics import (
        DNA_FROM,
        DNA_TO,
        MINIMIZER_K,
        MINIMIZER_W,
    )

    got = {
        r.doc_id: (r.n_kmers, r.sketch_size, r.sketch_min, r.sketch_max)
        for r in all_queries()["q157_minimizer_sketch"].fn(spark, SF).collect()
    }
    assert got, "q157 returned no rows"

    seqs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.translate(F.substring("text", 1, 120), DNA_FROM, DNA_TO).alias("seq"),
        )
        .collect()
    )
    n_checked = 0
    for r in seqs:
        n_kmers, sketch = _naive_sketch(r.seq, MINIMIZER_K, MINIMIZER_W)
        if n_kmers < MINIMIZER_W:
            assert r.doc_id not in got
            continue
        exp = (n_kmers, len(sketch), min(sketch), max(sketch))
        assert got[r.doc_id] == exp, f"doc {r.doc_id}: {got[r.doc_id]} != {exp}"
        n_checked += 1
    assert n_checked == len(got)
