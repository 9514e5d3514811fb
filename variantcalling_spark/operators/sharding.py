"""Rendezvous (highest-random-weight) sharding — deterministic key->shard
assignment with the minimal-movement rebalance property (Thaler &
Ravishankar 1998; the consistent-placement primitive under shard-local
processing, bucketed sinks, and cache affinity at 100 TB).

For every key and shard s in 0..n-1, weight(key, s) is an engine-portable
hash of "key:s"; the key lands on the argmax shard. Growing the ring from
n to m shards moves a key ONLY if one of the m-n new shards wins its
argmax — so the expected moved fraction is (m-n)/m and, crucially, NO key
ever moves between two surviving shards (the invariant
``shard_movement_audit`` proves in-data rather than by citation).

Scale shape: the assignment is a single scan-local array expression per
row (one md5 per (key, shard) pair, folded JVM-side) — zero shuffle,
zero lookup table, trivially parallel at any corpus size; the audit adds
one bounded groupBy over the shard domain.

Engine parity: the weight is ``portable_string_hash`` (first 8 hex
digits of md5 mod 2^31-1), identical literal-for-literal in the DuckDB
oracle, so assignments, movement counts, and load extremes are all
value-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from variantcalling_spark.operators.dedup import MERSENNE31


def _hrw_weights(key: Column, n_shards: int) -> Column:
    """array<bigint> of HRW weights for shards 0..n_shards-1."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_shards - 1)),
        lambda s: F.conv(
            F.substring(
                F.md5(F.concat_ws(":", key.cast("string"), s.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("bigint")
        % MERSENNE31,
    )


def rendezvous_shard(
    df: DataFrame, key_col: str, n_shards: int, out_col: str = "shard"
) -> DataFrame:
    """Append the HRW shard id (0-based) for ``key_col`` over
    ``n_shards`` shards. First-index tie-break (md5 ties are ~2^-31
    per pair and broken identically on both engines by construction)."""
    w = _hrw_weights(F.col(key_col), n_shards)
    return df.withColumn(
        out_col, (F.array_position(w, F.array_max(w)) - 1).cast("int")
    )


def shard_movement_audit(
    df: DataFrame, key_col: str, n_old: int, n_new: int
) -> DataFrame:
    """One-row rebalance audit for growing the ring ``n_old`` ->
    ``n_new``: how many keys move, whether any key illegally moves
    between surviving shards (must be 0 — THE rendezvous guarantee),
    and the old/new load extremes. The old assignment is the argmax of
    the FIRST ``n_old`` weights of the ``n_new``-length array, so both
    rings share one hash computation per key."""
    w = _hrw_weights(F.col(key_col), n_new)
    assigned = df.select(
        F.col(key_col).alias("key"),
        (F.array_position(F.slice(w, 1, n_old), F.array_max(F.slice(w, 1, n_old))) - 1)
        .cast("int")
        .alias("shard_old"),
        (F.array_position(w, F.array_max(w)) - 1).cast("int").alias("shard_new"),
    )
    from variantcalling_spark._persist import managed_persist

    assigned = assigned.transform(managed_persist)
    core = assigned.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum((F.col("shard_old") != F.col("shard_new")).cast("bigint")).alias(
            "n_moved"
        ),
        F.sum(
            (
                (F.col("shard_old") != F.col("shard_new"))
                & (F.col("shard_new") < n_old)
            ).cast("bigint")
        ).alias("n_moved_to_surviving"),
        F.round(
            F.sum((F.col("shard_old") != F.col("shard_new")).cast("bigint"))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("moved_frac"),
    )

    def extremes(col: str, label: str) -> DataFrame:
        return (
            assigned.groupBy(col)
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.max("n").cast("bigint").alias(f"{label}_load_max"),
                F.min("n").cast("bigint").alias(f"{label}_load_min"),
            )
        )

    return core.crossJoin(F.broadcast(extremes("shard_old", "old"))).crossJoin(
        F.broadcast(extremes("shard_new", "new"))
    )
