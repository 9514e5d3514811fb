"""Keyed result store (data model D5, SURVEY.md §1.1).

The reference writes multi-table results as HDF5 keys
(`evaluate_concordance.py:101-106`, `coverage_analysis.py:532-534`).
Here: one parquet directory per key under a catalog root — columnar,
partition-prunable, readable back as named tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_results(catalog_root: str, results: dict[str, DataFrame]) -> None:
    for key, df in results.items():
        df.write.mode("overwrite").parquet(os.path.join(catalog_root, key))


def read_result(spark: SparkSession, catalog_root: str, key: str) -> DataFrame:
    return spark.read.parquet(os.path.join(catalog_root, key))


def list_keys(catalog_root: str) -> list[str]:
    if not os.path.isdir(catalog_root):
        return []
    return sorted(
        d for d in os.listdir(catalog_root)
        if os.path.isdir(os.path.join(catalog_root, d))
    )


# ---- merge-on-read upsert (ROADMAP item: catalog upsert without a
# table-format dependency) -------------------------------------------------
#
# Each upsert lands as a new immutable version partition ``v=N`` under the
# key directory — writes never rewrite existing files (object-store safe,
# concurrent-reader safe). Readers resolve latest-version-per-merge-key at
# read time (merge-on-read); tombstone rows (__deleted=true) hide earlier
# versions. ``compact_result`` folds the version chain back into one base
# version. The same layout Delta/Iceberg formalize, reduced to plain
# partitioned parquet + a resolution window — swap in a real table format
# by replacing these four functions.

_DELETED = "__deleted"


def _versions(catalog_root: str, key: str) -> list[int]:
    d = os.path.join(catalog_root, key)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(name[2:]) for name in os.listdir(d)
        if name.startswith("v=") and name[2:].isdigit()
    )


def _committed_versions(catalog_root: str, key: str) -> list[int]:
    """Versions whose write COMMITTED: the mkdir claim makes ``v=N``
    visible before any parquet lands, so readers must gate on the
    ``_SUCCESS`` marker Spark writes at job commit — otherwise a
    concurrent reader can resolve a torn, partially-written latest
    version."""
    d = os.path.join(catalog_root, key)
    return [
        n for n in _versions(catalog_root, key)
        if os.path.exists(os.path.join(d, f"v={n}", "_SUCCESS"))
    ]


def upsert_result(
    catalog_root: str,
    key: str,
    df: DataFrame,
    *,
    delete: bool = False,
    max_retries: int = 16,
) -> int:
    """Write ``df`` as the next immutable version of ``key``. With
    ``delete=True`` the rows are tombstones: any earlier version of the
    same merge keys disappears from resolved reads. Returns the version
    number written.

    Concurrency: the version slot is CLAIMED with an atomic ``mkdir``
    before any data is written — two interleaved writers that both saw
    the same latest version race on the mkdir, the loser retries on the
    next slot, and both upserts land as distinct versions (the
    optimistic-commit protocol Delta/Iceberg implement with conditional
    metadata swaps, reduced to the POSIX primitive; an object-store
    deployment swaps the mkdir claim for a conditional put or a real
    table format — same four-function surface)."""
    from pyspark.sql import functions as F

    key_dir = os.path.join(catalog_root, key)
    os.makedirs(key_dir, exist_ok=True)
    out = df.withColumn(_DELETED, F.lit(bool(delete)))
    v = (_versions(catalog_root, key) or [0])[-1] + 1
    for _ in range(max_retries):
        path = os.path.join(key_dir, f"v={v}")
        try:
            os.mkdir(path)  # atomic claim of the version slot
        except FileExistsError:
            v += 1
            continue
        # append INTO the claimed (empty) directory: mode("overwrite")
        # would delete-and-recreate it, momentarily releasing the claim
        # so a racer could re-mkdir the same slot mid-write
        out.write.mode("append").parquet(path)
        return v
    raise RuntimeError(
        f"upsert_result: lost the version race {max_retries} times on "
        f"{key!r} — writer storm; back off or compact"
    )


def read_result_latest(
    spark: SparkSession,
    catalog_root: str,
    key: str,
    merge_keys: list[str],
    as_of_version: int | None = None,
) -> DataFrame:
    """Merge-on-read resolution: latest version per merge key, tombstones
    dropped. ``as_of_version`` gives snapshot reads (time travel): only
    versions <= N participate — partition pruning on the ``v`` directory
    column means later versions are never even opened."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    key_dir = os.path.join(catalog_root, key)
    committed = _committed_versions(catalog_root, key)
    if not committed:
        raise FileNotFoundError(
            f"read_result_latest: no committed versions under {key_dir!r}"
        )
    # enumerate only committed (_SUCCESS-marked) version dirs so a
    # claimed-but-still-writing version is never half-read (torn read)
    df = spark.read.option("basePath", key_dir).parquet(
        *[os.path.join(key_dir, f"v={n}") for n in committed]
    )
    if as_of_version is not None:
        df = df.where(F.col("v") <= as_of_version)
    w = Window.partitionBy(*merge_keys).orderBy(F.col("v").desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where((F.col("__rn") == 1) & ~F.col(_DELETED))
        .drop("__rn", "v", _DELETED)
    )


def compact_result(
    spark: SparkSession, catalog_root: str, key: str, merge_keys: list[str]
) -> int:
    """Fold the version chain into a single new base version holding the
    resolved rows, then drop the superseded version directories. Readers
    racing the swap still resolve correctly: the new base version wins
    every merge-key window by construction before the old dirs go."""
    import shutil

    # fold only COMMITTED versions; an uncommitted claim belongs to a
    # writer still in flight (or crashed debris) and is left alone —
    # readers already ignore it via the _SUCCESS gate
    old = _committed_versions(catalog_root, key)
    resolved = read_result_latest(spark, catalog_root, key, merge_keys)
    v = upsert_result(catalog_root, key, resolved)
    for n in old:
        shutil.rmtree(os.path.join(catalog_root, key, f"v={n}"))
    return v


def diff_versions(
    spark: SparkSession,
    catalog_root: str,
    key: str,
    merge_keys: list[str],
    v_old: int,
    v_new: int,
) -> DataFrame:
    """Snapshot DIFF between two catalog versions (the audit query a
    versioned table owes its consumers — what changed between the
    snapshot a model trained on and today's?): resolve both snapshots
    with the same merge-on-read rule, full-outer join on the merge
    keys, and classify every key as added / removed / changed /
    unchanged. Returns (merge_keys..., change) — value columns are
    compared via a hash of all non-key fields so the diff works for
    any schema.

    Scale shape: two snapshot reads (partition-pruned to v <= N), one
    full-outer join hashed on the merge keys; the classification is a
    pure projection. No driver-side row handling."""
    from pyspark.sql import functions as F

    old = read_result_latest(
        spark, catalog_root, key, merge_keys, as_of_version=v_old
    )
    new = read_result_latest(
        spark, catalog_root, key, merge_keys, as_of_version=v_new
    )

    # value-column set: sorted UNION of both snapshots' columns, so the
    # fingerprint is deterministic under column reordering and schema
    # evolution (a column present in only one snapshot reads as the
    # missing-sentinel on the other side -> correctly 'changed').
    # Each column is coalesced to a NUL sentinel BEFORE concat_ws:
    # concat_ws silently SKIPS null arguments, which would make
    # (NULL,'x') and ('x',NULL) hash identically.
    value_cols = sorted(
        (set(old.columns) | set(new.columns)) - set(merge_keys)
    )

    def fingerprint(df):
        def cell(c):
            v = F.col(c).cast("string") if c in df.columns else F.lit(None)
            return F.coalesce(v, F.lit("\x00"))

        return df.select(
            *merge_keys,
            F.md5(F.concat_ws("\x1f", *[cell(c) for c in value_cols])).alias(
                "__fp"
            ),
        )

    o = fingerprint(old).withColumnRenamed("__fp", "__fp_old")
    n = fingerprint(new).withColumnRenamed("__fp", "__fp_new")
    j = o.join(n, merge_keys, "full_outer")
    change = (
        F.when(F.col("__fp_old").isNull(), F.lit("added"))
        .when(F.col("__fp_new").isNull(), F.lit("removed"))
        .when(F.col("__fp_old") != F.col("__fp_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(*merge_keys, change.alias("change"))
