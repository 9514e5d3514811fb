"""Catalog of the driver-supplied parquet tables.

Mirrors the reference's keyed result store (HDF5 keys -> named tables,
``ugvc/pipelines/evaluate_concordance.py:82-87``): here every named table
is a parquet directory read through ``spark.read.parquet`` — columnar,
predicate-pushdown, partition-prunable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any scale factor (TPC-H
# region/nation are fixed-size; supplier/part/customer grow with SF but
# stay dimension-sided relative to lineitem).
BROADCASTABLE = {"region", "nation"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's TimestampType
        # (microsecond) cannot hold losslessly. Read it as int64 nanoseconds
        # (exact; matches DuckDB's epoch_ns(ts)) and expose it as `ts_ns`.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path).withColumnRenamed("ts", "ts_ns")
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
