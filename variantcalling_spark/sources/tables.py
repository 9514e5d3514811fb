"""Catalog of the driver-supplied parquet tables.

Mirrors the reference's keyed result store (HDF5 keys -> named tables,
``ugvc/pipelines/evaluate_concordance.py:82-87``): here every named table
is a parquet directory read through ``spark.read.parquet`` — columnar,
predicate-pushdown, partition-prunable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
        # events.ts arrives as either parquet TIMESTAMP(NANOS) (read as
        # int64 via nanosAsLong — Spark's TimestampType can't hold nanos
        # losslessly) or TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ /
        # TIMESTAMP depending on session conf). Normalize every shape to
        # an exact int64 epoch-nanoseconds `ts_ns` column, matching
        # DuckDB's epoch_ns(ts) on the naive timestamp.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            return df.withColumnRenamed("ts", "ts_ns")
        if ts_type == "timestamp_ntz":
            # pure field arithmetic — independent of the session timezone
            ns = F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ) * 1000
        else:  # timestamp: stored micros are the naive parquet value
            ns = F.expr("unix_micros(ts)") * 1000
        return df.select(
            *[
                ns.cast("long").alias("ts_ns") if c == "ts" else F.col(c)
                for c in df.columns
            ]
        )
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for the SQL API surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
