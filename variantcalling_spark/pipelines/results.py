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
