"""Shared helpers for oracle-checkable queries.

Key idea: double-precision SUMs are summation-order dependent, and Spark
sums per-partition in parallel while DuckDB sums vectorized-sequentially.
To make value-hashes match bit-for-bit, monetary/measure aggregates are
computed in DECIMAL (exact, order-independent) and cast back to DOUBLE at
the end. ``DECIMAL(12,2)`` keeps products within both engines' 38-digit
cap without precision-loss rescaling:
  (12,2)*(12,2) -> (25,4) [Spark] / (24,4) [DuckDB]; one more factor stays
  at or under precision 38, so no engine rescales and both stay exact.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(12,2)"


def dec(colname: str) -> Column:
    """Column cast to exact decimal for order-independent arithmetic."""
    return F.col(colname).cast(DEC)


def dsum(expr: Column, alias: str) -> Column:
    """Exact decimal SUM, surfaced as DOUBLE (deterministic any partitioning)."""
    return F.sum(expr).cast("double").alias(alias)


def dsum_col(colname: str, alias: str) -> Column:
    return dsum(dec(colname), alias)


def cnt(alias: str) -> Column:
    return F.count(F.lit(1)).alias(alias)


# Bounded persist bookkeeping lives in the layer-neutral _persist
# module (operators chain through it too); re-exported here for the
# query modules.
from variantcalling_spark._persist import managed_persist  # noqa: E402,F401


# SQL-side fragment builders (DuckDB dialect-compatible ANSI SQL).
def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def sql_dec(colname: str) -> str:
    return f"CAST({colname} AS DECIMAL(12,2))"
