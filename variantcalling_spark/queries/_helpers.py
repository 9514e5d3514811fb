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


# Bounded persist bookkeeping: query functions persist shared
# intermediates but return LAZY DataFrames, so they can never unpersist
# themselves (the caller's action materializes the cache). A long-lived
# session running the full registry would accumulate one cached
# relation per persist site; this ring keeps at most _PERSIST_CAP of
# them alive, unpersisting the oldest (non-blocking) once the cap is
# hit. The cap comfortably exceeds any single bench/correctness phase,
# so warm-run cache reuse within a phase is unaffected.
_PERSIST_CAP = 48
_persist_ring: "deque" = None  # type: ignore[assignment]


def managed_persist(df):
    """``df.persist()`` with session-lifetime bounded accumulation.
    Chains as ``df.transform(managed_persist)``."""
    from collections import deque

    global _persist_ring
    if _persist_ring is None:
        _persist_ring = deque()
    df = df.persist()
    _persist_ring.append(df)
    while len(_persist_ring) > _PERSIST_CAP:
        try:
            _persist_ring.popleft().unpersist(blocking=False)
        except Exception:
            pass  # session already stopped; nothing to release
    return df


# SQL-side fragment builders (DuckDB dialect-compatible ANSI SQL).
def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def sql_dec(colname: str) -> str:
    return f"CAST({colname} AS DECIMAL(12,2))"
