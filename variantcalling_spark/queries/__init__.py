"""Query registry: every implemented operator exposed as a named query.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable plus (where the
semantics are SQL-expressible) an equivalent ANSI-SQL oracle string that
DuckDB runs on the same parquet tables. The driver executes both sides at
sf=0.01 and compares row-count + schema + order-insensitive value-hash.

Conventions (required for hash equality):
- Alias every computed column identically on both sides.
- Money/double aggregates go through ``DECIMAL(18,2)`` (exact, summation-
  order-independent) and are cast back to DOUBLE — see ``dsum`` helpers —
  so Spark's partition-parallel sum and DuckDB's vectorized sum produce
  bit-identical doubles.
- Ratios/averages are ``round(x, N)`` on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

# Modules that register queries on import.
_MODULES = (
    "relational",
    "intervals",
    "windows",
    "genomics",
    "dedup",
    "text",
    "similarity",
    "multimodal",
    "streaming_batch",
    "pipelines_q",
    "advanced",
)


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    doc: str = field(default="")


_REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``.

    ``oracle`` is the DuckDB-runnable SQL equivalent; ``None`` marks a
    genuinely non-SQL-expressible operator (driver does rows-only check).
    """

    def deco(fn):
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def _load_all() -> None:
    for mod in _MODULES:
        importlib.import_module(f"variantcalling_spark.queries.{mod}")


def all_queries() -> dict[str, Query]:
    _load_all()
    return dict(_REGISTRY)


def query_callables() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
