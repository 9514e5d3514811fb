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

# Driver-facing ordering. The correctness driver walks ``queries()`` in
# insertion order with a bounded per-round budget (~50 queries in round 1),
# so the registry is re-ordered to lead with queries that have no
# CORRECTNESS row yet (round 1 consumed its budget on the relational /
# intervals / windows / genomics families, all green). Names listed here
# come first, in this order; everything else follows in module
# registration order. Keep newly added queries in this list so they get
# oracle rows while they are young.
_PRIORITY = (
    # Round 3 front-of-budget: the driver checks ~50 queries per round.
    # Never driver-checked (round-2 budget cut off exactly before them).
    "q83_stream_stream_join",
    "q84_streaming_dedup",
    # New this round.
    "q102_image_decode_features",
    "q103_audio_features",
    "q104_concordance_window_rescue",
    "q105_depth_runs",
    "q106_pileup_calls",
    "q107_joint_genotyping_matrix",
    "q108_semantic_dedup",
    "q109_pii_scrub",
    # Upgraded from no_oracle to full value oracles this round.
    "q77_greedy_packing",
    "q89_ml_filter_score",
    "q71_ivf_ann",
    # Events-table family: round-2 errs / stale round-1 greens behind the
    # fixed tables.py import — prove the fix with fresh rows.
    "q86_coverage_summary",
    "q48_cumulative_coverage",
    "q12_numeric_histogram",
    "q30_point_in_interval",
    "q31_interval_semi_join",
    "q32_interval_anti_join",
    "q34_bucketed_range_join",
    "q36_asof_join",
    "q96_interval_map_agg",
    "q38_closest_interval",
    "q40_pr_curve",
    "q41_running_extent_dedup",
    "q42_interval_merge",
    "q43_every_nth",
    "q44_histogram_percentiles",
    "q45_hierarchical_rollup",
    "q46_score_direction",
    "q50_phred_math",
    "q53_overlap_cleanup",
    "q80_tumbling_window",
    "q81_sliding_window",
    "q82_session_window",
    # Arrow-vectorized this round — re-verify bit parity.
    "q74_embedding_neardup_lsh",
    "q69_lsh_ann",
    "q68_cosine_topk",
    "q73_embedding_neardup",
    "q99_data_curation_funnel",
    # Flagship re-confirmation.
    "q88_hit_fraction",
    "q85_evaluate_concordance",
    "q90_denovo_refinement",
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
    ordered: dict[str, Query] = {}
    for name in _PRIORITY:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, q in _REGISTRY.items():
        if name not in ordered:
            ordered[name] = q
    return ordered


def query_callables() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
