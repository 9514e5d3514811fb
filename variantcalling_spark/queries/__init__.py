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
    # Round 5 front-of-budget (~50 checked/round): new r5 queries first,
    # then re-certify stale greens oldest-first, so no green row ages
    # past ~2 rounds (round-2's silent regression shipped exactly
    # because stale rows went unchecked). The full local sweep
    # (tools/check_correctness) covers ALL queries each round
    # regardless of the driver budget.
    # ROUND 6 ROTATION NOTE: after the r5 driver run the oldest rows
    # will be the round-4 block (q110-q133) — lead round 6 with those.
    # --- New in round 5 ---
    "q134_auto_bucketed_interval_join",
    "q135_cdc_chunk_dedup",
    "q136_curriculum_phases",
    "q137_leakage_safe_split",
    "q138_weighted_sample",
    "q139_containment_pairs",
    "q140_perplexity_cutpoint_buckets",
    "q141_vocab_oov",
    "q142_zoom_reduction",
    "q143_gc_bias_curve",
    "q144_knn_pagerank",
    "q145_contained_doc_pruning",
    "q146_adaptive_knn_graph",
    "q147_bpe_encode",
    "q148_sample_qc",
    "q149_king_kinship",
    "q150_soft_dedup_weights",
    "q151_label_propagation",
    "q152_community_modularity",
    "q153_hwe_exact_chi2",
    "q154_distinct_ngram_diversity",
    "q155_site_frequency_spectrum",
    "q156_gap_interpolation",
    "q157_minimizer_sketch",
    "q158_label_centroid_similarity",
    "q159_duplication_profile",
    "q160_source_vocab_overlap",
    "q161_ingest_distribution_drift",
    "q162_media_content_dedup",
    "q163_weighted_quantiles",
    "q164_audio_content_dedup",
    "q165_groupwise_ols_trend",
    "q166_chi2_independence",
    "q167_exact_auc",
    "q168_vocab_entropy",
    "q169_incremental_aggregates",
    "q170_spearman_correlation",
    "q171_ks_two_sample",
    "q172_token_gini",
    "q173_graph_triangles",
    "q174_mutual_knn_pairs",
    "q175_mutual_nn_clusters",
    "q176_ingest_novelty",
    "q177_zipf_hapax",
    "q178_dispersion_index",
    "q179_sessionization_stats",
    "q180_edit_distance_neardup",
    "q181_flagstat",
    "q182_bigram_lm_score",
    "q183_mad_robust",
    "q184_trimmed_mean",
    "q185_kmer_spectrum",
    "q186_personalized_pagerank",
    "q187_target_coverage_metrics",
    "q188_mark_duplicates",
    "q189_n50_stats",
    "q190_quantile_normalization",
    "q191_pmi_collocations",
    "q192_cohort_retention",
    "q193_funnel_conversion",
    "q194_association_rules",
    "q195_pareto_concentration",
    "q196_skyline_2d",
    "q197_cusum_changepoint",
    "q198_ld_r2_pairs",
    "q199_ld_prune",
    "q200_gwas_prep_funnel",
    "q201_split_integrity_audit",
    "q202_switch_error_rate",
    "q203_cohens_kappa",
    "q204_blocking_quality",
    "q205_brier_reliability",
    "q206_kaplan_meier",
    "q207_mash_distance",
    "q208_wilson_intervals",
    "q209_emerging_terms",
    "q210_idf_weighted_containment",
    "q211_roh_segments",
    "q212_decile_lift",
    # --- Oldest greens: round-2 vintage (r4 re-checked q52/q65 only) ---
    "q66_minhash_lsh",
    "q67_simhash",
    "q64_exact_dedup",
    "q98_dedup_clusters",
    "q76_sequence_packing",
    "q75_decontamination",
    "q63_rolling_fingerprint",
    "q72_bpe_tokens",
    "q60_token_stats",
    "q61_quality_score",
    "q62_lang_id_confusion",
    "q78_repetition_ratio",
    "q97_unigram_lm_score",
    "q70_multimodal_features",
    "q93_frame_sampling",
    "q94_deterministic_shuffle",
    "q13_hmer_stat_matrix",
    "q14_contingency_multinomial",
    "q23_annotate_back_join",
    "q24_dynamic_map_lookup",
    "q25_stratified_sample",
    "q26_inverse_cdf_sample",
    "q27_truth_classify",
    "q28_phred_codec",
    "q29_flow_rle",
    "q49_titv_ratio",
    "q54_imputation_pl_rescale",
    "q59_haploid_pl",
    "q87_sv_stats_matrix",
    "q95_collapse_multiallelic",
    "q100_hardy_weinberg",
    "q101_mendel_violation_rate",
    # --- Round-3-green, never driver-checked since ---
    "q74_embedding_neardup_lsh",
    "q99_data_curation_funnel",
    "q104_concordance_window_rescue",
    "q105_depth_runs",
    "q106_pileup_calls",
    # --- Hot paths touched in round 5 (re-certify even though r4-green) ---
    "q52_gvcf_compress",
    "q65_ngram_jaccard",
    "q112_embedding_neardup_lsh_wide",
    "q121_pq_ann",
    "q122_incremental_dedup",
    "q129_adaptive_neardup",
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
