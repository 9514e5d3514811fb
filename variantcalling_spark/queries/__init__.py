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
    # Driver budget is ~50 rows/round; the full local sweep
    # (tools/check_correctness.py) covers ALL queries every round, so this
    # order only decides WHICH rows the driver re-certifies.
    # ROUND 12 ordering (r11 verdict ask #10 - keep the certification
    # cadence, pay the oldest debt first):
    #   1. q484-q502 (rest of r9), q503-q518 (r10), q519-q532 (r11) -
    #      the last never-driver-checked block, 49 queries, exactly the
    #      ~50-row budget (the r11 driver run certified q434-q483; after
    #      this round every registered query has a driver CORRECTNESS
    #      row at least once: 530/530);
    #   2. q434-q483 (certified r11), then everything else in registry
    #      (module) order - all of it has a green row from r1-r11 and
    #      stays covered by the local sweep every round.
    # --- Never-driver-checked block: r9 tail + r10 + r11 registrations ---
    "q484_nnd_recall_harness",
    "q485_rendezvous_sharding",
    "q486_winnowing_fingerprints",
    "q487_t_closeness",
    "q488_heaps_law_fit",
    "q489_bleu_smoothing_variants",
    "q490_semantic_decontamination",
    "q491_louvain_local_move",
    "q492_dp_noisy_histogram",
    "q493_winnowing_ingest_dedup",
    "q494_weighted_jaccard",
    "q495_lsh_s_curve_validation",
    "q496_nnd_clustered_recall",
    "q497_lsh_band_planner",
    "q498_winnowing_containment",
    "q499_salted_skew_join",
    "q500_community_connectivity_audit",
    "q501_dedup_method_matrix",
    "q502_incremental_knn_graph",
    "q503_dp_cluster_release",
    "q504_planner_recall_harness",
    "q505_leiden_refinement",
    "q506_leiden_aggregate_level",
    "q507_partition_agreement_ari",
    "q508_chrf_score",
    "q509_rank_biased_overlap",
    "q510_friedman_test",
    "q511_consensus_coassociation",
    "q512_gumbel_topk_sampling",
    "q513_wasserstein_1d",
    "q514_planner_driven_neardup",
    "q515_chao1_richness",
    "q516_token_burstiness",
    "q517_consensus_ari",
    "q518_matthews_correlation",
    # (add NEW round-12+ queries HERE so they certify while young)
    "q519_leiden_multilevel",
    "q520_planned_minhash_neardup",
    "q521_bpe_train_loop",
    "q522_betweenness_centrality",
    "q523_randomized_response",
    "q524_holt_winters",
    "q525_domain_mixture_weights",
    "q526_repeated_sequences",
    "q527_isotonic_calibration",
    "q528_knn_shapley_valuation",
    "q529_kneser_ney_bigram",
    "q530_reciprocal_rank_fusion",
    "q531_leiden_planted_hierarchy",
    "q532_sharded_knn_shapley",
    # --- Certified r11 (q434-q483) ---
    "q434_hosmer_lemeshow",
    "q435_chow_test",
    "q436_jonckheere_terpstra",
    "q437_granger_lite",
    "q438_krippendorff_alpha",
    "q439_signature_fit",
    "q440_pacf_durbin_levinson",
    "q441_top_eigenvector",
    "q442_codon_adaptation_index",
    "q443_raking_ipf",
    "q444_capture_recapture",
    "q445_fightin_words",
    "q446_weibull_fit",
    "q447_heavy_changers",
    "q448_eb_shrinkage",
    "q449_runs_test",
    "q450_sprt_sequential",
    "q451_minhash_error_curve",
    "q452_lead_lag_xcorr",
    "q453_competing_risks",
    "q454_size_factors",
    "q455_markov_entropy_rate",
    "q456_day_gap_audit",
    "q457_srm_gate",
    "q458_mad_outlier_gate",
    "q459_allele_balance",
    "q460_cpg_islands",
    "q461_kmer_error_valley",
    "q462_price_elasticity",
    "q463_dedup_threshold_sensitivity",
    "q464_abc_classification",
    "q465_join_skew_audit",
    "q466_hubness_audit",
    "q467_rich_club",
    "q468_readability",
    "q469_mutual_proximity_knn",
    "q470_hubness_correction_audit",
    "q471_srm_stream",
    "q472_heavy_changers_stream",
    "q473_bootstrap_rouge_ci",
    "q474_mp_recall_harness",
    "q475_isotropy_correction",
    "q476_dup_cluster_canonicalization",
    "q477_clustering_coefficient",
    "q478_pq_recall_harness",
    "q479_ece_calibration",
    "q480_embedding_mmd",
    "q481_ivf_pq_rerank",
    "q482_semantic_ingest_dedup",
    "q483_nn_descent_graph",
    # --- Certified r10 (q384-q433) + r9 (q284-q383), tail of the list ---
    "q284_attribution_last_touch",
    "q285_cochran_armitage",
    "q286_nelson_aalen",
    "q287_seasonal_profile",
    "q288_sprt_ledger",
    "q289_kfold_balance_audit",
    "q290_quantile_normalization",
    "q291_callable_loci",
    "q292_bradley_terry",
    "q293_mann_whitney",
    "q294_lof_outliers",
    "q295_theil_sen",
    "q296_mcnemar",
    "q297_adamic_adar",
    "q298_acf",
    "q299_jsd_source_drift",
    "q300_temperature_mixture",
    "q301_kendall_tau",
    "q302_holt_linear",
    "q303_kmv_source_overlap",
    "q304_mmr_rerank",
    "q305_position_attribution",
    "q306_em_gaussian",
    "q307_dtw_distance",
    "q308_facility_location",
    "q309_welch_ttest",
    "q310_mann_kendall",
    "q311_degree_assortativity",
    "q312_fastq_roundtrip",
    "q313_event_paths",
    "q314_rfm_segmentation",
    "q315_viterbi_segments",
    "q316_best_split",
    "q317_standardized_rates",
    "q318_exponential_gof",
    "q319_hmm_posterior",
    "q320_jl_projection",
    "q321_topic_coherence",
    "q322_lsh_planner",
    "q373_training_set_consistency",
    "q374_multiband_ann",
    "q375_ann_recall_multiband",
    "q376_baum_welch_converged",
    "q377_motif_chains",
    "q378_corpus_bleu",
    "q379_rouge_l",
    "q380_pii_scan",
    "q381_cox_score_test",
    "q382_page_hinkley",
    "q383_cmh_test",
    # --- Certified r8 (q234-q283) ---
    "q234_adapter_scan",
    "q235_embedding_isotropy",
    "q236_transmission_phasing",
    "q237_prs_score",
    "q238_tajimas_d",
    "q239_fst_hudson",
    "q240_ld_decay",
    "q241_umi_correction",
    "q242_hll_set_algebra",
    "q243_ctfidf_topics",
    "q244_bh_fdr",
    "q245_logrank_test",
    "q246_poisson_bootstrap",
    "q247_sw_local_alignment",
    "q248_good_turing",
    "q249_heaps_law",
    "q250_str_catalog",
    "q251_knn_classification",
    "q252_scd2_dimension",
    "q253_dbscan",
    "q254_community_conductance",
    "q255_bfs_distances",
    "q256_temporal_lookup",
    "q257_bloom_filter",
    "q258_rrf_hybrid_retrieval",
    "q259_silhouette",
    "q260_benford_digit_test",
    "q261_n50_stats",
    "q262_markov_transitions",
    "q263_kmv_distinct",
    "q264_kcore_peeling",
    "q265_cuped_adjustment",
    "q266_gopher_quality_flags",
    "q267_ewma_smoothing",
    "q268_liftover",
    "q269_fellegi_sunter",
    "q270_sorted_neighborhood",
    "q271_max_interval_overlap",
    "q272_winsorized_means",
    "q273_event_funnel",
    "q274_retention_cohorts",
    "q275_wgs_uniformity_metrics",
    "q276_depth_normalization",
    "q277_anova_f",
    "q279_label_noise_matrix",
    "q280_dup_ngram_fraction",
    "q281_inverted_index",
    "q282_skipgram_cooccurrence",
    "q283_cusum_changepoint",
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
