"""Partitioning-invariance sweep: float-bearing queries must produce
BIT-IDENTICAL results under different shuffle partition counts.

COVERAGE.md claims "float exactness is partitioning-invariant, not tuned
to one size". test_determinism.py pins that for dec_sum and k-means;
this sweep pins it for a representative slice of every float-emitting
family added since — closed-form stats, shared-text formulas, ratio
outputs, percentile interpolation. A query whose doubles depend on
accumulation order would differ between 5 and 32 partitions.
"""

from __future__ import annotations

import pytest

from big_data_streaming_spark.workload import QUERIES

SWEEP = [
    "q_ols_by_group",       # decimal-routed sufficient statistics
    "q_wilson_rank",        # shared-text sqrt formula
    "q_chi2",               # quantized term sum
    "q_auc",                # global-rank integer sums
    "q_robust_scaler",      # percentile interpolation + broadcast apply
    "q_target_encoding",    # LOO decimal sums
    "q_simpson_diversity",  # exact-integer ratios
    "q_gini_sources",       # rank-product window
    "q_ohlc_bars",          # min_by/max_by selection + decimal volume
    "q_bigram_lm",          # exact-ratio probabilities, global top-k
    "q_minhash_audit",      # estimator tolerance boolean + exact jaccard
    "q_entity_resolution",  # CC labels + window count under repartition
    "q_profile_columns",    # decimal sum + exact NDV per column
    "q_twap",               # cents×µs integer products, DECIMAL(38,0) sum
    "q_realized_vol",       # quantized squared-return sums
    # round-3 float-bearing additions
    "q_bollinger",          # integer rolling sums + sqrt shared formula
    "q_rsi",                # integer gain/loss sums + ratio finish
    "q_lag_corr",           # DECIMAL(38,0) sufficient stats, Pearson finish
    "q_s_core",             # adaptive mean threshold + localCheckpoint loop
    "q_seasonal_decompose", # 25·tq−Σwindow exact-integer detrending
    "q_maxsim",             # quantized chunk dots, max/sum over integers
    "q_bigram_score",       # MIN over per-row divisions, coverage ratio
    # round-3 second wave
    "q_embed_cov",          # quantized scatter sums, fixed-order cov finish
    "q_pca_power",          # driver-side IEEE iteration on collected sums
    "q_hellinger_drift",    # quantized cross-type reduce, sqrt finish
    "q_assoc_rules",        # integer-count ratios, lift-ordered limit
    "q_table_checksum",     # order-insensitive modular sum + XOR digests
    "q_fd_audit",           # count-distinct rollup, exact ratio
    "q_rrf_fusion",         # integer ranks, two-term reciprocal sum
    "q_calibration",        # NTILE total order + quantized mean logit
    "q_outlier_maha",       # quantized 2-D moments, closed-form inverse
    "q_schema_evolution",   # mergeSchema NULL-fill counts
    "q_attribution_multi",  # quantized 1/n credits, order-free rollup
    "q_dataset_card",       # exact ratios + quantized mean logit
    "q_rate_smoothing",     # pseudo-count ratios, deterministic top-k
    "q_mmr_rerank",         # integer dots, shared MMR score text
    # round-4 additions
    "q_lorenz_deciles",     # decimal revenue sums + global ntile
    "q_slice_finder",       # shared Wilson text over a grouping-sets lattice
    "q_rr_privacy",         # dyadic estimator on exact integer sums
    "q_tail_concentration", # decimal-routed tail cut, total-order rank
    "q_cramers_v",          # quantized chi2 + sqrt finish
    "q_forecast_eval",      # integer |error| sums, single divisions
    "q_heavy_hitters",      # MG bound boolean must hold at ANY partitioning
    "q_graph_reciprocity",  # integer-valued mean threshold + ratio
    "q_zonemap_advisor",    # global row_number blocks, integer prune counts
    "q_selfjoin_estimator", # Σc² integer rollup + uniform-estimate division
    "q_label_spread",       # majority vote with total-order tie-break
    "q_rendezvous_shards",  # per-row argmax, partition-free by construction
    "q_centroid_shift",     # quantized per-dim sums + re-quantized reduce
    "q_graph_assortativity",  # integer degree sufficient statistics
    "q_float32_audit",      # order-free MAX error reduce
    "q_qq_plot",            # element-selection deciles, total-order ranks
    "q_poisson_bootstrap",  # hash weights + decimal replicate means
    "q_welch_t",            # quantized moments, shared sqrt finish
    "q_diff_in_diff",       # decimal cell means, fixed subtraction order
    "q_lsh_advisor",        # squaring-chain powers on exact ratios
    "q_changepoint",        # integer prefix-sum argmax
    "q_ndcg",               # literal integer discounts, one-division finish
    "q_precision_at_k",     # quantized precision rationals, order-free AP
    "q_spearman",           # integer rank Σd², shared closed-form finish
    "q_cohen_kappa",        # integer sufficient stats, one-division kappa
    "q_link_predict",       # quantized 1/deg sums, TakeOrdered top-100
    "q_dsir_weights",       # quantized bucket ratios, order-free doc sums
    "q_holt",               # integer fixed-point recursion on daily series
    "q_markov_attribution", # integer chain solve on collected counts
    "q_ppr",                # decimal-routed mass sums, seed teleport
    "q_hits",               # decimal-routed vector/norm sums per step
    "q_kcenter_select",     # quantized integer distances, argmax picks
    "q_f1_threshold",       # exact counts, zero-guarded shared F1 text
    "q_trimmed_mean",       # element-selection cuts + decimal mean
    "q_ab_power",           # shared literal-z formula on exact counts
    "q_quantile_sketch_audit",  # bound booleans must hold at ANY split
    "q_linkage_em",         # integer EM on collected pattern counts
    "q_conformal_interval", # element-selected residual quantile
    "q_km_survival",        # integer product recursion on risk table
    "q_lift_curve",         # exact counts, fixed-order division chain
    "q_propensity_strata",  # quantized stratum terms, order-free sum
    "q_cvm_test",           # integer rank sums, shared-text finish
    "q_kruskal_wallis",     # floor-divided integer terms, order-free
    "q_anova_f",            # exact cents sufficient statistics
    "q_mcnemar",            # integer cells, one division
    "q_cochran_q",          # integer sufficient stats, one division
    "q_hhi",                # integer sum-of-squares, fixed-order ratio
    "q_fano",               # integer moments, shared sqrt finish
    "q_durbin_watson",      # integer lag diffs, one division
    "q_runs_test",          # element-selected median, shared-z text
    "q_kendall_tau",        # integer concordance, shared-sqrt tau-b
    "q_mann_kendall",       # integer S + tie variance, shared CASE z
    "q_friedman",           # doubled block ranks, shared chi2 text
    "q_levene_bf",          # element-selected medians, integer W parts
    "q_hapax",              # integer spectrum counts, shared sqrt
    "q_brier",              # exact integer 4n^3-scaled Brier
    "q_ccf",                # integer lag moments, shared-sqrt r
    "q_jackknife",          # quantized replicates, integer variance
    "q_perm_test",          # md5 permutations, exact cents means
    "q_silhouette",         # quantized centroid distances, order-free
    "q_medoid",             # quantized pair distances, order-free
    "q_mad_outliers",       # element-selected median/MAD, pinned order
    "q_evt_gumbel",         # integer moments, shared literals
    "q_smd_balance",        # integer arm moments, shared-text SMD
    "q_isotonic",           # integer cumsums, minimax over intervals
    "q_gini_gain",          # integer impurities, quantized child sums
    "q_qini",               # integer cumsums, fixed-order scaling
    "q_bland_altman",       # integer moments, shared literal LoA
    "q_recency_score",      # dyadic integer weights
    "q_cuped",              # integer pre/post moments, fixed finish
    "q_srm",                # integer GOF identity
    "q_collocations",       # integer lift ratio, pinned order
    "q_markov_stationary",  # integer fixed-point power iteration
    "q_morisita",           # all-integer cross-multiplied identity
    "q_yule_q",             # integer cells, fixed divisions
    "q_lag_features",       # cents rolling mean, epoch gaps
    "q_watermark_advisor",  # integer lateness, element quantiles
    "q_merge_audit",        # integer state flags
    "q_funnel_time",        # integer gaps, element quartiles
    "q_rolling_corr",       # integer frame moments, shared-sqrt r
    "q_hod_anova",          # integer count identity
    "q_iqr_outliers",       # doubled-cents exact fences
    "q_missingness",        # integer null cells
    "q_rbo",                # dyadic depth terms, order-free
    "q_energy_test",        # sorted-identity integer T sums
    "q_jonckheere",         # doubled pooled-pair ranks
    "q_logrank",            # quantized risk-table terms
    "q_partial_corr",       # integer moments, shared formula
    "q_granger_lite",       # shared-text double polynomials
    "q_variance_ratio",     # integer block moments
    "q_pacf",               # integer lag products, unrolled DL
    "q_rfm_migration",      # integer transition counts
    "q_abc_analysis",       # exact micro cumsums, integer cuts
    "q_cohort_revenue",     # decimal-routed revenue
    "q_ship_delay",         # element-selected delay quantiles
    "q_neyman",             # quantized weights, fixed allocations
    "q_mde_curve",          # shared literal z constants
    "q_hash_uniformity",    # integer GOF identity
    "q_daily_bands",        # element-selected per-day quantiles
    "q_boot_diff",          # decimal replicate means, pinned ranks
    "q_jl_audit",           # shared literal planes, 9dp absolution
    "q_token_burst",        # integer counts, one division
    "q_record_days",        # integer harmonic sum
    "q_ljung_box",          # integer lag products, one expression
    "q_keyness",            # shared double chi2 on integer cells
    "q_source_jaccard",     # integer set sizes, one division
    "q_holt_winters",       # dyadic fixed-point ring recursion
    "q_jarque_bera",        # quantized fourth-power moments
    "q_page_hinkley",       # pre-quantized cumulative trace
    "q_sen_slope",          # element-selected pairwise slopes
    "q_capture_recapture",  # integer capture counts, shared text
    "q_chao1",              # integer spectrum, one division
    "q_simpsons_check",     # integer cross-product directions
    "q_churn_baseline",     # element-selected threshold, exact CM
    "q_bloom_advisor",      # shared literal factors, exact counts
    "q_order_seasonality",  # decimal revenue, exact shares
    "q_reorder_gap",        # element-selected gap quantiles
    "q_yoy_growth",         # decimal yearly sums, fixed division
    "q_return_rates",       # integer cross-product ranking
    "q_price_dispersion",   # cents moments, shared-double CV
    "q_supplier_scorecard", # decimal roll-up, pinned top-10
    "q_discount_corr",      # integer moments, shared-double r
    "q_priority_drift",     # all-integer TV terms
    "q_mau_retention",      # integer retention counts
    "q_balance_segments",   # quantized chi2 terms, order-free
    "q_cross_source_dups",  # integer fingerprint-group counts
    "q_dead_stock",         # anti-join counts, pinned order
    "q_type_rollup",        # decimal rollup, exact shares
    "q_daypart_interaction",  # integer cells, fixed odds ratios
    "q_temporal_integrity",   # integer day gaps, one division
    "q_monthly_swing",        # decimal ledger, pinned swings
    "q_geo_grid",           # decimal balance rollup per cell
    "q_eoq_advisor",        # decimal demand + sqrt-only chain
    "q_kelly",              # pre-quantized integer micro diffs
    "q_shapley",            # integer x12 weights, one division
    "q_doc_selfrep",        # integer shingle counts, one division
    "q_wasserstein_drift",  # integer CDF cross-products, one division
    "q_burstiness",         # integer gap moments, shared sqrt chain
    "q_tcloseness",         # integer TV cross-products, one division
    "q_median_polish",      # element-selected medians, fixed chain
    "q_control_chart",      # quantized daily means + moving ranges
    "q_process_capability", # integer day moments, shared sqrt chain
    "q_dedup_bias",         # integer share cross-products
    "q_period_detect",      # cleared-denominator integer fold R2
    "q_knee_point",         # integer cross-product argmax
    "q_markov_eval",        # integer transition counts, one division
    "q_queueing_advisor",   # integer rates, shared division chain
    "q_var_es",             # element-selected VaR, integer tail mean
    "q_var_backtest",       # integer breaches, shared sqrt z
    "q_twfe",               # twice-quantized cross products
    "q_group_sequential",   # rounded z, literal OBF boundary
    "q_price_elasticity",   # integer band means, fixed arc chain
    "q_anomaly_consensus",  # element-selected fences, integer votes
    "q_market_beta",        # twice-quantized moments
    "q_seasonal_strength",  # /7-cleared detrend, re-quantized resid
    "q_mv_advisor",         # integer cardinalities, one division
    "q_error_budget",       # integer budget burn
    "q_pareto_thresholds",  # division-cleared crossing ranks
    "q_retention_curve",    # exact distinct counts, one division
    "q_stickiness",         # bounded range-join distinct counts
    "q_dau_overlap",        # integer set algebra, one division
    "q_crosstab_residuals", # integer cells, shared sqrt chain
    "q_new_vs_returning",   # exact distinct splits, one division
    "q_basket_size_dist",   # integer histogram, ordered cum window
    # round-6 additions
    "q_sequence_match",     # integer match counts, one division
    "q_mood_median",        # element-selected median, shared residuals
    "q_mase",               # integer error sums, single divisions
    "q_grubbs",             # BIGINT deviation argmax, shared sqrt chain
    "q_yule_k",             # integer frequency spectrum, one division
    "q_fleiss_kappa",       # integer agreement stats, shared kappa chain
    "q_tokenizer_fertility",  # integer sufficient stats, fixed divisions
    "q_char_class_profile", # regexp-delta integer counts, one division
    "q_context_plan",       # ceil-division integers, one division
    "q_geo_hotspots",       # integer cell masses, fixed ratio text
    "q_ansari_bradley",     # folded integer ranks, shared CASE expectation
    "q_hodges_lehmann",     # element-selected Walsh median, one division
    "q_embed_outliers",     # quantized L1 BIGINT, partitioned top-3
    "q_stopword_profile",   # integer counts + bounded argmax
    "q_length_outliers",    # integer deviation argmax, shared-z report
    "q_quality_curve",      # shared-logit threshold counts
    "q_gini_revenue",       # BIGINT rank-weighted sum, shared division
    "q_day_checksums",      # order-insensitive modular digests
    "q_percent_rank",       # range-partitioned rank, one division
    "q_first_last_touch",   # struct min_by/max_by selection, one division
    "q_token_position_bias",  # ppm-quantized positions, BIGINT sums
    "q_bigram_redundancy",  # exact distinct counts, one division
    "q_top_value_share",    # bounded argmax, one division
    "q_max_concurrency",    # range-partitioned running sum, integer argmax
    "q_wilcoxon_signed_rank",  # range-partitioned |d| ranks, shared z
    "q_quantile_shift",     # element-selected per-group decile cuts
    "q_revenue_bridge",     # denominator-cleared BIGINT effects
    "q_activation_week",    # exact integer day splits, one division
    "q_source_tv_matrix",   # denominator-cleared BIGINT TV sums
    "q_atkinson_index",     # pre-quantized reciprocals, shared chain
    "q_graph_conductance",  # integer cut/volume counts, one division
    "q_weighted_jaccard_days",  # integer min/max sums, one division
    "q_new_items_share",    # integer day MINs, exact cents
    "q_weekend_uplift",     # integer counts, cleared cross ratio
    "q_hhi_by_nation",      # integer sum-of-squares, one division
    "q_stream_user_ewma",   # batch_key-ordered integer fold, dyadic div
    "q_dup_cluster_purity", # integer cluster counts, one division
    "q_oov_rate",           # deterministic vocab cut, integer counts
    "q_embed_stride_distances",  # quantized squared L2, integer sums
    "q_cr4_by_nation",      # partitioned rank, integer dollar sums
    "q_sentence_stats",     # integer segment counts, single divisions
    "q_multi_supplier_share",  # distinct-edge integers, single divisions
    # round-7 additions (float-bearing)
    "q_cliff_delta",        # doubled-midrank integers, shared delta text
    "q_kuiper_drift",       # exact CDF ratios, MAX over differences
    "q_dwell_stats",        # element-selected gap percentiles, pinned order
    "q_user_type_affinity", # exact-integer lift, TakeOrdered top-20
    "q_share_shift_movers", # decimal shares, partitioned lag, TakeOrdered
    "q_cold_start_suppliers",  # integer cohorts, single share division
    "q_embed_bit_profile",  # exact sign counts, one ratio
    "q_embed_class_scatter",   # denominator-cleared BIGINT scatter
    "q_vocab_growth_by_source",  # exact TTR ratio
    "q_audio_clip_detect",  # kernel counts, clip_share division
    "q_kmv_distinct",       # bottom-k of shared hash, deterministic est
    "q_quota_apportion",    # pure integer apportionment
    "q_lpa_communities",    # pinned-tie synchronous label propagation
    "q_stream_gap_alert",   # arrival-order-independent batch keys
    "q_kmv_setops",         # shared-hash bottom-k union + exact audits
    "q_ransac",             # integer cleared-denominator inlier counts
    "q_dbscan_grid",        # integer density grid + canonical star CC
]


def _rows(spark, name, sf, partitions):
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = QUERIES[name](spark, sf)
        return sorted(map(repr, df.collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


@pytest.mark.parametrize("name", SWEEP)
def test_partitioning_invariant(spark, sf_small, name):
    a = _rows(spark, name, sf_small, 5)
    b = _rows(spark, name, sf_small, 32)
    assert a == b, f"{name}: results depend on shuffle partition count"
