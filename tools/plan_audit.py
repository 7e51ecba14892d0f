"""Plan auditor: materialize the physical plan of every (batch) registry
query and flag scale anti-patterns.

Flags raised:

* ``CARTESIAN``   — CartesianProduct / BroadcastNestedLoopJoin in the plan.
  Fine only when one side is provably tiny (crossJoin of scalar aggregates,
  deliberate small cross joins); every hit must be allowlisted with a reason.
* ``GLOBAL_WINDOW`` — a window with an empty partition spec (single-partition
  funnel).  Fine only on provably reduced inputs (vocab ranking, per-group
  daily series); allowlisted with a reason.
* ``ROW_UDF``     — row-at-a-time BatchEvalPython in the plan (Arrow-batched
  pandas UDFs do NOT trigger this).  Allowed only for the deliberate §2.9
  escape-hatch demo.
* ``BLIND_REPARTITION`` — source lint: a count-less ``repartition(col)``
  in engine code.  AQE re-picks the partition count from shuffle BYTES and
  will coalesce a small-but-CPU-heavy stream to one task (measured: the
  whole Jaccard posting join ran single-task until spread() pinned an
  explicit count).  Pass an explicit count (executors×cores) whenever the
  repartition feeds per-row-heavy compute.

Streaming queries are skipped (their plans only materialize at query start).

Usage:  python tools/plan_audit.py [name ...]
Exit code 1 if any non-allowlisted flag fires — usable as a CI gate.
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from projeto_de_etl_com_api_do_meta_spark.queries.registry import (  # noqa: E402
    QUERIES,
    _load_all,
)
from projeto_de_etl_com_api_do_meta_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_AUDIT_SF_DIR", "/root/testdata/sf0.001")

#: (query, flag) -> reason the pattern is acceptable THERE.
ALLOWLIST: dict[tuple[str, str], str] = {
    # ---- round 9b drift/series batch: scalar-aggregate broadcasts and
    # windows over reduced (distinct-value / bucket / daily-spine) tables ----
    ("ml_wasserstein_drift", "CARTESIAN"): "1-row (n_a, n_b) totals scalar broadcast onto the distinct-value ECDF table",
    ("agg_top_n_with_others", "GLOBAL_WINDOW"): "rank window over the brand-cardinality table (dozens of rows), never the fact table",
    ("warehouse_inventory_aging", "CARTESIAN"): "1-row (anchor date, total count) scalar broadcast onto orders",
    ("ml_cronbach_alpha", "CARTESIAN"): "1-row scalar attaches: (n_users,k) onto the 5-row item table and the two 1-row moment tables onto each other",
    ("ml_runs_test", "CARTESIAN"): "1-row (n_days, total) scalar broadcast onto the calendar-bounded daily table",
    ("ml_runs_test", "GLOBAL_WINDOW"): "lag over the calendar-bounded daily sign sequence (<= days in range)",
    ("events_page_trend_test", "CARTESIAN"): "1-row block-count scalar attach onto the 1-row L aggregate",
    ("events_page_trend_test", "GLOBAL_WINDOW"): "dense_rank over the k-treatment domain (5 event types)",
    ("eval_rbo_rankings", "CARTESIAN"): "1-row n_docs scalar attach + the 10-row depth-spine theta-join onto the <=10-row both-rankings table (broadcast, bounded by depth^2)",
    ("dedup_tf_cosine_pairs", "CARTESIAN"): "1-row n_docs scalar attach onto the shingle-df table for the fraction cap",
    ("corpus_misra_gries_sharded", "CARTESIAN"): "1-row merged deficit-bound scalar broadcast onto the <=shards*k candidate table",
    ("er_blocking_quality", "CARTESIAN"): "1-row scalar attaches: the three pair-count aggregates and n_docs joined into the single metrics row; also the n_docs attach for the fraction cap",
    ("agg_pareto_coverage", "GLOBAL_WINDOW"): "cumulative/rank windows over the brand-cardinality table (dozens of rows), never the fact table",
    ("ml_bland_altman", "CARTESIAN"): "1-row moment scalar broadcast onto the calendar-bounded daily table for the integer fence test, plus the 1-row outside-count attach",
    ("events_changepoint_binseg", "GLOBAL_WINDOW"): "cumulative-sum and argmax windows over the calendar-bounded daily spine (<= days in range)",
    ("ml_youden_j_threshold", "CARTESIAN"): "1-row (P, N) totals scalar broadcast onto the distinct-score ROC table",
    ("ml_youden_j_threshold", "GLOBAL_WINDOW"): "cumulative TP/FP and argmax windows over the DISTINCT-SCORE table (bounded by e6 score resolution — the ml_auc_roc_exact contract)",
    ("events_control_chart_xbar_r", "CARTESIAN"): "1-row grand-moment scalar broadcast onto the calendar-bounded daily subgroup table + the 1-row violation attach",
    ("ml_wasserstein_drift", "GLOBAL_WINDOW"): "cumulative ECDF window over the DISTINCT-VALUE table (bounded by cent resolution, the ml_auc_roc_exact contract)",
    ("agg_ddsketch_quantiles", "CARTESIAN"): "3-row quantile-target spine broadcast onto the sketch-bucket table (<=8*log2(max) buckets per group)",
    ("window_rolling_regression", "GLOBAL_WINDOW"): "rolling OLS windows over the calendar-bounded daily spine (the events_seasonal_decompose contract)",
    ("events_haar_wavelet_energy", "CARTESIAN"): "1-row calendar-origin scalar broadcast onto the <=32-row daily table",
    ("join_geo_grid_knn", "CARTESIAN"): "9-row grid-offset spine broadcast onto customers (the 3x3 neighborhood enumeration); the supplier match itself is a cell equi-join",
    ("join_geo_grid_knn_auto", "CARTESIAN"): "9-row grid-offset spine broadcast onto customers (the 3x3 neighborhood enumeration); the supplier match itself is a cell equi-join on density-scaled cells",
    ("ml_ransac_line_md5", "CARTESIAN"): "1-row point-count scalar + 64-row candidate spine broadcasts onto the calendar-bounded daily table",
    ("ml_ransac_line_md5", "GLOBAL_WINDOW"): "point indexing and top-5 model ranking over <=31-day / 64-candidate tables",
    ("layout_encoding_efficiency", "CARTESIAN"): "two 1-row aggregate scalars (colstats x runstats) cross joined",
    ("corpus_cooc_svd_embedding", "CARTESIAN"): "1-row bigram-total scalar + vocab-sized rescale scalars broadcast onto the vocab^2-bounded lift matrix",
    ("ml_quantile_regression_pinball", "CARTESIAN"): "41-row slope-grid spine broadcast onto the calendar-bounded daily table",
    ("ml_decision_stump_exact", "CARTESIAN"): "1-row (n, p) totals scalar broadcast onto the distinct-value threshold table",
    ("ml_decision_stump_exact", "GLOBAL_WINDOW"): "cumulative confusion cells + best-split ranking over the DISTINCT-VALUE table (bounded by cent resolution, the ml_auc_roc_exact contract)",
    ("dq_functional_dependency_profile", "CARTESIAN"): "12 x (1-row distinct-aggregate scalar x 1-row violation-count scalar) broadcasts",
    ("graph_rich_club_coefficient", "CARTESIAN"): "4-row k-threshold spine broadcast onto the vocabulary-scale degree table",
    ("events_sprt_sequential_test", "CARTESIAN"): "1-row first-crossing scalar attached to the 1-row last-day scalar",
    ("events_sprt_sequential_test", "GLOBAL_WINDOW"): "cumulative LLR walk over the calendar-bounded daily table",
    ("events_power_law_mle", "CARTESIAN"): "1-row user-total scalar broadcast onto the 1-row tail-sum aggregate",
    ("corpus_collocation_tscore", "CARTESIAN"): "1-row bigram-total scalar broadcast onto the vocab^2-bounded bigram table",
    ("warehouse_fx_triangulation_asof", "CARTESIAN"): "calendar-bounded rate-spine broadcast inequality join onto orders (fanout <= |published rates|, the join_range_binned contract)",
    ("ml_friedman_test", "CARTESIAN"): "1-row treatment-count and block-count scalar broadcasts onto day-grained cells",
    ("ml_kruskal_wallis", "CARTESIAN"): "1-row tie/total scalar broadcast onto the 5-row per-group rank-sum table",
    ("ml_kruskal_wallis", "GLOBAL_WINDOW"): "cumulative rank window over the DISTINCT-CENT-VALUE table (the ml_mann_whitney_u contract)",
    ("ml_anova_oneway_exact", "CARTESIAN"): "1-row grand-total scalar broadcast onto the 5-row group-moment table (twice: parts + output attach)",
    ("ml_effect_sizes_pairwise", "CARTESIAN"): "5-row group-moment self pair join (10 pairs, bounded by |event types|)",
    ("corpus_burrows_delta", "CARTESIAN"): "20-source x 20-word grid construction broadcasts (stot x topw) — sketch-sized by construction",
    # ---- round 8 stats/eval batch: every hit is a scalar-aggregate
    # broadcast, a calendar-bounded daily-spine window, or a small fixed
    # spine — never data-scale quadratic work ----
    ("ml_brier_decomposition", "CARTESIAN"): "scalar-aggregate broadcasts (1-row totals, 1-row decomposition parts) onto 10 bins",
    ("ml_kendall_tau_daily", "CARTESIAN"): "<=31-row daily-spine broadcast self-join (<=465 pairs) + 1-row n_days scalar",
    ("ml_spearman_rho_daily", "GLOBAL_WINDOW"): "rank windows over the <=31-row daily spine",
    ("ml_naive_bayes_lang", "CARTESIAN"): "5-row class table cross joined onto the vocabulary (linear in vocab, never quadratic) + vsize/n scalar broadcasts (1 row each)",
    ("events_autocorrelation_daily", "CARTESIAN"): "7-row lag spine x <=31-row integer-residual table + 1-row total scalar",
    ("events_autocorrelation_daily", "GLOBAL_WINDOW"): "row_number over the calendar-bounded daily spine",
    ("events_hazard_nelson_aalen", "CARTESIAN"): "spell-count scalar broadcast (1 row) onto the duration table (the events_survival_kaplan_meier contract)",
    ("events_hazard_nelson_aalen", "GLOBAL_WINDOW"): "cumulative hazard/variance windows over the calendar-bounded duration table",
    ("events_rate_ratio_test", "CARTESIAN"): "date-origin scalar broadcast (1 row)",
    ("events_cumulative_distinct_users", "GLOBAL_WINDOW"): "cumulative new-user sum over the calendar-bounded day spine",
    ("events_dau_wau_mau", "CARTESIAN"): "<=31-row day-spine broadcast inequality join; per-row fanout bounded by the 7/30-day window length",
    ("events_wilcoxon_signed_rank", "GLOBAL_WINDOW"): "rank windows over <=31 days / <=15 pairs",
    ("dq_chisquare_independence", "CARTESIAN"): "margin cross join bounded by |langs| x |sources| cells + corpus-total scalar (1 row)",
    ("corpus_tfidf_cosine_search", "CARTESIAN"): "corpus-stats scalar (1 row) + query-norm scalar (1 row) broadcasts; retrieval itself is a posting equi-join",
    ("retrieval_mrr_eval", "CARTESIAN"): "bounded 5-query vector broadcast (the ml_eval_ndcg contract)",
    ("retrieval_recall_at_k", "CARTESIAN"): "bounded 5-query vector broadcast (the ml_eval_ndcg contract)",
    ("ml_chi2_feature_selection", "CARTESIAN"): "1-row doc-totals scalar broadcast onto the vocabulary table",
    ("corpus_jsd_sources", "CARTESIAN"): "per-source totals (|sources| rows) cross joined onto the vocabulary — linear in vocab x sources, never document-scale",
    ("ml_pr_auc_exact", "CARTESIAN"): "1-row positives/negatives totals broadcast",
    ("ml_permutation_test_md5", "CARTESIAN"): "200 fixed replicate rows x 1-row observed-stats broadcast (scalar attach; bounded by the replicate constant, never data-scale)",
    ("ml_pr_auc_exact", "GLOBAL_WINDOW"): "cumulative tp/k over the DISTINCT-SCORE table (bounded by e6 quantization — the ml_auc_roc_exact contract)",
    ("warehouse_semi_additive_balance", "CARTESIAN"): "distinct-week spine broadcast (calendar-bounded) inequality join onto first-activity accounts; fanout <= |periods|",
    # ---- late-r7 registrations that post-dated the r7 audit run ----
    ("embed_silhouette_labels", "CARTESIAN"): "broadcast k-centroid distance cross join (k rows)",
    ("events_seasonal_decompose", "GLOBAL_WINDOW"): "centered-MA/seasonal windows over the calendar-bounded daily spine",
    ("events_seasonal_anomaly", "CARTESIAN"): "median/MAD scalar broadcasts (1 row each)",
    ("events_seasonal_anomaly", "GLOBAL_WINDOW"): "residual order statistics over the calendar-bounded daily spine",
    ("ml_eval_ndcg", "CARTESIAN"): "bounded 5-query vector broadcast",
    ("agg_hll_running_daily", "CARTESIAN"): "days-spine x <=64-cell daily register sketches inequality join — sketch-scale by construction, never data-scale",
    ("dq_constraint_suite", "CARTESIAN"): "scalar constraint totals broadcast (1-row aggregates) onto the report rows",
    ("retrieval_colbert_maxsim", "CARTESIAN"): "1-row query-matrix broadcast onto candidate docs",
    ("sample_pareto_frontier", "CARTESIAN"): "broadcast dominance close over local-frontier candidates — counted and guarded at 100k with the measured anti-chain curve (SCALE_PROBE_r08)",
    ("corpus_waterfill_budget", "CARTESIAN"): "token-budget scalar broadcast (1 row) onto the per-source table",
    ("corpus_waterfill_budget", "GLOBAL_WINDOW"): "water-level prefix sums over the ~20-source table",
    # ---- round 5/6 scalar-aggregate broadcasts (1-row or bounded-row
    # crossJoins — the global-total pattern) and bounded-table windows ----
    ("dq_benford_digit_profile", "CARTESIAN"): "digit-total scalar broadcast (1 row) onto 9 digit groups",
    ("text_kneser_ney_bigram", "CARTESIAN"): "bigram-type-count scalar broadcast (1 row)",
    ("retrieval_rrf_hybrid", "CARTESIAN"): "corpus-stats scalar + 1-row query-vector broadcasts; both retriever arms depth-bounded to 20 before any join",
    ("sample_doremi_reweight", "CARTESIAN"): "corpus-total and softmax-normalizer scalar broadcasts (1 row each) onto the ~20-domain table",
    ("pipeline_rag_funnel", "CARTESIAN"): "chunk-stats scalar + 1-row query-vector broadcasts; fusion work O(depth)",
    ("sample_neyman_allocation", "CARTESIAN"): "weight-total and leftover-seat scalar broadcasts (1 row each) onto the ~20-stratum table",
    ("sample_neyman_allocation", "GLOBAL_WINDOW"): "largest-remainder seat ranking over the ~20-stratum table",
    ("corpus_keyness_loglikelihood", "CARTESIAN"): "token-total scalar broadcast (1 row) onto the vocabulary table",
    ("agg_gini_inequality", "CARTESIAN"): "min-balance shift scalar broadcast (1 row)",
    ("events_survival_kaplan_meier", "CARTESIAN"): "spell-count scalar broadcast (1 row) onto the duration table",
    ("events_survival_kaplan_meier", "GLOBAL_WINDOW"): "risk-set/survival windows over the calendar-bounded duration table",
    ("ml_calibration_reliability", "CARTESIAN"): "bin-mass total scalar broadcast (1 row) onto 10 bins",
    ("corpus_word_burstiness", "CARTESIAN"): "doc-count scalar broadcast (1 row) onto the vocabulary table",
    ("agg_kmv_running_daily", "CARTESIAN"): "days x per-day-sketch (k rows each) inequality join — sketch-scale by construction, never data-scale",
    ("ml_auc_roc_exact", "GLOBAL_WINDOW"): "cumulative ranks over the DISTINCT-SCORE table (bounded by 1e-6 score resolution)",
    ("corpus_heaps_law_curve", "CARTESIAN"): "max-doc-id and Heaps-beta scalar broadcasts (1 row each)",
    ("corpus_heaps_law_curve", "GLOBAL_WINDOW"): "cumulative token/type sums over the 10-row decile table",
    ("events_dow_hour_profile", "CARTESIAN"): "traffic-total scalar broadcast (1 row) onto <=168 cells",
    ("agg_mom_waterfall", "GLOBAL_WINDOW"): "LAG over the calendar-bounded months table",
    ("events_slo_error_budget_burn", "GLOBAL_WINDOW"): "7-day rolling window over the calendar-bounded days table",
    ("sample_balanced_downsample", "CARTESIAN"): "min-class-count scalar broadcast (1 row)",
    ("corpus_source_concentration", "CARTESIAN"): "corpus-total scalar broadcast (1 row) onto the per-source table",
    ("corpus_bm25_search", "CARTESIAN"): "corpus-stats scalar broadcast (1 row; N, avgdl)",
    ("sample_dsir_importance", "CARTESIAN"): "feature-total scalar broadcasts (1 row) onto the hashed-bucket table",
    ("sample_dsir_gumbel", "CARTESIAN"): "feature-total scalar broadcasts (1 row) onto the hashed-bucket table",
    ("dq_key_skew_report", "CARTESIAN"): "table-total scalar broadcast (1 row) onto the hot-key report",
    ("text_ccnet_perplexity_buckets", "CARTESIAN"): "corpus-tercile threshold scalar broadcast (1 row)",
    ("ml_psi_drift_report", "CARTESIAN"): "half-totals scalar broadcast (1 row) onto 10 bins",
    ("ml_ks_two_sample_exact", "CARTESIAN"): "group-size scalar broadcast (1 row) onto the distinct-value table",
    ("ml_ks_two_sample_exact", "GLOBAL_WINDOW"): "cumulative ECDF counts over the bounded distinct-value (cents) table",
    ("corpus_lang_source_mi", "CARTESIAN"): "corpus-total scalar broadcast (1 row) onto the lang x source grid",
    ("ml_gains_lift_table", "CARTESIAN"): "population-totals scalar broadcast (1 row) onto 10 deciles",
    ("ml_gains_lift_table", "GLOBAL_WINDOW"): "exact NTILE contract (scale-audit-only tag; percentile_approx threshold twin is the scale path) + cumulative sums over 10 decile rows",
    ("join_cross_small", "CARTESIAN"): "deliberate 5x5x5 dim cross join (J3)",
    ("train_rendezvous_sharding", "CARTESIAN"): "broadcast 9-row shard spine (HRW candidate expand; map-only)",
    ("join_theta_ineq", "CARTESIAN"): "deliberate pure theta-join demo (J5); bounded filtered sides — join_range_binned is the scale path",
    ("q11_important_parts", "CARTESIAN"): "TPC-H q11 global value-threshold scalar broadcast (1 row)",
    ("q22_dormant_customers", "CARTESIAN"): "TPC-H q22 avg-acctbal scalar broadcast (1 row)",
    ("events_rfm_segments", "CARTESIAN"): "scalar quartile-threshold row broadcast (exact-NTILE contract; approx twin exists)",
    ("fn_python_udtf_lateral", "ROW_UDF"): "SQL UDTF lateral demo (§2.9)",
    ("fn_scalar_udfs", "ROW_UDF"): "deliberate F.udf vs pandas_udf demo (§2.9)",
    # ---- round 9 robust-stats / graph / clustering batch ----
    ("ml_mann_whitney_u", "GLOBAL_WINDOW"): "cumulative ranks over the DISTINCT-VALUE table (bounded by cent resolution — the ml_auc_roc_exact contract)",
    ("ml_theil_sen_daily", "CARTESIAN"): "calendar-bounded daily-spine broadcast self-join (O(days^2) pairs) + 1-row n_days scalar",
    ("ml_theil_sen_daily", "GLOBAL_WINDOW"): "slope order statistics over the day-bounded pair table (O(days^2) rows, never data-scale)",
    ("agg_quantile_sketch_md5", "CARTESIAN"): "3-row chosen-bin broadcast, 3-row median broadcast, and 1-row full-count scalar — the two-phase selection's refine joins",
    ("graph_hits_bipartite", "CARTESIAN"): "1-row max-score scalar broadcast per normalization half-step",
    ("embed_dbscan_cosine", "CARTESIAN"): "scalar-threshold crossJoin inside the shared near-dup generator (the dedup_embedding_cosine contract); IVF/LSH candidates swap in at scale",
    ("graph_modularity_components", "CARTESIAN"): "1-row total-edge-count scalar broadcast onto the per-community rows",
    ("ml_bh_fdr_permutation", "GLOBAL_WINDOW"): "BH step-up rank/max windows over the m = |event types| test family (5 rows)",
    ("events_burst_detection", "CARTESIAN"): "1-row global-total scalar broadcast onto the per-(day,type) cost table",
    ("embed_knn_bruteforce", "CARTESIAN"): "exact-oracle baseline by contract; scale paths are the ANN queries",
    ("train_hard_negatives", "CARTESIAN"): "bounded 20-anchor broadcast over the corpus (same contract as embed_knn_bruteforce); ANN shortlist swaps in at scale",
    ("embed_matryoshka_recall", "CARTESIAN"): "two bounded 10-anchor broadcasts (full-dim and truncated rankings being compared)",
    ("embed_knn_classify", "CARTESIAN"): "vote layer over the brute-force baseline (same contract); ANN shortlist swaps in at scale",
    ("graph_triangle_count", "CARTESIAN"): "three 1x1 scalar-aggregate crossjoins in the summary row",
    ("corpus_token_budget", "CARTESIAN"): "corpus-total scalar broadcast (1 row)",
    ("corpus_temperature_mixture", "CARTESIAN"): "total-weight scalar broadcast (1 row) onto the per-source rate table",
    ("web_host_quality_filter", "CARTESIAN"): "corpus keep-rate scalar broadcast (1 row) onto the 7-row host table",
    ("basket_association_rules", "CARTESIAN"): "order-total scalar broadcast (1 row)",
    ("corpus_token_budget", "GLOBAL_WINDOW"): "cumulative share over the (source x lang) grid — input pre-reduced to ~|sources|*|langs| rows",
    ("dedup_embedding_cosine", "CARTESIAN"): "scalar-threshold crossJoin of two single-row aggregates",
    ("embed_pair_sim_histogram", "CARTESIAN"): "deliberately quadratic on a bounded sample (vec_id < 1000) by calibration contract; production pairs come from the IVF/LSH candidate path",
    ("embed_ann_int8", "CARTESIAN"): "broadcast 10-query shortlist re-rank",
    ("embed_ann_srp", "CARTESIAN"): "broadcast 10-query shortlist re-rank",
    ("embed_ann_pq", "CARTESIAN"): "broadcast 10-query shortlist re-rank",
    ("embed_ann_lsh", "CARTESIAN"): "broadcast 10-query bucket probe",
    ("embed_ann_ivf", "CARTESIAN"): "broadcast centroid assignment (k=8 rows)",
    ("embed_ann_srp_md5", "CARTESIAN"): "broadcast 10-query integer-dot shortlist (oracle twin of embed_ann_srp)",
    ("embed_ann_ivf_md5", "CARTESIAN"): "broadcast centroid assignment (k=8 rows; oracle twin of embed_ann_ivf)",
    ("text_tfidf_top_terms", "CARTESIAN"): "scalar n_docs aggregate broadcast (1 row; replaced the driver count() action)",
    ("train_shuffle_epochs", "CARTESIAN"): "2-row epoch spine broadcast",
    ("embed_quantize_int8", "CARTESIAN"): "scalar scale broadcast",
    ("embed_power_iteration", "CARTESIAN"): "scalar rescale-factor broadcast (1 row)",
    ("agg_histogram_equiwidth", "CARTESIAN"): "scalar min/max bounds broadcast",
    ("agg_histogram_equidepth_approx", "CARTESIAN"): "decile threshold array broadcast (1 row)",
    ("ml_gains_lift_table_approx", "CARTESIAN"): "decile-threshold vector + population-totals scalar broadcasts (1 row each)",
    ("ml_gains_lift_table_approx", "GLOBAL_WINDOW"): "cumulative gains over the 10-row decile table (value-bucketed; no row-scale sort)",
    ("agg_gini_inequality_approx", "CARTESIAN"): "min-balance shift scalar broadcast (1 row)",
    ("dedup_embedding_ivf_md5", "CARTESIAN"): "broadcast centroid assignment (k=8 rows; shared _ivf_md5_scores build)",
    ("embed_pca_whitening_fp", "CARTESIAN"): "N-count / rescale-divisor scalar broadcasts (1 row each) onto dim-bounded tables",
    ("events_rfm_segments_approx", "CARTESIAN"): "quartile threshold row broadcast",
    ("text_quality_filter_quantile", "CARTESIAN"): "scalar percentile threshold broadcast",
    ("text_decontaminate_ngram", "CARTESIAN"): "broadcast eval-split gram set",
    ("ml_target_encode_status", "CARTESIAN"): "global prior scalar broadcast (1 row)",
    ("dq_expectations_summary", "CARTESIAN"): "per-check scalar count pairs (1x1 rows)",
    ("events_interpolate_linear", "CARTESIAN"): "date-bounds scalar broadcast (1 row)",
    ("events_gap_fill_daily", "CARTESIAN"): "date-bounds scalar + 5-type spine",
    ("events_rolling_active_users", "CARTESIAN"): "30-row day spine broadcast range join",
    ("corpus_pmi_bigrams", "CARTESIAN"): "scalar corpus-total broadcast",
    ("text_unigram_surprisal", "CARTESIAN"): "scalar corpus-total broadcast (1 row)",
    ("text_bigram_perplexity", "CARTESIAN"): "scalar |V| aggregate broadcast (1 row)",
    ("corpus_heavy_hitters", "CARTESIAN"): "bounded Misra-Gries candidate set broadcast",
    ("sql_interface_demo", "CARTESIAN"): "scalar subquery in demo SQL",
    ("events_funnel_stages", "CARTESIAN"): "per-user stage minima are scalar-joined",
    ("window_rolling_median", "GLOBAL_WINDOW"): "input pre-reduced to |types|x|days| rows",
    ("window_range_frame_7d", "GLOBAL_WINDOW"): "input pre-reduced to the daily series (calendar-bounded rows)",
    ("window_distribution_funcs", "GLOBAL_WINDOW"): "cume_dist/percent_rank over a total order by W1 contract; approx-quantile twin pattern documented in SCALE.md",
    ("events_daily_anomaly", "GLOBAL_WINDOW"): "input pre-reduced to daily series",
    ("dedup_ngram_jaccard_capped", "CARTESIAN"): "scalar df-cap broadcast (1-row greatest(floor, frac*N) aggregate)",
    ("dedup_lsh_recall_eval", "CARTESIAN"): "three 1x1 scalar-count crossjoins building the summary row (truth join is the audit path by contract)",
    ("embed_ann_recall_eval", "CARTESIAN"): "exact top-5 side is the bounded 10-anchor brute-force baseline being evaluated (same contract as embed_knn_bruteforce)",
    ("train_negative_sampling", "CARTESIAN"): "scalar |items| broadcast (1 row) feeding the per-user candidate expression",
    ("train_negative_sampling", "GLOBAL_WINDOW"): "dense index over the item VOCABULARY (bounded ~1e2 here; swap for global_dense_ids at vocab scale)",
    ("corpus_inverted_index", "GLOBAL_WINDOW"): "vocabulary-bounded df ranking",
    ("events_rfm_segments", "GLOBAL_WINDOW"): "exact NTILE contract at user grain (approx twin exists)",
    ("agg_histogram_equidepth", "GLOBAL_WINDOW"): "exact equi-depth contract (approx twin exists)",
    ("ids_global_dense", "GLOBAL_WINDOW"): "partition-count prefix-sum only (rows never funnel)",
    ("corpus_vocab_coverage", "GLOBAL_WINDOW"): "rank + running sum over the vocabulary-bounded frequency table",
    ("corpus_vocab_coverage", "CARTESIAN"): "3-row candidate-vocab-size spine broadcast (theta join on rk <= size)",
    ("sample_topk_per_stratum", "GLOBAL_WINDOW"): "partitioned by lang stratum",
    ("sort_limit_topn", "GLOBAL_WINDOW"): "global top-N by contract (TakeOrdered, not full sort)",
    # ---- round 10 session-2 stats/warehouse batch (adjudicated r11):
    # every CARTESIAN is a 1-row scalar-aggregate broadcast, a bounded
    # dimension/spine grid, or a calendar-bounded daily pair join; every
    # GLOBAL_WINDOW runs over a distinct-value / distinct-duration /
    # day-pair spine, never raw fact rows ----
    ("ml_brown_forsythe", "CARTESIAN"): "1-row global (n_tot, k, sum_r, sum_q) scalar broadcast onto the k-row group-moment table",
    ("ml_mood_median_test", "CARTESIAN"): "1-row 2*grand-median scalar broadcast onto the fact table for the above/below split + the 1-row (n_tot, a_tot) attach onto k groups",
    ("ml_mood_median_test", "GLOBAL_WINDOW"): "cumulative counts over the DISTINCT-CENT-VALUE spine locating the middle order statistics (the ml_auc_roc_exact contract)",
    ("ml_jonckheere_trend", "CARTESIAN"): "k x |buckets| dominance grid build (broadcast distinct-value spine onto k groups; shared _dominance_tables) + 1-row totals scalar attach",
    ("ml_cliffs_delta", "CARTESIAN"): "k x |buckets| dominance grid build (shared _dominance_tables spine)",
    ("ml_krippendorff_alpha", "CARTESIAN"): "1-row pooled category-square scalar attached to the 1-row observed-disagreement aggregate",
    ("agg_ams_f2_sketch", "CARTESIAN"): "1-row median-of-means sketch readout attached to the 1-row exact-F2 aggregate",
    ("warehouse_bridge_allocation", "CARTESIAN"): "two 1-row scalar attaches (orders grand total + allocation total) carrying the rounding-residual audit column",
    ("ml_anderson_darling_2samp", "CARTESIAN"): "1-row (n1, n2, N) totals scalar broadcast onto the distinct-value spine + two 1-row summary attaches",
    ("ml_anderson_darling_2samp", "GLOBAL_WINDOW"): "cumulative M_j/B_j counts over the pooled DISTINCT-VALUE spine (the ml_auc_roc_exact contract)",
    ("retrieval_err_eval", "CARTESIAN"): "bounded 5-query vector broadcast (the ml_eval_ndcg contract)",
    ("ml_ljung_box", "CARTESIAN"): "7-row lag spine broadcast onto the calendar-bounded daily residual table (the events_autocorrelation_daily contract)",
    ("ml_kendall_w", "CARTESIAN"): "1-row rater-count scalar broadcast onto the daily row-sum table + two 1-row attaches in the summary row",
    ("warehouse_factless_coverage", "CARTESIAN"): "dimension grid build: |months| spine x broadcast 25-row nation dim — dimension-sized regardless of fact volume",
    ("ml_tukey_hsd", "CARTESIAN"): "k-row group-moment self pair join (k(k-1)/2 pairs, bounded by |event types|) + 1-row (n_tot, k, ssw) scalar attach",
    ("ml_passing_bablok", "CARTESIAN"): "calendar-bounded daily-spine pair join (~435 slope pairs at 30 days; the ml_theil_sen_daily contract)",
    ("ml_passing_bablok", "GLOBAL_WINDOW"): "median selection over the day-pair slope table (O(days^2) rows, never data-scale)",
    ("ml_distribution_distances", "CARTESIAN"): "1-row (n1, n2) totals scalar broadcast onto the 50-unit-bucket histogram",
    ("ml_distance_correlation", "CARTESIAN"): "30 x 30 daily-spine distance grid (spine-bounded at any event volume) + row/col-mean and grand-mean broadcasts",
    ("ml_regression_diagnostics", "CARTESIAN"): "1-row OLS moment scalar broadcast onto the calendar-bounded daily table + 1-row SSE attach",
    ("ml_logrank_test", "CARTESIAN"): "1-row cohort-totals scalar broadcast onto the distinct-duration table",
    ("ml_logrank_test", "GLOBAL_WINDOW"): "at-risk cumulative windows over the DISTINCT-DURATION spine (calendar-bounded; the events_survival_kaplan_meier contract)",
    ("ml_mood_scale_test", "GLOBAL_WINDOW"): "tie-block cumulative counts over the DISTINCT-CENT-VALUE spine (the ml_auc_roc_exact contract)",
    ("ml_siegel_repeated_medians", "CARTESIAN"): "calendar-bounded daily-spine pair join (O(days^2) slopes; the ml_theil_sen_daily contract)",
    ("ml_siegel_repeated_medians", "GLOBAL_WINDOW"): "outer median selection over the <=|days|-row inner-median table",
    ("ml_mcc_confusion_battery", "CARTESIAN"): "1-row 2*grand-median scalar broadcast onto the fact table for the threshold split",
    ("ml_mcc_confusion_battery", "GLOBAL_WINDOW"): "cumulative counts over the DISTINCT-CENT-VALUE spine locating the middle order statistics (the ml_auc_roc_exact contract)",
    ("agg_lorenz_curve_deciles", "CARTESIAN"): "10-row decile-target spine broadcast theta-join locating each rank's straddling block on the distinct-cent-value cumulative table",
    ("agg_lorenz_curve_deciles", "GLOBAL_WINDOW"): "cumulative count/value sums over the DISTINCT-CENT-VALUE spine (the ml_auc_roc_exact contract)",
    # ---- r11 batch (adjudicated at registration): scalar-aggregate
    # broadcasts, the shared dominance grid, the 4-row Hurst window spine,
    # and spine/daily windows — never raw-row funnels ----
    ("ml_goodman_kruskal_gamma", "CARTESIAN"): "k x |buckets| dominance grid build (shared _dominance_tables) + three 1-row totals scalar attaches",
    ("ml_durbin_watson", "CARTESIAN"): "1-row OLS moment scalar broadcast onto the calendar-bounded daily table",
    ("ml_durbin_watson", "GLOBAL_WINDOW"): "lag over the calendar-bounded daily residual spine",
    ("ml_chow_test", "CARTESIAN"): "1-row midpoint-cut scalar broadcast onto days + 1-row pooled-SSE attach onto the 2-segment row",
    ("ml_cramer_von_mises", "CARTESIAN"): "1-row (n1, n2) totals scalar broadcast onto the distinct-value spine + 1-row sum attach",
    ("ml_cramer_von_mises", "GLOBAL_WINDOW"): "cumulative ECDF counts over the DISTINCT-CENT-VALUE spine (the ml_auc_roc_exact contract)",
    ("ml_hurst_rs", "CARTESIAN"): "4-row window-size spine broadcast onto the calendar-bounded daily table + 1-row log-log fit attach",
    ("ml_hurst_rs", "GLOBAL_WINDOW"): "day indexing over the calendar-bounded daily spine (block windows themselves are PARTITIONED by (w, block))",
    ("ml_mahalanobis_outliers", "CARTESIAN"): "1-row moment scalar broadcast onto the calendar-bounded daily table",
    ("retrieval_map_eval", "CARTESIAN"): "bounded 5-query vector broadcast (the ml_eval_ndcg contract)",
    ("retrieval_lm_dirichlet", "CARTESIAN"): "1-row collection-total scalar broadcast onto the term-filtered postings (the corpus_bm25_search contract)",
    ("ml_theil_u_uncertainty", "CARTESIAN"): "1-row corpus-total scalar broadcast onto the |langs| x |sources| grid + three 1-row entropy attaches",
    ("agg_theil_index", "CARTESIAN"): "1-row (n, s) totals scalar broadcast onto the distinct-cent value spine + 1-row term-sum attach",
    ("ml_cohen_kappa_weighted", "CARTESIAN"): "5x5 rater-margin grid cross join (bounded by the category count) + two 1-row scalar attaches",
    ("ml_granger_causality", "GLOBAL_WINDOW"): "lag over the calendar-bounded daily spine",
    ("events_transfer_entropy", "GLOBAL_WINDOW"): "two chained lags over the calendar-bounded daily up/down state spine",
    ("retrieval_prf_expansion", "CARTESIAN"): "corpus-stats scalar broadcast (1 row; N, avgdl) onto query-term postings and the feedback-term table (the corpus_bm25_search contract)",
    ("events_shapley_attribution", "CARTESIAN"): "coalition algebra on the 2^4 = 16-row literal subset spine: the mask-containment and S+i joins are non-equi by construction and bounded by the channel count, never by data",
    ("ml_qini_uplift", "GLOBAL_WINDOW"): "cumulative window over the DISTINCT per-user click-count value spine (bounded by max clicks per user), not over users — the quantize-then-spine contract (ml_auc_roc_exact)",
    ("ml_empirical_bayes_ctr", "CARTESIAN"): "two scalar attaches: the 1-row prior (k, m, v) broadcast onto the 25-row campaign spine, and the g1-left-join-r moment pass over the same spine",
    ("graph_hits_hubs", "CARTESIAN"): "per-round L1-normalization scalar (1-row SUM) broadcast onto the score vector — the graph_pagerank_purchases iterate shape with a normalize step",
    ("ml_pacf_durbin_levinson", "CARTESIAN"): "calendar-day spine work: 1-row moment/denominator scalars attached to the <=31-row daily series and the 5-row lag spine",
    ("ml_pacf_durbin_levinson", "GLOBAL_WINDOW"): "row_number over the calendar-bounded daily spine (<=31 rows after the daily pre-aggregate)",
    ("events_hidden_periodicity", "CARTESIAN"): "1-row total-moment scalar and the 9-row period spine attached to the calendar-bounded daily series",
    ("events_hidden_periodicity", "GLOBAL_WINDOW"): "row_number over the calendar-bounded daily spine (<=31 rows after the daily pre-aggregate)",
    ("agg_count_min_sketch", "CARTESIAN"): "the d=4 literal hash-row spine fanned onto the event stream (map-combinable) and the 10-probe x 4-row probe spine",
    ("agg_hyperloglog_exact", "CARTESIAN"): "1-row true-distinct scalar attached to the 1-row 64-register readout",
    ("events_recurrence_quantification", "CARTESIAN"): "1-row eps/n scalar broadcast onto the calendar-bounded day-pair spine (<=31x31)",
    ("ml_xicor_correlation", "GLOBAL_WINDOW"): "rank/lag windows over the calendar-bounded daily spine (<=31 rows after the daily pre-aggregate)",
    ("ml_tail_dependence", "CARTESIAN"): "1-row threshold/n scalars broadcast onto the user-grain aggregate for the four conditional counts",
    ("ml_tail_dependence", "GLOBAL_WINDOW"): "cumulative counts over the distinct-VALUE spines (engagement counts + whole-currency revenue buckets) — the quantize-then-spine order-statistic idiom (ml_auc_roc_exact)",
    ("events_allan_variance", "CARTESIAN"): "the 5-row tau literal spine fanned onto the calendar-bounded daily series",
    ("events_allan_variance", "GLOBAL_WINDOW"): "row_number over the calendar-bounded daily spine; block lags are PARTITIONED by tau",
    ("ml_survival_cindex", "CARTESIAN"): "cell-grid pair join: (day-grain time x event x score-count) cells multiply counts — bounded by calendar x score cardinality, never by user volume; plus the 1-row max-date scalar",
    ("events_matrix_profile", "CARTESIAN"): "window-pair spine over the calendar-bounded daily series (<=26x26 non-equi pairs) plus 1-row min/max scalar attaches",
    ("events_matrix_profile", "GLOBAL_WINDOW"): "row_number over the calendar-bounded daily spine (<=31 rows after the daily pre-aggregate)",
    ("corpus_good_turing", "CARTESIAN"): "two 1-row scalar attaches (token totals + the N_1 row) onto the bounded frequency-of-frequencies spine",
}


import re as _re


def _has_global_window(plan: str) -> bool:
    """True iff some Window node is fed (directly in the tree) by an
    Exchange whose Arguments include SinglePartition — i.e. an
    unpartitioned window funneling all rows through one task."""
    lines = plan.splitlines()
    tree = [ln for ln in lines if _re.search(r"\(\d+\)$", ln.rstrip())]
    single_ids = set()
    for i, ln in enumerate(lines):
        m = _re.match(r"\((\d+)\) Exchange", ln.strip())
        if m and i + 2 < len(lines):
            block = "\n".join(lines[i : i + 3])
            if "SinglePartition" in block:
                single_ids.add(m.group(1))
    for i, ln in enumerate(tree):
        if "Window (" in ln:
            # a Sort sits between Window and its Exchange; look 2 nodes down
            for nxt in tree[i + 1 : i + 3]:
                m = _re.search(r"Exchange \((\d+)\)", nxt)
                if m and m.group(1) in single_ids:
                    return True
    return False


_REPARTITION_RE = _re.compile(r"\.repartition\(\s*(?:F\.col|[\"'])")


def lint_blind_repartitions() -> int:
    """Source lint: flag count-less .repartition(col) in engine code (AQE
    byte-based coalescing serializes CPU-bound per-row work; see spread())."""
    pkg = os.path.join(_REPO_ROOT, "projeto_de_etl_com_api_do_meta_spark")
    bad = 0
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            path = os.path.join(root, f)
            for i, line in enumerate(open(path), 1):
                if _REPARTITION_RE.search(line):
                    print(
                        f"FLAG {os.path.relpath(path, _REPO_ROOT)}:{i} "
                        f"[BLIND_REPARTITION] {line.strip()}"
                    )
                    bad += 1
    return bad


def audit(names: list[str] | None = None) -> int:
    _load_all()
    spark = get_spark(app_name="plan-audit", master="local[4]", shuffle_partitions=4)
    targets = names or [
        n for n, s in QUERIES.items() if "streaming" not in s.tags and not n.startswith("stream_")
    ]
    bad = 0
    for name in targets:
        spec = QUERIES[name]
        try:
            df = spec.fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            bad += 1
            continue
        flags = []
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            flags.append("CARTESIAN")
        if _has_global_window(plan):
            flags.append("GLOBAL_WINDOW")
        if "BatchEvalPython" in plan:
            flags.append("ROW_UDF")
        verdicts = []
        for f in flags:
            why = ALLOWLIST.get((name, f))
            if why:
                verdicts.append(f"{f}:ok({why})")
            else:
                verdicts.append(f"{f}:FLAG")
                bad += 1
        print(f"{'FLAG' if any(v.endswith('FLAG') for v in verdicts) else 'ok  '} "
              f"{name}" + (f"  [{'; '.join(verdicts)}]" if verdicts else ""))
    spark.catalog.clearCache()
    bad += lint_blind_repartitions()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(audit(sys.argv[1:] or None))
