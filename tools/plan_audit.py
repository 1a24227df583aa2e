#!/usr/bin/env python
"""Plan audit: dump `explain("formatted")` for every headline query
plus the scale-critical §2.11 operators into PLANS.md, with a short
automated checklist per plan (pushdown, broadcast, no cartesian, no
single-partition window).

Regenerate after plan-affecting changes:
    python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (  # noqa: E402
    HEADLINE_QUERIES,
    QUERIES,
)
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.session import (  # noqa: E402
    get_spark,
)

EXTRA = [
    "similarity_ann_lsh",
    "similarity_pq_topk",
    "dedup_cluster_components",
    "dedup_boilerplate_shingles",
    "dedup_repeated_substrings",
    "quality_heuristic_filter",
    "quality_bigram_lm_ppl",
    "corpus_decontamination",
    "corpus_mixing_sample",
    "corpus_curation_funnel",
    "events_gap_fill_ffill",
    "events_anomaly_zscore",
    "join_asof_last_purchase",
    "similarity_knn_graph",
    "embedding_label_centroids",
    "dedup_latest_per_key",
    "cdc_snapshot_diff",
    # r3 retrieval/ranking surface
    "retrieval_bm25_topk",
    "retrieval_build_inverted_index",
    "retrieval_hybrid_rrf",
    "graph_pagerank_orders",
    # r4 additions
    "dedup_semantic_clusters",
    "text_tfidf_top_terms",
    "variant_shred_props",
    "source_python_datasource",
    "similarity_sq_int8_topk",
    "sql_pipe_syntax_rollup",
    "join_asof_next_event",
    "events_hll_hourly_rollup",
    "sketch_theta_set_ops",
    "sketch_kll_quantile_rollup",
    # r5 additions
    "events_funnel_conversion",
    "events_linear_interpolate",
    "events_time_weighted_avg",
    "corpus_weighted_doc_sample",
    "corpus_embedding_decontaminate",
    # r6 additions
    "dq_referential_orphans",
    "multimodal_features_audit",
    "multimodal_frame_audit",
    "dedup_incremental_minhash",
    "corpus_global_shuffle",
    "events_late_arrival_audit",
    "embedding_dim_variance",
    "events_ohlc_bars",
    "features_point_in_time",
    "corpus_length_log2_histogram",
    "quality_zipf_slope",
    # r7 additions
    "quality_ttr_lexical_diversity",
    "text_ngram_novelty",
    "corpus_temperature_resample",
    "corpus_interleave_sources",
    "features_rolling_zscore",
    "events_rate_limit_audit",
    "dedup_minhash_accuracy",
    "sketch_bloom_prefilter",
    "embedding_matryoshka_recall",
    # r7 second batch (ROADMAP backlog)
    "corpus_stratified_cell_quota",
    "corpus_curriculum_order",
    "dedup_span_remediate",
    "dedup_token_savings",
    "retrieval_rerank_token_f1",
    "embedding_covariance_whitening",
    "quality_psi_drift",
    "sketch_join_cardinality",
    "sketch_kmv_distinct",
    "er_blocked_parts",
    "er_incremental_parts",
    "corpus_session_pack_shards",
    "dedup_semantic_keep_manifest",
    "quality_train_serve_skew",
    "dq_schema_drift",
    "corpus_mixing_waterfill",
    "cdc_scd2_intervals",
    "cdc_merge_upsert",
    "mv_incremental_refresh",
    "dedup_incremental_components",
    "events_anomaly_contribution",
    "corpus_epoch_schedule",
    "graph_cosupplier_projection",
    "pii_tokenize_preserving",
    # r8 additions
    "skew_shuffle_profile",
    "join_interval_overlap",
    "text_vocab_coverage",
    "dedup_cross_source_matrix",
    "events_mad_outliers",
    "events_cusum_changepoint",
    "events_trend_slope",
    "text_token_pmi",
    "graph_triangle_count",
    "features_target_encoding_loo",
    "features_equidepth_bins",
    "pii_l_diversity_audit",
    "dq_referential_integrity",
    "dq_key_uniqueness",
    "events_longest_streak",
    "dq_benford_firstdigit",
    "quality_ks_drift",
    "events_transition_matrix",
    "features_rfm_segments",
    "features_time_decay_mean",
    "features_global_equidepth_bins",
    "embedding_source_centroid_drift",
    # r9 additions (quality_psi_drift already above; re-audited after
    # its single-pass-cube refactor)
    "skew_join_key_profile",
    "dedup_shingle_containment",
    "features_woe_iv",
    "dq_completeness_matrix",
    "events_autocorrelation",
    "features_feature_hashing",
    "agg_exact_group_median",
    "source_partitioned_roundtrip",
    "streaming_psi_drift",
    "events_session_paths",
    "agg_exact_group_mode",
    "retrieval_mmr_rerank",
    "retrieval_query_likelihood",
    "graph_triangle_orientation_stats",
    "events_interarrival_stats",
    "agg_exact_group_percentiles",
    "quality_js_divergence",
    "dq_order_reconciliation",
    "features_chi2_selection",
    "streaming_jsd_drift",
    "agg_exact_weighted_median",
    "events_burstiness_fano",
    "retrieval_ndcg_eval",
    "agg_exact_group_trimmed_mean",
    "retrieval_rank_correlation",
    "events_dow_seasonality",
    "streaming_dow_seasonality",
    # r10 additions
    "streaming_fano_burstiness",
    "agg_histogram_group_percentiles",
    "retrieval_mrr_eval",
    "streaming_autocorrelation",
    "events_gini_concentration",
    "dq_volume_anomaly",
    "agg_exact_group_moments",
    "features_scaling_params",
    "streaming_volume_anomaly",
    "pii_t_closeness",
    "text_readability_score",
    "graph_jaccard_similarity",
    "join_asof_tolerance",
    "events_time_to_convert",
    "sketch_hll_intersection",
    "events_type_entropy_daily",
    "streaming_type_entropy",
    "agg_group_correlation",
    "events_markov_stationary",
    "events_dow_strength",
    "streaming_dow_strength",
    "retrieval_prf_expansion",
    "events_pareto_share",
    "text_unigram_entropy",
    "corpus_dedup_yield_report",
    "quality_perplexity_drift",
    # r11 additions
    "retrieval_rm3_interpolated",
    "events_ewma_volume_forecast",
    "streaming_ewma_volume_forecast",
    "join_dynamic_partition_pruning",
    "events_seasonal_volume_anomaly",
    "dq_feed_freshness",
    "events_markov_entropy_rate",
    "similarity_ann_recall_audit",
    "streaming_seasonal_volume_anomaly",
    "streaming_trend_slope",
    "events_cohort_ltv",
    "events_survival_km",
    "events_ab_conversion_ztest",
    "streaming_dod_growth",
    "features_mutual_information",
    "er_blocking_quality",
    "features_pca_quality_axis",
    "embedding_kmeans_lloyd",
    "features_anova_f",
    "embedding_cluster_quality",
    "events_holt_volume_forecast",
    "streaming_holt_volume_forecast",
    "events_session_timeout_sensitivity",
    "pii_dp_noisy_counts",
    "join_lateral_topk_per_key",
    "graph_degree_distribution",
    # r12 additions
    "events_did_estimator",
    "agg_theil_decomposition",
    "graph_adamic_adar",
    "join_lateral_recent_avg",
    # r12 second batch
    "agg_theil_l_decomposition",
    "graph_resource_allocation",
    "events_power_mde",
    "events_bootstrap_rate_ci",
    # r12 third batch (experimentation guardrail + variance reduction)
    "events_srm_check",
    "events_cuped_adjustment",
    # r13 additions (sequential/distributional/robust experimentation,
    # inequality welfare index, link-prediction baseline)
    "events_msprt_always_valid",
    "events_quantile_treatment_effect",
    "events_winsorized_lift",
    "agg_atkinson_index",
    "graph_preferential_attachment",
    # r13 second batch (nonparametric + categorical-covariate members)
    "events_mannwhitney_u",
    "events_stratified_lift",
    # r13 third batch (DiD validity diagnostic)
    "events_did_placebo_pretrends",
    # r13 fourth batch (anytime-valid estimation + behavior guardrail)
    "events_confidence_sequence",
    "events_split_behavior_chi2",
    # r13 fifth batch (ratio metrics + time-to-event comparison)
    "events_ratio_metric_ztest",
    "events_logrank_test",
    # r13 sixth batch (horizon ladder + per-segment HTE)
    "events_conversion_horizon_lift",
    "events_segment_lift_hte",
    # r14 additions (real-codec multimodal audit, seeded-sample
    # invariants, inequality readouts, exact range search,
    # group-sequential boundary)
    "multimodal_wav_audit",
    "w2_seeded_sample_invariants",
    "agg_hoover_index",
    "agg_lorenz_deciles",
    "agg_palma_ratio",
    "similarity_range_search",
    "events_obrien_fleming_boundary",
    # r14 second batch (forensic DQ + graph degree correlation)
    "dq_benford_chi2_gate",
    "graph_degree_assortativity",
    # r14 third batch (token concentration + uplift evaluation)
    "text_token_hhi",
    "events_qini_uplift_deciles",
    # r14 fourth batch (cross-variable concentration + sequence entropy)
    "agg_concentration_curve",
    "text_bigram_entropy_rate",
    # r14 fifth batch (streaming Benford tier)
    "streaming_benford_gate",
    # r14 sixth batch (daily SRM trace)
    "events_srm_daily_trace",
    # r15 additions (MP4 demux audit, repetition/GT/JSD corpus
    # diagnostics, local clustering, basket rules, changepoint,
    # effective dimensionality)
    "multimodal_mp4_audit",
    "text_gopher_repetition",
    "text_good_turing_unseen",
    "quality_source_jsd",
    "graph_local_clustering",
    "basket_brand_rules",
    "events_volume_changepoint",
    "embedding_effective_dim",
    "retrieval_rbo_overlap",
    "embedding_cluster_purity",
    # r16 additions (3-itemset rules, depth-2 binary segmentation,
    # contamination-overlap evaluator, anisotropy, day-block
    # jackknife, split-conformal interval)
    "basket_brand_rules3",
    "events_volume_binseg",
    "retrieval_contamination_eval",
    "embedding_anisotropy",
    "events_ratio_jackknife",
    "events_conformal_volume_interval",
    "text_term_burstiness",
    "sketch_ams_f2",
    "text_rake_keywords",
    "similarity_graph_expand_topk",
    "corpus_ht_token_estimate",
    "text_textrank_keywords",
    "dq_column_profile",
    # r16 second batch
    "retrieval_map_eval",
    "events_kruskal_wallis",
    "text_heaps_law",
    "events_calibration_ece",
    "streaming_volume_binseg",
    "events_stouffer_meta",
    "corpus_dsir_importance",
    "graph_kcore",
    "embedding_jl_projection_audit",
    "features_price_elasticity",
    "events_isotonic_calibration",
    "features_ipf_raking",
]


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def executed(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def executed_final(df) -> str:
    """Post-execution plan string: under AQE the pre-execution
    executedPlan prints `isFinalPlan=false` with NO codegen spans, so
    the codegen checklist line could never fire (it read '– no codegen
    span' on every query through r8). The action must run on the
    DATAFRAME'S OWN QueryExecution (df.write would spawn a fresh one),
    so collect-and-discard; the final adaptive tree then carries the
    codegen stages as `*(n)` operator prefixes."""
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _node_depth(line: str) -> int:
    """Depth of a plan-tree line = offset of the operator text past the
    tree-drawing prefix ('+- ', ':- ', '   ' …)."""
    for i, ch in enumerate(line):
        if ch not in " :+-":
            return i
    return len(line)


def audit_unpartitioned_windows(exe: str) -> tuple[int, int]:
    """Return (waived, unwaived) counts of unpartitioned window nodes.

    ADVICE r3: the limit-bounded waiver must check the WINDOW'S OWN
    INPUT SUBTREE for a TakeOrderedAndProject/GlobalLimit/LocalLimit —
    a limit in a sibling branch does not bound this window's input.
    In the executed-plan string a node's subtree is the following lines
    with strictly greater tree depth."""
    lines = exe.splitlines()
    waived = unwaived = 0
    for idx, line in enumerate(lines):
        if "windowspecdefinition(" not in line:
            continue
        first_arg = line.split("windowspecdefinition(", 1)[1].split(",", 1)[0]
        if "ASC" not in first_arg and "DESC" not in first_arg:
            continue  # partitioned window: first spec arg is the key
        depth = _node_depth(line)
        bounded = False
        for nxt in lines[idx + 1 :]:
            if _node_depth(nxt) <= depth:
                break  # left the window's subtree
            if (
                "TakeOrderedAndProject" in nxt
                or "GlobalLimit" in nxt
                or "LocalLimit" in nxt
            ):
                bounded = True
                break
        if bounded:
            waived += 1
        else:
            unwaived += 1
    return waived, unwaived


# Unpartitioned windows whose input is bounded by a VALUE DOMAIN
# rather than a plan-visible limit — the structural waiver above
# cannot see these, so they are waived by name WITH the documented
# bound (each is asserted in tests or holds by construction).
# name → (expected unpartitioned-window count, bound). The COUNT is
# asserted, not just the presence (ADVICE r7): waiving the query
# wholesale would let a future edit add a genuinely corpus-scale
# global window and still print a green checkmark.
_BOUNDED_DOMAIN_WINDOW_WAIVERS: dict[str, tuple[int, str]] = {
    # histogram cumsum over integer 1e-4 score units: ≤ 10001 rows no
    # matter the corpus size (floor(score·10⁴), score ∈ [0, 1]).
    "corpus_curriculum_order": (1, "≤ 10001-row score-value histogram"),
    # waterfill prefix scans over the source DIMENSION (~20 rows) —
    # bounded by |sources|, never the corpus. The physical plan holds
    # 8 unpartitioned specs: rank + two prefix sums + prefix-min, each
    # appearing twice because the pfx subtree feeds both the clamp-set
    # aggregate and the final projection. ALL of them sit above the
    # groupBy(source) inventory, so every one is dimension-bounded.
    "corpus_mixing_waterfill": (8, "|sources|-row dimension scans ×8"),
    # shares the curriculum's histogram cumsum (same bound).
    "corpus_epoch_schedule": (1, "≤ 10001-row score-value histogram"),
    # CUSUM prefix sum + candidate row_number over the DAILY count
    # relation — calendar-bounded (one row per day with events, never
    # the corpus; the _seq_day_increments family bound). One counted
    # spec: Catalyst plans both functions in a single Window node over
    # the shared (ORDER BY day) spec.
    "events_volume_changepoint": (1, "calendar-day count relation"),
    # same calendar-day bound; the prefix-sum subtree (one Window node
    # carrying sum(c), sum(c²), row_number over the shared ORDER BY
    # day spec) is planned THREE times — the root-argmax branch, the
    # segment-candidate branch, and the broadcast copy of root the
    # segment branch joins against.
    "events_volume_binseg": (3, "calendar-day count relation ×3"),
    # the streamed twin runs the identical binseg kernel over the
    # cube-derived day totals — same three calendar-day prefix
    # subtrees (the max-seq window is type-partitioned, not counted).
    "streaming_volume_binseg": (3, "calendar-day count relation ×3"),
    # calendar-day bound again: the day-order row_number subtree is
    # planned once per consumer branch (forecast stats, calibration
    # scores, test-coverage copy, plus the calibration score-rank
    # window, itself over ≤ ⌊m/4⌋ calibration days).
    "events_conformal_volume_interval": (5, "calendar-day relations ×5"),
}

# Unpartitioned windows whose input subtree IS truncated by a plan-
# visible limit (TakeOrderedAndProject/GlobalLimit/LocalLimit). Same
# counted treatment as the value-domain waivers (VERDICT r8 #7): the
# waiver names the query AND the expected count, so an edit that moves
# a window above its limit (count drops here, unwaived count rises →
# ✗) or quietly adds another globally-sorted window behind an
# incidental limit (count rises → ✗) trips the audit instead of
# auto-greening. name → (expected limit-bounded window count, bound).
_LIMIT_BOUNDED_WINDOW_WAIVERS: dict[str, tuple[int, str]] = {
    # sparse rank + dense rank, each over its own limit-truncated
    # top-k candidate list (≤ k rows apiece).
    "retrieval_hybrid_rrf": (2, "sparse + dense rank over top-k lists"),
    # log-log OLS over the top-200 token ranks (TakeOrderedAndProject).
    "quality_zipf_slope": (1, "rank over top-200 token rows"),
    # F1 rerank over the BM25 top-k candidate set.
    "retrieval_rerank_token_f1": (1, "rank over BM25 top-k candidates"),
    # display rank over the limit(20) heaviest-triangle edges
    # (pkg/queries_retrieval.py post-limit rank).
    "graph_triangle_count": (1, "rank over limit(20) edge rows"),
    # three rank windows, each over its own limit(10) top list
    # (bm25 top-10, ql top-10, ideal-relevance top-10).
    "retrieval_ndcg_eval": (3, "ranks over three limit(10) top lists"),
    # two rank windows, one per retriever's limit(10) top list.
    "retrieval_mrr_eval": (2, "ranks over two limit(10) top lists"),
    # rank + cumulative-relevance windows, one pair per retriever's
    # limit(10) top list.
    "retrieval_map_eval": (4, "rank + cum-rel over two limit(10) lists"),
    # two rank windows, one per retriever's limit(20) top list (the
    # tau shape without the localCheckpoint — RBO's common relation
    # feeds a single aggregate, no self-join to shield).
    "retrieval_rbo_overlap": (2, "ranks over two limit(20) top lists"),
    # (retrieval_rank_correlation's two limit(20) rank windows run at
    # localCheckpoint-creation time — the audited plan roots at the
    # checkpointed <= k-row relation, so no waiver entry is needed.)
}


def checklist(plan: str, exe: str, name: str = "", final: str = "") -> list[str]:
    notes = []
    notes.append(
        ("✓" if "PushedFilters: [" in plan else "–")
        + " filter pushdown present"
        if "PushedFilters" in plan
        else "– no parquet scan filters (full-table op)"
    )
    notes.append(
        "✓ broadcast join"
        if "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        else "– no broadcast join"
    )
    notes.append(
        "✗ CARTESIAN PRODUCT" if "CartesianProduct" in exe else "✓ no cartesian product"
    )
    waived, unwaived = audit_unpartitioned_windows(exe)
    # the two counted waiver classes are checked INDEPENDENTLY (r9
    # review): an elif chain let a query with domain-waived windows
    # acquire an uncounted limit-bounded window without tripping.
    if unwaived:
        if name in _BOUNDED_DOMAIN_WINDOW_WAIVERS:
            expected, bound = _BOUNDED_DOMAIN_WINDOW_WAIVERS[name]
            if unwaived == expected:
                notes.append(
                    "✓ single-partition window over bounded value domain "
                    f"({bound})"
                )
            else:
                notes.append(
                    f"✗ SINGLE-PARTITION WINDOW (waiver covers {expected}, "
                    f"plan has {unwaived})"
                )
        else:
            notes.append("✗ SINGLE-PARTITION WINDOW")
    if waived:
        # unpartitioned window whose own input subtree is truncated by a
        # limit — bounded rows by construction, not a scale hazard, but
        # only when the query carries a COUNTED waiver (VERDICT r8 #7)
        if name in _LIMIT_BOUNDED_WINDOW_WAIVERS:
            expected, bound = _LIMIT_BOUNDED_WINDOW_WAIVERS[name]
            if waived == expected:
                notes.append(
                    f"✓ single-partition window over limit-bounded input ({bound})"
                )
            else:
                notes.append(
                    f"✗ SINGLE-PARTITION WINDOW (limit-bounded waiver covers "
                    f"{expected}, plan has {waived})"
                )
        else:
            notes.append(
                "✗ SINGLE-PARTITION WINDOW (limit-bounded but no counted waiver)"
            )
    if not waived and not unwaived:
        notes.append("✓ no single-partition window")
    codegen_src = final or exe
    # the final adaptive plan string marks codegen stages with the
    # `*(id)` operator prefix, not the literal node name
    has_codegen = "WholeStageCodegen" in codegen_src or bool(
        re.search(r"\*\(\d+\)", codegen_src)
    )
    notes.append(
        "✓ whole-stage codegen"
        if has_codegen
        else "– no codegen span (expression-heavy or non-codegen operators)"
    )
    return notes


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit", master="local[4]", shuffle_partitions=4)
    names = list(dict.fromkeys(HEADLINE_QUERIES + EXTRA))
    out = [
        "# PLANS — physical-plan audit of the headline + scale-critical queries",
        "",
        f"Generated by `tools/plan_audit.py` at `{sf_dir}`. Checklist per plan:",
        "filter pushdown reaches the scan, dim joins broadcast, no cartesian",
        "products, no single-partition windows, whole-stage codegen spans.",
        "",
    ]
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        plan, exe = formatted(df), executed(df)
        final = executed_final(df)
        out.append(f"## {name}")
        out.append("")
        for n in checklist(plan, exe, name, final):
            out.append(f"- {n}")
        out.append("")
        # keep the formatted plan's operator tree (head) — enough to read
        # the join/exchange structure without megabytes of detail
        head = "\n".join(plan.splitlines()[:40])
        out.append("```")
        out.append(head)
        out.append("```")
        out.append("")
    spark.stop()
    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(dest, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {dest} ({len(names)} plans)")


if __name__ == "__main__":
    main()
