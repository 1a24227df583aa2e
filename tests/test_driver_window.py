"""Guard the driver CORRECTNESS window ordering (VERDICT r1 #1, r2 #1, r3 #1).

The external driver verifies only the first 50 registered queries, so the
first 50 must (a) match the explicit _DRIVER_WINDOW list, (b) all carry a
DuckDB oracle, and (c) every operator family must have a representative
that is either in the current window or already driver-green in a prior
round's CORRECTNESS file (cumulative coverage — VERDICT r3 grades on the
union across rounds, not on any single window).
"""

import json
import pathlib

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
    QUERIES,
    _DRIVER_WINDOW,
)

REPO = pathlib.Path(__file__).resolve().parents[1]


def cumulative_driver_green() -> set[str]:
    green: set[str] = set()
    for path in sorted(REPO.glob("CORRECTNESS_r*.json")):
        for name, row in json.loads(path.read_text()).items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                green.add(name)
    return green


# One representative (or more) per SURVEY §2 / LLM-pipeline family that must
# be covered — by the current window or by a prior driver-green row.
FAMILY_REPRESENTATIVES = {
    "flagship": ["flagship_enriched_sample"],
    "filters": ["p1_filter_isin", "p4_project_alias", "p6_match_rate"],
    "joins": ["j1_broadcast_left_join"],
    "aggregates": ["a2_group_count_ordered", "agg_grouping_sets"],
    "windows": ["w2_stratified_sample_rows", "w8_distribution_functions"],
    "order_limit": ["o1_topk"],
    "set_ops": ["set_union_distinct"],
    "scalar_fns": ["f5_string_functions", "f_date_functions", "json_extract_props"],
    "pipeline_gates": ["c3_quality_gate", "dq_expectation_suite"],
    "text": ["text_lang_id", "text_tfidf_top_terms", "text_bpe_top_merges"],
    "corpus_quality": ["quality_heuristic_filter", "pii_detect_redact", "quality_char_entropy"],
    "dedup": ["dedup_exact", "dedup_minhash_lsh", "dedup_simhash_pairs", "dedup_semantic_clusters"],
    "similarity": ["similarity_ann_lsh", "similarity_ivf_topk", "similarity_pq_topk", "similarity_knn_graph"],
    "retrieval": ["retrieval_bm25_topk", "retrieval_build_inverted_index", "retrieval_hybrid_rrf"],
    "graph": ["graph_pagerank_orders"],
    "events": ["events_session_window", "events_retention_cohorts", "events_anomaly_zscore"],
    "streaming": ["streaming_dedup_events", "streaming_click_purchase_join"],
    "multimodal": ["multimodal_payload_meta"],
    "joins_ext": ["join_asof_last_purchase", "join_range_bucketed"],
    "udf": ["udf_pandas_parse_id", "udf_rowwise_safe_int", "udtf_token_windows"],
    "sources": ["source_csv_roundtrip", "source_orc_roundtrip", "source_schema_evolution", "rest_census_ingest"],
    "skew": ["skew_salted_agg"],
    "cdc": ["scd2_merge_emulation", "cdc_snapshot_diff"],
    "sql_surface": ["sql_recursive_cte_date_spine", "subquery_scalar_correlated"],
    "tpch": ["tpch_q1_pricing_summary", "tpch_q9_product_profit", "tpch_q21_waiting_supplier"],
    "corpus": ["corpus_split_train_val_test", "corpus_pack_token_shards", "corpus_curation_funnel", "training_data_prep_pipeline"],
    "sketch": ["sketch_count_min_tokens", "sketch_hll_union", "sketch_quantile_envelope"],
}

# Queries rotated INTO the window this round for first-time driver exposure
# (VERDICT r3 next-round #1). Pinned so an accidental re-rotation is loud.
R4_FIRST_TIME = [
    "retrieval_bm25_topk",
    "retrieval_build_inverted_index",
    "retrieval_hybrid_rrf",
    "graph_pagerank_orders",
    "dedup_semantic_clusters",
    "sketch_quantile_envelope",
    "text_bpe_top_merges",
    "streaming_click_purchase_join",
    "training_data_prep_pipeline",
    "text_tfidf_top_terms",
    "tpch_q7_volume_shipping",
    "tpch_q9_product_profit",
    "tpch_q17_small_quantity",
    "tpch_q20_part_promotion",
    "tpch_q21_waiting_supplier",
    "dedup_simhash_pairs",
    "similarity_knn_graph",
    "events_retention_cohorts",
    "events_anomaly_zscore",
    "source_orc_roundtrip",
    "source_schema_evolution",
    "join_range_bucketed",
    "subquery_scalar_correlated",
    "w8_distribution_functions",
    "sketch_hll_union",
    "quality_char_entropy",
    "pii_k_anonymity_audit",
    "corpus_curation_funnel",
    "text_pmi_top_pairs",
    "dedup_boilerplate_shingles",
]


def test_r4_rotation_entries_in_window():
    window = set(_DRIVER_WINDOW)
    missing = [n for n in R4_FIRST_TIME if n not in window]
    assert not missing, f"r4 first-time entries fell out of window: {missing}"


def test_r4_rotation_entries_are_actually_first_timers():
    green = cumulative_driver_green()
    already = [n for n in R4_FIRST_TIME if n in green]
    assert not already, f"not first-timers (already driver-green): {already}"


def test_window_is_exactly_first_50():
    assert len(_DRIVER_WINDOW) == 50
    assert list(QUERIES)[:50] == _DRIVER_WINDOW


def test_window_queries_all_have_oracles():
    missing = [n for n in _DRIVER_WINDOW if QUERIES[n].oracle is None]
    assert not missing, f"window entries without oracle: {missing}"


def test_every_family_covered_by_window_or_cumulative_green():
    covered = set(_DRIVER_WINDOW) | cumulative_driver_green()
    for family, reps in FAMILY_REPRESENTATIVES.items():
        assert covered.intersection(reps), f"family {family!r} has no covered query"


def test_retained_anchors_are_cumulative_green():
    # The 20 non-first-timer slots exist as regression canaries; each must
    # already be driver-green (otherwise it should be in R4_FIRST_TIME).
    green = cumulative_driver_green()
    anchors = [n for n in _DRIVER_WINDOW if n not in set(R4_FIRST_TIME)]
    assert len(anchors) == 20
    stale = [n for n in anchors if n not in green]
    assert not stale, f"retained anchors never driver-green: {stale}"


def test_no_duplicates_in_window():
    assert len(set(_DRIVER_WINDOW)) == len(_DRIVER_WINDOW)
