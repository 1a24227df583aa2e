"""Guard the driver CORRECTNESS window ordering (VERDICT r1, next-round #1).

The external driver verifies only the first 50 registered queries, so the
first 50 must (a) match the explicit _DRIVER_WINDOW list, (b) all carry a
DuckDB oracle, and (c) cover every operator family.
"""

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
    QUERIES,
    _DRIVER_WINDOW,
)

# One representative (or more) per SURVEY §2 / LLM-pipeline family that must
# sit inside the driver's 50-entry verification window.
FAMILY_REPRESENTATIVES = {
    "flagship": ["flagship_enriched_sample"],
    "filters": ["p1_filter_isin", "p4_project_alias", "p6_match_rate"],
    "joins": ["j1_broadcast_left_join"],
    "aggregates": ["a2_group_count_ordered", "tpch_q1_pricing_summary", "agg_grouping_sets"],
    "windows": ["w2_stratified_sample_rows"],
    "order_limit": ["o1_topk"],
    "set_ops": ["set_union_distinct"],
    "scalar_fns": ["f5_string_functions", "f_date_functions", "f_higher_order_arrays", "json_extract_props"],
    "pipeline_gates": ["c3_quality_gate", "dq_expectation_suite"],
    "text": ["text_lang_id"],
    "corpus_quality": ["quality_heuristic_filter", "pii_detect_redact"],
    "dedup": ["dedup_exact", "dedup_minhash_lsh", "dedup_embedding_cosine"],
    "similarity": ["similarity_ann_lsh", "similarity_ivf_topk", "similarity_pq_topk"],
    "events": ["events_session_window", "events_hypertable_rollup", "events_funnel_analysis"],
    "streaming": ["streaming_dedup_events"],
    "multimodal": ["multimodal_payload_meta"],
    "joins_ext": ["join_asof_last_purchase"],
    "udf": [
        "udf_pandas_parse_id",
        "udf_rowwise_safe_int",
        "udtf_token_windows",
        "udf_cogroup_spend_ratio",
    ],
    "sources": ["source_csv_roundtrip", "source_json_roundtrip", "rest_census_ingest"],
    "skew": ["skew_salted_agg"],
    "cdc": ["scd2_merge_emulation", "cdc_snapshot_diff"],
    "sql_surface": ["sql_recursive_cte_date_spine"],
    "corpus": [
        "corpus_split_train_val_test",
        "corpus_pack_token_shards",
        "corpus_decontamination",
        "corpus_chunk_documents",
        "corpus_mixing_sample",
    ],
    "sketch": ["sketch_count_min_tokens", "sketch_misra_gries_heavy_hitters"],
}

# Queries rotated INTO the window this round for first-time driver exposure
# (VERDICT r2 next-round #1). Pinned so an accidental re-rotation is loud.
R3_FIRST_TIME = [
    "similarity_pq_topk",
    "rest_census_ingest",
    "udf_rowwise_safe_int",
    "udtf_token_windows",
    "udf_cogroup_spend_ratio",
    "sql_recursive_cte_date_spine",
    "json_extract_props",
    "f_higher_order_arrays",
    "agg_grouping_sets",
    "events_funnel_analysis",
    "dq_expectation_suite",
    "cdc_snapshot_diff",
    "tpch_q1_pricing_summary",
    "corpus_mixing_sample",
    "sketch_misra_gries_heavy_hitters",
]


def test_r3_rotation_entries_in_window():
    window = set(_DRIVER_WINDOW)
    missing = [n for n in R3_FIRST_TIME if n not in window]
    assert not missing, f"r3 first-time entries fell out of window: {missing}"


def test_window_is_exactly_first_50():
    assert len(_DRIVER_WINDOW) == 50
    assert list(QUERIES)[:50] == _DRIVER_WINDOW


def test_window_queries_all_have_oracles():
    missing = [n for n in _DRIVER_WINDOW if QUERIES[n].oracle is None]
    assert not missing, f"window entries without oracle: {missing}"


def test_every_family_has_a_window_representative():
    window = set(_DRIVER_WINDOW)
    for family, reps in FAMILY_REPRESENTATIVES.items():
        assert window.intersection(reps), f"family {family!r} has no query in window"


def test_no_duplicates_in_window():
    assert len(set(_DRIVER_WINDOW)) == len(_DRIVER_WINDOW)
