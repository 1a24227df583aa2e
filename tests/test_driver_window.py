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
    "filters": ["p1_filter_isin", "p2_filter_notnull", "p7_distinct"],
    "joins": ["j1_broadcast_left_join", "j2_anti_join", "p3_semi_join"],
    "aggregates": ["a1_global_count", "a2_group_count_ordered", "a5_ratio_of_sums"],
    "windows": ["w2_stratified_sample_rows"],
    "order_limit": ["o1_topk"],
    "set_ops": ["set_union_distinct"],
    "scalar_fns": ["f1_cast_string_numeric", "f5_string_functions", "f_date_functions"],
    "pipeline_gates": ["c3_quality_gate"],
    "text": ["text_lang_id", "text_quality_score", "text_token_count"],
    "corpus_quality": ["quality_heuristic_filter", "pii_detect_redact"],
    "dedup": ["dedup_exact", "dedup_cluster_components", "dedup_minhash_lsh", "dedup_simhash"],
    "similarity": [
        "similarity_topk_bruteforce",
        "similarity_ann_lsh",
        "similarity_ivf_topk",
        "dedup_embedding_cosine",
    ],
    "events": ["events_session_window", "events_hypertable_rollup"],
    "streaming": ["streaming_dedup_events"],
    "multimodal": ["multimodal_payload_meta"],
    "joins_ext": ["join_asof_last_purchase"],
    "udf": ["udf_pandas_parse_id"],
    "sources": ["source_csv_roundtrip", "source_json_roundtrip"],
    "skew": ["skew_salted_agg"],
    "cdc": ["scd2_merge_emulation"],
    "corpus": [
        "corpus_split_train_val_test",
        "corpus_pack_token_shards",
        "corpus_decontamination",
        "corpus_chunk_documents",
    ],
    "sketch": ["sketch_count_min_tokens"],
}


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
