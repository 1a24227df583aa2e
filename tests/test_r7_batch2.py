"""Invariant tests for the round-7 second-batch operators (the ROADMAP
backlog): stratified cell quotas, curriculum ordering, span remediation,
token-savings accounting, retrieve→rerank, covariance/whitening, and the
streaming sliding rate-limit twin."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import QUERIES
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
    load_table,
)


def test_cell_quota_respects_grid(spark, sf_dir):
    """Every (source, lang) cell keeps exactly min(4·isqrt(n), n) docs,
    recomputed here with Python's exact integer isqrt — pinning the
    integer-corrected double-sqrt in both engines to the true root."""
    rows = QUERIES["corpus_stratified_cell_quota"].fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    cell_n = {
        (r.source, r.lang): r.n
        for r in docs.groupBy("source", "lang").agg(F.count("*").alias("n")).collect()
    }
    kept: dict[tuple[str, str], int] = {}
    for r in rows:
        kept[(r.source, r.lang)] = kept.get((r.source, r.lang), 0) + 1
        assert r.n_cell == cell_n[(r.source, r.lang)]
        assert r.quota == min(4 * math.isqrt(r.n_cell), r.n_cell)
        assert 1 <= r.rank_in_cell <= r.quota
    for cell, n in cell_n.items():
        assert kept.get(cell, 0) == min(4 * math.isqrt(n), n)


def test_curriculum_buckets_partition_and_order(spark, sf_dir):
    """The curriculum assignment is a PARTITION of the corpus into
    score-contiguous buckets: every doc appears once, bucket value
    ranges do not overlap, and sizes are near-quartile (value ties can
    skew them slightly, never by construction more than one value
    run)."""
    rows = QUERIES["corpus_curriculum_order"].fn(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    by_bucket: dict[int, list] = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
        assert 0 <= r.shard < 256
        assert r.pos_in_shard >= 1
    assert set(by_bucket) <= set(range(4))
    bounds = {
        b: (min(x.q_mil for x in xs), max(x.q_mil for x in xs))
        for b, xs in by_bucket.items()
    }
    for b in sorted(bounds)[:-1]:
        nxt = sorted(bounds)[sorted(bounds).index(b) + 1]
        assert bounds[b][1] <= bounds[nxt][0], "bucket ranges overlap"
    for b, xs in by_bucket.items():
        assert 0.4 * n_docs / 4 <= len(xs) <= 1.7 * n_docs / 4, (
            f"bucket {b} size {len(xs)} far from quartile"
        )


def test_span_remediate_consistency(spark, sf_dir):
    """Remediation agrees with detection: a doc with zero shared
    windows is untouched (its remediated md5 IS the normalized-text
    fingerprint), a doc with shared windows loses at least K tokens,
    and nothing loses more than it has."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        text as X,
    )

    rem = {
        r.doc_id: r
        for r in QUERIES["dedup_span_remediate"].fn(spark, sf_dir).collect()
    }
    det = {
        r.doc_id: r
        for r in QUERIES["dedup_repeated_substrings"].fn(spark, sf_dir).collect()
    }
    fp = {
        r.doc_id: r.f
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", X.fingerprint().alias("f"))
        .collect()
    }
    assert set(det) <= set(rem)  # detector drops window-less docs
    touched = 0
    for doc_id, r in rem.items():
        assert 0 <= r.n_removed <= r.n_tokens
        d = det.get(doc_id)
        if d is None or d.n_shared == 0:
            assert r.n_removed == 0
            assert r.remediated_md5 == fp[doc_id]
        else:
            touched += 1
            assert r.n_removed >= 8  # at least one whole K-token window
            assert r.remediated_md5 != fp[doc_id]
    assert touched > 0, "corpus has shared spans; remediation touched none"


def test_token_savings_consistent_with_pairs(spark, sf_dir):
    """The savings report's dup-doc count equals the distinct doc_b set
    of the verified pair list, and token totals reconcile with the
    corpus."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        text as X,
    )

    rows = QUERIES["dedup_token_savings"].fn(spark, sf_dir).collect()
    pairs = QUERIES["dedup_minhash_lsh"].fn(spark, sf_dir).collect()
    removable = {p.doc_b for p in pairs}
    assert sum(r.n_dup_docs for r in rows) == len(removable)
    corpus_tokens = (
        load_table(spark, sf_dir, "documents")
        .agg(F.sum(X.token_count()).alias("t"))
        .collect()[0]
        .t
    )
    assert sum(r.total_tokens for r in rows) == corpus_tokens
    for r in rows:
        assert 0 <= r.dup_tokens <= r.total_tokens
        assert 0.0 <= r.savings_frac <= 1.0


def test_rerank_is_bounded_and_monotone(spark, sf_dir):
    """Stage-2 containment and ordering: the reranked list is ≤ 20
    rows with dense unique ranks, f1 non-increasing in rank, and every
    entry comes from the stage-1 BM25 candidate list."""
    rows = sorted(
        QUERIES["retrieval_rerank_token_f1"].fn(spark, sf_dir).collect(),
        key=lambda r: r.rerank_rank,
    )
    assert 0 < len(rows) <= 20
    assert [r.rerank_rank for r in rows] == list(range(1, len(rows) + 1))
    for a, b in zip(rows, rows[1:]):
        assert a.f1 >= b.f1
    # stage-1 containment: rebuild the top-100 BM25 candidate ids
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_retrieval import (
        _RRF_CAND,
        _bm25_scored,
        _tf_projection,
    )

    docs = load_table(spark, sf_dir, "documents")
    cand = {
        r.doc_id
        for r in _bm25_scored(_tf_projection(docs))
        .where(F.col("doc_id") != 0)
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(_RRF_CAND)
        .collect()
    }
    assert {r.doc_id for r in rows} <= cand


def test_whitening_matrix_psd_and_consistent(spark, sf_dir):
    """The driver-side eigen step the query's docstring promises: the
    64×64 covariance assembled from the upper triangle must be
    symmetric PSD (up to the 6-dp rounding), with unit self-correlation
    and variances matching embedding_dim_variance's var_pop within
    rounding tolerance."""
    import numpy as np

    rows = QUERIES["embedding_covariance_whitening"].fn(spark, sf_dir).collect()
    d = 64
    assert len(rows) == d * (d + 1) // 2
    cov = np.zeros((d, d))
    for r in rows:
        cov[r.dim_i - 1, r.dim_j - 1] = r.cov
        cov[r.dim_j - 1, r.dim_i - 1] = r.cov
        if r.dim_i == r.dim_j:
            assert r.corr == 1.0
        else:
            assert -1.01 <= r.corr <= 1.01
    evals = np.linalg.eigvalsh(cov)
    assert evals.min() >= -1e-4, f"covariance not PSD: min eig {evals.min()}"
    # cross-check the diagonal against the dim-variance audit's top-10
    dv = QUERIES["embedding_dim_variance"].fn(spark, sf_dir).collect()
    for r in dv:
        assert abs(cov[r.dim - 1, r.dim - 1] - r.var_val) < 1e-3


def test_streaming_rate_limit_matches_batch_buckets(spark, sf_dir):
    """Equals-batch pin for the sliding-window streaming job (the
    VERDICT r6 #6 pattern): the watermarked 1 h / 30 min window counts
    must equal a batch recomputation that explodes each event into its
    two bucket starts."""
    stream = {
        (r.window_start, r.user_id): r.n_in_window
        for r in QUERIES["streaming_rate_limit_windows"].fn(spark, sf_dir).collect()
    }
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.streaming.jobs import (
        RATE_LIMIT_THRESHOLD,
    )

    ev = load_table(spark, sf_dir, "events")
    halfhour = F.expr("unix_micros(ts) div 1800000000") * 1_800_000_000
    batch_rows = (
        ev.select(
            "user_id",
            F.explode(
                F.array(halfhour, halfhour - 1_800_000_000)
            ).alias("ws_us"),
        )
        .groupBy("ws_us", "user_id")
        .agg(F.count("*").cast("bigint").alias("n"))
        .where(F.col("n") >= RATE_LIMIT_THRESHOLD)
        .select(
            F.date_format(
                F.timestamp_micros("ws_us"), "yyyy-MM-dd HH:mm:ss"
            ).alias("window_start"),
            "user_id",
            "n",
        )
        .collect()
    )
    batch = {(r.window_start, r.user_id): r.n for r in batch_rows}
    assert stream == batch


def test_psi_drift_nonnegative_and_covers_grid(spark, sf_dir):
    """PSI is a sum of (p−q)·ln(p/q) terms, each ≥ 0 — allow only the
    6-dp ln-rounding slack below zero; every (type, day) present in
    events gets a row; flags agree with the 0.2 threshold."""
    rows = QUERIES["quality_psi_drift"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    n_cells = (
        ev.select(
            "event_type", F.date_trunc("day", "ts").alias("d")
        )
        .distinct()
        .count()
    )
    assert len(rows) == n_cells
    for r in rows:
        assert r.psi >= -1e-4, f"negative PSI {r.psi}"
        assert r.drift_flag == (r.psi >= 0.2)


def test_join_cardinality_fk_edges_exact_and_enveloped(spark, sf_dir):
    """On FK edges the exact join size equals the child row count
    (every child key resolves), and the HLL containment estimate must
    sit inside its envelope — the booleans the oracle asserts TRUE."""
    rows = {r.edge: r for r in QUERIES["sketch_join_cardinality"].fn(spark, sf_dir).collect()}
    ol = rows["orders-lineitem@orderkey"]
    assert ol.exact_join_rows == load_table(spark, sf_dir, "lineitem").count()
    co = rows["customer-orders@custkey"]
    assert co.exact_join_rows == load_table(spark, sf_dir, "orders").count()
    for r in rows.values():
        assert r.est_within_envelope


def test_kmv_merge_law_and_estimate_sanity(spark, sf_dir):
    """The tier-merged KMV sketch equals the directly-built one (the
    merge law the query asserts), and the (k−1)/u estimate lands
    within a coarse 4× band (k=8 ⇒ ~40 % stderr; the value itself is
    md5-deterministic, so the band only guards gross formula errors)."""
    rows = QUERIES["sketch_kmv_distinct"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.merged_equals_direct
        assert r.exact_distinct >= r.k
        assert r.exact_distinct / 4 <= r.est_distinct <= r.exact_distinct * 4


def test_er_blocked_parts_blocking_contract(spark, sf_dir):
    """ER invariants: assignment covers every part exactly once;
    entity sizes reconcile; entity_id is the min member key; and the
    blocking contract holds — the largest (noun, brand, type) block is
    far below the all-pairs regime."""
    rows = QUERIES["er_blocked_parts"].fn(spark, sf_dir).collect()
    part = load_table(spark, sf_dir, "part")
    n_parts = part.count()
    assert len(rows) == n_parts
    assert len({r.p_partkey for r in rows}) == n_parts
    members: dict[int, list[int]] = {}
    for r in rows:
        members.setdefault(r.entity_id, []).append(r.p_partkey)
    for eid, ms in members.items():
        assert eid == min(ms)
        assert all(
            r.n_members == len(ms) for r in rows if r.entity_id == eid
        )
    max_block = (
        part.groupBy(
            F.substring_index("p_name", " ", -1), "p_brand", "p_type"
        )
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert max_block < n_parts / 10, (
        f"largest ER block {max_block} of {n_parts} — blocking degenerate"
    )


def test_session_pack_no_split_and_budget(spark, sf_dir):
    """Packing invariants: shard event totals reconcile with the
    corpus; every shard except possibly the last holds at least the
    budget only via whole sessions (a shard's event total can overrun
    the budget by at most one session's length minus one — greedy
    whole-unit packing); shards are densely numbered."""
    rows = sorted(
        QUERIES["corpus_session_pack_shards"].fn(spark, sf_dir).collect(),
        key=lambda r: r.shard,
    )
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.shard_events for r in rows) == total
    assert [r.shard for r in rows] == list(range(len(rows)))
    # greedy cumsum sharding: every shard's START is aligned to the
    # budget grid, so a shard's total is < budget + its largest session
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_corpus import (
        _SESSION_PACK_BUDGET,
    )

    for r in rows[:-1]:
        assert r.shard_events >= 1
    assert all(r.n_sessions >= 1 for r in rows)
    # budget respected on average: shards ≈ ceil(total / budget)
    import math

    assert len(rows) <= math.ceil(total / _SESSION_PACK_BUDGET) + len(rows) // 2


def test_semantic_manifest_reconciles_with_clusters(spark, sf_dir):
    """The per-vector manifest and the per-cluster aggregate must tell
    one story: drop counts per cluster equal n_semantic_dups, every
    representative keeps itself, and kept+dropped covers the corpus."""
    man = QUERIES["dedup_semantic_keep_manifest"].fn(spark, sf_dir).collect()
    agg = {
        r.cluster_id: r
        for r in QUERIES["dedup_semantic_clusters"].fn(spark, sf_dir).collect()
    }
    n_vecs = load_table(spark, sf_dir, "embeddings").count()
    assert len(man) == n_vecs
    drops: dict[int, int] = {}
    for r in man:
        if r.vec_id == r.rep_vec_id:
            assert not r.drop_flag
        if r.drop_flag:
            drops[r.cluster_id] = drops.get(r.cluster_id, 0) + 1
    for cid, a in agg.items():
        assert drops.get(cid, 0) == a.n_semantic_dups


def test_er_incremental_covers_batch_and_is_consistent(spark, sf_dir):
    """Every batch record gets exactly one row; unmatched records found
    a new entity under their own key; matched records carry at least
    one candidate and an entity that exists in the store-side full
    resolution."""
    rows = QUERIES["er_incremental_parts"].fn(spark, sf_dir).collect()
    part = load_table(spark, sf_dir, "part")
    n_batch = part.where((F.col("p_partkey") % 5) == 2).count()
    assert len(rows) == n_batch
    full = {
        r.p_partkey: r.entity_id
        for r in QUERIES["er_blocked_parts"].fn(spark, sf_dir).collect()
    }
    store_entities = {
        eid for pk, eid in full.items() if pk % 5 != 2
    }
    for r in rows:
        if r.matched:
            assert r.n_candidates >= 1
            # entity ids assigned from the store come from store-only
            # components — min store key of some component
            assert r.assigned_entity in store_entities or (
                r.assigned_entity % 5 != 2
            )
        else:
            assert r.n_candidates == 0
            assert r.assigned_entity == r.p_partkey


def test_train_serve_skew_monotone_quantiles(spark, sf_dir):
    """One row per (type, pct); both windows populated; within a type
    the picked order statistics are non-decreasing in the percent
    rank for each window."""
    rows = QUERIES["quality_train_serve_skew"].fn(spark, sf_dir).collect()
    types = {
        r.event_type
        for r in load_table(spark, sf_dir, "events").select("event_type").distinct().collect()
    }
    assert len(rows) == len(types) * 4
    by_type: dict[str, list] = {}
    for r in rows:
        assert r.early_value is not None and r.late_value is not None
        assert r.abs_shift >= 0
        by_type.setdefault(r.event_type, []).append(r)
    for t, rs in by_type.items():
        rs = sorted(rs, key=lambda r: r.pct)
        for a, b in zip(rs, rs[1:]):
            assert a.early_value <= b.early_value
            assert a.late_value <= b.late_value


def test_schema_drift_statuses_exercised(spark, sf_dir):
    """The v2-draft contract must light up every drift status on live
    data: schema_version missing, props extra, events.value
    type_drift, everything else ok."""
    rows = QUERIES["dq_schema_drift"].fn(spark, sf_dir).collect()
    by = {(r.table_name, r.column_name): r.status for r in rows}
    assert by[("events", "schema_version")] == "missing"
    assert by[("events", "props")] == "extra"
    assert by[("events", "value")] == "type_drift"
    others = [
        s
        for (t, c), s in by.items()
        if (t, c)
        not in {
            ("events", "schema_version"),
            ("events", "props"),
            ("events", "value"),
        }
    ]
    assert others and all(s == "ok" for s in others)


def test_waterfill_exhausts_budget_exactly(spark, sf_dir):
    """Waterfill invariants: no source exceeds its inventory; clamped
    sources take exactly their inventory; total allocation lands
    within |unclamped| tokens of the budget (floor truncation only);
    and a Python reference waterfill reproduces every allocation."""
    rows = QUERIES["corpus_mixing_waterfill"].fn(spark, sf_dir).collect()
    total_avail = sum(r.avail_tokens for r in rows)
    budget = total_avail // 2
    alloc = sum(r.alloc_tokens for r in rows)
    n_unclamped = sum(1 for r in rows if not r.clamped)
    assert budget - n_unclamped <= alloc <= budget or n_unclamped == 0
    for r in rows:
        assert r.alloc_tokens <= r.avail_tokens
        if r.clamped:
            assert r.alloc_tokens == r.avail_tokens
    # reference implementation: greedy clamp in avail/w ascending order
    items = sorted(rows, key=lambda r: (r.avail_tokens / r.weight, r.source))
    left, wleft = budget, sum(r.weight for r in rows)
    expect = {}
    clamping = True
    for r in items:
        if clamping and left * r.weight >= r.avail_tokens * wleft:
            expect[r.source] = r.avail_tokens
            left -= r.avail_tokens
            wleft -= r.weight
        else:
            clamping = False
            expect[r.source] = None  # fill later with the final L/V
    for r in items:
        if expect[r.source] is None:
            expect[r.source] = (left * r.weight) // wleft
    for r in rows:
        assert r.alloc_tokens == expect[r.source], r.source


def test_scd2_intervals_tile_the_timeline(spark, sf_dir):
    """SCD2 invariants: per user exactly one open (is_current)
    interval; intervals chain (valid_to == next valid_from) with no
    gaps or overlaps; interval event counts sum to the user's event
    count; adjacent intervals change type."""
    rows = QUERIES["cdc_scd2_intervals"].fn(spark, sf_dir).collect()
    ev_counts = {
        r.user_id: r.n
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert set(by_user) == set(ev_counts)
    for uid, ivs in by_user.items():
        ivs = sorted(ivs, key=lambda r: r.valid_from)
        assert sum(i.n_events for i in ivs) == ev_counts[uid]
        assert sum(1 for i in ivs if i.is_current) == 1
        assert ivs[-1].is_current and ivs[-1].valid_to is None
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from
            assert a.event_type != b.event_type


def test_merge_upsert_reconciles(spark, sf_dir):
    """MERGE invariants: upserted count equals the batch size; total
    row count equals base + new-key inserts; new keys move max_key
    beyond the base key range."""
    rows = QUERIES["cdc_merge_upsert"].fn(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    n_base = orders.count()
    batch = orders.where((F.col("o_orderkey") % 10) == 3)
    n_batch = batch.count()
    n_new = batch.where((F.col("o_orderkey") % 100) == 33).count()
    assert sum(r.n_upserted for r in rows) == n_batch
    assert sum(r.n_rows for r in rows) == n_base + n_new
    if n_new:
        assert max(r.max_key for r in rows) >= 1000000000


def test_mv_incremental_always_matches(spark, sf_dir):
    """The incremental combine must equal the full recompute for every
    group — the boolean the oracle asserts TRUE, re-checked here."""
    rows = QUERIES["mv_incremental_refresh"].fn(spark, sf_dir).collect()
    assert rows and all(r.incremental_matches for r in rows)
    n = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == n


def test_incremental_components_adoption_policy(spark, sf_dir):
    """Every batch doc gets one row; matched docs carry ≥1 store
    neighbor and adopt the MIN of their neighbors' store labels
    (neighbor's own id when it is an edge-less singleton); unmatched
    docs found their own component."""
    rows = {
        r.doc_id: r
        for r in QUERIES["dedup_incremental_components"].fn(spark, sf_dir).collect()
    }
    n_batch = (
        load_table(spark, sf_dir, "documents")
        .where((F.col("doc_id") % 5) == 2)
        .count()
    )
    assert len(rows) == n_batch
    pairs = QUERIES["dedup_incremental_minhash"].fn(spark, sf_dir).collect()
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_quality import (
        min_label_components,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_dedup import (
        minhash_verified_pairs,
    )

    sp = minhash_verified_pairs(spark, sf_dir).where(
        ((F.col("doc_a") % 5) != 2) & ((F.col("doc_b") % 5) != 2)
    ).select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    labels = {r.u: r.lbl for r in min_label_components(sp).collect()}
    neighbors: dict[int, list[int]] = {}
    for p in pairs:
        neighbors.setdefault(p.new_doc, []).append(p.dup_of)
    for doc_id, r in rows.items():
        ns = neighbors.get(doc_id, [])
        assert r.n_store_neighbors == len(ns)
        assert r.matched == bool(ns)
        if ns:
            assert r.component_id == min(labels.get(n, n) for n in ns)
        else:
            assert r.component_id == doc_id


def test_anomaly_contribution_reconciles_with_dod(spark, sf_dir):
    """Per day: segment deltas sum to total_delta, abs shares sum to
    ~1 when movement exists, and impact ranks are dense from 1."""
    rows = QUERIES["events_anomaly_contribution"].fn(spark, sf_dir).collect()
    assert rows
    by_day: dict[str, list] = {}
    for r in rows:
        by_day.setdefault(r.day, []).append(r)
    for day, rs in by_day.items():
        assert sum(r.delta for r in rs) == rs[0].total_delta
        ranks = sorted(r.impact_rank for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        if any(r.delta != 0 for r in rs):
            assert abs(sum(r.abs_share for r in rs) - 1.0) < 0.01


def test_epoch_schedule_decorrelated_and_consistent(spark, sf_dir):
    """Each epoch covers every doc once with the SAME bucket as the
    single-epoch curriculum; within-bucket orders differ between
    epochs (salted keys decorrelate)."""
    rows = QUERIES["corpus_epoch_schedule"].fn(spark, sf_dir).collect()
    cur = {
        r.doc_id: r.bucket
        for r in QUERIES["corpus_curriculum_order"].fn(spark, sf_dir).collect()
    }
    n_docs = len(cur)
    by_epoch: dict[int, dict[int, tuple]] = {}
    for r in rows:
        assert cur[r.doc_id] == r.bucket  # curriculum is epoch-stable
        by_epoch.setdefault(r.epoch, {})[r.doc_id] = (r.shard, r.pos_in_shard)
    assert set(by_epoch) == {0, 1, 2}
    for e, m in by_epoch.items():
        assert len(m) == n_docs
    # decorrelation: epoch 0 and 1 must not share the same (shard, pos)
    # assignment for (almost) all docs
    same = sum(
        1 for d in by_epoch[0] if by_epoch[0][d] == by_epoch[1][d]
    )
    assert same < n_docs / 10


def test_streaming_quantiles_envelopes_hold(spark, sf_dir):
    """The streaming percentile_approx sketch lands inside the ±2-rank
    envelope for every (day, type) group, and exact picks are real
    data values within each group's range."""
    rows = QUERIES["streaming_window_quantiles"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.p50_within and r.p90_within
        assert r.p50_exact <= r.p90_exact or r.n_events <= 2


def test_pii_tokenization_deterministic_and_shaped(spark, sf_dir):
    """Tokens are format-preserving (email shape, 555- phone shape),
    deterministic (same value → same token on a re-run), and exactly
    the docs the injection harness marks carry them."""
    import re

    rows = QUERIES["pii_tokenize_preserving"].fn(spark, sf_dir).collect()
    rows2 = QUERIES["pii_tokenize_preserving"].fn(spark, sf_dir).collect()
    assert {(r.doc_id, r.email_token) for r in rows} == {
        (r.doc_id, r.email_token) for r in rows2
    }
    for r in rows:
        assert r.had_email == (r.doc_id % 7 == 0)
        assert r.had_phone == (r.doc_id % 7 == 0)
        if r.had_email:
            assert re.fullmatch(
                r"user[0-9a-f]{8}@redacted\.example", r.email_token
            )
            assert re.fullmatch(r"555-[0-9]{4}", r.phone_token)
        else:
            assert r.email_token is None and r.phone_token is None


def test_cosupplier_projection_symmetric_and_bounded(spark, sf_dir):
    """Projection invariants: ≤ 10 partners per supplier with dense
    ranks; weights non-increasing in rank; the relation is symmetric
    in weight (if (a,b,w) is kept for a, then w is b's weight for a
    too, whenever b also keeps a)."""
    rows = QUERIES["graph_cosupplier_projection"].fn(spark, sf_dir).collect()
    assert rows
    by_s: dict[int, list] = {}
    weights: dict[tuple[int, int], int] = {}
    for r in rows:
        by_s.setdefault(r.supplier, []).append(r)
        weights[(r.supplier, r.partner)] = r.shared_customers
    for s, rs in by_s.items():
        rs = sorted(rs, key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 10
        for a, b in zip(rs, rs[1:]):
            assert a.shared_customers >= b.shared_customers
    for (s, p), w in weights.items():
        if (p, s) in weights:
            assert weights[(p, s)] == w
