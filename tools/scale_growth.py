#!/usr/bin/env python
"""Scale-growth rehearsal for the dedup/ANN paths (VERDICT r2 #6).

Replicates the sf0.1 documents/embeddings tables at 1x/2x/4x/8x (the
judged question is the trend, not one point), runs the four scale-
critical operators at each size, and fits the log-log growth exponent
of wall time plus the blocking-structure invariants that must stay
bounded for the 100 TB story to hold:

- dedup_minhash_lsh        — band-bucket max size, candidate-pair count
- dedup_simhash_pairs      — band-bucket max size, candidate-pair count
- similarity_ann_lsh       — LSH bits derived from n (bucket selectivity)
- similarity_ivf_topk      — quantizer k derived from n (list size n/k)
- dedup_semantic_clusters  — max cluster size (k ~ sqrt(n) seeds)
- retrieval_bm25_topk      — hot-term posting length (skew ×k, not dense)
- graph_pagerank_orders    — edge count (disjoint graph copies, linear)
- dedup_incremental_minhash — FIXED-batch candidate count flat in corpus
- corpus_global_shuffle    — max shard size within n/shards concentration
- text_ngram_novelty       — wall linear in shingles (inverted-index shape)
- corpus_temperature_resample — kept rows sub-linear (sqrt-quota damping)
- sketch_bloom_prefilter   — broadcast filter state capped at k*m rows

Replica construction keeps the corpus REALISTIC without inflating the
near-dup structure quadratically: replica r>0 of a document carries the
same token multiset in a deterministic md5-shuffled order (3-gram
shingles change, so replicas are NOT near-dups of each other), and
replica embeddings are fresh seeded Gaussians in the same dimension.
A corpus scaled by copying rows verbatim would measure K^2 growth by
construction — that would be a bug in the harness, not the operator.

Writes SCALE_GROWTH.md at the repo root and exits non-zero if any wall
exponent is super-linear past the tolerance (alpha > 1.35) or a
blocking invariant degrades super-linearly.

    python tools/scale_growth.py [--scales 1,2,4,8]
"""

from __future__ import annotations

import argparse
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

BASE_SF = "/root/testdata/sf0.1"
WORK = "/tmp/scale_growth"
QUERIES_UNDER_TEST = [
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "similarity_ann_lsh",
    "similarity_ivf_topk",
    # round-3 families (VERDICT r3 #6)
    "dedup_semantic_clusters",
    "retrieval_bm25_topk",
    "graph_pagerank_orders",
    # round-5 headline families (VERDICT r5 #4)
    "sketch_bitmap_exact_distinct",
    "corpus_embedding_decontaminate",
    # round-6 headline families (VERDICT r6 #3)
    "dedup_incremental_minhash",
    "corpus_global_shuffle",
    # round-7 families (inverted-index novelty; sqrt-quota resample)
    "text_ngram_novelty",
    "corpus_temperature_resample",
    # round-7 second batch (ROADMAP backlog): span rewrite is the
    # explode→mask shape (linear in tokens); curriculum's only
    # non-partitioned step is the value-bounded histogram; covariance
    # is d²-per-row constant work with a d²-group aggregate.
    "dedup_span_remediate",
    "corpus_curriculum_order",
    "embedding_covariance_whitening",
    # round-7 second batch, events families: session packing is the
    # two-pass cumsum over sessions, SCD2 the gaps-and-islands
    # interval build, contribution the dimension-grid decomposition —
    # all should be linear in the event stream.
    "corpus_session_pack_shards",
    "cdc_scd2_intervals",
    "events_anomaly_contribution",
    # round-8: the profiler is one partial-agg shuffle over the key —
    # must stay linear in events no matter how hot the keys are (the
    # map-side combine is the whole point).
    "skew_shuffle_profile",
    # round-8: overlap join — candidate pairs are per-bucket products,
    # the one intrinsically super-linear family; the rehearsal bounds
    # how fast that grows on the replicated corpus.
    "join_interval_overlap",
    # round-8: the KS supremum runs a per-type window over the VALUE
    # grain — distinct values grow with the corpus, so the window input
    # must stay linear (the exact-order-statistics trade).
    "quality_ks_drift",
    # round-9: containment reuses the banded MinHash candidates — its
    # wall must track dedup_minhash_lsh's (same candidate growth, the
    # blocking invariants already bound the bucket join); the join-key
    # profile is two partial-agg shuffles + a key-grain join and must
    # stay linear however hot the users get.
    "dedup_shingle_containment",
    "skew_join_key_profile",
    # round-9 late batch: the orientation comparison row quantifies the
    # wedge-join work bound; on the disjoint replica graph edges grow
    # x k, so wall and both wedge totals must stay linear, with the
    # provable outdeg² <= 2|E| orientation gate blocked below (the
    # wedge-work comparison itself is reported, not gated).
    "graph_triangle_orientation_stats",
    # round-10: Jaccard similarity shares the capped pair expansion the
    # orientation gate already bounds — its wall must track the same
    # linear edge growth; the Gini rank window is partitioned by type
    # over the per-user counts, so wall must stay linear however many
    # users a type accumulates.
    "graph_jaccard_similarity",
    "events_gini_concentration",
    # round-11 (VERDICT r10 #7b): the yield report runs one
    # cluster-grain + one size-grain aggregate ON TOP of the banded
    # MinHash component labels, so its wall must track
    # dedup_minhash_lsh's; its growth surface is the report state —
    # the cluster-size histogram support — which must stay
    # metadata-scale (replicas are NOT near-dups of each other, so
    # scaling multiplies cluster COUNTS, not sizes).
    "corpus_dedup_yield_report",
    # round-11: k-means assignments are map-only projections against
    # k*d literal centroids and the update is a (k*d)-key integer
    # aggregate — state is constant by construction, so wall must
    # stay linear in vectors however the corpus grows.
    "embedding_kmeans_lloyd",
    # round-12: DiD is one user-period aggregate + an 8-count
    # reduction (linear in events); Theil is two co-keyed aggregates
    # + a broadcast totals pass (linear in orders); Adamic–Adar
    # shares the capped pair expansion the orientation gate already
    # bounds (weights are per-customer constants riding the same
    # expansion); the lateral recent-avg is one WindowGroupLimit
    # shuffle over the semi-pruned orders.
    "events_did_estimator",
    "agg_theil_decomposition",
    "graph_adamic_adar",
    "join_lateral_recent_avg",
    # round-12 second batch: Theil L and resource-allocation share
    # the T / Adamic–Adar shapes exactly (same base relations, new
    # term expressions); power/MDE is the z-test's one-pass user
    # aggregate; the bootstrap is one (variant, b)-keyed integer
    # aggregate over the ×39-replicated USER grain — linear in users
    # with a constant replicate factor, state 2·B counters/variant.
    "agg_theil_l_decomposition",
    "graph_resource_allocation",
    "events_power_mde",
    "events_bootstrap_rate_ci",
    # round-12 third batch: SRM shares power_mde's one-pass user
    # aggregate exactly; CUPED is the DiD shape (midpoint reduction +
    # one user-grain aggregate + a 12-sum single-row reduction).
    "events_srm_check",
    "events_cuped_adjustment",
    # round-13: mSPRT is two day-grain aggregates + days² lambda folds
    # on a calendar-bounded array (the replicas multiply users, not
    # days, so the fold state is CONSTANT and wall must stay linear in
    # events); QTE/winsorized share the per-user spend aggregate +
    # the bucket-rank two-pass (pass-1 state ≤ 2·4096 buckets by
    # construction, pass-2 windows rank only target buckets);
    # Atkinson shares the Theil L shape exactly; preferential
    # attachment shares the capped pair expansion + the
    # supplier-dimension degree join the Jaccard gate already bounds.
    "events_msprt_always_valid",
    "events_quantile_treatment_effect",
    "events_winsorized_lift",
    "agg_atkinson_index",
    "graph_preferential_attachment",
    # round-13 second batch: Mann–Whitney shares the spend base + the
    # bucket-prefix machinery (pass-1 state ≤ 4096 buckets, pass-2
    # rng-partitioned windows over one bucket's distinct values);
    # the stratified lift is one user-grain + one 5-stratum aggregate.
    "events_mannwhitney_u",
    "events_stratified_lift",
    # round-13 third batch: the placebo is the DiD shape exactly
    # (one pre-period-pruned user-half-period aggregate + an 8-count
    # reduction).
    "events_did_placebo_pretrends",
    # round-13 fourth batch: the confidence sequence shares the mSPRT
    # shape exactly (same day-increment aggregate + one prefix fold);
    # the chi2 audit is one event-grain cell aggregate + two
    # dimension-grain margins + a single-row integer reduction.
    "events_confidence_sequence",
    "events_split_behavior_chi2",
    # round-13 fifth batch: the ratio z is ONE user-grain aggregate +
    # a 12-sum reduction (linear in events); the log-rank shares the
    # survival_km shape (user-keyed aggregates + join, time-grain
    # cells, days-squared folds on a calendar-bounded array).
    "events_ratio_metric_ztest",
    "events_logrank_test",
    # round-13 sixth batch: the horizon ladder is ONE user-grain
    # aggregate (horizons are extra columns, unpivot on the single
    # row); the HTE drill-down reuses the stratified estimator shape
    # (two aggregates) with per-row scalar z.
    "events_conversion_horizon_lift",
    "events_segment_lift_hte",
    # round-14: Hoover shares the Theil base exactly (one extra
    # broadcast-totals term pass); Lorenz runs the shared
    # bucket_prefix_cells kernel (pass-1 state ≤ 4096 buckets,
    # pass-2 windows only the ≤ 9 boundary buckets); Qini is the
    # same kernel with a four-cell vector over the user grain; the
    # range search is ONE corpus scan against a ~64-row broadcast
    # probe relation whose mod ladder keeps probe count constant —
    # wall must stay linear in vectors; assortativity shares the
    # capped pair expansion + degree join the Jaccard gate bounds;
    # OBF shares the mSPRT day-cell shape (constant fold state);
    # HHI is the unigram-entropy shape minus the broadcast-back
    # join; the Benford gate is one 9-group digit aggregate; the WAV
    # audit is two mapInPandas passes over one checkpointed linear
    # relation.
    "agg_hoover_index",
    "agg_lorenz_deciles",
    "events_qini_uplift_deciles",
    "similarity_range_search",
    "graph_degree_assortativity",
    "events_obrien_fleming_boundary",
    "text_token_hhi",
    "dq_benford_chi2_gate",
    "multimodal_wav_audit",
    # r14 fourth batch: the concentration curve is the Lorenz plan
    # with the rank variable swapped (same kernel, same bounds); the
    # bigram entropy is the unigram-entropy shape plus one
    # pair-vocabulary-grain aggregate — linear in tokens.
    "agg_concentration_curve",
    "text_bigram_entropy_rate",
    # r15: Gopher repetition is a per-doc bigram aggregate + two
    # doc-grain dimension joins — linear in tokens with doc-bounded
    # groups; Good–Turing is the HHI shape exactly (one
    # (source, token) aggregate + a source rollup); the source JSD
    # collapses the corpus to a |sources|×20 grid in one aggregate —
    # everything after is metadata-scale; the MP4 audit is the WAV
    # audit's two-mapInPandas shape over the checkpointed container
    # relation; effective-dim shares the whitening Gramian kernel
    # (2080-key metadata merge + one reduction).
    "text_gopher_repetition",
    "text_good_turing_unseen",
    "quality_source_jsd",
    "multimodal_mp4_audit",
    "embedding_effective_dim",
    # r16: the contamination evaluator is the decontamination
    # inverted-index semi-overlap restricted to a CONSTANT 20-doc
    # probe set — the eval index grows with the eval split (fixed
    # cutoff, so fixed here) and the probe side is top-k-bounded, so
    # the only corpus-scale work is the dual-scored projection the
    # NDCG family already measures. Anisotropy is one linear scan
    # folding to 64 per-dim sums + two scalars — the sum-vector
    # identity replaces the n² pairwise mean entirely.
    "retrieval_contamination_eval",
    "embedding_anisotropy",
    # burstiness: one (doc, token) aggregate + one vocabulary-grain
    # aggregate (the tf-idf shape); AMS: one 63-integer map-side fold
    # over the stream + the same vocabulary-grain exact reference.
    "text_term_burstiness",
    "sketch_ams_f2",
    # RAKE: positional explode (linear in tokens) + a doc-PARTITIONED
    # phrase window + vocabulary/phrase-grain aggregates.
    "text_rake_keywords",
    # HT audit: one broadcast stats row + per-row keep/term expressions
    # + one integer sum (the weighted-sample shape plus an estimate).
    "corpus_ht_token_estimate",
    # TextRank: map-side pair expansion (linear in tokens) + Pregel
    # iterations over the vocabulary-bounded weighted word graph.
    "text_textrank_keywords",
    # Heaps: one exploded token pass + vocab/shingle first-seen
    # aggregates folding to a <= 64-row dyadic grid; the fits are
    # 1-row DECIMAL aggregates — everything past the first
    # aggregates is metadata-scale.
    "text_heaps_law",
    # DSIR: one exploded pass to (doc, bucket), a fixed-1024-bucket
    # model aggregate broadcast back, exact per-doc sums, top-50
    # TakeOrdered — model size fixed at any corpus size.
    "corpus_dsir_importance",
]
ALPHA_TOL = 1.35  # near-linear bar for wall-clock growth
INCR_FLAT_TOL = 0.5  # fixed-batch incremental-dedup flatness bar
# Per-query wall bars where the WORK is intentionally super-linear in
# this rehearsal's densified corpus: the overlap join's output is the
# overlap-pair set, which grows ~k² when k user populations share one
# time window. Its real invariant is proportionality (see
# overlap_bucket_cands in _blocking_metrics), not linear wall.
ALPHA_TOL_OVERRIDES = {"join_interval_overlap": 2.35}


def _shuffled_text(text: str, doc_id: int, replica: int) -> str:
    """Deterministic md5-keyed word shuffle: same token multiset, new
    3-gram shingles — a realistic 'different document', not a near-dup."""
    import hashlib

    toks = text.split()
    keyed = sorted(
        (hashlib.md5(f"{doc_id}|{replica}|{i}".encode()).hexdigest(), t)
        for i, t in enumerate(toks)
    )
    return " ".join(t for _, t in keyed)


def build_scaled_dir(k: int) -> str:
    out = os.path.join(WORK, f"x{k}")
    if os.path.isdir(out):
        return out
    os.makedirs(out, exist_ok=True)
    # documents: replica 0 verbatim, replicas 1..k-1 shuffled
    docs = pq.read_table(os.path.join(BASE_SF, "documents.parquet")).to_pandas()
    n_docs = len(docs)
    frames = [docs]
    for r in range(1, k):
        rep = docs.copy()
        rep["doc_id"] = rep["doc_id"] + r * n_docs
        rep["text"] = [
            _shuffled_text(t, int(d), r)
            for t, d in zip(docs["text"], docs["doc_id"])
        ]
        frames.append(rep)
    import pandas as pd

    pq.write_table(
        pa.Table.from_pandas(pd.concat(frames, ignore_index=True), preserve_index=False),
        os.path.join(out, "documents.parquet"),
    )
    # embeddings: replica 0 verbatim, replicas 1..k-1 fresh seeded Gaussians
    emb = pq.read_table(os.path.join(BASE_SF, "embeddings.parquet")).to_pandas()
    n_vec, dim = len(emb), len(emb["embedding"].iloc[0])
    eframes = [emb]
    for r in range(1, k):
        rng = np.random.RandomState(1000 + r)
        rep = emb.copy()
        rep["vec_id"] = rep["vec_id"] + r * n_vec
        rep["embedding"] = [
            rng.normal(size=dim).astype(np.float32) for _ in range(n_vec)
        ]
        eframes.append(rep)
    etab = pa.Table.from_pandas(pd.concat(eframes, ignore_index=True), preserve_index=False)
    # keep the float32 list element type of the source table
    etab = etab.cast(pq.read_schema(os.path.join(BASE_SF, "embeddings.parquet")))
    pq.write_table(etab, os.path.join(out, "embeddings.parquet"))
    # orders/lineitem: k disjoint copies of the customer↔supplier
    # bipartite graph (keys shifted per replica) so PageRank's edge set
    # grows linearly with scale — structure ×k, never densified.
    orders = pq.read_table(os.path.join(BASE_SF, "orders.parquet")).to_pandas()
    li = pq.read_table(os.path.join(BASE_SF, "lineitem.parquet")).to_pandas()
    cust = pq.read_table(os.path.join(BASE_SF, "customer.parquet")).to_pandas()
    ok_off = int(orders["o_orderkey"].max()) + 1
    # custkey offset spans BOTH tables so replica r's customers can
    # never collide with replica r+1's orders (customers without
    # orders can carry keys past max(o_custkey))
    ck_off = max(int(orders["o_custkey"].max()), int(cust["c_custkey"].max())) + 1
    sk_off = int(li["l_suppkey"].max()) + 1
    oframes, lframes = [orders], [li]
    for r in range(1, k):
        orep = orders.copy()
        orep["o_orderkey"] = orep["o_orderkey"] + r * ok_off
        orep["o_custkey"] = orep["o_custkey"] + r * ck_off
        oframes.append(orep)
        lrep = li.copy()
        lrep["l_orderkey"] = lrep["l_orderkey"] + r * ok_off
        lrep["l_suppkey"] = lrep["l_suppkey"] + r * sk_off
        lframes.append(lrep)
    # customer: replicated with the SAME custkey offset as orders so
    # the customer-joined families (Theil decomposition, the lateral
    # recent-avg) see their join populations actually grow — an
    # unscaled symlinked customer would silently drop every replica
    # row at the inner join and the rehearsal would measure a
    # constant-n query behind a growing scan (r12).
    cframes = [cust]
    for r in range(1, k):
        crep = cust.copy()
        crep["c_custkey"] = crep["c_custkey"] + r * ck_off
        cframes.append(crep)
    for name, frames, src in (
        ("orders", oframes, "orders.parquet"),
        ("lineitem", lframes, "lineitem.parquet"),
        ("customer", cframes, "customer.parquet"),
    ):
        tab = pa.Table.from_pandas(
            pd.concat(frames, ignore_index=True), preserve_index=False
        ).cast(pq.read_schema(os.path.join(BASE_SF, src)))
        pq.write_table(tab, os.path.join(out, f"{name}.parquet"))
    # events: k disjoint user populations (user_id/event_id shifted per
    # replica, timestamps unchanged) — bitmap distinct-state grows with
    # TRUE cardinality by design, so the rehearsal must actually grow
    # the cardinality, not replay the same users (VERDICT r5 #4).
    ev = pq.read_table(os.path.join(BASE_SF, "events.parquet")).to_pandas()
    eid_off = int(ev["event_id"].max()) + 1
    # advance replica user populations by WHOLE 32768-wide bitmap
    # buckets: a small +max_user offset would park every replica in
    # bucket 0 and the bucket-count invariant could not observe the
    # cardinality growth
    uid_off = ((int(ev["user_id"].max()) // 32768) + 1) * 32768
    evframes = [ev]
    for r in range(1, k):
        erep = ev.copy()
        erep["event_id"] = erep["event_id"] + r * eid_off
        erep["user_id"] = erep["user_id"] + r * uid_off
        evframes.append(erep)
    etab2 = pa.Table.from_pandas(
        pd.concat(evframes, ignore_index=True), preserve_index=False
    ).cast(pq.read_schema(os.path.join(BASE_SF, "events.parquet")))
    pq.write_table(etab2, os.path.join(out, "events.parquet"))
    # remaining tables: symlink the sf0.1 originals (unused by the
    # operators under test but required by load_table's catalog)
    for t in os.listdir(BASE_SF):
        dst = os.path.join(out, t)
        if not os.path.exists(dst):
            os.symlink(os.path.join(BASE_SF, t), dst)
    return out


def _blocking_metrics(spark, sf_dir: str) -> dict[str, float]:
    """Band-bucket maxima and candidate-pair counts for the two dedup
    LSH paths — the invariants that must stay bounded per bucket."""
    from pyspark.sql import functions as F

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark import (
        queries_dedup as D,
    )

    out: dict[str, float] = {}
    docs = D._docs(spark, sf_dir)
    sh = D.cached_shingles(spark, sf_dir)
    sizes = D.minhash_band_keys(sh).groupBy("band_idx", "band_val").count()
    out["minhash_max_bucket"] = sizes.agg(F.max("count")).first()[0]
    out["minhash_cand_pairs"] = (
        sizes.select((F.col("count") * (F.col("count") - 1) / 2).alias("p"))
        .agg(F.sum("p"))
        .first()[0]
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        table_rows,
    )

    sig = D._doc_simhash(docs, sh)
    bx = D.simhash_band_keys(sig, table_rows(sf_dir, "documents"))
    sizes = bx.groupBy("band_idx", "band_val").count()
    out["simhash_max_bucket"] = sizes.agg(F.max("count")).first()[0]
    out["simhash_cand_pairs"] = (
        sizes.select((F.col("count") * (F.col("count") - 1) / 2).alias("p"))
        .agg(F.sum("p"))
        .first()[0]
    )

    # round-3 families (VERDICT r3 #6):
    # semantic dedup: k ~ sqrt(n) seeds → max cluster should grow ~sqrt(n),
    # never absorb the corpus (a degenerate all-in-one cluster would make
    # the representative-join quadratic-ish in practice).
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
        QUERIES,
    )

    spark_df = QUERIES["dedup_semantic_clusters"].fn(spark, sf_dir)
    out["semantic_max_cluster"] = spark_df.agg(F.max("n_members")).first()[0]
    # BM25 / inverted index: the hot-term posting (max docs per term) must
    # grow ~linearly with the corpus (skew ×k, never densified).
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        text as X,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(X.tokens()).alias("token")
    )
    out["bm25_max_posting"] = (
        toks.groupBy("token")
        .agg(F.countDistinct("doc_id").alias("df"))
        .agg(F.max("df"))
        .first()[0]
    )
    # PageRank: edge count must be linear in scale (disjoint graph copies).
    eb = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey", "l_suppkey")
        .distinct()
    )
    out["pagerank_edges"] = eb.count() * 2  # both directions

    # round-5 families (VERDICT r5 #4):
    # bitmap exact-distinct: the daily (type, day, bucket) tier is the
    # materialized state — its row count must grow LINEARLY with true
    # cardinality (new users land in new 32768-wide buckets), while the
    # per-type merge output stays metadata-scale. Documented, not
    # capped: linear state is the advertised exact-distinct trade.
    ev = load_table(spark, sf_dir, "events")
    out["bitmap_daily_buckets"] = (
        ev.groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.bitmap_bucket_number(F.col("user_id")).alias("bucket"),
        )
        .count()
        .count()
    )
    # the true bitmap state size: total set bits across the merged
    # per-type tier == total distinct users summed over types
    out["bitmap_set_bits"] = (
        QUERIES["sketch_bitmap_exact_distinct"]
        .fn(spark, sf_dir)
        .agg(F.sum("n_distinct_users"))
        .first()[0]
    )
    # embedding decontamination: the broadcast eval side must stay FLAT
    # as the train corpus scales (it is the vec_id < N_QUERIES prefix,
    # fixed by the query-set convention) — wall-time linearity in the
    # corpus is covered by the main alpha table.
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_similarity import (
        _N_QUERIES,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    out["decon_eval_rows"] = emb.filter(
        F.col("vec_id") < _N_QUERIES
    ).count()

    # round-6 families (VERDICT r6 #3):
    # incremental minhash: the whole 100 TB claim is that per-batch
    # cost is O(batch × bands + candidates), FLAT in corpus size. The
    # registered query's batch is a fixed FRACTION of the corpus (so
    # its wall alpha tracks the corpus), which cannot observe that —
    # here we probe the growing band index with the FIXED x1 batch
    # (replica-0 doc_ids only) and require its candidate count to stay
    # ~flat as the indexed corpus scales 1x→8x.
    n_base = table_rows(BASE_SF, "documents")
    is_batch = (F.col("doc_id") % D._INCR_BATCH_MOD) == D._INCR_BATCH_REM
    bands_all = D.minhash_band_keys(sh)
    fixed_new = bands_all.filter(is_batch & (F.col("doc_id") < n_base)).alias("a")
    idx = bands_all.filter(~is_batch).alias("b")
    out["incr_fixed_batch_cands"] = (
        fixed_new.join(
            idx,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val")),
        )
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    # global shuffle: the 256-way partitioned rank only avoids the
    # single-task global row_number if the md5 shard byte balances —
    # record the max shard size and the doc count; main() asserts the
    # concentration bound max <= mean + 5*sqrt(mean) + 5 per scale.
    gs = QUERIES["corpus_global_shuffle"].fn(spark, sf_dir)
    mx, total = (
        gs.groupBy("shard")
        .count()
        .agg(F.max("count"), F.sum("count"))
        .first()
    )
    out["shuffle_max_shard"] = mx
    out["shuffle_n_docs"] = total

    # round-7 families:
    # Bloom prefilter: the broadcast filter state is the distinct
    # (table, position) set — structurally capped at k*m rows no
    # matter how many members the corpus accumulates. main() asserts
    # the cap; the x1→x8 trend shows saturation, not growth.
    from functools import reduce

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_sketch import (
        _BLOOM_HASHES,
        _BLOOM_MEMBER_MIN_PRICE,
        _BLOOM_NIBBLES,
        bloom_pos,  # the ONE position definition the query itself uses
    )

    member_keys = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_totalprice") > _BLOOM_MEMBER_MIN_PRICE)
        .select("o_custkey")
    )
    out["bloom_filter_rows"] = (
        reduce(
            lambda a, b: a.unionAll(b),
            [
                member_keys.select(
                    F.lit(i).alias("i"),
                    bloom_pos(i, F.col("o_custkey")).alias("pos"),
                )
                for i in range(_BLOOM_HASHES)
            ],
        )
        .distinct()
        .count()
    )
    out["bloom_filter_cap"] = _BLOOM_HASHES * 16**_BLOOM_NIBBLES
    # sqrt-temperature resample: kept rows grow ~sqrt(corpus) per
    # source (alpha ~0.5) — the whole point of temperature smoothing
    # is that head-domain growth is damped, so the kept set must grow
    # SUB-linearly.
    out["temperature_kept_rows"] = (
        QUERIES["corpus_temperature_resample"].fn(spark, sf_dir).count()
    )
    # round-7 second batch:
    # curriculum ordering: the single-partition histogram window that
    # PLANS.md waives is bounded by the VALUE domain — count the
    # distinct floor(score·10⁴) values and assert the ≤ 10001 cap at
    # every scale (saturating, like the bloom state, never growing
    # with the corpus).
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        text as X,
    )

    out["curriculum_hist_values"] = (
        load_table(spark, sf_dir, "documents")
        .select(
            F.floor(X.quality_score() * 10000.0).cast("bigint").alias("q")
        )
        .distinct()
        .count()
    )
    out["curriculum_hist_cap"] = 10001
    # covariance/whitening: the aggregate output is d(d+1)/2 rows —
    # metadata-scale, FLAT in the corpus (the driver-side eigen step
    # depends only on d).
    out["whitening_pair_rows"] = (
        QUERIES["embedding_covariance_whitening"].fn(spark, sf_dir).count()
    )
    # round-8: interval-overlap join. The rehearsal DENSIFIES the time
    # axis (k replica user populations, timestamps unchanged), so the
    # TRUE overlap-pair count grows ~k² — quadratic wall is the work
    # being asked for, not a plan defect. The invariant is
    # PROPORTIONALITY: the bucket join's candidate rows must track the
    # true pair count's growth (bucketing adds a bounded constant
    # factor, no extra asymptotics). main() asserts
    # cand_alpha <= true_alpha + 0.35 and overrides the wall bar.
    out["overlap_true_pairs"] = (
        QUERIES["join_interval_overlap"]
        .fn(spark, sf_dir)
        .agg(F.sum("n_concurrent"))
        .first()[0]
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_joins_ext import (
        _OVL_BUCKET_US,
        _OVL_GAP_US,
    )
    from pyspark.sql import Window as _W

    uw = _W.partitionBy("user_id").orderBy("ts", "event_id")
    sess_b = (
        ev.select(
            "user_id", "ts", "event_id",
            F.lag("ts").over(uw).alias("prev_ts"),
        )
        .withColumn(
            "new_s",
            F.when(
                F.col("prev_ts").isNull()
                | (
                    F.unix_micros("ts") - F.unix_micros("prev_ts")
                    >= _OVL_GAP_US
                ),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sid",
            F.sum("new_s").over(
                uw.rowsBetween(_W.unboundedPreceding, _W.currentRow)
            ),
        )
        .groupBy("user_id", "sid")
        .agg(
            F.unix_micros(F.min("ts")).alias("s"),
            F.unix_micros(F.max("ts")).alias("e"),
        )
        .select(
            F.explode(
                F.sequence(
                    F.expr(f"s div {_OVL_BUCKET_US}"),
                    F.expr(f"e div {_OVL_BUCKET_US}"),
                )
            ).alias("b")
        )
    )
    out["overlap_bucket_cands"] = (
        sess_b.groupBy("b")
        .count()
        .select((F.col("count") * (F.col("count") - 1) / 2).alias("p"))
        .agg(F.sum("p"))
        .first()[0]
    )

    # round-9 late batch: triangle orientation — record both wedge
    # totals (REPORTED comparison; "degree never exceeds key" is NOT a
    # theorem — r9 review found a counter-example graph) and the
    # quantities for the gate that IS a theorem on any graph: in the
    # (deg, id) orientation every out-neighbor of v has degree >=
    # outdeg(v), so outdeg(v)^2 <= Σ degrees = 2|E|. main() blocks on
    # that bound; the wall alpha table covers linearity.
    tri = QUERIES["graph_triangle_orientation_stats"].fn(spark, sf_dir).first()
    out["tri_wedges_key"] = tri["wedges_key"]
    out["tri_wedges_degree"] = tri["wedges_degree"]
    out["tri_edges"] = tri["n_edges"]
    out["tri_max_outdeg_degree"] = tri["max_outdeg_degree"]

    # round-11: dedup yield report — the histogram support (distinct
    # cluster sizes = the report's row count) is the state a curator
    # dashboard holds; it must saturate, never track the corpus
    # (cluster COUNTS scale, cluster SIZES don't, because replicas are
    # not near-dups of each other by construction). main() gates its
    # growth exponent.
    out["yield_hist_rows"] = (
        QUERIES["corpus_dedup_yield_report"].fn(spark, sf_dir).count()
    )
    return out


def fit_alpha(scales: list[int], times: list[float]) -> float:
    """Least-squares slope of log(time) on log(scale)."""
    xs = [math.log(s) for s in scales]
    ys = [math.log(max(t, 1e-3)) for t in times]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    denom = sum((x - mx) ** 2 for x in xs)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,2,4,8")
    ap.add_argument("--fresh", action="store_true", help="rebuild scaled dirs")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    if args.fresh and os.path.isdir(WORK):
        shutil.rmtree(WORK)

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
        QUERIES,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.session import (
        get_spark,
    )

    spark = get_spark(app_name="scale-growth")
    wall: dict[str, list[float]] = {q: [] for q in QUERIES_UNDER_TEST}
    rows: dict[str, list[int]] = {q: [] for q in QUERIES_UNDER_TEST}
    blocking: list[dict[str, float]] = []
    for k in scales:
        sf_dir = build_scaled_dir(k)
        # fresh shingle cache per scale dir is handled by cached_shingles
        # keying on sf_dir; warm the parquet scan once
        for q in QUERIES_UNDER_TEST:
            fn = QUERIES[q].fn
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            wall[q].append(round(time.perf_counter() - t0, 3))
            rows[q].append(n)
        blocking.append(_blocking_metrics(spark, sf_dir))
        print(f"x{k}: " + ", ".join(f"{q}={wall[q][-1]}s" for q in QUERIES_UNDER_TEST),
              flush=True)
    spark.stop()

    alphas = {q: round(fit_alpha(scales, wall[q]), 2) for q in QUERIES_UNDER_TEST}
    wall_ok = all(
        a <= ALPHA_TOL_OVERRIDES.get(q, ALPHA_TOL) for q, a in alphas.items()
    )
    # round-8: overlap-join proportionality (work-tracking, not linear)
    ov_true_alpha = round(
        fit_alpha(
            scales, [max(b["overlap_true_pairs"], 1.0) for b in blocking]
        ),
        2,
    )
    ov_cand_alpha = round(
        fit_alpha(
            scales, [max(b["overlap_bucket_cands"], 1.0) for b in blocking]
        ),
        2,
    )
    overlap_ok = ov_cand_alpha <= ov_true_alpha + 0.35
    lines = [
        "# SCALE_GROWTH — dedup/ANN/retrieval/sketch growth rehearsal",
        "",
        "Regenerated by `tools/scale_growth.py`; the newest run wins "
        "(no round number in the title — VERDICT r5 #3 doc-drift).",
        "",
        f"Base corpus: sf0.1 ({BASE_SF}), replicated at scales "
        f"{scales} with md5-shuffled replica documents (same token "
        "multiset, new shingles — NOT near-dups) and fresh Gaussian "
        "replica embeddings. Wall seconds are warm (plan compiled, "
        "second run timed). alpha = least-squares slope of log(time) "
        "vs log(scale); 1.0 is linear.",
        "",
        "| query | " + " | ".join(f"x{k} s" for k in scales) + " | alpha | rows@x1 | rows@max |",
        "|---|" + "---|" * (len(scales) + 3),
    ]
    for q in QUERIES_UNDER_TEST:
        lines.append(
            f"| {q} | "
            + " | ".join(str(t) for t in wall[q])
            + f" | **{alphas[q]}** | {rows[q][0]} | {rows[q][-1]} |"
        )
    lines += [
        "",
        "## Blocking invariants (bounded-bucket contract)",
        "",
        "| metric | " + " | ".join(f"x{k}" for k in scales) + " |",
        "|---|" + "---|" * len(scales),
    ]
    for m in sorted(blocking[0]):
        lines.append(
            f"| {m} | " + " | ".join(str(int(b[m])) for b in blocking) + " |"
        )
    cand_alpha = {
        m: round(
            fit_alpha(scales, [max(b[m], 1.0) for b in blocking]), 2
        )
        for m in sorted(blocking[0])
        if m.endswith("cand_pairs")
    }
    # round-6 invariants (VERDICT r6 #3)
    incr_alpha = round(
        fit_alpha(scales, [max(b["incr_fixed_batch_cands"], 1.0) for b in blocking]),
        2,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_corpus import (
        _SHUFFLE_SHARDS,
    )

    shard_bounds = []
    for k, b in zip(scales, blocking):
        mean = b["shuffle_n_docs"] / _SHUFFLE_SHARDS
        bound = mean + 5 * math.sqrt(mean) + 5
        shard_bounds.append(
            (k, int(b["shuffle_max_shard"]), round(bound, 1), b["shuffle_max_shard"] <= bound)
        )
    shard_ok = all(ok for *_, ok in shard_bounds)
    # round-7 invariants
    bloom_ok = all(
        b["bloom_filter_rows"] <= b["bloom_filter_cap"] for b in blocking
    )
    # round-7 second batch invariants
    hist_ok = all(
        b["curriculum_hist_values"] <= b["curriculum_hist_cap"]
        for b in blocking
    )
    whiten_flat = len({int(b["whitening_pair_rows"]) for b in blocking}) == 1
    # round-9 late batch: the PROVABLE degree-orientation bound
    # outdeg^2 <= 2|E| (any graph); the wedge comparison is reported,
    # not gated — it is fixture-empirical, not a theorem (r9 review)
    tri_ok = all(
        b["tri_max_outdeg_degree"] ** 2 <= 2 * b["tri_edges"]
        for b in blocking
    )
    temp_alpha = round(
        fit_alpha(scales, [max(b["temperature_kept_rows"], 1.0) for b in blocking]),
        2,
    )
    TEMP_SUBLINEAR_TOL = 0.7  # kept rows must grow ~sqrt(n), well below 1
    # round-11: yield-report histogram support must saturate
    yield_alpha = round(
        fit_alpha(scales, [max(b["yield_hist_rows"], 1.0) for b in blocking]),
        2,
    )
    YIELD_SAT_TOL = 0.35  # distinct cluster sizes ~constant across scales
    lines += [
        "",
        "Candidate-pair growth exponents: "
        + ", ".join(f"{m}={a}" for m, a in cand_alpha.items())
        + " (1.0 = linear in corpus size; the all-pairs anti-pattern "
        "would be 2.0).",
        "",
        "Round-5 families (VERDICT r5 #4): the bitmap exact-distinct "
        "MATERIALIZED state grows linearly with true cardinality by "
        "design — that is the exact-distinct trade vs HLL's O(1) "
        "sketches. `bitmap_set_bits` (total set bits across the merged "
        "tier == total distinct users) is the state size; "
        "`bitmap_daily_buckets` counts the (type, day, 32768-wide "
        "bucket) tier rows, which step up as new user populations "
        "cross bucket boundaries. The per-type merge OUTPUT stays "
        "metadata-scale, and the wall alpha above shows the tier "
        "build + OR-merge stays near-linear. "
        "`decon_eval_rows` is the broadcast eval side of "
        "`corpus_embedding_decontaminate` — it must stay FLAT as the "
        "train corpus scales (one broadcast, one train pass).",
        "",
        "Round-6 families (VERDICT r6 #3): "
        f"`incr_fixed_batch_cands` probes the growing band index with "
        "the FIXED x1 ingestion batch — its growth exponent is "
        f"**{incr_alpha}** (bar {INCR_FLAT_TOL}; flat means per-batch "
        "incremental-dedup cost does not depend on corpus size, which "
        "is the operator's whole 100 TB claim — the registered query's "
        "own wall alpha tracks the corpus only because its batch is "
        "defined as a fixed fraction of it). "
        "`shuffle_max_shard` vs the concentration bound "
        "mean + 5*sqrt(mean) + 5 per scale: "
        + "; ".join(
            f"x{k} max={mx} bound={bd} {'OK' if ok else 'FAIL'}"
            for k, mx, bd, ok in shard_bounds
        )
        + f" — the {_SHUFFLE_SHARDS}-way partitioned rank stays "
        f"balanced, so no task ever sees more than ~n/{_SHUFFLE_SHARDS} "
        "rows.",
        "",
        "Round-7 families: `bloom_filter_rows` is the broadcast Bloom "
        "state (distinct (table, position) rows) — structurally capped "
        f"at k·m = {blocking[0]['bloom_filter_cap']:.0f} rows no matter "
        "how many members accumulate "
        f"({'OK' if bloom_ok else 'FAIL'}: "
        + ", ".join(
            f"x{k}={b['bloom_filter_rows']:.0f}"
            for k, b in zip(scales, blocking)
        )
        + " — saturating, not growing; at saturation the filter prunes "
        "nothing but never errors or blows memory). "
        f"`temperature_kept_rows` growth exponent **{temp_alpha}** (bar "
        f"{TEMP_SUBLINEAR_TOL}): sqrt-quota resampling must keep a "
        "SUB-linear slice of a growing corpus — that damping is the "
        "operator's purpose.",
        "",
        "Round-7 second batch: `curriculum_hist_values` is the input "
        "to the one single-partition window PLANS.md waives for "
        "corpus_curriculum_order — distinct floor(score·10⁴) values, "
        f"capped at 10001 by the value domain "
        f"({'OK' if hist_ok else 'FAIL'}: "
        + ", ".join(
            f"x{k}={b['curriculum_hist_values']:.0f}"
            for k, b in zip(scales, blocking)
        )
        + " — saturating toward the cap, never tracking the corpus). "
        "`whitening_pair_rows` is embedding_covariance_whitening's "
        "entire output — d(d+1)/2 rows, "
        f"{'FLAT' if whiten_flat else 'NOT FLAT (FAIL)'} across scales, "
        "so the driver-side eigen step stays metadata-scale.",
        "",
        "Round-8: `join_interval_overlap`'s wall bar is "
        f"{ALPHA_TOL_OVERRIDES['join_interval_overlap']} (not "
        f"{ALPHA_TOL}) BY DESIGN — the rehearsal puts k user "
        "populations in the SAME time window, so the true overlap-pair "
        f"output grows ~k² (true-pair alpha **{ov_true_alpha}**); the "
        "operator's invariant is PROPORTIONALITY: the bucket join's "
        f"candidate rows (alpha **{ov_cand_alpha}**) must track the "
        "true pairs within +0.35 — bucketing adds a bounded constant "
        "factor, never its own asymptotics "
        f"({'OK' if overlap_ok else 'FAIL'}). On real corpora the time "
        "axis grows WITH the data, keeping per-bucket occupancy — and "
        "therefore wall — near-linear.",
        "",
        "Round-9 late batch: triangle orientation. The BLOCKING gate "
        "is the theorem bound max_outdeg_degree² <= 2·|E| (every "
        "out-neighbor under the (deg, id) orientation has degree >= "
        "the out-degree, so it holds on ANY graph) "
        f"({'OK' if tri_ok else 'FAIL'}: "
        + ", ".join(
            f"x{k}={b['tri_max_outdeg_degree']:.0f}²<=2·"
            f"{b['tri_edges']:.0f}"
            for k, b in zip(scales, blocking)
        )
        + "). The wedge-work comparison `tri_wedges_degree` vs "
        "`tri_wedges_key` is REPORTED (not gated — degree orientation "
        "does not dominate on every graph, only overwhelmingly on "
        "skewed ones): "
        + ", ".join(
            f"x{k}={b['tri_wedges_degree']:.0f}/{b['tri_wedges_key']:.0f}"
            for k, b in zip(scales, blocking)
        )
        + "; on the disjoint replica graph both totals and the wall "
        "must also stay linear (alpha table above).",
        "",
        "Round-11: `yield_hist_rows` is corpus_dedup_yield_report's "
        "entire output — the cluster-size histogram support. Replicas "
        "are not near-dups of each other, so scaling multiplies "
        "cluster COUNTS while the size domain saturates; growth "
        f"exponent **{yield_alpha}** (bar {YIELD_SAT_TOL}): "
        + ", ".join(
            f"x{k}={b['yield_hist_rows']:.0f}"
            for k, b in zip(scales, blocking)
        )
        + " — the curator-dashboard state stays metadata-scale while "
        "the wall alpha above tracks the MinHash family it reuses.",
        "",
        f"Wall-clock tolerance: alpha <= {ALPHA_TOL} (sub-quadratic with "
        "headroom for fixed per-run overhead amortizing INTO the "
        "exponent at these small absolute sizes); per-query overrides: "
        f"{ALPHA_TOL_OVERRIDES}.",
        "",
        f"Verdict: {'PASS' if wall_ok and all(a <= ALPHA_TOL for a in cand_alpha.values()) and incr_alpha <= INCR_FLAT_TOL and shard_ok and bloom_ok and temp_alpha <= TEMP_SUBLINEAR_TOL and hist_ok and whiten_flat and overlap_ok and tri_ok and yield_alpha <= YIELD_SAT_TOL else 'FAIL'} "
        f"— wall alphas {alphas}, candidate alphas {cand_alpha}, "
        f"incr-fixed-batch alpha {incr_alpha}, shard balance "
        f"{'OK' if shard_ok else 'FAIL'}, bloom cap "
        f"{'OK' if bloom_ok else 'FAIL'}, temperature-kept alpha "
        f"{temp_alpha}, curriculum histogram cap "
        f"{'OK' if hist_ok else 'FAIL'}, whitening output "
        f"{'flat' if whiten_flat else 'NOT flat'}, overlap "
        f"proportionality {'OK' if overlap_ok else 'FAIL'} "
        f"(true {ov_true_alpha} / cand {ov_cand_alpha}), "
        f"yield-histogram alpha {yield_alpha}.",
    ]
    report = "\n".join(lines) + "\n"
    out_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "SCALE_GROWTH.md")
    with open(out_path, "w") as f:
        f.write(report)
    print(report)
    bad = [
        q
        for q, a in alphas.items()
        if a > ALPHA_TOL_OVERRIDES.get(q, ALPHA_TOL)
    ]
    bad += [m for m, a in cand_alpha.items() if a > ALPHA_TOL]
    if not overlap_ok:
        bad.append("overlap_bucket_cands")
    if incr_alpha > INCR_FLAT_TOL:
        bad.append("incr_fixed_batch_cands")
    if not shard_ok:
        bad.append("shuffle_max_shard")
    if not bloom_ok:
        bad.append("bloom_filter_rows")
    if temp_alpha > TEMP_SUBLINEAR_TOL:
        bad.append("temperature_kept_rows")
    if not hist_ok:
        bad.append("curriculum_hist_values")
    if not whiten_flat:
        bad.append("whitening_pair_rows")
    if not tri_ok:
        bad.append("tri_max_outdeg_degree")
    if yield_alpha > YIELD_SAT_TOL:
        bad.append("yield_hist_rows")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
