"""Invariant tests for the round-8 additions: the shuffle-skew
profiler (VERDICT r7 #5) and its closed loop into the salted
mitigations."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import QUERIES
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators.skew import (
    salted_aggregate,
    shuffle_skew_profile,
)
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_skew import (
    _SKEW_TARGET_ROWS,
    _SKEW_TOP_N,
)
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
    load_table,
)


def test_skew_profile_exact_recompute(spark, sf_dir):
    """Every profile column recomputed exactly from plain per-key
    counts: ordering (count desc, key), share, skew ratio, and the
    recommended salt = max(1, ceil(n / target))."""
    rows = QUERIES["skew_shuffle_profile"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    counts = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    total, nk = sum(counts.values()), len(counts)
    expect_order = sorted(counts, key=lambda k: (-counts[k], k))[:_SKEW_TOP_N]
    assert [r.event_type for r in rows] == expect_order
    for r in rows:
        n = counts[r.event_type]
        assert r.n_rows == n
        assert abs(r.share - n / total) < 1e-6
        assert abs(r.skew_ratio - n * nk / total) < 1e-4
        assert r.recommended_salt == max(1, math.ceil(n / _SKEW_TARGET_ROWS))


def test_skew_profile_flags_hot_keys_at_sf01(spark):
    """At sf0.1 every event_type carries ~20k rows — well above the
    target reducer input — so the profiler must recommend an actual
    split (salt ≥ 2) for every key, sized exactly ⌈n/target⌉."""
    prof = QUERIES["skew_shuffle_profile"].fn(spark, "/root/testdata/sf0.1").collect()
    assert prof, "profile is empty at sf0.1"
    for r in prof:
        assert r.n_rows > _SKEW_TARGET_ROWS
        assert r.recommended_salt == math.ceil(r.n_rows / _SKEW_TARGET_ROWS)
        assert r.recommended_salt >= 2


def test_skew_profile_closes_loop_into_salted_aggregate(spark, sf_dir):
    """The profile's recommended salt drives salted_aggregate to
    bit-identical results vs the direct groupBy — profile → mitigate
    is a semantics-preserving loop."""
    ev = load_table(spark, sf_dir, "events")
    prof = {
        r.event_type: r.recommended_salt
        for r in shuffle_skew_profile(
            ev, ["event_type"], target_rows=_SKEW_TARGET_ROWS
        ).collect()
    }
    n_salts = max(prof.values())
    salted = {
        r.event_type: (r.n_rows, round(r.sum_value, 4))
        for r in salted_aggregate(
            ev.select("event_type", F.col("value")),
            keys=["event_type"],
            sum_cols=["value"],
            spread_col="value",
            n_salts=max(2, n_salts),
        )
        .withColumnRenamed("sum_value", "sum_value")
        .collect()
    }
    plain = {
        r.event_type: (r.n, round(r.s, 4))
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert salted.keys() == plain.keys()
    for k in plain:
        assert salted[k][0] == plain[k][0]
        assert abs(salted[k][1] - plain[k][1]) < 1e-2


def test_streaming_kmv_equals_batch_sketch(spark, sf_dir):
    """The streamed bottom-k fold must equal the batch KMV sketch
    row-for-row (same kth hash, same estimate) — the KMV merge law
    applied across stream batches instead of day tiers."""
    stream = {
        r.event_type: (r.k, r.kth_hash, r.est_distinct)
        for r in QUERIES["streaming_kmv_distinct"].fn(spark, sf_dir).collect()
    }
    batch = {
        r.event_type: (r.k, r.kth_hash, r.est_distinct)
        for r in QUERIES["sketch_kmv_distinct"].fn(spark, sf_dir).collect()
    }
    assert stream == batch


def test_interval_overlap_matches_bruteforce(spark, sf_dir):
    """The bucketed overlap join must equal the O(n²) definition: for
    every session, the count of other-user sessions with
    [s,e] ∩ [s',e'] ≠ ∅ — recomputed here in pure Python. Also pins
    the exactly-once bucket trick (a pair sharing several 1 h buckets
    must not double-count)."""
    rows = QUERIES["join_interval_overlap"].fn(spark, sf_dir).collect()
    sess = [(r.user_id, r.start_us, r.end_us) for r in rows]
    expect = {}
    for u, s, e in sess:
        expect[(u, s)] = sum(
            1
            for u2, s2, e2 in sess
            if u2 != u and s2 <= e and s <= e2
        )
    assert len(rows) == len(sess)
    for r in rows:
        assert r.n_concurrent == expect[(r.user_id, r.start_us)], (
            r.user_id,
            r.start_us,
        )
    # sessions straddling a bucket boundary exist in the corpus (the
    # multi-bucket emission path — and its exactly-once guard — is
    # actually exercised)
    bucket = 3_600_000_000
    assert any(s // bucket != e // bucket for _, s, e in sess)


def test_vocab_coverage_recompute(spark, sf_dir):
    """Coverage recomputed from raw tokens with the vocabulary cut
    re-derived in Python (count desc, token asc, top V)."""
    from collections import Counter

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        text as X,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_text2 import (
        _VOCAB_V,
    )

    docs = load_table(spark, sf_dir, "documents").select("source", "text").collect()
    import re as _re

    def toks(t):
        return [w for w in _re.sub(r"[^a-z0-9]+", " ", t.lower()).strip().split(" ") if w]

    counts = Counter()
    per_source = {}
    for r in docs:
        tt = toks(r.text)
        counts.update(tt)
        per_source.setdefault(r.source, []).extend(tt)
    vocab = {
        t
        for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_VOCAB_V
        ]
    }
    rows = QUERIES["text_vocab_coverage"].fn(spark, sf_dir).collect()
    assert {r.source for r in rows} == set(per_source)
    for r in rows:
        tt = per_source[r.source]
        n_cov = sum(1 for t in tt if t in vocab)
        assert r.n_tokens == len(tt)
        assert r.n_covered == n_cov
        assert abs(r.coverage - n_cov / len(tt)) < 1e-6
        assert 0.0 <= r.coverage <= 1.0


def test_cross_source_matrix_accounts_for_all_pairs(spark, sf_dir):
    """Cell pair counts must sum to the verified near-dup pair total,
    and every cell's mean Jaccard must sit in [threshold, 1]."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_dedup import (
        _MINHASH_THRESHOLD,
    )

    cells = QUERIES["dedup_cross_source_matrix"].fn(spark, sf_dir).collect()
    total_pairs = QUERIES["dedup_minhash_lsh"].fn(spark, sf_dir).count()
    assert sum(r.n_pairs for r in cells) == total_pairs
    for r in cells:
        assert r.source_a <= r.source_b
        assert _MINHASH_THRESHOLD - 1e-6 <= r.mean_jaccard <= 1.0
        assert r.pairs_per_1k >= 0.0


def test_mad_outliers_exact_recompute(spark, sf_dir):
    """Median, MAD, and the outlier count recomputed exactly in Python
    under the same (value, event_id) tie-break."""
    rows = QUERIES["events_mad_outliers"].fn(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "event_id"
    ).collect()
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append((r.value, r.event_id))
    for r in rows:
        vals = sorted(by_type[r.event_type])
        n = len(vals)
        med = (vals[(n - 1) // 2][0] + vals[n // 2][0]) / 2
        devs = sorted(
            (abs(v - med), eid) for v, eid in vals
        )
        mad = (devs[(n - 1) // 2][0] + devs[n // 2][0]) / 2
        n_out = sum(1 for v, _ in vals if abs(v - med) > 3 * mad)
        assert r.n_events == n
        assert abs(r.median_value - med) < 1e-6
        assert abs(r.mad - mad) < 1e-6
        assert r.n_outliers == n_out


def test_cusum_changepoint_exact_recompute(spark, sf_dir):
    """The peak-|CUSUM| day recomputed from daily counts with exact
    integer arithmetic (n_days·cum − rank·total)."""
    rows = {
        r.event_type: r
        for r in QUERIES["events_cusum_changepoint"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).collect()
    daily = {}
    for r in ev:
        daily.setdefault(r.event_type, {}).setdefault(r.day, 0)
        daily[r.event_type][r.day] += 1
    for et, days in daily.items():
        items = sorted(days.items())
        nd, total = len(items), sum(c for _, c in items)
        cum, best = 0, None
        for rk, (day, c) in enumerate(items, start=1):
            cum += c
            s = nd * cum - rk * total
            key = (-abs(s), day)
            if best is None or key < best[0]:
                best = (key, day, s)
        r = rows[et]
        assert r.n_days == nd
        assert r.change_day == best[1]
        assert abs(r.peak_cusum - best[2] / nd) < 1e-6
        assert r.direction == (1 if best[2] >= 0 else -1)


def test_trend_slope_exact_recompute(spark, sf_dir):
    """OLS slope/intercept recomputed from integer sums."""
    rows = {
        r.event_type: r
        for r in QUERIES["events_trend_slope"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).collect()
    daily = {}
    for r in ev:
        daily.setdefault(r.event_type, {}).setdefault(r.day, 0)
        daily[r.event_type][r.day] += 1
    for et, days in daily.items():
        ys = [c for _, c in sorted(days.items())]
        n = len(ys)
        xs = range(1, n + 1)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        r = rows[et]
        assert r.n_days == n
        assert abs(r.slope_per_day - num / den) < 1e-6
        assert abs(r.intercept - (sy * den - num * sx) / (n * den)) < 1e-6


def test_token_pmi_values_and_order(spark, sf_dir):
    """Reported PMI values recomputed from raw doc-frequencies; rows
    must arrive in (pmi desc, tok_a, tok_b) order with the support
    floor respected."""
    import math as m
    import re as _re
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_text2 import (
        _PMI_MIN_PAIR_DOCS,
        _PMI_VOCAB,
    )

    rows = QUERIES["text_token_pmi"].fn(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    doc_toks = {
        r.doc_id: set(
            w
            for w in _re.sub(r"[^a-z0-9]+", " ", r.text.lower()).strip().split(" ")
            if w
        )
        for r in docs
    }
    from collections import Counter

    df = Counter()
    for toks in doc_toks.values():
        df.update(toks)
    vocab = dict(
        sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:_PMI_VOCAB]
    )
    n_docs = sum(1 for t in doc_toks.values() if t) or len(doc_toks)
    n_docs = len([1 for t in doc_toks.values() if t])
    keys = [(r.pmi, r.tok_a, r.tok_b) for r in rows]
    assert keys == sorted(keys, key=lambda k: (-k[0], k[1], k[2]))
    for r in rows:
        assert r.tok_a in vocab and r.tok_b in vocab
        assert r.n_pair >= _PMI_MIN_PAIR_DOCS
        n_pair = sum(
            1
            for toks in doc_toks.values()
            if r.tok_a in toks and r.tok_b in toks
        )
        assert r.n_pair == n_pair
        expect = m.log(n_pair * n_docs / (vocab[r.tok_a] * vocab[r.tok_b]))
        assert abs(r.pmi - expect) < 1e-5


def test_triangle_count_bruteforce(spark, sf_dir):
    """Per-node triangle counts recomputed by brute force over the
    sparsified edge set (mutual-top-10 projection, undirected)."""
    from itertools import combinations

    proj = QUERIES["graph_cosupplier_projection"].fn(spark, sf_dir).collect()
    edges = {
        (min(r.supplier, r.partner), max(r.supplier, r.partner))
        for r in proj
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:
                for v in (a, b, c):
                    counts[v] = counts.get(v, 0) + 1
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    rows = QUERIES["graph_triangle_count"].fn(spark, sf_dir).collect()
    assert [(r.supplier, r.n_triangles) for r in rows] == top


def test_target_encoding_loo_is_leakage_free(spark, sf_dir):
    """LOO mean recomputed from integer cents; excluding the row's own
    value must hold exactly: mean_loo = (sum - x) / (n - 1)."""
    rows = QUERIES["features_target_encoding_loo"].fn(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey).collect()
    cents = {r.o_orderkey: round(r.o_totalprice * 100) for r in joined}
    seg_of = {r.o_orderkey: r.c_mktsegment for r in joined}
    seg_sum, seg_n = {}, {}
    for k, c in cents.items():
        s = seg_of[k]
        seg_sum[s] = seg_sum.get(s, 0) + c
        seg_n[s] = seg_n.get(s, 0) + 1
    assert len(rows) == sum(n for n in seg_n.values() if n > 1)
    for r in rows[:500]:
        s = r.segment
        expect = (seg_sum[s] - cents[r.o_orderkey]) / (seg_n[s] - 1) / 100.0
        assert abs(r.loo_target_mean - expect) < 1e-3


def test_equidepth_bins_balanced_and_ordered(spark, sf_dir):
    """Per segment: exactly 10 bins, populations differ by at most
    one, edges are ordered and non-overlapping, totals match."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_window2 import (
        _EQD_BINS,
    )

    rows = QUERIES["features_equidepth_bins"].fn(spark, sf_dir).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r.segment, []).append(r)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n_orders = orders.count()
    assert sum(r.n_rows for r in rows) == n_orders
    for seg, bins in by_seg.items():
        bins.sort(key=lambda r: r.bin)
        assert [b.bin for b in bins] == list(range(1, _EQD_BINS + 1))
        sizes = [b.n_rows for b in bins]
        assert max(sizes) - min(sizes) <= 1
        for prev, nxt in zip(bins, bins[1:]):
            assert prev.hi <= nxt.lo + 1e-9


def test_referential_integrity_clean_on_testdata(spark, sf_dir):
    """The generated star schema must be orphan-free, and the audit
    must cover every FK relation with the right child cardinalities."""
    rows = {r.relation: r for r in QUERIES["dq_referential_integrity"].fn(spark, sf_dir).collect()}
    assert len(rows) == 7
    li_n = load_table(spark, sf_dir, "lineitem").count()
    assert rows["lineitem.orderkey->orders"].n_child_rows == li_n
    for r in rows.values():
        assert r.n_orphans == 0
        assert r.orphan_rate == 0.0


def test_referential_integrity_detects_orphans(spark, sf_dir):
    """Synthetic orphan check: shifting half the child keys out of the
    parent domain must be reported (the audit is not a tautology)."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_pipeline import (
        _RI_RELATIONS,
    )

    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    max_ck = cust.agg(F.max("c_custkey")).first()[0]
    broken = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_custkey") % 2 == 0, F.col("o_custkey") + max_ck + 1)
        .otherwise(F.col("o_custkey")),
    )
    j = broken.join(
        cust.select(F.col("c_custkey").alias("_pk")).distinct(),
        broken.o_custkey == F.col("_pk"),
        "left",
    )
    n_orph = j.filter(F.col("_pk").isNull()).count()
    n_even = orders.filter(F.col("o_custkey") % 2 == 0).count()
    assert n_orph == n_even and n_orph > 0


def test_key_uniqueness_all_tables(spark, sf_dir):
    rows = {r.table_name: r for r in QUERIES["dq_key_uniqueness"].fn(spark, sf_dir).collect()}
    assert len(rows) == 8
    for t, r in rows.items():
        assert r.is_unique, t
        assert r.n_rows == r.n_distinct


def test_l_diversity_recompute(spark, sf_dir):
    rows = QUERIES["pii_l_diversity_audit"].fn(spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey", "c_acctbal"
    ).collect()
    import math as m

    grp = {}
    for c in cust:
        key = (c.c_mktsegment, c.c_nationkey)
        grp.setdefault(key, set()).add(m.floor(c.c_acctbal / 1000.0))
    n_by = {}
    for c in cust:
        key = (c.c_mktsegment, c.c_nationkey)
        n_by[key] = n_by.get(key, 0) + 1
    assert len(rows) == len(grp)
    for r in rows:
        key = (r.c_mktsegment, r.c_nationkey)
        assert r.n == n_by[key]
        assert r.l_distinct == len(grp[key])
        assert r.at_risk == (len(grp[key]) < 3)


def test_longest_streak_recompute(spark, sf_dir):
    """Streaks recomputed from raw (user, day) sets."""
    import datetime as dt

    rows = {r.user_id: r for r in QUERIES["events_longest_streak"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day")
    ).collect()
    days = {}
    for r in ev:
        days.setdefault(r.user_id, set()).add(r.day)
    for uid, ds in days.items():
        seq = sorted(dt.date.fromisoformat(d) for d in ds)
        best_len, best_start = 1, seq[0]
        run_len, run_start = 1, seq[0]
        for prev, cur in zip(seq, seq[1:]):
            if (cur - prev).days == 1:
                run_len += 1
            else:
                run_len, run_start = 1, cur
            if run_len > best_len:
                best_len, best_start = run_len, run_start
        r = rows[uid]
        assert r.n_active_days == len(ds)
        assert r.longest_streak == best_len
        assert r.streak_start == best_start.isoformat()


def test_benford_shares_and_chi2(spark, sf_dir):
    """Digit extraction recomputed from integer cents; shares sum to 1;
    expected shares are the Benford masses."""
    import math as m

    rows = QUERIES["dq_benford_firstdigit"].fn(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").select("o_totalprice").collect()
    from collections import Counter

    digits = Counter(int(str(round(r.o_totalprice * 100))[0]) for r in orders)
    total = sum(digits.values())
    assert {r.digit for r in rows} == set(digits)
    assert abs(sum(r.observed_share for r in rows) - 1.0) < 1e-4
    for r in rows:
        assert r.n == digits[r.digit]
        assert abs(r.benford_share - m.log10(1 + 1 / r.digit)) < 1e-6
        exp = m.log10(1 + 1 / r.digit)
        assert abs(r.chi2_term - (r.n / total - exp) ** 2 / exp) < 1e-5


def test_ks_drift_exact_recompute(spark, sf_dir):
    """KS statistic recomputed with exact integer cross-products."""
    rows = {r.event_type: r for r in QUERIES["quality_ks_drift"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", F.unix_micros("ts").alias("us")
    ).collect()
    by_type = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append((r.us, r.value))
    for et, xs in by_type.items():
        mid = (min(u for u, _ in xs) + max(u for u, _ in xs)) // 2
        early = sorted(v for u, v in xs if u < mid)
        late = sorted(v for u, v in xs if u >= mid)
        n1, n2 = len(early), len(late)
        grid = sorted(set(early) | set(late))
        import bisect

        ks_num = max(
            abs(bisect.bisect_right(early, v) * n2 - bisect.bisect_right(late, v) * n1)
            for v in grid
        )
        r = rows[et]
        assert (r.n_early, r.n_late) == (n1, n2)
        assert abs(r.ks_statistic - ks_num / (n1 * n2)) < 1e-6


def test_transition_matrix_probabilities(spark, sf_dir):
    """Per from_type probabilities sum to 1 and counts match a direct
    lead recomputation on a sample of users."""
    rows = QUERIES["events_transition_matrix"].fn(spark, sf_dir).collect()
    from collections import defaultdict

    by_from = defaultdict(float)
    n_by_from = defaultdict(int)
    for r in rows:
        by_from[r.from_type] += r.p_transition
        n_by_from[r.from_type] += r.n
    for ft, p in by_from.items():
        assert abs(p - 1.0) < 1e-3, ft
    # total transitions = total events - total sessions
    ev_n = load_table(spark, sf_dir, "events").count()
    n_sessions = QUERIES["events_session_window"].fn(spark, sf_dir).count()
    assert sum(n_by_from.values()) == ev_n - n_sessions


def test_rfm_quartiles_balanced(spark, sf_dir):
    """Within every nation each quartile holds between floor(n/4) and
    ceil(n/4) customers on every axis, and the code composes."""
    rows = QUERIES["features_rfm_segments"].fn(spark, sf_dir).collect()
    from collections import defaultdict

    by_nation = defaultdict(list)
    for r in rows:
        by_nation[r.nation].append(r)
        assert r.rfm_code == r.r_q * 100 + r.f_q * 10 + r.m_q
    for nation, rs in by_nation.items():
        n = len(rs)
        for axis in ("r_q", "f_q", "m_q"):
            cnt = defaultdict(int)
            for r in rs:
                cnt[getattr(r, axis)] += 1
            assert set(cnt) <= {1, 2, 3, 4}
            for q in cnt:
                assert n // 4 <= cnt[q] <= n // 4 + 1, (nation, axis, cnt)


def test_time_decay_mean_exact(spark, sf_dir):
    """Decayed and plain means recomputed with integer weights and
    half-up rational rounding."""
    rows = {r.user_id: r for r in QUERIES["features_time_decay_mean"].fn(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "value", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).collect()
    maxd = max(r.day for r in ev)
    from collections import defaultdict

    acc = defaultdict(lambda: [0, 0, 0, 0])  # swc, sw, sc, n
    for r in ev:
        cents = round(r.value * 100)
        halv = min((maxd - r.day).days // 7, 10)
        iw = 2 ** (10 - halv)
        a = acc[r.user_id]
        a[0] += cents * iw
        a[1] += iw
        a[2] += cents
        a[3] += 1
    for uid, (swc, sw, sc, n) in acc.items():
        r = rows[uid]
        assert r.n_events == n
        assert r.decayed_mean == ((200 * swc + sw) // (2 * sw)) / 10000.0
        assert r.plain_mean == ((200 * sc + n) // (2 * n)) / 10000.0


def test_global_equidepth_bins_exact_and_no_global_window(spark, sf_dir):
    """The two-pass global binning must equal the naive global-window
    definition (recomputed in Python) AND its executed plan must
    contain no unpartitioned window — the whole point of the pattern."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_window2 import (
        _GEQD_BINS,
        features_global_equidepth_bins,
    )

    rows = {r.bin: r for r in QUERIES["features_global_equidepth_bins"].fn(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    ).collect()
    ranked = sorted(
        (round(r.o_totalprice * 100), r.o_orderkey) for r in orders
    )
    n = len(ranked)
    from collections import defaultdict

    bins = defaultdict(list)
    for i, (cents, _) in enumerate(ranked):
        bins[(i * _GEQD_BINS) // n + 1].append(cents)
    assert set(rows) == set(bins)
    for b, cents in bins.items():
        r = rows[b]
        assert r.n_rows == len(cents)
        assert r.lo == round(min(cents) / 100.0, 2)
        assert r.hi == round(max(cents) / 100.0, 2)
    sizes = [rows[b].n_rows for b in sorted(rows)]
    assert max(sizes) - min(sizes) <= 1
    # plan hygiene: partitioned windows only
    df = features_global_equidepth_bins(spark, sf_dir)
    exe = df._jdf.queryExecution().executedPlan().toString()
    for line in exe.splitlines():
        if "windowspecdefinition(" in line:
            first_arg = line.split("windowspecdefinition(", 1)[1].split(",", 1)[0]
            assert "ASC" not in first_arg and "DESC" not in first_arg, (
                "unpartitioned window found:\n" + line
            )


def test_centroid_drift_recompute(spark, sf_dir):
    """Cosine-to-global and norm ratio recomputed in numpy from the
    same integer micro-unit sums; global centroid's own drift row (if
    a label equals the mixture) is not assumed — every label checked."""
    import numpy as np

    rows = {r.label: r for r in QUERIES["embedding_source_centroid_drift"].fn(spark, sf_dir).collect()}
    emb = load_table(spark, sf_dir, "embeddings").select("label", "embedding").collect()
    by_label = {}
    for r in emb:
        v = np.asarray(r.embedding, dtype=np.float64)
        m = np.copysign(np.floor(np.abs(v * 1e6) + 0.5), v).astype(object)
        acc = by_label.setdefault(r.label, [np.zeros(len(v), dtype=object), 0])
        acc[0] += m
        acc[1] += 1
    gx = sum(a[0] for a in by_label.values())
    gn = sum(a[1] for a in by_label.values())
    import math as mm

    for label, (sx, n) in by_label.items():
        dot = int(np.dot(sx, gx))
        nl = int(np.dot(sx, sx))
        ng = int(np.dot(gx, gx))
        r = rows[label]
        assert r.n_vectors == n
        assert abs(r.cos_to_global - dot / (mm.sqrt(nl) * mm.sqrt(ng))) < 1e-5
        assert abs(r.norm_ratio - mm.sqrt(nl) * gn / (mm.sqrt(ng) * n)) < 1e-5
