"""Round-16 operator tests: driver-side recomputes for the 3-itemset
association rules, the binary-segmentation multi-changepoint, and the
retrieval contamination evaluator (the VERDICT r15 #6 seam batch).
Each test recomputes the full kernel from raw collected rows — the
same double-entry bookkeeping style as tests/test_r15.py — so a bug
shared by the Spark plan and the DuckDB oracle (same author) still
gets caught by a third, imperative derivation.
"""

from __future__ import annotations

import math

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import QUERIES


def _baskets(spark, sf_dir):
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )
    from collections import defaultdict

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pt = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    brand = {r.p_partkey: r.p_brand for r in pt.collect()}
    baskets: dict = defaultdict(set)
    for r in li.collect():
        baskets[r.l_orderkey].add(brand[r.l_partkey])
    return baskets


def test_basket_rules3_recompute(spark, sf_dir):
    """Recompute triple supports, the 0.2 % integer support gate,
    confidence vs the antecedent PAIR, lift vs the consequent single,
    and the lift-ordered top-20."""
    from collections import Counter
    from itertools import combinations

    baskets = _baskets(spark, sf_dir)
    n = len(baskets)
    supp: Counter = Counter()
    pair: Counter = Counter()
    tri: Counter = Counter()
    for bs in baskets.values():
        ss = sorted(bs)
        supp.update(ss)
        pair.update(combinations(ss, 2))
        tri.update(combinations(ss, 3))
    scored = []
    for (a, b, c), st in tri.items():
        if 500 * st < n:
            continue
        for (a1, a2), cons in (((a, b), c), ((a, c), b), ((b, c), a)):
            sp = pair[(a1, a2)]
            conf = math.floor(st / sp * 1e6 + 0.5)
            lift = math.floor(st * n / (sp * supp[cons]) * 1e6 + 0.5)
            scored.append((-lift, a1, a2, cons, st, sp, conf))
    scored.sort()
    rows = QUERIES["basket_brand_rules3"].fn(spark, sf_dir).collect()
    assert len(rows) == min(20, len(scored))
    assert len(rows) > 0  # gate must not silence the query at smoke SF
    for r, e in zip(rows, scored[:20]):
        lift, a1, a2, cons, st, sp, conf = -e[0], *e[1:]
        assert (r.antecedent_1, r.antecedent_2, r.consequent) == (a1, a2, cons)
        assert r.support_triple == st
        assert r.support_ante == sp
        assert r.support_cons == supp[cons]
        assert r.n_baskets == n
        assert abs(r.confidence - round(conf / 1e6, 6)) < 1e-9
        assert abs(r.lift - round(lift / 1e6, 6)) < 1e-9


def _binseg_expected(days):
    """Imperative depth-2 binary segmentation over {day: count}."""
    ds = sorted(days)
    cs = [days[d] for d in ds]

    def argmax_segment(lo, hi):  # day indices [lo, hi) — local kernel
        m = hi - lo
        tot = sum(cs[lo:hi])
        sq = sum(v * v for v in cs[lo:hi])
        best = None
        s = 0
        for k in range(1, m):  # local split after k days
            s += cs[lo + k - 1]
            cnum = abs(m * s - k * tot)
            if best is None or cnum > best[0]:
                best = (cnum, ds[lo + k - 1], k, s)
        return best, m, tot, sq

    out = {}
    (cnum, day, k1, s1), n, tot, sq = argmax_segment(0, len(ds))
    out["root"] = (cnum, day, k1, s1, n, tot, sq)
    if k1 >= 2:
        (c2, d2, k2, s2), m, t, q = argmax_segment(0, k1)
        out["left"] = (c2, d2, k2, s2, m, t, q)
    if len(ds) - k1 >= 2:
        (c3, d3, k3, s3), m, t, q = argmax_segment(k1, len(ds))
        out["right"] = (c3, d3, k3, s3, m, t, q)
    return out


def test_binseg_recompute(spark, sf_dir):
    """Recompute both segmentation stages: the root argmax must match
    events_volume_changepoint's, and each child must be the local
    integer-CUSUM argmax of its own segment with segment-local
    means/variance/Brownian-bridge statistic."""
    from collections import Counter

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    days: Counter = Counter()
    for r in load_table(spark, sf_dir, "events").select("ts").collect():
        days[r.ts.date()] += 1
    expect = _binseg_expected(days)
    rows = {
        r.role: r
        for r in QUERIES["events_volume_binseg"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == set(expect)
    root = QUERIES["events_volume_changepoint"].fn(spark, sf_dir).collect()[0]
    assert rows["root"].split_day == root.split_day
    assert rows["root"].days_before == root.days_before
    assert abs(rows["root"].cusum_max - root.cusum_max) < 1e-9
    for role, (cnum, day, k, s, m, tot, sq) in expect.items():
        r = rows[role]
        assert r.split_day == day.isoformat()
        assert (r.seg_days, r.days_before) == (m, k)
        assert abs(
            r.mean_before - round(math.floor(s / k * 1e6 + 0.5) / 1e6, 6)
        ) < 1e-9
        assert abs(
            r.mean_after
            - round(math.floor((tot - s) / (m - k) * 1e6 + 0.5) / 1e6, 6)
        ) < 1e-9
        assert abs(
            r.cusum_max - round(math.floor(cnum / m * 1e6 + 0.5) / 1e6, 6)
        ) < 1e-9
        if m * sq > tot * tot:
            sd = math.sqrt((sq - tot * tot / m) / (m - 1))
            bb = math.floor(cnum / m / (sd * math.sqrt(m)) * 1e6 + 0.5)
            assert abs(r.bb_stat - round(bb / 1e6, 6)) < 1e-9
            assert r.shift_flag_95_unadjusted == int(bb > 1_358_000)
        else:
            assert r.bb_stat is None
            assert r.shift_flag_95_unadjusted == 0


def test_contamination_eval_recompute(spark, sf_dir):
    """Recompute the per-doc shingle-overlap rates for both
    retrievers' top-10 against the eval-split shingle index, and the
    per-retriever mean/max/flag aggregation."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_corpus import (
        _EVAL_CUTOFF,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_dedup import (
        cached_shingles,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_retrieval import (
        _CONTAM_FLAG_MICRO,
        _CONTAM_K,
        _dual_scored,
        _tf_projection,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    scored = _dual_scored(
        _tf_projection(load_table(spark, sf_dir, "documents"))
    ).collect()
    bmtop = [
        r.doc_id
        for r in sorted(scored, key=lambda r: (-r.bm25, r.doc_id))[:_CONTAM_K]
    ]
    qltop = [
        r.doc_id
        for r in sorted(scored, key=lambda r: (-r.qlm, r.doc_id))[:_CONTAM_K]
    ]
    sh = {
        r.doc_id: list(r.sh)
        for r in cached_shingles(spark, sf_dir).collect()
    }
    eval_idx = set()
    for d, arr in sh.items():
        if d < _EVAL_CUTOFF:
            eval_idx.update(arr)
    rows = {
        r.retriever: r
        for r in QUERIES["retrieval_contamination_eval"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(rows) == {"bm25", "ql"}
    for name, top in (("bm25", bmtop), ("ql", qltop)):
        r = rows[name]
        train = [d for d in top if d >= _EVAL_CUTOFF]
        rates = []
        for d in train:
            arr = sh[d]
            ov = sum(1 for g in arr if g in eval_idx)
            rates.append(
                math.floor(ov / len(arr) * 1e6 + 0.5) if arr else 0
            )
        assert r.n_topk == len(top)
        assert r.n_eval_in_topk == len(top) - len(train)
        assert r.n_train_docs == len(train)
        if train:
            mean = math.floor(sum(rates) / len(rates) + 0.5)
            assert abs(r.mean_contamination - round(mean / 1e6, 6)) < 1e-9
            assert abs(r.max_contamination - round(max(rates) / 1e6, 6)) < 1e-9
            assert r.n_flagged_10pct == sum(
                1 for x in rates if x >= _CONTAM_FLAG_MICRO
            )
        else:
            assert r.mean_contamination is None
            assert r.max_contamination is None
            assert r.n_flagged_10pct == 0


def test_anisotropy_recompute_and_bounds(spark, sf_dir):
    """numpy recompute of the sum-vector identity from the SAME
    quantization chain, plus |mean cosine| <= 1 and the
    centroid-norm consistency bound."""
    import numpy as np

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    X = np.asarray(
        [
            r.embedding
            for r in load_table(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_similarity import (
        _half_away_i64,
    )

    xm = _half_away_i64(X * 1e6)  # engines' round(), NOT numpy banker's
    normsq = (xm * xm).sum(axis=1)
    keep = normsq > 0
    xm, normsq = xm[keep], normsq[keep]
    um = np.floor(xm / np.sqrt(normsq)[:, None] * 1e6 + 0.5).astype(np.int64)
    n = len(um)
    norm_micro = np.floor(np.sqrt(normsq) + 0.5).astype(np.int64)
    sd = um.sum(axis=0)
    ssum = int((sd.astype(object) * sd.astype(object)).sum())
    usq = int((um.astype(np.int64) ** 2).sum())
    row = QUERIES["embedding_anisotropy"].fn(spark, sf_dir).collect()[0]
    assert row.n_vectors == n
    assert abs(
        row.mean_norm
        - round(math.floor(norm_micro.sum() / n + 0.5) / 1e6, 6)
    ) < 1e-9
    assert abs(
        row.centroid_norm
        - round(math.floor(math.sqrt(ssum) / n + 0.5) / 1e6, 6)
    ) < 1e-9
    mpc = math.floor((ssum - usq) / (n * (n - 1)) / 1e6 + 0.5)
    assert abs(row.mean_pairwise_cosine - round(mpc / 1e6, 6)) < 1e-9
    assert -1.0 <= row.mean_pairwise_cosine <= 1.0
    # identity sanity: mean pairwise cosine ~ ||centroid||^2 - 1/n
    assert abs(
        row.mean_pairwise_cosine
        - (row.centroid_norm**2 - 1.0 / n) * n / (n - 1)
    ) < 1e-2


def test_ratio_jackknife_recompute(spark, sf_dir):
    """Driver-side recompute of the day-block replicates, the S1/S2
    reduction, and the bias/SE/CI chain."""
    from collections import Counter

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    x: Counter = Counter()
    y: Counter = Counter()
    for r in (
        load_table(spark, sf_dir, "events").select("ts", "event_type").collect()
    ):
        d = r.ts.date()
        x[d] += 1
        if r.event_type == "purchase":
            y[d] += 1
    xt, yt = sum(x.values()), sum(y.values())
    reps = [
        math.floor((yt - y[d]) / (xt - x[d]) * 1e6 + 0.5)
        for d in x
        if xt - x[d] > 0
    ]
    m, s1, s2 = len(reps), sum(reps), sum(t * t for t in reps)
    row = QUERIES["events_ratio_jackknife"].fn(spark, sf_dir).collect()[0]
    assert (row.n_days, row.total_events, row.total_purchases) == (m, xt, yt)
    assert abs(
        row.rate - round(math.floor(yt / xt * 1e6 + 0.5) / 1e6, 6)
    ) < 1e-9
    assert abs(row.jack_mean - round(math.floor(s1 / m + 0.5) / 1e6, 6)) < 1e-9
    bias = math.floor((m - 1) * (s1 / m - yt / xt * 1e6) + 0.5)
    assert abs(row.jack_bias - round(bias / 1e6, 6)) < 1e-9
    se = math.floor(math.sqrt((m - 1) / m * (s2 - s1 * s1 / m)) + 0.5)
    assert abs(row.jack_se - round(se / 1e6, 6)) < 1e-9
    lo = math.floor(yt / xt * 1e6 - 1.959964 * se + 0.5)
    hi = math.floor(yt / xt * 1e6 + 1.959964 * se + 0.5)
    assert abs(row.ci_lo_95 - round(lo / 1e6, 6)) < 1e-9
    assert abs(row.ci_hi_95 - round(hi / 1e6, 6)) < 1e-9
    assert row.ci_lo_95 <= row.rate <= row.ci_hi_95


def test_conformal_recompute(spark, sf_dir):
    """Driver-side recompute of the chronological split, the
    finite-sample conformal rank, the quantile pick, and the test
    coverage."""
    from collections import Counter

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    days: Counter = Counter()
    for r in load_table(spark, sf_dir, "events").select("ts").collect():
        days[r.ts.date()] += 1
    ds = sorted(days)
    cs = [days[d] for d in ds]
    m = len(cs)
    n_train, n_cal = math.floor(m / 2), math.floor(m / 4)
    n_test = m - n_train - n_cal
    yhat = math.floor(sum(cs[:n_train]) / n_train * 1e6 + 0.5)
    cal = sorted(
        abs(c * 1_000_000 - yhat) for c in cs[n_train:n_train + n_cal]
    )
    kq = math.ceil((n_cal + 1) * 4 / 5)
    row = (
        QUERIES["events_conformal_volume_interval"]
        .fn(spark, sf_dir)
        .collect()[0]
    )
    assert (row.n_days, row.n_train, row.n_cal, row.n_test) == (
        m, n_train, n_cal, n_test,
    )
    assert abs(row.forecast_mean - round(yhat / 1e6, 6)) < 1e-9
    if kq <= n_cal:
        q = cal[kq - 1]
        assert abs(row.q80_residual - round(q / 1e6, 6)) < 1e-9
        assert abs(row.pi_lo_80 - round((yhat - q) / 1e6, 6)) < 1e-9
        assert abs(row.pi_hi_80 - round((yhat + q) / 1e6, 6)) < 1e-9
        cov = sum(
            1
            for c in cs[n_train + n_cal:]
            if abs(c * 1_000_000 - yhat) <= q
        )
        assert abs(
            row.test_coverage
            - round(math.floor(cov / n_test * 1e6 + 0.5) / 1e6, 6)
        ) < 1e-9
    else:
        assert row.q80_residual is None


def test_term_burstiness_recompute(spark, sf_dir):
    """Driver-side recompute of the four-integer term kernel and the
    three quantized ratios, plus the Poisson sanity direction
    (bursty terms: adaptation > global containment rate)."""
    from collections import Counter

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        text as X,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", X.tokens().alias("toks"))
        .collect()
    )
    n = len(docs)
    cf: Counter = Counter()
    cf2: Counter = Counter()
    df: Counter = Counter()
    df2: Counter = Counter()
    for r in docs:
        tf = Counter(r.toks)
        for t, f in tf.items():
            cf[t] += f
            cf2[t] += f * f
            df[t] += 1
            if f >= 2:
                df2[t] += 1
    top = sorted(cf, key=lambda t: (-cf[t], t))[:20]
    rows = QUERIES["text_term_burstiness"].fn(spark, sf_dir).collect()
    assert [r.token for r in rows] == top
    for r in rows:
        t = r.token
        assert (r.cf, r.df, r.df2, r.n_docs) == (cf[t], df[t], df2[t], n)
        mean = cf[t] / n
        var = (cf2[t] - cf[t] * cf[t] / n) / (n - 1)
        assert abs(
            r.vmr - round(math.floor(var / mean * 1e6 + 0.5) / 1e6, 6)
        ) < 1e-9
        assert abs(
            r.adaptation
            - round(math.floor(df2[t] / df[t] * 1e6 + 0.5) / 1e6, 6)
        ) < 1e-9
        assert abs(
            r.burst_mean
            - round(math.floor(cf[t] / df[t] * 1e6 + 0.5) / 1e6, 6)
        ) < 1e-9
        assert r.vmr > 0 and r.burst_mean >= 1.0


def test_ams_f2_recompute(spark, sf_dir):
    """Driver-side md5 recompute of all 63 sign counters, both
    estimators, and the 3-sigma gate."""
    import hashlib
    from collections import Counter

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        text as X,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    freq: Counter = Counter()
    for r in (
        load_table(spark, sf_dir, "documents")
        .select(X.tokens().alias("toks"))
        .collect()
    ):
        freq.update(r.toks)
    f2 = sum(f * f for f in freq.values())

    def sign(salt, tok):
        h = hashlib.md5(f"{salt}:{tok}".encode()).hexdigest()[:8]
        return 1 if int(h, 16) % 2 == 0 else -1

    sq = sorted(
        sum(sign(f"ams{j}", t) * f for t, f in freq.items()) ** 2
        for j in range(63)
    )
    med = sq[31]
    mean = math.floor(sum(sq) / 63 + 0.5)
    row = QUERIES["sketch_ams_f2"].fn(spark, sf_dir).collect()[0]
    assert row.n_tokens == sum(freq.values())
    assert row.n_distinct == len(freq)
    assert row.f2_exact == f2
    assert row.ams_f2_median == med
    assert row.ams_f2_mean == mean
    assert abs(
        row.rel_error
        - round(math.floor(abs(mean - f2) / f2 * 1e6 + 0.5) / 1e6, 6)
    ) < 1e-9
    assert row.within_3sigma == int(abs(mean - f2) / f2 <= 0.534522)


def test_rake_recompute(spark, sf_dir):
    """Driver-side recompute of the full RAKE chain: phrase splitting
    on the shared stopword profile, the 8-word candidate cap,
    degree/freq word scores, and the additive phrase score."""
    from collections import Counter, defaultdict

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        text as X,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    stop = set(X.EN_STOPWORDS)
    phrases = []  # list of token tuples (candidates, capped)
    for r in (
        load_table(spark, sf_dir, "documents")
        .select(X.tokens().alias("toks"))
        .collect()
    ):
        cur = []
        for t in list(r.toks) + [next(iter(stop))]:  # sentinel flush
            if t in stop:
                if cur and len(cur) <= 8:
                    phrases.append(tuple(cur))
                cur = []
            else:
                cur.append(t)
    freq: Counter = Counter()
    degree: Counter = Counter()
    for ph in phrases:
        for t in ph:
            freq[t] += 1
            degree[t] += len(ph)
    smicro = {
        t: math.floor(degree[t] / freq[t] * 1e6 + 0.5) for t in freq
    }
    by_text: defaultdict = defaultdict(list)
    for ph in phrases:
        by_text[" ".join(ph)].append(sum(smicro[t] for t in ph))
    scored = sorted(
        (-scores[0], text, len(text.split()), len(scores))
        for text, scores in by_text.items()
    )
    rows = QUERIES["text_rake_keywords"].fn(spark, sf_dir).collect()
    assert len(rows) == min(20, len(scored))
    for r, e in zip(rows, scored[:20]):
        sc, text, nw, occ = -e[0], e[1], e[2], e[3]
        assert r.phrase == text
        assert r.n_words == nw
        assert r.n_occurrences == occ
        assert abs(r.rake_score - round(sc / 1e6, 6)) < 1e-9


def test_graph_expand_recompute(spark, sf_dir):
    """numpy recompute of the whole graph-expansion chain: sign
    signatures from the literal planes, Hamming seed lists, the
    one-hop expansion, both exact reranks, and both recalls — with
    the same fold order for dots (left-to-right float64) and 6-dp
    cosine rounding."""
    import numpy as np

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_similarity import (
        _GEX_PLANES,
        _GEX_SEEDS,
        _KNN_CAP,
        _KNN_K,
        _N_QUERIES,
        _TOP_K,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )
    from pyspark.sql import functions as F

    recs = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < _KNN_CAP)
        .select("vec_id", "embedding")
        .collect()
    )
    recs.sort(key=lambda r: r.vec_id)
    ids = [r.vec_id for r in recs]
    X = np.asarray([r.embedding for r in recs], dtype=np.float64)
    n = len(ids)
    nrm = np.sqrt((X * X).sum(axis=1))
    P = np.asarray(_GEX_PLANES, dtype=np.float64)
    sig = (X @ P.T) >= 0  # float64 dot; matches the fold to well past sign

    def cos6(i, j):
        return round(float(X[i] @ X[j]) / (nrm[i] * nrm[j]), 6)

    def topk(q, cands, k):
        return sorted(cands, key=lambda j: (-cos6(q, j), ids[j]))[:k]

    knn = {
        i: topk(i, [j for j in range(n) if j != i], _KNN_K)
        for i in range(n)
    }
    out = {}
    for qi in range(min(_N_QUERIES, n)):
        others = [j for j in range(n) if j != qi]
        exact = set(topk(qi, others, _TOP_K))
        agree = (sig == sig[qi]).sum(axis=1)
        sd = sorted(others, key=lambda j: (-int(agree[j]), ids[j]))[
            :_GEX_SEEDS
        ]
        exp = set(sd)
        for s_ in sd:
            exp.update(knn[s_])
        exp.discard(qi)
        top_s = topk(qi, sd, _TOP_K)
        top_e = topk(qi, sorted(exp), _TOP_K)
        out[ids[qi]] = (
            len(sd),
            len(exp),
            round(len(set(top_s) & exact) / _TOP_K, 6),
            round(len(set(top_e) & exact) / _TOP_K, 6),
        )
    rows = (
        QUERIES["similarity_graph_expand_topk"].fn(spark, sf_dir).collect()
    )
    assert len(rows) == len(out)
    for r in rows:
        ns, ne, rs, re_ = out[r.query_id]
        assert (r.n_seeds, r.n_expanded) == (ns, ne)
        assert abs(r.recall_seed_only - rs) < 1e-9
        assert abs(r.recall_expanded - re_) < 1e-9


def test_ht_estimate_recompute(spark, sf_dir):
    """Driver-side md5 recompute of the deterministic inclusion set,
    the per-row HT terms (with the pi-clamp branch), and the
    estimate/error chain."""
    import hashlib

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        text as X,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_corpus import (
        _WSAMPLE_TARGET,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    rows_in = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars", X.token_count().alias("y"))
        .collect()
    )
    total_w = sum(r.n_chars for r in rows_in)
    total_y = sum(r.y for r in rows_in)
    st = 0
    n_kept = 0
    for r in rows_in:
        u6 = int(hashlib.md5(str(r.doc_id).encode()).hexdigest()[:6], 16)
        if u6 * total_w < _WSAMPLE_TARGET * r.n_chars * 16**6:
            n_kept += 1
            if _WSAMPLE_TARGET * r.n_chars >= total_w:
                st += r.y * 1_000_000
            else:
                st += math.floor(
                    r.y * total_w / (_WSAMPLE_TARGET * r.n_chars) * 1e6
                    + 0.5
                )
    row = QUERIES["corpus_ht_token_estimate"].fn(spark, sf_dir).collect()[0]
    assert (row.n_docs, row.n_kept) == (len(rows_in), n_kept)
    assert row.exact_total_tokens == total_y
    assert abs(row.ht_estimate - round(st / 1e6, 6)) < 1e-9
    err = math.floor(abs(st / 1e6 - total_y) / total_y * 1e6 + 0.5)
    assert abs(row.rel_error - round(err / 1e6, 6)) < 1e-9


def test_anisotropy_empty_corpus_matches_oracle(spark, sf_dir, tmp_path):
    """r16 review: with an empty embeddings table the Spark aggregate
    read n_vectors NULL (max over zero partial rows) while the oracle
    counted 0 — the Benford empty-table ADVICE class. Both sides now
    report n_vectors = 0 with NULL statistics and must value-hash
    identically."""
    import duckdb
    import pyarrow.parquet as pq

    from tests.oracle import _norm_rows

    src = pq.read_table(f"{sf_dir}/embeddings.parquet")
    empty = str(tmp_path / "embeddings.parquet")
    pq.write_table(src.slice(0, 0), empty)

    spec = QUERIES["embedding_anisotropy"]
    sdf = spec.fn(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{empty}')"
    )
    odf = con.execute(spec.oracle).fetchdf()
    assert sorted(sdf.columns) == sorted(odf.columns)
    assert len(sdf) == len(odf) == 1
    s_rows = _norm_rows(list(sdf.columns), sdf.itertuples(index=False, name=None))
    o_rows = _norm_rows(list(odf.columns), odf.itertuples(index=False, name=None))
    assert s_rows == o_rows, (s_rows, o_rows)
    assert sdf.iloc[0]["n_vectors"] == 0


def test_textrank_recompute(spark, sf_dir):
    """Driver-side recompute of the full weighted-TextRank chain:
    window-2 pair expansion, stopword filter, weighted edges,
    strength, and the 3 integer fixed-point iterations."""
    from collections import Counter, defaultdict

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators import (
        text as X,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_text2 import (
        _TRANK_ITERS,
        _TRANK_SCALE,
        _TRANK_TELEPORT,
        _TRANK_TOP,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    stop = set(X.EN_STOPWORDS)
    w: Counter = Counter()
    for r in (
        load_table(spark, sf_dir, "documents")
        .select(X.tokens().alias("toks"))
        .collect()
    ):
        toks = list(r.toks)
        for i, tu in enumerate(toks):
            for j in (i + 1, i + 2):
                if j >= len(toks):
                    continue
                tv = toks[j]
                if tu == tv or tu in stop or tv in stop:
                    continue
                w[(min(tu, tv), max(tu, tv))] += 1
    adj: defaultdict = defaultdict(dict)
    for (u, v), c in w.items():
        adj[u][v] = c
        adj[v][u] = c
    strength = {u: sum(nb.values()) for u, nb in adj.items()}
    outdeg = {u: len(nb) for u, nb in adj.items()}
    pr = {u: _TRANK_SCALE for u in adj}
    for _ in range(_TRANK_ITERS):
        inbox: Counter = Counter()
        for u, nb in adj.items():
            for v, c in nb.items():
                inbox[v] += (pr[u] * c) // strength[u]
        pr = {
            u: _TRANK_TELEPORT + (85 * inbox.get(u, 0)) // 100
            for u in adj
        }
    expect = sorted(((-p, t) for t, p in pr.items()))[:_TRANK_TOP]
    rows = QUERIES["text_textrank_keywords"].fn(spark, sf_dir).collect()
    assert len(rows) == len(expect)
    for r, (negp, t) in zip(rows, expect):
        assert r.token == t
        assert r.textrank_fp == -negp
        assert r.degree == outdeg[t]


def test_column_profile_recompute(spark, sf_dir):
    """Driver-side recompute of every column's nulls/distinct/mode
    profile and the candidate-key conjunction."""
    from collections import Counter

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_pipeline import (
        _PROFILE_COLS,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    data = load_table(spark, sf_dir, "orders").select(*_PROFILE_COLS).collect()
    rows = {
        r.col_name: r
        for r in QUERIES["dq_column_profile"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == set(_PROFILE_COLS)
    n = len(data)
    for c in _PROFILE_COLS:
        vals = [getattr(r, c) for r in data]
        nulls = sum(1 for v in vals if v is None)
        nonnull = [v for v in vals if v is not None]
        distinct = len(set(nonnull)) + (1 if nulls else 0)
        # countDistinct / count(DISTINCT c) EXCLUDE nulls in both engines
        distinct = len(set(nonnull))
        mode_count = max(Counter(nonnull).values()) if nonnull else 0
        r = rows[c]
        assert (r.n_rows, r.n_nulls, r.n_distinct) == (n, nulls, distinct)
        assert r.mode_count == mode_count
        assert abs(
            r.uniqueness
            - round(math.floor(distinct / n * 1e6 + 0.5) / 1e6, 6)
        ) < 1e-9
        if n - nulls:
            assert abs(
                r.mode_share
                - round(
                    math.floor(mode_count / (n - nulls) * 1e6 + 0.5) / 1e6, 6
                )
            ) < 1e-9
        assert r.is_candidate_key == int(distinct == n and nulls == 0)


def test_map_eval_recompute(spark, sf_dir):
    """Recompute AP@10 for both retrievers from the collected
    dual-scored relation: top-10 by (score desc, doc_id), precision
    terms cum_rel/i micro-quantized per hit, bounded denominator
    min(n_relevant, 10) — the third derivation beside the Spark plan
    and the DuckDB oracle."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_retrieval import (
        _MAP_K,
        _MRR_REL_MIN,
        _dual_scored,
        _tf_projection,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    scored = _dual_scored(
        _tf_projection(load_table(spark, sf_dir, "documents"))
    ).collect()
    n_relevant = sum(1 for r in scored if r.rel >= _MRR_REL_MIN)
    rows = {
        r.retriever: r
        for r in QUERIES["retrieval_map_eval"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {"bm25", "ql"}
    for name, key in (("bm25", lambda r: (-r.bm25, r.doc_id)),
                      ("ql", lambda r: (-r.qlm, r.doc_id))):
        top = sorted(scored, key=key)[:_MAP_K]
        cum = 0
        hits = 0
        sum_p = 0
        for i, r in enumerate(top, start=1):
            if r.rel >= _MRR_REL_MIN:
                cum += 1
                hits += 1
                sum_p += math.floor(cum * 1e6 / i + 0.5)
        got = rows[name]
        assert got.hits_at_k == hits
        assert got.n_relevant == n_relevant
        den = min(n_relevant, _MAP_K)
        want = (
            round(math.floor(sum_p / den + 0.5) / 1e6, 6) if den else 0.0
        )
        assert abs(got.ap_at_10 - want) < 1e-9
        # AP is bounded by precision@k's best case: every term <= 1
        assert 0.0 <= got.ap_at_10 <= 1.0 + 1e-9


def test_kruskal_wallis_recompute(spark, sf_dir):
    """Recompute the tie-adjusted Kruskal–Wallis H from collected
    per-user (first-event-type, spend-cents) rows: pooled doubled
    midranks, per-cohort micro-quantized H terms, tie correction,
    df-table flag, and epsilon-squared."""
    from collections import Counter, defaultdict

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_events import (
        _CHI2_CRIT_MICRO,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    ).collect()
    first: dict = {}
    spend: Counter = Counter()
    for r in ev:
        k = (r.ts, r.event_id, r.event_type)
        if r.user_id not in first or k < first[r.user_id]:
            first[r.user_id] = k
        if r.event_type == "purchase":
            spend[r.user_id] += math.floor(r.value * 100 + 0.5)
    users = [(first[u][2], spend.get(u, 0)) for u in first]
    nn = len(users)
    tcnt: Counter = Counter(m for _, m in users)
    # doubled midranks per distinct value
    cb = 0
    dr: dict = {}
    s_t = 0
    for m in sorted(tcnt):
        t = tcnt[m]
        dr[m] = 2 * cb + t + 1
        s_t += t * t * t - t
        cb += t
    r2: dict = defaultdict(int)
    ng: Counter = Counter()
    for g, m in users:
        r2[g] += dr[m]
        ng[g] += 1
    hterm = sum(
        math.floor(
            3 * (r2[g] ** 2) / (nn * (nn + 1) * ng[g]) * 1e6 + 0.5
        )
        for g in r2
    )
    h_micro = hterm - 3 * (nn + 1) * 1000000
    tie_c = 1 - s_t / (nn * (nn - 1) * (nn + 1))
    k = len(ng)
    row = QUERIES["events_kruskal_wallis"].fn(spark, sf_dir).collect()[0]
    assert row.k_groups == k
    assert row.n_users == nn
    assert row.df == k - 1
    assert abs(row.h_stat - round(h_micro / 1e6, 6)) < 1e-9
    assert tie_c > 0
    h_adj = math.floor(h_micro / tie_c + 0.5)
    assert abs(row.h_tie_adjusted - round(h_adj / 1e6, 6)) < 1e-9
    crit = _CHI2_CRIT_MICRO.get(k - 1)
    if crit is not None:
        assert row.significant_95 == (1 if h_adj > crit else 0)
    else:
        assert row.significant_95 is None
    eps = max(
        0, math.floor((h_adj - (k - 1) * 1000000) / (nn - k) + 0.5)
    )
    assert abs(row.epsilon_sq - round(eps / 1e6, 6)) < 1e-9
    # H' is a chi-square-scale statistic: nonnegative here (ties
    # handled); epsilon^2 in [0, 1] by the clamp construction
    assert row.h_tie_adjusted >= 0
    assert 0.0 <= row.epsilon_sq <= 1.0

def test_heaps_law_recompute(spark, sf_dir):
    """Recompute both Heaps fits from collected tokenized docs:
    dyadic first-seen/prefix points, 6dp DECIMAL log terms,
    least-squares beta and ln K at unigram and shingle grain."""
    from collections import Counter

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators.text import (
        tokens,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_dedup import (
        cached_shingles,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens().alias("toks"))
        .collect()
    )
    sh = cached_shingles(spark, sf_dir).collect()
    first: dict = {}
    sfirst: dict = {}
    ntok: Counter = Counter()
    mx = 0
    for r in docs:
        mx = max(mx, r.doc_id)
        for t in r.toks:
            if not t:
                continue
            ntok[r.doc_id] += 1
            if t not in first or r.doc_id < first[t]:
                first[t] = r.doc_id
    for r in sh:
        for g in r.sh:
            if g not in sfirst or r.doc_id < sfirst[g]:
                sfirst[g] = r.doc_id

    def bucket(n):
        return 0 if n <= 1 else (n - 1).bit_length()

    B = bucket(mx)
    vb = Counter(bucket(fd) for fd in first.values())
    sb = Counter(bucket(fd) for fd in sfirst.values())
    nb: Counter = Counter()
    for d, c in ntok.items():
        nb[bucket(d)] += c

    def fit(vcounts):
        pts = []
        v = n = 0
        for j in range(B + 1):
            v += vcounts.get(j, 0)
            n += nb.get(j, 0)
            if v > 0 and n > 0:
                pts.append(
                    (round(math.log(n), 6), round(math.log(v), 6),
                     round(math.log(n) * math.log(v), 6),
                     round(math.log(n) * math.log(n), 6))
                )
        k = len(pts)
        sx = sum(p[0] for p in pts)
        sy = sum(p[1] for p in pts)
        sxy = sum(p[2] for p in pts)
        sxx = sum(p[3] for p in pts)
        den = k * sxx - sx * sx
        beta = (k * sxy - sx * sy) / den if den else None
        lnk = (sy - beta * sx) / k if beta is not None else None
        return k, beta, lnk

    ku, bu, lu = fit(vb)
    ks, bs, ls = fit(sb)
    row = QUERIES["text_heaps_law"].fn(spark, sf_dir).collect()[0]
    assert row.n_points == ku
    assert row.vocab_total == len(first)
    assert row.shingle_total == len(sfirst)
    assert row.tokens_total == sum(ntok.values())
    assert abs(row.heaps_beta - round(bu, 4)) < 2e-4
    assert abs(row.heaps_lnk - round(lu, 4)) < 2e-3
    assert abs(row.heaps_beta_shingle - round(bs, 4)) < 2e-4
    assert abs(row.heaps_lnk_shingle - round(ls, 4)) < 2e-3
    # the synthetic corpus has a CLOSED word vocabulary (beta ~ 0 is
    # the templated-corpus flag working) while shingle types keep
    # growing — pin the separation the two-grain design exists for
    assert 0.0 <= row.heaps_beta < 0.2
    assert 0.05 < row.heaps_beta_shingle < 1.0


def test_calibration_ece_recompute(spark, sf_dir):
    """Recompute the exact-support calibration audit from collected
    per-user rows: split-A per-stratum conversion rates as
    predictions, split-B reliability gaps, ECE/MCE/Brier/skill."""
    import hashlib
    from collections import defaultdict
    from datetime import timezone

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_events import (
        _CAL_HORIZON_US,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts"
    ).collect()
    first: dict = {}
    f_us: dict = {}
    p_us: dict = {}
    for r in ev:
        k = (r.ts, r.event_id, r.event_type)
        if r.user_id not in first or k < first[r.user_id]:
            first[r.user_id] = k
        us = int(
            r.ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000
        )
        f_us[r.user_id] = min(f_us.get(r.user_id, us), us)
        if r.event_type == "purchase":
            p_us[r.user_id] = min(p_us.get(r.user_id, us), us)
    cells: dict = defaultdict(lambda: [0, 0, 0, 0])  # na, ca, nb, cb
    for u, k in first.items():
        is_a = hashlib.md5(str(u).encode()).hexdigest()[:2] < "80"
        y = (
            u in p_us and p_us[u] - f_us[u] <= _CAL_HORIZON_US
        )
        c = cells[k[2]]
        if is_a:
            c[0] += 1
            c[1] += y
        else:
            c[2] += 1
            c[3] += y
    n_bins = n_serve = unscored = ece_num = c_serve = 0
    mce = None
    brier_num = 0
    for na, ca, nb, cb in cells.values():
        if na == 0:
            unscored += nb
            continue
        n_bins += 1
        conf = math.floor(ca / na * 1e6 + 0.5)
        c_serve += cb
        if nb == 0:
            continue
        n_serve += nb
        acc = math.floor(cb / nb * 1e6 + 0.5)
        gap = abs(acc - conf)
        ece_num += nb * gap
        mce = gap if mce is None else max(mce, gap)
        brier_num += math.floor(
            (nb * conf * conf / 1e12 - 2 * conf / 1e6 * cb + cb) * 1e6
            + 0.5
        )
    row = QUERIES["events_calibration_ece"].fn(spark, sf_dir).collect()[0]
    assert row.n_bins == n_bins
    assert row.n_serve == n_serve
    assert row.n_serve_unscored == unscored
    assert n_serve > 0
    ece = math.floor(ece_num / n_serve + 0.5)
    brier = math.floor(brier_num / n_serve + 0.5)
    base = math.floor(c_serve / n_serve * 1e6 + 0.5)
    bbase = math.floor(base / 1e6 * (1 - base / 1e6) * 1e6 + 0.5)
    assert abs(row.ece - round(ece / 1e6, 6)) < 1e-9
    assert abs(row.mce - round(mce / 1e6, 6)) < 1e-9
    assert abs(row.brier - round(brier / 1e6, 6)) < 1e-9
    assert abs(row.brier_base - round(bbase / 1e6, 6)) < 1e-9
    if bbase > 0:
        skill = math.floor((1 - brier / bbase) * 1e6 + 0.5)
        assert abs(row.brier_skill - round(skill / 1e6, 6)) < 1e-9
    # structural bounds: ECE <= MCE <= 1; Brier within [0, 1]
    assert 0.0 <= row.ece <= row.mce <= 1.0
    assert 0.0 <= row.brier <= 1.0


def test_streaming_binseg_equals_batch(spark, sf_dir):
    """One streamed sufficient statistic, another report: the binseg
    tier sums the PSI fold's (day, bucket) cube across buckets AND
    types to the corpus-wide daily volume, so its depth-2
    segmentation must equal the batch twin row-for-row."""
    cols = (
        "role",
        "role_rank",
        "split_day",
        "seg_days",
        "days_before",
        "mean_before",
        "mean_after",
        "cusum_max",
        "bb_stat",
        "shift_flag_95_unadjusted",
    )
    stream = [
        tuple(getattr(r, c) for c in cols)
        for r in QUERIES["streaming_volume_binseg"].fn(spark, sf_dir).collect()
    ]
    batch = [
        tuple(getattr(r, c) for c in cols)
        for r in QUERIES["events_volume_binseg"].fn(spark, sf_dir).collect()
    ]
    assert stream == batch
    assert stream  # non-degenerate fixture

def test_stouffer_meta_recompute(spark, sf_dir):
    """Recompute the per-segment Welch spend z's and both Stouffer
    combinations from collected raw rows, and pin the richness the
    first (conversion-z) draft lacked: at least one segment must
    contribute a defined z on the smoke fixture."""
    import hashlib
    from collections import defaultdict

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "ts", "value"
    ).collect()
    first: dict = {}
    spend: dict = defaultdict(int)
    for r in ev:
        k = (r.ts, r.event_id, r.event_type)
        if r.user_id not in first or k < first[r.user_id]:
            first[r.user_id] = k
        if r.event_type == "purchase":
            spend[r.user_id] += math.floor(r.value * 100 + 0.5)
    cells: dict = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for u, k in first.items():
        is_a = hashlib.md5(str(u).encode()).hexdigest()[:2] < "80"
        w = spend.get(u, 0)
        c = cells[k[2]]
        o = 0 if is_a else 3
        c[o] += 1
        c[o + 1] += w
        c[o + 2] += w * w
    t_sum = z_sum = n_users = used = 0
    for na, swa, swwa, nb, swb, swwb in cells.values():
        if na < 2 or nb < 2:
            continue
        va = (swwa * na - swa * swa) / (na * na * (na - 1))
        vb = (swwb * nb - swb * swb) / (nb * nb * (nb - 1))
        if va + vb <= 0:
            continue
        zm = math.floor(
            (swa / na - swb / nb) / math.sqrt(va + vb) * 1e6 + 0.5
        )
        used += 1
        n_s = na + nb
        n_users += n_s
        t_sum += math.floor(math.sqrt(n_s) * zm + 0.5)
        z_sum += zm
    row = QUERIES["events_stouffer_meta"].fn(spark, sf_dir).collect()[0]
    assert row.n_strata == len(cells)
    assert row.n_used == used
    assert row.n_excluded == len(cells) - used
    assert used > 0  # richness guard: the spend z must be defined
    assert row.n_users_used == n_users
    zw = math.floor(t_sum / math.sqrt(n_users) + 0.5)
    zu = math.floor(z_sum / math.sqrt(used) + 0.5)
    assert abs(row.stouffer_z - round(zw / 1e6, 6)) < 1e-9
    assert abs(row.stouffer_z_unweighted - round(zu / 1e6, 6)) < 1e-9
    assert row.significant_95 == (1 if abs(zw) > 1959964 else 0)


def test_dsir_importance_recompute(spark, sf_dir):
    """Recompute the DSIR hashed-unigram importance scores from
    collected tokenized docs: md5 bucket hash, Laplace-smoothed
    bucket log-ratios quantized at bucket grain, exact per-doc sums,
    and the top-50 integer argsort."""
    import hashlib
    from collections import Counter

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators.text import (
        tokens,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_corpus import (
        _DSIR_BUCKETS,
        _DSIR_TOP,
        _EVAL_CUTOFF,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", tokens().alias("toks"))
        .collect()
    )

    def bucket(tok):
        return (
            int(hashlib.md5(tok.encode()).hexdigest()[:8], 16)
            % _DSIR_BUCKETS
        )

    ct: Counter = Counter()
    cr: Counter = Counter()
    per_doc: dict = {}
    for r in docs:
        bs = [bucket(t) for t in r.toks if t]
        if r.doc_id < _EVAL_CUTOFF:
            ct.update(bs)
        else:
            cr.update(bs)
            per_doc[r.doc_id] = bs
    nt, nr = sum(ct.values()), sum(cr.values())
    lw = {
        b: math.floor(
            (
                math.log(ct.get(b, 0) + 1.0)
                - math.log(nt + float(_DSIR_BUCKETS))
                - math.log(cr.get(b, 0) + 1.0)
                + math.log(nr + float(_DSIR_BUCKETS))
            )
            * 1e6
            + 0.5
        )
        for b in range(_DSIR_BUCKETS)
    }
    scored = sorted(
        (
            (-sum(lw[b] for b in bs), d, len(bs))
            for d, bs in per_doc.items()
            if bs
        ),
    )[:_DSIR_TOP]
    rows = QUERIES["corpus_dsir_importance"].fn(spark, sf_dir).collect()
    assert len(rows) == len(scored)
    got = {r.doc_id: r for r in rows}
    for neg_s, d, n in scored:
        r = got[d]
        assert r.n_tokens == n
        assert abs(r.log_importance - round(-neg_s / 1e6, 6)) < 1e-9
        want_n = math.floor(-neg_s / n + 0.5)
        assert abs(
            r.log_importance_per_token - round(want_n / 1e6, 6)
        ) < 1e-9
    # target-likeness sanity: scores are finite and the list is the
    # exact integer argsort (descending)
    ordered = [r.log_importance for r in rows]
    assert ordered == sorted(ordered, reverse=True)


def test_kcore_recompute(spark, sf_dir):
    """Recompute the k-core peeling fixpoint imperatively from the
    collected sparsified edge set and pin every reported count plus
    the core invariant (every core node keeps >= k core
    neighbors)."""
    from collections import defaultdict

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_retrieval import (
        _KCORE_K,
        _KCORE_MAX_ROUNDS,
        _sparsified_edges,
    )

    edges = [
        (r.s1, r.s2) for r in _sparsified_edges(spark, sf_dir).collect()
    ]
    alive = {s for e in edges for s in e}
    n_nodes, n_edges = len(alive), len(edges)
    rounds = _KCORE_MAX_ROUNDS
    converged = False
    for i in range(1, _KCORE_MAX_ROUNDS + 1):
        deg: dict = defaultdict(int)
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        new = {s for s, d in deg.items() if d >= _KCORE_K}
        if new == alive:
            converged = True
            rounds = i - 1
            break
        alive = new
    core_edges = sum(1 for a, b in edges if a in alive and b in alive)
    row = QUERIES["graph_kcore"].fn(spark, sf_dir).collect()[0]
    assert row.k_core == _KCORE_K
    assert row.n_nodes == n_nodes
    assert row.n_edges == n_edges
    assert row.n_core_nodes == len(alive)
    assert row.n_core_edges == core_edges
    assert row.n_rounds == rounds
    assert row.converged == (1 if converged else 0)
    # core invariant: within-core degree >= k for every member
    if converged and alive:
        deg = defaultdict(int)
        for a, b in edges:
            if a in alive and b in alive:
                deg[a] += 1
                deg[b] += 1
        assert min(deg[s] for s in alive) >= _KCORE_K


def test_jl_projection_audit_recompute(spark, sf_dir):
    """Recompute the JL distortion audit from collected probe
    embeddings: md5 sign matrix, exact integer projections and
    distances, per-pair quantized ratios, and the JL sanity that the
    mean distortion sits near 1."""
    import hashlib
    from itertools import combinations

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_similarity import (
        _JL_K,
        _JL_PROBES,
        _vecs,
    )

    probes = (
        _vecs(spark, sf_dir)
        .where(f"vec_id < {_JL_PROBES}")
        .select("vec_id", "embedding")
        .collect()
    )
    q = {
        r.vec_id: [math.floor(x * 1e6 + 0.5) for x in r.embedding]
        for r in probes
    }

    def sign(j, i):
        d = int(hashlib.md5(f"{j}:{i}".encode()).hexdigest()[0], 16)
        return 1 if d % 2 == 1 else -1

    proj = {
        v: [
            sum(sign(j, i) * e for i, e in enumerate(vec))
            for j in range(_JL_K)
        ]
        for v, vec in q.items()
    }
    ratios = []
    zero = 0
    for u, v in combinations(sorted(q), 2):
        dd = sum((a - b) ** 2 for a, b in zip(q[u], q[v]))
        pp = sum((a - b) ** 2 for a, b in zip(proj[u], proj[v]))
        if dd == 0:
            zero += 1
            continue
        ratios.append(math.floor(pp / (_JL_K * dd) * 1e6 + 0.5))
    row = (
        QUERIES["embedding_jl_projection_audit"].fn(spark, sf_dir)
        .collect()[0]
    )
    n_pairs = len(ratios) + zero
    assert row.k_dims == _JL_K
    assert row.n_pairs == n_pairs
    assert row.n_zero_dist_pairs == zero
    assert ratios
    mean = math.floor(sum(ratios) / len(ratios) + 0.5)
    within = sum(1 for r in ratios if 750000 <= r <= 1250000)
    assert abs(row.mean_distortion - round(mean / 1e6, 6)) < 1e-9
    assert abs(row.min_distortion - round(min(ratios) / 1e6, 6)) < 1e-9
    assert abs(row.max_distortion - round(max(ratios) / 1e6, 6)) < 1e-9
    assert abs(
        row.frac_within_25pct
        - round(math.floor(within / len(ratios) * 1e6 + 0.5) / 1e6, 6)
    ) < 1e-9
    # JL sanity: an unbiased sign projection concentrates around 1
    assert 0.5 < row.mean_distortion < 1.5


def test_price_elasticity_recompute(spark, sf_dir):
    """Recompute each brand's log-log OLS from collected order lines
    (6dp-rounded terms, exact decimal-style sums) and pin slope, R²,
    and the degenerate-brand guards."""
    from collections import defaultdict
    from decimal import Decimal

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    ).collect()
    pt = {
        r.p_partkey: r.p_brand
        for r in load_table(spark, sf_dir, "part").collect()
    }
    groups: dict = defaultdict(list)
    for r in li:
        if r.l_quantity > 0 and r.l_extendedprice > 0:
            x = round(math.log(r.l_extendedprice / r.l_quantity), 6)
            y = round(math.log(r.l_quantity), 6)
            groups[pt[r.l_partkey]].append((x, y))
    rows = {
        r.brand: r
        for r in QUERIES["features_price_elasticity"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(rows) == set(groups)
    q = Decimal("0.000001")
    n_fit = 0
    for brand, obs in groups.items():
        n = len(obs)
        sx = float(sum(Decimal(str(x)).quantize(q) for x, _ in obs))
        sy = float(sum(Decimal(str(y)).quantize(q) for _, y in obs))
        sxy = float(
            sum(Decimal(str(round(x * y, 6))).quantize(q) for x, y in obs)
        )
        sxx = float(
            sum(Decimal(str(round(x * x, 6))).quantize(q) for x, _ in obs)
        )
        syy = float(
            sum(Decimal(str(round(y * y, 6))).quantize(q) for _, y in obs)
        )
        r = rows[brand]
        assert r.n_obs == n
        if n >= 3 and n * sxx - sx * sx != 0:
            want = round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
            assert abs(r.elasticity - want) < 2e-4
            n_fit += 1
            if n * sxx - sx * sx > 0 and n * syy - sy * sy > 0:
                r2 = round(
                    (n * sxy - sx * sy) ** 2
                    / ((n * sxx - sx * sx) * (n * syy - sy * sy)),
                    4,
                )
                assert abs(r.r_squared - r2) < 2e-4
                assert -1e-9 <= r.r_squared <= 1.0 + 1e-9
    assert n_fit > 0  # richness: real fits exist on the smoke fixture


def test_isotonic_calibration_recompute(spark, sf_dir):
    """Recompute the isotonic table via an INDEPENDENT algorithm —
    classic pool-adjacent-violators — and check it matches the
    engines' minimax closed form bin for bin; pin monotonicity."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_events import (
        _horizon_cells,
    )

    rows = (
        QUERIES["events_isotonic_calibration"].fn(spark, sf_dir).collect()
    )
    cells = {
        r.stratum: r
        for r in _horizon_cells(spark, sf_dir).collect()
        if r.n_as > 0 and r.n_bs > 0
    }
    # the isotonic table carries exactly the double-populated bins
    assert {r.stratum for r in rows} == set(cells)
    if not rows:
        return
    # rebuild the weighted (conversions, users) sequence in fit
    # order from the EXACT cells (inverting the 6dp-rounded observed
    # rate would break past ~1e6 serve users — r16 review), then run
    # classic PAV with per-block member counts so pooled rates
    # expand back onto their bins
    seq = [
        (cells[r.stratum].c_bs, cells[r.stratum].n_bs) for r in rows
    ]
    blocks = [[c, n, 1] for c, n in seq]
    i = 0
    while i < len(blocks) - 1:
        c1, n1, m1 = blocks[i]
        c2, n2, m2 = blocks[i + 1]
        if c1 * n2 > c2 * n1:
            blocks[i] = [c1 + c2, n1 + n2, m1 + m2]
            del blocks[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    pav = []
    for c, n, m in blocks:
        r = round(math.floor(c / n * 1e6 + 0.5) / 1e6, 6)
        pav.extend([r] * m)
    got = [r.isotonic_rate for r in rows]
    assert len(got) == len(pav)
    for g, w in zip(got, pav):
        # the minimax closed form quantizes interval averages before
        # the lattice; PAV pools exact integers then quantizes once —
        # agreement within one micro
        assert abs(g - w) <= 2e-6
    # monotone by construction
    assert got == sorted(got)


def test_ipf_raking_recompute(spark, sf_dir):
    """Recompute the IPF chain imperatively (same quantization per
    step) from collected orders and pin weights, fitted counts, and
    the convergence property: after the rounds, both weighted
    margins sit within a tiny relative gap of their targets."""
    import hashlib
    from collections import Counter

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_extra import (
        _IPF_ROUNDS,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    ).collect()
    cust = {
        r.c_custkey: r.c_mktsegment
        for r in load_table(spark, sf_dir, "customer").collect()
    }
    rows_all = []
    for r in o:
        seg = cust[r.o_custkey]
        ins = (
            hashlib.md5(str(r.o_custkey).encode()).hexdigest()[:2] < "80"
        )
        rows_all.append((seg, r.o_orderpriority, ins))
    n = Counter((s, p) for s, p, i in rows_all if i)
    rm = Counter(s for s, _, _ in rows_all)
    cm = Counter(p for _, p, _ in rows_all)
    w = {k: 1000000 for k in n}

    def scale(axis_of, margin):
        sums: Counter = Counter()
        for k in n:
            sums[axis_of(k)] += n[k] * w[k]
        for k in n:
            ax = axis_of(k)
            if sums[ax]:
                w[k] = math.floor(
                    w[k] * margin[ax] * 1e6 / sums[ax] + 0.5
                )

    for _ in range(_IPF_ROUNDS):
        scale(lambda k: k[0], rm)
        scale(lambda k: k[1], cm)
    rows = {
        (r.seg, r.pri): r
        for r in QUERIES["features_ipf_raking"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == set(n)
    gaps = []
    for ax, tgt, axis_of in (
        (rm, rm, lambda k: k[0]),
        (cm, cm, lambda k: k[1]),
    ):
        sums: Counter = Counter()
        for k in n:
            sums[axis_of(k)] += n[k] * w[k]
        for a, t in tgt.items():
            if t and a in sums:
                gaps.append(
                    math.floor(abs(sums[a] / 1e6 - t) / t * 1e6 + 0.5)
                )
    want_gap = max(gaps)
    for k, r in rows.items():
        assert r.n_sample == n[k]
        assert abs(r.weight - round(w[k] / 1e6, 6)) < 1e-9
        assert r.fitted == math.floor(n[k] * w[k] / 1e6 + 0.5)
        assert abs(r.max_margin_gap - round(want_gap / 1e6, 6)) < 1e-9
    # raking converged: both margins within 0.1% of targets
    assert want_gap <= 1000
