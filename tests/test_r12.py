"""Round-12 operator invariants.

Every query here registered AFTER the r12 window froze (POST_PIN →
r13), so the pin is never at risk; each carries its three-SF strict
oracle sweep plus an independent recompute or exact-invariant test
below."""

from __future__ import annotations

import math

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
    QUERIES,
)


def test_did_estimator_exact_recompute(spark, sf_dir):
    """Driver-side recompute of the difference-in-differences readout
    from the raw events — the md5 split, the integer-midpoint period
    cut, the eight cell counts, and the micro-quantized estimate /
    standard-error / z chain must all match bit-for-bit."""
    import hashlib

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )
    from pyspark.sql import functions as F

    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            (F.col("event_type") == "purchase").alias("is_purchase"),
        )
        .collect()
    )
    mid = (min(r.us for r in rows) + max(r.us for r in rows)) // 2
    cell = {}  # (treat, post) -> {user: conv}
    for r in rows:
        treat = (
            1
            if hashlib.md5(str(r.user_id).encode()).hexdigest()[:2] < "80"
            else 0
        )
        post = 0 if r.us < mid else 1
        users = cell.setdefault((treat, post), {})
        users[r.user_id] = users.get(r.user_id, 0) or int(r.is_purchase)
    n = {k: len(v) for k, v in cell.items()}
    c = {k: sum(v.values()) for k, v in cell.items()}

    def rate(k):
        return c[k] / n[k]

    order = [(1, 0), (1, 1), (0, 0), (0, 1)]  # t_pre t_post c_pre c_post
    assert all(n.get(k, 0) > 0 for k in order), "fixture lost a cell"
    did = (rate((1, 1)) - rate((1, 0))) - (rate((0, 1)) - rate((0, 0)))
    se = math.sqrt(
        sum(rate(k) * (1.0 - rate(k)) / n[k] for k in order)
    )
    did_micro = math.floor(did * 1e6 + 0.5)
    z_micro = math.floor(did / se * 1e6 + 0.5) if se > 0 else None
    r = QUERIES["events_did_estimator"].fn(spark, sf_dir).collect()[0]
    assert (
        r.n_t_pre,
        r.c_t_pre,
        r.n_t_post,
        r.c_t_post,
        r.n_c_pre,
        r.c_c_pre,
        r.n_c_post,
        r.c_c_post,
    ) == tuple(x for k in order for x in (n[k], c[k]))
    for nm, k in zip(
        ("rate_t_pre", "rate_t_post", "rate_c_pre", "rate_c_post"), order
    ):
        assert getattr(r, nm) == math.floor(rate(k) * 1e6 + 0.5) / 1e6
    assert r.did_estimate == did_micro / 1e6
    assert r.z_score == (None if z_micro is None else z_micro / 1e6)
    assert r.significant_95 == (
        1 if z_micro is not None and abs(z_micro) > 1959964 else 0
    )


def test_theil_decomposition_exact_recompute(spark, sf_dir):
    """Driver-side Theil recompute from raw orders/customer rows with
    the exact cents and micro-quantization rules, plus the inequality
    invariants: T ≥ 0, T_between ≥ 0, T_within ≥ 0 (clamped), and
    between_share ∈ [0, 1]."""
    from collections import defaultdict

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    spend = defaultdict(int)
    for r in (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    ):
        spend[r.o_custkey] += math.floor(float(r.o_totalprice) * 100.0 + 0.5)
    nation = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    n = len(spend)
    s = sum(spend.values())
    g = defaultdict(lambda: [0, 0])  # nation -> [n_g, s_g]
    for cust, x in spend.items():
        e = g[nation[cust]]
        e[0] += 1
        e[1] += x
    # mirror the engine's (CAST(x AS DOUBLE) * n) / s evaluation order
    t_sum = sum(
        math.floor(
            (float(x) * n / s) * math.log(float(x) * n / s) * 1e6 + 0.5
        )
        for x in spend.values()
    )
    t_micro = math.floor(t_sum / n + 0.5)
    tb_micro = sum(
        math.floor(
            (float(sg) / s)
            * math.log((float(sg) * n) / (float(ng) * s))
            * 1e6
            + 0.5
        )
        for ng, sg in g.values()
    )
    # consistent clamps (r12 review): 0 <= tb_c <= t_c by construction
    t_c = max(t_micro, 0)
    tb_c = min(max(tb_micro, 0), t_c)
    r = QUERIES["agg_theil_decomposition"].fn(spark, sf_dir).collect()[0]
    assert (r.n_customers, r.n_groups, r.total_spend_cents) == (n, len(g), s)
    assert r.theil_total == t_c / 1e6
    assert r.theil_between == tb_c / 1e6
    assert r.theil_within == (t_c - tb_c) / 1e6
    assert r.theil_total >= 0 and r.theil_between >= 0
    assert r.theil_within >= 0
    if t_c > 0:
        assert r.between_share == math.floor(tb_c / t_c * 1e6 + 0.5) / 1e6
        assert 0.0 <= r.between_share <= 1.0


def test_adamic_adar_exact_recompute(spark, sf_dir):
    """Driver-side Adamic–Adar recompute on the capped edge set: the
    engine's top-20 must equal the exact pairwise computation (weights
    from capped degrees, integer micro sums, (aa desc, s1, s2) order),
    and every reported pair must also appear in the Jaccard family's
    shared-customer pair relation with the same count."""
    from collections import defaultdict

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark import (
        queries_retrieval as R,
    )

    ee = R._cosupp_capped_edges(spark, sf_dir).collect()
    by_cust = defaultdict(set)
    for r in ee:
        by_cust[r.cust].add(r.supp)
    pair = defaultdict(lambda: [0, 0])  # (s1,s2) -> [shared, aa_micro]
    for supps in by_cust.values():
        if len(supps) < 2:
            continue
        w = math.floor(1e6 / math.log(float(len(supps))) + 0.5)
        ss = sorted(supps)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                e = pair[(a, b)]
                e[0] += 1
                e[1] += w
    want = sorted(
        ((v[1], k[0], k[1], v[0]) for k, v in pair.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[: R._AA_TOP]
    got = [
        (
            round(r.adamic_adar * 1e6),
            r.s1,
            r.s2,
            r.shared_customers,
        )
        for r in QUERIES["graph_adamic_adar"].fn(spark, sf_dir).collect()
    ]
    assert got == [(aa, s1, s2, sh) for aa, s1, s2, sh in want]
    assert got, "fixture produced no co-supplier pairs"


def test_lateral_recent_avg_matches_sparks_own_decorrelation(
    spark, sf_dir
):
    """The registered rank-filter formulation must (a) return exactly
    the rows of Spark's own decorrelation of the LATERAL SQL text,
    (b) plan with WindowGroupLimit pre-pruning and WITHOUT the global
    range sort Spark's decorrelation inserts, and (c) never plan a
    nested loop."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark import (
        queries_analytics as A,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        register_views,
    )

    df = QUERIES["join_lateral_recent_avg"].fn(spark, sf_dir)
    rows = df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "rangepartitioning" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    got = {(r.c_custkey, r.n_recent, r.recent_avg_cents) for r in rows}
    register_views(spark, sf_dir, ["customer", "orders"])
    lateral = spark.sql(A._LATERAL_RECENT_SQL)
    # Spark's own decorrelation of agg-over-limit: correct, but with
    # the global range sort the registered formulation avoids
    lplan = lateral._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in lplan  # documents WHY we reformulate
    want = {
        (r.c_custkey, r.n_recent, r.recent_avg_cents)
        for r in lateral.collect()
    }
    assert got == want and got


def test_did_expression_tree_cross_engine_property(spark):
    """The DiD estimate/SE/z kernel is claimed deterministic because
    it is ONE fixed tree of exactly-rounded IEEE ops over eight BIGINT
    counts — drive randomized count tuples through the SAME fragments
    in Spark, DuckDB, and a Python mirror and require bit-identical
    micro values (including the degenerate-cell NULL paths)."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark import (
        queries_events as E,
    )

    cols = [
        "n_t_pre", "c_t_pre", "n_t_post", "c_t_post",
        "n_c_pre", "c_c_pre", "n_c_post", "c_c_post",
    ]
    sel_did = (
        f"CASE WHEN {E._DID_CELLS_OK} THEN"
        f" CAST(floor({E._DID_EST} * 1000000e0 + 0.5e0) AS BIGINT) END"
        " AS did_micro"
    )
    sel_z = (
        f"CASE WHEN {E._DID_CELLS_OK} AND {E._DID_SE} > 0e0 THEN"
        f" CAST(floor({E._DID_EST} / {E._DID_SE}"
        " * 1000000e0 + 0.5e0) AS BIGINT) END AS z_micro"
    )
    con = duckdb.connect()

    cell = st.integers(min_value=0, max_value=10**6).flatmap(
        lambda n: st.tuples(
            st.just(n), st.integers(min_value=0, max_value=n)
        )
    )

    @settings(max_examples=25, deadline=None)
    @given(st.tuples(cell, cell, cell, cell))
    def run(cells):
        vals = [x for pair in cells for x in pair]
        row = dict(zip(cols, vals))
        sdf = spark.createDataFrame([row]).selectExpr(*cols)
        s = sdf.selectExpr("*", sel_did, sel_z).collect()[0]
        d = con.execute(
            f"SELECT {sel_did}, {sel_z}"
            f" FROM (VALUES ({', '.join(map(str, vals))}))"
            f" t({', '.join(cols)})"
        ).fetchone()
        # python mirror of the same tree
        n = {c: v for c, v in zip(cols, vals)}
        ok = all(
            n[f"n_{c}"] > 0 for c in ("t_pre", "t_post", "c_pre", "c_post")
        )
        did = se = None
        if ok:
            r = {
                c: n[f"c_{c}"] / n[f"n_{c}"]
                for c in ("t_pre", "t_post", "c_pre", "c_post")
            }
            did = (r["t_post"] - r["t_pre"]) - (r["c_post"] - r["c_pre"])
            se = math.sqrt(
                sum(
                    r[c] * (1.0 - r[c]) / n[f"n_{c}"]
                    for c in ("t_pre", "t_post", "c_pre", "c_post")
                )
            )
        want_did = math.floor(did * 1e6 + 0.5) if ok else None
        want_z = (
            math.floor(did / se * 1e6 + 0.5) if ok and se > 0 else None
        )
        assert (s.did_micro, s.z_micro) == (d[0], d[1]) == (
            want_did,
            want_z,
        )

    run()


def test_baseline_reland_control_flow(monkeypatch, capsys):
    """Pin the re-land tool's three subprocess outcomes (r11 ADVICE +
    r12 review): no JSON → clear abort; nonzero exit WITH result JSON
    (bench's regression flag against the stale baselines) → note and
    continue; clean run → BASELINE_SEC literal printed. The
    calibration probe and bench subprocess are stubbed so the test is
    engine-free."""
    import importlib
    import sys
    import types

    reland = importlib.import_module("tools.baseline_reland")
    monkeypatch.setattr(reland, "calibration_ratio", lambda: 1.0)

    def fake_run(payloads):
        it = iter(payloads)

        def run(*a, **k):
            rc, out = next(it)
            return types.SimpleNamespace(
                returncode=rc, stdout=out, stderr="boom"
            )

        return run

    result_line = (
        '{"metric": "m", "value": 1.0, "queries": {"q1": 0.5},'
        ' "host_calibration_ratio": 1.0, "regressions": ["q1"]}'
    )
    monkeypatch.setattr(sys, "argv", ["baseline_reland.py", "--runs", "1"])

    # 1: bench dies with no JSON → abort rc 1
    monkeypatch.setattr(
        reland.subprocess, "run", fake_run([(1, "garbage, no json")])
    )
    assert reland.main() == 1
    assert "no parsable JSON output" in capsys.readouterr().out

    # 2: nonzero exit WITH JSON → continue and emit the literal
    monkeypatch.setattr(
        reland.subprocess, "run", fake_run([(1, result_line)])
    )
    assert reland.main() == 0
    out = capsys.readouterr().out
    assert "regressions vs the STALE baselines" in out
    assert "BASELINE_SEC = {" in out

    # 3: clean run → literal printed, no abort note
    monkeypatch.setattr(
        reland.subprocess, "run", fake_run([(0, result_line)])
    )
    assert reland.main() == 0
    out = capsys.readouterr().out
    assert "BASELINE_SEC = {" in out and "ABORT" not in out

    # 4 (r12 ADVICE): bench's r13 two-line contract — the full
    # per-query line followed by the tagged compact line, with a
    # TRUNCATED partial trailing fragment after them; the parser must
    # skip the fragment, see the compact line, and still prefer the
    # line that carries the per-query dict.
    compact_line = (
        '{"compact": true, "metric": "m", "value": 1.0,'
        ' "host_calibration_ratio": 1.0, "regressions": []}'
    )
    headline_line = (
        '{"metric": "m", "value": 1.0,'
        ' "queries": {"flagship_enriched_sample": 0.5},'
        ' "host_calibration_ratio": 1.0, "regressions": []}'
    )
    two_lines = (
        headline_line + "\n" + compact_line + '\n{"metric": "m", "val'
    )
    monkeypatch.setattr(
        reland.subprocess, "run", fake_run([(0, two_lines)])
    )
    assert reland.main() == 0
    out = capsys.readouterr().out
    assert "BASELINE_SEC = {" in out and '"flagship_enriched_sample"' in out

    # 5: ONLY the compact line survived (full line truncated away) →
    # clear abort, not a KeyError
    monkeypatch.setattr(
        reland.subprocess, "run", fake_run([(0, compact_line)])
    )
    assert reland.main() == 1
    assert "compact totals line" in capsys.readouterr().out


def test_theil_l_exact_recompute_and_t_consistency(spark, sf_dir):
    """Driver-side Theil L (MLD) recompute with the exact micro rules
    and consistent clamps, plus the family invariant that both
    decomposable indices ride the SAME base relations (equal
    n_customers / n_groups / total_spend_cents as the T query)."""
    from collections import defaultdict

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    spend = defaultdict(int)
    for r in (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_totalprice")
        .collect()
    ):
        spend[r.o_custkey] += math.floor(float(r.o_totalprice) * 100.0 + 0.5)
    nation = {
        r.c_custkey: r.c_nationkey
        for r in load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .collect()
    }
    n, s = len(spend), sum(spend.values())
    g = defaultdict(lambda: [0, 0])
    for cust, x in spend.items():
        e = g[nation[cust]]
        e[0] += 1
        e[1] += x
    l_sum = sum(
        math.floor(
            math.log(float(s) / (float(x) * n)) * 1e6 + 0.5
        )
        for x in spend.values()
    )
    lb = sum(
        math.floor(
            (float(ng) / n)
            * math.log((float(s) * ng) / (float(n) * sg))
            * 1e6
            + 0.5
        )
        for ng, sg in g.values()
    )
    l_c = max(math.floor(l_sum / n + 0.5), 0)
    lb_c = min(max(lb, 0), l_c)
    r = QUERIES["agg_theil_l_decomposition"].fn(spark, sf_dir).collect()[0]
    assert (r.n_customers, r.n_groups, r.total_spend_cents) == (n, len(g), s)
    assert r.mld_total == l_c / 1e6
    assert r.mld_between == lb_c / 1e6
    assert r.mld_within == (l_c - lb_c) / 1e6
    t = QUERIES["agg_theil_decomposition"].fn(spark, sf_dir).collect()[0]
    assert (t.n_customers, t.n_groups, t.total_spend_cents) == (
        r.n_customers,
        r.n_groups,
        r.total_spend_cents,
    )


def test_resource_allocation_exact_recompute_fp_free(spark, sf_dir):
    """Driver-side RA recompute: weights via the PURE INTEGER identity
    (2e6 + d) // (2d) (== round(1e6/d), checked explicitly), same
    pair multiset as Adamic–Adar (equal shared_customers on the
    intersection of their top-20s)."""
    from collections import defaultdict

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark import (
        queries_retrieval as R,
    )

    for d in range(1, 101):  # the integer identity IS round-half-up
        assert (2_000_000 + d) // (2 * d) == math.floor(1e6 / d + 0.5)

    ee = R._cosupp_capped_edges(spark, sf_dir).collect()
    by_cust = defaultdict(set)
    for r in ee:
        by_cust[r.cust].add(r.supp)
    pair = defaultdict(lambda: [0, 0])
    for supps in by_cust.values():
        d = len(supps)
        if d < 2:
            continue
        w = (2_000_000 + d) // (2 * d)
        ss = sorted(supps)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                e = pair[(a, b)]
                e[0] += 1
                e[1] += w
    want = sorted(
        ((v[1], k[0], k[1], v[0]) for k, v in pair.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[: R._AA_TOP]
    got = [
        (round(r.resource_allocation * 1e6), r.s1, r.s2, r.shared_customers)
        for r in QUERIES["graph_resource_allocation"]
        .fn(spark, sf_dir)
        .collect()
    ]
    assert got == [(sc, s1, s2, sh) for sc, s1, s2, sh in want] and got
    aa = {
        (r.s1, r.s2): r.shared_customers
        for r in QUERIES["graph_adamic_adar"].fn(spark, sf_dir).collect()
    }
    for sc, s1, s2, sh in want:
        if (s1, s2) in aa:
            assert aa[(s1, s2)] == sh


def test_power_mde_recompute_and_ztest_consistency(spark, sf_dir):
    """Driver-side MDE recompute from the z-test's own cell counts —
    the two queries must agree on (n_a, n_b) since they share the
    count kernel, and the MDE chain must match the mirrored fixed
    tree bit-for-bit."""
    z = QUERIES["events_ab_conversion_ztest"].fn(spark, sf_dir).collect()[0]
    m = QUERIES["events_power_mde"].fn(spark, sf_dir).collect()[0]
    assert (m.n_a, m.n_b) == (z.n_a, z.n_b)
    assert m.n_total == z.n_a + z.n_b
    n_a, c_a, n_b, c_b = z.n_a, z.c_a, z.n_b, z.c_b
    p = (c_a + c_b) / (n_a + n_b)
    se = math.sqrt(p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b))
    assert m.pooled_rate == math.floor(p * 1e6 + 0.5) / 1e6
    if se > 0:
        assert m.se_design == math.floor(se * 1e6 + 0.5) / 1e6
        assert m.mde_abs == math.floor(2.801585 * se * 1e6 + 0.5) / 1e6
        assert m.mde_rel == math.floor(2.801585 * se / p * 1e6 + 0.5) / 1e6
        # the design must be self-consistent: a lift equal to the MDE
        # would produce |z| >= z_0.80 + z_0.975 > the 1.96 bar
        assert m.mde_abs > 0


def test_bootstrap_ci_exact_mirror(spark, sf_dir):
    """Full driver-side mirror of the deterministic Poisson bootstrap:
    md5-derived 48-bit ints vs the precomputed integer thresholds,
    integer replicate rates, [min, max] CI — every output cell must
    match exactly, and the weight distribution must be sane (mean
    weight within 20% of 1.0 across the replicate grid)."""
    import hashlib
    from collections import defaultdict

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark import (
        queries_events as E,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .collect()
    )
    conv = {}
    for r in rows:
        conv[r.user_id] = conv.get(r.user_id, 0) or int(
            r.event_type == "purchase"
        )

    def variant(uid):
        return (
            "a"
            if hashlib.md5(str(uid).encode()).hexdigest()[:2] < "80"
            else "b"
        )

    def weight(uid, b):
        h = int(
            hashlib.md5(
                f"{uid}:{b}{E._BOOT_SALT}".encode()
            ).hexdigest()[:12],
            16,
        )
        for k, t in enumerate(E._BOOT_T):
            if h < t:
                return k
        return 9

    rep = defaultdict(lambda: [0, 0])  # (variant, b) -> [num, den]
    pt = defaultdict(lambda: [0, 0])  # variant -> [n, c]
    wsum = wcnt = 0
    for uid, cv in conv.items():
        v = variant(uid)
        pt[v][0] += 1
        pt[v][1] += cv
        for b in range(E._BOOT_B):
            w = weight(uid, b)
            wsum += w
            wcnt += 1
            e = rep[(v, b)]
            e[0] += w * cv
            e[1] += w
    assert 0.8 < wsum / wcnt < 1.2  # Poisson(1) mean sanity
    want = {}
    for v in pt:
        rates = [
            (rep[(v, b)][0] * 1_000_000) // rep[(v, b)][1]
            for b in range(E._BOOT_B)
            if rep[(v, b)][1] > 0
        ]
        n, c = pt[v]
        want[v] = (
            n,
            (c * 1_000_000) // n / 1e6,
            min(rates) / 1e6,
            max(rates) / 1e6,
            len(rates),
        )
    got = {
        r.variant: (r.n_users, r.rate, r.ci_lo, r.ci_hi, r.n_replicates)
        for r in QUERIES["events_bootstrap_rate_ci"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert got == want
    for n, rate, lo, hi, nr in got.values():
        # a replicate whose resample drew all-zero weights carries no
        # rate (prob e^{-n} each — real at test scale), so valid
        # replicates can undershoot B
        assert lo <= hi and 0 < nr <= E._BOOT_B


def test_srm_check_integer_rule_and_ztest_consistency(spark, sf_dir):
    """SRM chi² must equal the integer recompute from the z-test's
    own cell sizes (shared kernel ⇒ identical n_a/n_b), and the
    violation flag must match the exact cross-multiplied rule."""
    z = QUERIES["events_ab_conversion_ztest"].fn(spark, sf_dir).collect()[0]
    m = QUERIES["events_srm_check"].fn(spark, sf_dir).collect()[0]
    assert (m.n_a, m.n_b, m.n_total) == (z.n_a, z.n_b, z.n_a + z.n_b)
    d2 = (m.n_a - m.n_b) ** 2
    tot = m.n_a + m.n_b
    # the overflow-proof decomposed forms (exact-int mirrors)
    assert m.srm_chi2 == (
        (d2 // tot) * 1_000_000 + (d2 % tot) * 1_000_000 // tot
    ) / 1e6
    assert m.srm_violation == (
        1 if d2 > (3_841_459 * tot) // 1_000_000 else 0
    )
    # and the decomposition is EQUIVALENT to the naive cross-multiply
    # wherever the naive form doesn't overflow (the reason it exists)
    for dd in range(0, 4000):
        for tt in (1, 2, 3, 1000, 999_983, 10**7):
            naive = dd * dd * 1_000_000 > 3_841_459 * tt
            robust = dd * dd > (3_841_459 * tt) // 1_000_000
            assert naive == robust, (dd, tt)


def test_cuped_exact_recompute(spark, sf_dir):
    """Full driver-side CUPED recompute from raw events: the midpoint
    cut, per-user (x, y) covariate/outcome, the twelve integer sums,
    and the θ / ρ² / raw / adjusted-difference chain must match
    bit-for-bit; ρ² must sit in [0, 1] and the adjustment must keep
    the contrast finite."""
    import hashlib

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )
    from pyspark.sql import functions as F

    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            (F.col("event_type") == "purchase").alias("p"),
        )
        .collect()
    )
    mid = (min(r.us for r in rows) + max(r.us for r in rows)) // 2
    xy = {}
    for r in rows:
        e = xy.setdefault(r.user_id, [0, 0])
        if r.p and r.us < mid:
            e[0] = 1
        if r.p and r.us >= mid:
            e[1] = 1
    n = len(xy)
    sx = sum(x for x, _ in xy.values())
    sy = sum(y for _, y in xy.values())
    sxy = sum(x * y for x, y in xy.values())
    sxx, syy = sx, sy  # binary
    cells = {1: [0, 0, 0], 0: [0, 0, 0]}  # treat -> [n, sx, sy]
    for uid, (x, y) in xy.items():
        t = (
            1
            if hashlib.md5(str(uid).encode()).hexdigest()[:2] < "80"
            else 0
        )
        cells[t][0] += 1
        cells[t][1] += x
        cells[t][2] += y
    n_a, sx_a, sy_a = cells[1]
    n_b, sx_b, sy_b = cells[0]
    # mirror the engine's NULLIF guards AND its double-by-double tree
    # (r12 second review: exact-int intermediates like num**2 pass
    # 2^53 around ~1e4 users and would drift an ulp from the engine's
    # DOUBLE*DOUBLE chain — every product below converts first)
    num = float(n) * sxy - float(sx) * sy
    var_x = float(n) * sxx - float(sx) * sx
    var_y = float(n) * syy - float(sy) * sy
    theta = num / var_x if var_x != 0.0 else None
    rho2 = (
        num * num / (var_x * var_y) if var_x * var_y != 0.0 else None
    )
    diff_raw = (
        sy_a / n_a - sy_b / n_b if n_a > 0 and n_b > 0 else None
    )
    diff_adj = (
        (sy_a / n_a - theta * (sx_a / n_a))
        - (sy_b / n_b - theta * (sx_b / n_b))
        if theta is not None and n_a > 0 and n_b > 0
        else None
    )

    def q(v):
        return None if v is None else math.floor(v * 1e6 + 0.5) / 1e6

    r = QUERIES["events_cuped_adjustment"].fn(spark, sf_dir).collect()[0]
    assert (r.n_users, r.n_a, r.n_b) == (n, n_a, n_b)
    assert r.theta == q(theta)
    assert r.var_reduction == q(rho2)
    assert r.diff_raw == q(diff_raw)
    assert r.diff_cuped == q(diff_adj)
    if r.var_reduction is not None:
        assert 0.0 <= r.var_reduction <= 1.0
