"""Round-13 operator invariants.

Every query here registered AFTER the r13 window froze (POST_PIN →
r14), so the pin is never at risk; each carries its three-SF strict
oracle sweep plus an independent recompute or exact-invariant test
below."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from pyspark.sql import functions as F

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
    QUERIES,
)
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
    load_table,
)


def _split_a(user_id) -> bool:
    return hashlib.md5(str(user_id).encode()).hexdigest()[:2] < "80"


def _user_spends(spark, sf_dir):
    """(user_id -> (variant, spend_cents)): the driver-side mirror of
    _USER_SPEND_CTE — per-user total purchase spend in exact cents,
    0 for never-purchasers, md5 hash-split tag."""
    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "value",
            (F.col("event_type") == "purchase").alias("is_purchase"),
        )
        .collect()
    )
    spend: dict = {}
    for r in rows:
        m = spend.setdefault(r.user_id, 0)
        if r.is_purchase:
            spend[r.user_id] = m + math.floor(float(r.value) * 100.0 + 0.5)
    return {
        u: ("a" if _split_a(u) else "b", m) for u, m in spend.items()
    }


def test_preferential_attachment_exact_recompute(spark, sf_dir):
    """Driver-side preferential-attachment recompute on the capped
    edge set: top-20 by the exact integer deg·deg product under the
    (score desc, s1, s2) order, shared-customer counts included —
    FP-free, so equality is exact with no quantization step."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark import (
        queries_retrieval as R,
    )

    ee = R._cosupp_capped_edges(spark, sf_dir).collect()
    by_cust = defaultdict(set)
    deg = defaultdict(int)
    for r in ee:
        by_cust[r.cust].add(r.supp)
        deg[r.supp] += 1
    pair = defaultdict(int)
    for supps in by_cust.values():
        ss = sorted(supps)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                pair[(a, b)] += 1
    want = sorted(
        (
            (deg[a] * deg[b], a, b, shared, deg[a], deg[b])
            for (a, b), shared in pair.items()
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )[: R._PA_TOP]
    got = [
        (r.pa_score, r.s1, r.s2, r.shared_customers, r.deg1, r.deg2)
        for r in QUERIES["graph_preferential_attachment"]
        .fn(spark, sf_dir)
        .collect()
    ]
    assert got == want
    assert got, "fixture produced no co-supplier pairs"


def test_atkinson_consistency_with_theil_l(spark, sf_dir):
    """The Atkinson query's mld must equal agg_theil_l_decomposition's
    mld_total bit-for-bit (shared base relations and clamp), and its
    atkinson_1 / EDE / mean columns must equal the driver-side
    transform of that SAME quantized L — the exp-of-quantized-input
    rule checked end to end."""
    l_row = (
        QUERIES["agg_theil_l_decomposition"].fn(spark, sf_dir).collect()[0]
    )
    a_row = QUERIES["agg_atkinson_index"].fn(spark, sf_dir).collect()[0]
    assert a_row.mld == l_row.mld_total
    assert a_row.n_customers == l_row.n_customers
    assert a_row.total_spend_cents == l_row.total_spend_cents
    n, s = a_row.n_customers, a_row.total_spend_cents
    l_micro = round(a_row.mld * 1e6)
    atk = math.floor((1.0 - math.exp(-(l_micro / 1e6))) * 1e6 + 0.5) / 1e6
    assert a_row.atkinson_1 == atk
    assert 0.0 <= a_row.atkinson_1 < 1.0
    assert a_row.mean_spend_cents == (2 * s + n) // (2 * n)
    assert a_row.ede_spend_cents == math.floor(
        (s / n) * math.exp(-(l_micro / 1e6)) + 0.5
    )
    # welfare ordering: EDE ≤ mean, with equality only at zero
    # inequality
    assert a_row.ede_spend_cents <= a_row.mean_spend_cents


def test_msprt_exact_recompute(spark, sf_dir):
    """Driver-side recompute of the full mSPRT daily monitor: entry
    and first-purchase days, cumulative what-the-dashboard-knew-at-d
    cells, the log-space mixture statistic, its running max, and the
    anytime-valid flag must all match bit-for-bit."""
    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
            (F.col("event_type") == "purchase").alias("is_purchase"),
        )
        .collect()
    )
    entry: dict = {}
    first_purchase: dict = {}
    for r in rows:
        if r.user_id not in entry or r.day < entry[r.user_id]:
            entry[r.user_id] = r.day
        if r.is_purchase and (
            r.user_id not in first_purchase
            or r.day < first_purchase[r.user_id]
        ):
            first_purchase[r.user_id] = r.day
    cells = defaultdict(lambda: [0, 0, 0, 0])  # day -> na ca nb cb
    for u, day in entry.items():
        e = cells[day]
        if _split_a(u):
            e[0] += 1
        else:
            e[2] += 1
    for u, day in first_purchase.items():
        e = cells[day]
        if _split_a(u):
            e[1] += 1
        else:
            e[3] += 1
    tau2 = 1e-4
    want = []
    na = ca = nb = cb = 0
    lnl_max = None
    for day in sorted(cells):
        d = cells[day]
        na, ca, nb, cb = na + d[0], ca + d[1], nb + d[2], cb + d[3]
        lnl = None
        if na > 0 and nb > 0 and 0 < ca + cb < na + nb:
            p = (ca + cb) / (na + nb)
            v = p * (1.0 - p) * (1.0 / na + 1.0 / nb)
            delta = ca / na - cb / nb
            lnl = math.floor(
                (
                    0.5 * math.log(v / (v + tau2))
                    + delta * delta * tau2 / (2.0 * v * (v + tau2))
                )
                * 1e6
                + 0.5
            )
        if lnl is not None:
            lnl_max = lnl if lnl_max is None else max(lnl_max, lnl)
        sig = None if lnl_max is None else int(lnl_max > 2995732)
        want.append(
            (
                day,
                na,
                ca,
                nb,
                cb,
                None if lnl is None else lnl / 1e6,
                None if lnl_max is None else lnl_max / 1e6,
                sig,
            )
        )
    got = [
        (
            r.day,
            r.n_a,
            r.c_a,
            r.n_b,
            r.c_b,
            r.log_e_value,
            r.log_e_running_max,
            r.significant_always_valid,
        )
        for r in QUERIES["events_msprt_always_valid"]
        .fn(spark, sf_dir)
        .collect()
    ]
    assert got == want
    assert len(got) > 1, "fixture produced fewer than two looks"


def test_qte_exact_order_statistics(spark, sf_dir):
    """Driver-side quantile-treatment-effect recompute: sort each
    variant's per-user spends under the (m, user_id) order, take the
    ceil(q·n)-th values, and require the two-pass bucket-rank query
    to reproduce them exactly — integer equality, no quantization."""
    spends = _user_spends(spark, sf_dir)
    by_var = defaultdict(list)
    for u, (v, m) in spends.items():
        by_var[v].append((m, u))
    want = []
    for pct in (25, 50, 75, 90):
        out = {"pct": pct}
        for v in ("a", "b"):
            vals = sorted(by_var[v])
            n = len(vals)
            out[f"n_{v}"] = n
            out[f"q_{v}"] = vals[(pct * n + 99) // 100 - 1][0]
        want.append(
            (
                pct,
                out["n_a"],
                out["q_a"],
                out["n_b"],
                out["q_b"],
                out["q_a"] - out["q_b"],
            )
        )
    got = [
        (r.quantile_pct, r.n_a, r.q_a_cents, r.n_b, r.q_b_cents, r.qte_cents)
        for r in QUERIES["events_quantile_treatment_effect"]
        .fn(spark, sf_dir)
        .collect()
    ]
    assert got == want
    assert all(n > 0 for _, n, _, _, _, _ in got), "fixture lost a variant"


def test_winsorized_lift_exact_recompute(spark, sf_dir):
    """Driver-side winsorized-lift recompute: pooled 95th-percentile
    cap as an order statistic, capped int64 cells, and the
    NULLIF-guarded Welch z tree — all outputs bit-for-bit."""
    spends = _user_spends(spark, sf_dir)
    pooled = sorted((m, u) for u, (_v, m) in spends.items())
    n = len(pooled)
    cap = pooled[(95 * n + 99) // 100 - 1][0]
    cells = {v: [0, 0, 0] for v in ("a", "b")}  # n, sw, sww
    for _u, (v, m) in spends.items():
        w = min(m, cap)
        cells[v][0] += 1
        cells[v][1] += w
        cells[v][2] += w * w
    (n_a, sw_a, sww_a), (n_b, sw_b, sww_b) = cells["a"], cells["b"]

    def var(nn, sw, sww):
        # mirror the engine's CAST-to-DOUBLE products
        return (float(nn) * float(sww) - float(sw) * float(sw)) / (
            float(nn) * (nn - 1)
        )

    diff = sw_a / n_a - sw_b / n_b
    se = math.sqrt(var(n_a, sw_a, sww_a) / n_a + var(n_b, sw_b, sww_b) / n_b)
    z_micro = (
        math.floor(diff / se * 1e6 + 0.5)
        if n_a > 1 and n_b > 1 and se > 0
        else None
    )
    r = QUERIES["events_winsorized_lift"].fn(spark, sf_dir).collect()[0]
    assert r.cap_cents == cap
    assert (r.n_a, r.n_b) == (n_a, n_b)
    assert r.mean_a_cents == math.floor(sw_a / n_a * 1e6 + 0.5) / 1e6
    assert r.mean_b_cents == math.floor(sw_b / n_b * 1e6 + 0.5) / 1e6
    assert r.lift_cents == math.floor(diff * 1e6 + 0.5) / 1e6
    assert r.z_score == (None if z_micro is None else z_micro / 1e6)
    assert r.significant_95 == (
        None if z_micro is None else int(abs(z_micro) > 1959964)
    )


def test_qte_and_winsorized_share_spend_base(spark, sf_dir):
    """The QTE median (q50) and the winsorized cap both come from the
    SAME per-user spend relation: the pooled p95 cap must be ≥ both
    variants' p90 order statistics only when the pooled tail says so
    — checked structurally by requiring cap ≥ pooled median and every
    QTE value ≤ the pooled max spend."""
    spends = _user_spends(spark, sf_dir)
    pooled = sorted(m for _v, m in spends.values())
    cap = (
        QUERIES["events_winsorized_lift"].fn(spark, sf_dir).collect()[0]
    ).cap_cents
    assert cap >= pooled[(50 * len(pooled) + 99) // 100 - 1]
    mx = pooled[-1]
    for r in (
        QUERIES["events_quantile_treatment_effect"]
        .fn(spark, sf_dir)
        .collect()
    ):
        assert r.q_a_cents <= mx and r.q_b_cents <= mx


def test_mannwhitney_exact_recompute(spark, sf_dir):
    """Driver-side Mann–Whitney recompute in the same doubled integer
    units: midrank rank sum, U, exact tie correction, rank-biserial,
    and the micro-quantized z must all match bit-for-bit."""
    spends = _user_spends(spark, sf_dir)
    cells = defaultdict(lambda: [0, 0])  # m -> [na, nb]
    for _u, (v, m) in spends.items():
        cells[m][0 if v == "a" else 1] += 1
    n_a = sum(c[0] for c in cells.values())
    n_b = sum(c[1] for c in cells.values())
    nn = n_a + n_b
    r2_a = s_t = 0
    cb = 0
    for m in sorted(cells):
        na_m, nb_m = cells[m]
        t = na_m + nb_m
        r2_a += na_m * (2 * cb + t + 1)
        s_t += t * t * t - t
        cb += t
    u2_a = r2_a - n_a * (n_a + 1)
    var = (n_a * n_b / 12.0) * ((nn + 1.0) - s_t / (nn * (nn - 1.0)))
    z_micro = (
        math.floor(
            (u2_a - float(n_a) * float(n_b)) / (2.0 * math.sqrt(var)) * 1e6
            + 0.5
        )
        if n_a > 0 and n_b > 0 and var > 0
        else None
    )
    r = QUERIES["events_mannwhitney_u"].fn(spark, sf_dir).collect()[0]
    assert (r.n_a, r.n_b) == (n_a, n_b)
    assert r.u_a == u2_a / 2.0
    assert r.rank_biserial == (
        math.floor((u2_a / (float(n_a) * float(n_b)) - 1.0) * 1e6 + 0.5)
        / 1e6
    )
    assert r.z_score == (None if z_micro is None else z_micro / 1e6)
    assert r.significant_95 == (
        None if z_micro is None else int(abs(z_micro) > 1959964)
    )
    # U is bounded by n_a*n_b and rank-biserial lives in [-1, 1]
    assert 0.0 <= r.u_a <= n_a * n_b
    assert -1.0 <= r.rank_biserial <= 1.0


def test_stratified_lift_exact_recompute(spark, sf_dir):
    """Driver-side post-stratification recompute: first-event-type strata,
    nano/pico per-stratum quantization, empty-arm guard, and the z
    chain must all match bit-for-bit."""
    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            (F.col("event_type") == "purchase").alias("is_purchase"),
        )
        .collect()
    )
    first: dict = {}
    conv: dict = {}
    for r in rows:
        k = r.user_id
        key = (r.ts, r.event_id, r.event_type)
        if k not in first or key < first[k]:
            first[k] = key
        conv[k] = conv.get(k, 0) or int(r.is_purchase)
    st = defaultdict(lambda: [0, 0, 0, 0])  # type -> n_as c_as n_bs c_bs
    for k, (_ts, _eid, etype) in first.items():
        e = st[etype]
        if _split_a(k):
            e[0] += 1
            e[1] += conv[k]
        else:
            e[2] += 1
            e[3] += conv[k]
    nn = sum(e[0] + e[2] for e in st.values())
    n_a = sum(e[0] for e in st.values())
    c_a = sum(e[1] for e in st.values())
    n_b = sum(e[2] for e in st.values())
    c_b = sum(e[3] for e in st.values())
    d_nano = v_pico = bad = 0
    for e in st.values():
        n_as, c_as, n_bs, c_bs = e
        if n_as == 0 or n_bs == 0:
            bad += 1
            continue
        w = (n_as + n_bs) / nn
        pa, pb = c_as / n_as, c_bs / n_bs
        d_nano += math.floor(w * (pa - pb) * 1e9 + 0.5)
        v_pico += math.floor(
            w * w * (pa * (1.0 - pa) / n_as + pb * (1.0 - pb) / n_bs)
            * 1e12
            + 0.5
        )
    r = QUERIES["events_stratified_lift"].fn(spark, sf_dir).collect()[0]
    assert (r.n_strata, r.bad_strata) == (len(st), bad)
    assert (r.n_a, r.n_b) == (n_a, n_b)
    assert r.diff_raw == math.floor(
        (c_a / n_a - c_b / n_b) * 1e6 + 0.5
    ) / 1e6
    if bad == 0:
        assert r.diff_stratified == (
            math.floor(d_nano / 1e9 * 1e6 + 0.5) / 1e6
        )
        if v_pico > 0:
            z = (d_nano / 1e9) / math.sqrt(v_pico / 1e12)
            z_micro = math.floor(z * 1e6 + 0.5)
            assert r.z_score == z_micro / 1e6
            assert r.significant_95 == int(abs(z_micro) > 1959964)
    else:
        assert r.diff_stratified is None and r.z_score is None
    assert len(st) >= 2, "fixture produced fewer than two strata"


def test_did_placebo_consistency_and_recompute(spark, sf_dir):
    """The placebo must equal a driver-side DiD recompute restricted
    to the pre-period (split at the pre-midpoint), and its period
    boundaries must nest inside the estimator's: placebo uses only
    events strictly before the estimator's midpoint."""
    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.unix_micros("ts").alias("us"),
            (F.col("event_type") == "purchase").alias("is_purchase"),
        )
        .collect()
    )
    mn = min(r.us for r in rows)
    mid = (mn + max(r.us for r in rows)) // 2
    pmid = (mn + mid) // 2
    cell: dict = {}
    for r in rows:
        if r.us >= mid:
            continue  # placebo lives entirely in the pre-period
        treat = 1 if _split_a(r.user_id) else 0
        post = 0 if r.us < pmid else 1
        users = cell.setdefault((treat, post), {})
        users[r.user_id] = users.get(r.user_id, 0) or int(r.is_purchase)
    order = [(1, 0), (1, 1), (0, 0), (0, 1)]
    n = {k: len(cell.get(k, {})) for k in order}
    c = {k: sum(cell.get(k, {}).values()) for k in order}
    r = (
        QUERIES["events_did_placebo_pretrends"]
        .fn(spark, sf_dir)
        .collect()[0]
    )
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
    if all(n[k] > 0 for k in order):

        def rate(k):
            return c[k] / n[k]

        did = (rate((1, 1)) - rate((1, 0))) - (rate((0, 1)) - rate((0, 0)))
        se = math.sqrt(
            sum(rate(k) * (1.0 - rate(k)) / n[k] for k in order)
        )
        assert r.placebo_estimate == math.floor(did * 1e6 + 0.5) / 1e6
        if se > 0:
            z_micro = math.floor(did / se * 1e6 + 0.5)
            assert r.z_score == z_micro / 1e6
            assert r.parallel_trends_violation == int(
                abs(z_micro) > 1959964
            )
    # the placebo population is a subset of the estimator's pre cells
    est = QUERIES["events_did_estimator"].fn(spark, sf_dir).collect()[0]
    assert r.n_t_pre + r.n_t_post >= est.n_t_pre
    assert r.n_c_pre + r.n_c_post >= est.n_c_pre


def test_confidence_sequence_recompute_and_msprt_consistency(
    spark, sf_dir
):
    """Driver-side recompute of the confidence sequence (same daily
    cells as the mSPRT test, the inverted-mixture radius, running
    intersection, empty flag) — plus the duality check: on any day
    the monitor declares significance, the running intersection must
    exclude 0."""
    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
            (F.col("event_type") == "purchase").alias("is_purchase"),
        )
        .collect()
    )
    entry: dict = {}
    first_purchase: dict = {}
    for r in rows:
        if r.user_id not in entry or r.day < entry[r.user_id]:
            entry[r.user_id] = r.day
        if r.is_purchase and (
            r.user_id not in first_purchase
            or r.day < first_purchase[r.user_id]
        ):
            first_purchase[r.user_id] = r.day
    cells = defaultdict(lambda: [0, 0, 0, 0])
    for u, day in entry.items():
        cells[day][0 if _split_a(u) else 2] += 1
    for u, day in first_purchase.items():
        cells[day][1 if _split_a(u) else 3] += 1
    tau2, lninv = 1e-4, 2.995732273553991
    want = []
    na = ca = nb = cb = 0
    lo_run = hi_run = None
    for day in sorted(cells):
        dd = cells[day]
        na, ca, nb, cb = na + dd[0], ca + dd[1], nb + dd[2], cb + dd[3]
        delta = lo = hi = None
        if na > 0 and nb > 0 and 0 < ca + cb < na + nb:
            p = (ca + cb) / (na + nb)
            v = p * (1.0 - p) * (1.0 / na + 1.0 / nb)
            dl = ca / na - cb / nb
            rr = math.sqrt(
                (2.0 * v * (v + tau2) / tau2)
                * (lninv + 0.5 * math.log((v + tau2) / v))
            )
            delta = math.floor(dl * 1e6 + 0.5)
            lo = math.floor((dl - rr) * 1e6 + 0.5)
            hi = math.floor((dl + rr) * 1e6 + 0.5)
        if lo is not None:
            lo_run = lo if lo_run is None else max(lo_run, lo)
            hi_run = hi if hi_run is None else min(hi_run, hi)
        empty = (
            None
            if lo_run is None
            else int(lo_run > hi_run)
        )
        want.append(
            (
                day,
                na,
                ca,
                nb,
                cb,
                None if delta is None else delta / 1e6,
                None if lo is None else lo / 1e6,
                None if hi is None else hi / 1e6,
                None if lo_run is None else lo_run / 1e6,
                None if hi_run is None else hi_run / 1e6,
                empty,
            )
        )
    got_rows = (
        QUERIES["events_confidence_sequence"].fn(spark, sf_dir).collect()
    )
    got = [
        (
            r.day,
            r.n_a,
            r.c_a,
            r.n_b,
            r.c_b,
            r.lift,
            r.ci_lo,
            r.ci_hi,
            r.ci_lo_running,
            r.ci_hi_running,
            r.intersection_empty,
        )
        for r in got_rows
    ]
    assert got == want
    # duality vs the mSPRT monitor on the shared cells: a significant
    # monitor day must have the running intersection excluding 0
    mon = {
        r.day: r.significant_always_valid
        for r in QUERIES["events_msprt_always_valid"]
        .fn(spark, sf_dir)
        .collect()
    }
    for r in got_rows:
        if mon.get(r.day) == 1:
            # >= / <= : a hairline monitor crossing can quantize the
            # excluded-zero bound to exactly 0.0 (the duality holds in
            # unquantized space; floor(x*1e6+0.5) maps tiny positive
            # margins to 0) — r13 second review
            assert (
                r.ci_lo_running is not None
                and (r.ci_lo_running >= 0 or r.ci_hi_running <= 0)
            )


def test_split_behavior_chi2_exact_recompute(spark, sf_dir):
    """Driver-side Pearson chi-square recompute over the
    (variant × event_type) contingency table with per-cell micro
    quantization, plus df/critical-value flag logic."""
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .collect()
    )
    cells = defaultdict(int)
    for r in rows:
        cells[("a" if _split_a(r.user_id) else "b", r.event_type)] += 1
    rt = defaultdict(int)
    ct = defaultdict(int)
    for (v, t), o in cells.items():
        rt[v] += o
        ct[t] += o
    nn = sum(cells.values())
    chi2 = 0
    min_e = None
    # full grid including structural zeros (r13 second review): an
    # absent (variant, type) cell contributes (0 - e)^2/e = e
    for v in rt:
        for t in ct:
            o = cells.get((v, t), 0)
            e = float(rt[v]) * ct[t] / nn
            chi2 += math.floor((o - e) * (o - e) / e * 1e6 + 0.5)
            e_micro = math.floor(e * 1e6 + 0.5)
            min_e = e_micro if min_e is None else min(min_e, e_micro)
    df = (len(rt) - 1) * (len(ct) - 1)
    crit = {1: 3841459, 2: 5991465, 3: 7814728, 4: 9487729,
            5: 11070498, 6: 12591587, 7: 14067140, 8: 15507313}.get(df)
    r = (
        QUERIES["events_split_behavior_chi2"].fn(spark, sf_dir).collect()[0]
    )
    assert (r.n_events, r.n_variants, r.n_types, r.df) == (
        nn,
        len(rt),
        len(ct),
        df,
    )
    assert r.chi2 == chi2 / 1e6
    assert r.min_expected == min_e / 1e6
    assert r.behavior_imbalance_95 == (
        None if crit is None else int(chi2 > crit)
    )
    assert df >= 1 and len(ct) >= 2, "fixture lost event-type variety"


def test_ratio_metric_exact_recompute(spark, sf_dir):
    """Driver-side delta-method recompute of the purchases-per-
    active-day ratio z: twelve exact sums, per-arm variances, and the
    micro-quantized z chain must all match bit-for-bit."""
    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
            (F.col("event_type") == "purchase").alias("is_purchase"),
        )
        .collect()
    )
    days = defaultdict(set)
    buys = defaultdict(int)
    for r in rows:
        days[r.user_id].add(r.day)
        if r.is_purchase:
            buys[r.user_id] += 1
    sums = {s: [0] * 6 for s in "ab"}  # n sx sy sxx syy sxy
    for u, ds in days.items():
        x, y = len(ds), buys.get(u, 0)
        e = sums["a" if _split_a(u) else "b"]
        e[0] += 1
        e[1] += x
        e[2] += y
        e[3] += x * x
        e[4] += y * y
        e[5] += x * y

    def arm(e):
        # mirrors _RATIO_VAR's exact association order (multiply the
        # moment DIFFERENCE by R before the /den division — dividing
        # first computes a different last-ulp double; r13 second
        # review): term_i = coef * (n*s** - s*s) / den, summed left
        # to right, then / (n * xbar * xbar)
        n, sx, sy, sxx, syy, sxy = e
        if n <= 1 or sx == 0:
            return None, None
        r_ = float(sy) / float(sx)
        den = float(n) * (n - 1)
        t1 = (float(n) * float(syy) - float(sy) * float(sy)) / den
        t2 = r_ * r_ * (float(n) * float(sxx) - float(sx) * float(sx)) / den
        t3 = 2.0 * r_ * (float(n) * float(sxy) - float(sx) * float(sy)) / den
        xbar = float(sx) / n
        return r_, (t1 + t2 - t3) / (float(n) * xbar * xbar)

    r_a, v_a = arm(sums["a"])
    r_b, v_b = arm(sums["b"])
    z_micro = None
    if v_a is not None and v_b is not None and v_a + v_b > 0:
        z_micro = math.floor(
            (r_a - r_b) / math.sqrt(v_a + v_b) * 1e6 + 0.5
        )
    r = QUERIES["events_ratio_metric_ztest"].fn(spark, sf_dir).collect()[0]
    assert (r.n_a, r.active_days_a, r.purchases_a) == tuple(sums["a"][:3])
    assert (r.n_b, r.active_days_b, r.purchases_b) == tuple(sums["b"][:3])
    assert r.rate_a == (
        None if r_a is None else math.floor(r_a * 1e6 + 0.5) / 1e6
    )
    assert r.rate_b == (
        None if r_b is None else math.floor(r_b * 1e6 + 0.5) / 1e6
    )
    assert r.z_score == (None if z_micro is None else z_micro / 1e6)
    assert r.significant_95 == (
        None if z_micro is None else int(abs(z_micro) > 1959964)
    )


def test_logrank_exact_recompute_and_km_consistency(spark, sf_dir):
    """Driver-side log-rank recompute (risk sets, hypergeometric
    E/V terms with the micro/pico quantization, z chain) — plus the
    KM consistency check: the pooled risk-set totals must match the
    pooled KM query's n_at_risk at every time."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table as lt,
    )

    ev = lt(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type"
    ).collect()
    mx = max(r.ts for r in ev).date()
    s_ts = {}
    for r in ev:
        if r.event_type == "signup":
            if r.user_id not in s_ts or r.ts < s_ts[r.user_id]:
                s_ts[r.user_id] = r.ts
    p_day = {}
    for r in ev:
        if r.event_type == "purchase" and r.user_id in s_ts:
            if r.ts >= s_ts[r.user_id]:
                d = r.ts.date()
                if r.user_id not in p_day or d < p_day[r.user_id]:
                    p_day[r.user_id] = d
    cells = defaultdict(lambda: [0, 0, 0, 0])  # t -> d1 c1 d2 c2
    nn = [0, 0]
    for u, st in s_ts.items():
        arm = 0 if _split_a(u) else 1
        nn[arm] += 1
        if u in p_day:
            t = (p_day[u] - st.date()).days
            cells[t][0 if arm == 0 else 2] += 1
        else:
            t = (mx - st.date()).days
            cells[t][1 if arm == 0 else 3] += 1
    o1 = e1 = v = 0
    n1t, n2t = nn[0], nn[1]
    for t in sorted(cells):
        d1, c1, d2, c2 = cells[t]
        dt, nt = d1 + d2, n1t + n2t
        o1 += d1
        e1 += math.floor(float(dt) * n1t / nt * 1e6 + 0.5)
        if nt > 1:
            v += math.floor(
                float(dt)
                * (n1t / nt)
                * (1.0 - n1t / nt)
                * (float(nt - dt) / (nt - 1))
                * 1e12
                + 0.5
            )
        n1t -= d1 + c1
        n2t -= d2 + c2
    z_micro = (
        math.floor(
            (o1 - e1 / 1e6) / math.sqrt(v / 1e12) * 1e6 + 0.5
        )
        if v > 0
        else None
    )
    r = QUERIES["events_logrank_test"].fn(spark, sf_dir).collect()[0]
    assert (r.n_a, r.n_b, r.observed_a) == (nn[0], nn[1], o1)
    assert r.d_total == sum(c[0] + c[2] for c in cells.values())
    assert r.expected_a == e1 / 1e6
    assert r.z_score == (None if z_micro is None else z_micro / 1e6)
    assert r.significant_95 == (
        None if z_micro is None else int(abs(z_micro) > 1959964)
    )
    # pooled risk sets must equal the KM query's n_at_risk
    km = {
        row.t: row.n_at_risk
        for row in QUERIES["events_survival_km"].fn(spark, sf_dir).collect()
    }
    n1t, n2t = nn[0], nn[1]
    for t in sorted(cells):
        assert km[t] == n1t + n2t
        d1, c1, d2, c2 = cells[t]
        n1t -= d1 + c1
        n2t -= d2 + c2


def test_horizon_lift_exact_recompute(spark, sf_dir):
    """Driver-side recompute of the conversion-horizon ladder: entry
    and first-purchase days, within-k cells per horizon, and the
    pooled-z chain must all match bit-for-bit; cells must be
    monotone non-decreasing in the horizon."""
    import datetime

    rows = (
        load_table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias(
                "day"
            ),
            (F.col("event_type") == "purchase").alias("is_purchase"),
        )
        .collect()
    )
    entry: dict = {}
    fp: dict = {}
    for r in rows:
        if r.user_id not in entry or r.day < entry[r.user_id]:
            entry[r.user_id] = r.day
        if r.is_purchase and (
            r.user_id not in fp or r.day < fp[r.user_id]
        ):
            fp[r.user_id] = r.day
    want = []
    prev = None
    for k in (1, 3, 7, 14):
        cells = [0, 0, 0, 0]
        for u, e in entry.items():
            i = 0 if _split_a(u) else 2
            cells[i] += 1
            if u in fp:
                ed = datetime.date.fromisoformat(e)
                pd_ = datetime.date.fromisoformat(fp[u])
                if (pd_ - ed).days <= k:
                    cells[i + 1] += 1
        na, ca, nb, cb = cells
        lift = (
            math.floor((ca / na - cb / nb) * 1e6 + 0.5) / 1e6
            if na > 0 and nb > 0
            else None
        )
        z = None
        if na > 0 and nb > 0 and 0 < ca + cb < na + nb:
            p = (ca + cb) / (na + nb)
            z = math.floor(
                (ca / na - cb / nb)
                / math.sqrt(p * (1 - p) * (1 / na + 1 / nb))
                * 1e6
                + 0.5
            )
        want.append(
            (
                k,
                na,
                ca,
                nb,
                cb,
                lift,
                None if z is None else z / 1e6,
                None if z is None else int(abs(z) > 1959964),
            )
        )
        if prev is not None:
            assert ca >= prev[0] and cb >= prev[1]  # monotone in k
        prev = (ca, cb)
    got = [
        (
            r.horizon_days,
            r.n_a,
            r.c_a,
            r.n_b,
            r.c_b,
            r.lift,
            r.z_score,
            r.significant_95,
        )
        for r in QUERIES["events_conversion_horizon_lift"]
        .fn(spark, sf_dir)
        .collect()
    ]
    assert got == want


def test_segment_hte_consistency_with_stratified(spark, sf_dir):
    """The HTE drill-down's per-stratum cells must sum exactly to the
    pooled stratified estimator's totals (same strata, split, and
    conversion rules), and each row's z must match a driver-side
    pooled-z recompute from its own cells."""
    hte = (
        QUERIES["events_segment_lift_hte"].fn(spark, sf_dir).collect()
    )
    pooled = (
        QUERIES["events_stratified_lift"].fn(spark, sf_dir).collect()[0]
    )
    assert len(hte) == pooled.n_strata
    assert sum(r.n_a for r in hte) == pooled.n_a
    assert sum(r.n_b for r in hte) == pooled.n_b
    for r in hte:
        na, ca, nb, cb = r.n_a, r.c_a, r.n_b, r.c_b
        if na > 0 and nb > 0 and 0 < ca + cb < na + nb:
            p = (ca + cb) / (na + nb)
            z = math.floor(
                (ca / na - cb / nb)
                / math.sqrt(p * (1 - p) * (1 / na + 1 / nb))
                * 1e6
                + 0.5
            )
            assert r.z_score == z / 1e6
            assert r.significant_95_unadjusted == int(abs(z) > 1959964)
        else:
            assert r.z_score is None
