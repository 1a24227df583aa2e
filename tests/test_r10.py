"""Round-10 operator invariants.

Two additions this round (kept deliberately small — VERDICT r9 #4 caps
r10 registry growth at 3 so the r11 window can close the pool in one
round):

* ``streaming_fano_burstiness`` — the FOURTH report off the streamed
  PSI (day, bucket) cube state; must equal the batch twin row-for-row.
* ``agg_histogram_group_percentiles`` — fixed-width-histogram quartiles
  whose error against the exact per-group sort is bounded by one bucket
  width by construction.
"""

from __future__ import annotations

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
    QUERIES,
)


def test_streaming_fano_equals_batch(spark, sf_dir):
    """One streamed sufficient statistic, four reports: the Fano tier
    reuses the PSI fold's (day, bucket) cube, so its burstiness report
    must equal the batch Fano query row-for-row."""
    stream = {
        r.event_type: (
            r.n_days_span,
            r.n_days_active,
            r.n_events,
            r.mean_daily,
            r.fano,
        )
        for r in QUERIES["streaming_fano_burstiness"]
        .fn(spark, sf_dir)
        .collect()
    }
    batch = {
        r.event_type: (
            r.n_days_span,
            r.n_days_active,
            r.n_events,
            r.mean_daily,
            r.fano,
        )
        for r in QUERIES["events_burstiness_fano"].fn(spark, sf_dir).collect()
    }
    assert stream == batch
    assert stream  # non-degenerate fixture


def test_histogram_percentiles_within_one_bucket_of_exact(spark, sf_dir):
    """The histogram quartile is the floor of the bucket containing the
    exact percentile_disc pick, so per group and per quartile:
    0 <= exact - approx < bucket width ($100)."""
    approx = {
        r.o_orderpriority: (r.p25_floor_price, r.p75_floor_price, r.n_orders)
        for r in QUERIES["agg_histogram_group_percentiles"]
        .fn(spark, sf_dir)
        .collect()
    }
    exact = {
        r.o_orderpriority: (r.p25_price, r.p75_price, r.n_orders)
        for r in QUERIES["agg_exact_group_percentiles"]
        .fn(spark, sf_dir)
        .collect()
    }
    assert set(approx) == set(exact) and approx
    for prio, (a25, a75, an) in approx.items():
        e25, e75, en = exact[prio]
        assert an == en, prio
        assert 0 <= e25 - a25 < 100, (prio, e25, a25)
        assert 0 <= e75 - a75 < 100, (prio, e75, a75)


def test_histogram_percentiles_floor_values_are_bucket_multiples(
    spark, sf_dir
):
    """Every emitted quartile is an exact bucket edge (a multiple of
    the $100 width) — the determinism contract that makes the full
    value oracle possible."""
    for r in (
        QUERIES["agg_histogram_group_percentiles"]
        .fn(spark, sf_dir)
        .collect()
    ):
        assert r.p25_floor_price % 100 == 0, r
        assert r.p75_floor_price % 100 == 0, r
        assert r.n_buckets >= 1


# --- second r10 batch (post-pin -> r11 window) -------------------------------


def test_streaming_autocorrelation_equals_batch(spark, sf_dir):
    """One streamed sufficient statistic, five reports: the ACF tier
    reuses the PSI fold's (day, bucket) cube, so its lag-1/lag-7
    report must equal the batch autocorrelation query row-for-row."""
    cols = ("n_days", "acf_lag1", "acf_lag7")

    def snap(name):
        return {
            r.event_type: tuple(getattr(r, c) for c in cols)
            for r in QUERIES[name].fn(spark, sf_dir).collect()
        }

    stream, batch = snap("streaming_autocorrelation"), snap(
        "events_autocorrelation"
    )
    assert stream == batch and stream


def test_mrr_consistent_with_relevance_grade(spark, sf_dir):
    """MRR/recall invariants: mrr = 1/first_rel_rank (micro-quantized),
    hits <= 10, recall = hits/min(10, n_relevant), and both retriever
    rows agree on the corpus-wide relevant count."""
    rows = {
        r.retriever: r
        for r in QUERIES["retrieval_mrr_eval"].fn(spark, sf_dir).collect()
    }
    assert set(rows) == {"bm25", "ql"}
    n_rel = {r.n_relevant for r in rows.values()}
    assert len(n_rel) == 1
    for r in rows.values():
        assert 0 <= r.hits_at_k <= 10
        if r.first_rel_rank is None:
            assert r.mrr_at_10 == 0.0 and r.hits_at_k == 0
        else:
            assert 1 <= r.first_rel_rank <= 10
            expect = round(int(1_000_000 / r.first_rel_rank + 0.5) / 1e6, 6)
            assert r.mrr_at_10 == expect
        den = min(10, r.n_relevant)
        if den:
            assert abs(r.recall_at_10 - r.hits_at_k / den) < 1e-6


def test_gini_matches_pandas_and_bounds(spark, sf_dir):
    """Exact Gini cross-check against an independent pandas fold of
    the same per-user counts, plus the [0, 1) population bounds."""
    rows = (
        QUERIES["events_gini_concentration"].fn(spark, sf_dir).collect()
    )
    assert rows
    import pandas as pd

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").toPandas()
    uc = ev.groupby(["event_type", "user_id"]).size()
    for r in rows:
        # same deterministic (count, user_id) ordering: sort_values on
        # a user_id-sorted series is stable, so ties keep user order
        x = (
            uc.loc[r.event_type]
            .sort_index()
            .sort_values(kind="stable")
            .to_numpy()
        )
        n, s = len(x), x.sum()
        t = sum((i + 1) * v for i, v in enumerate(x))
        g = (2.0 * t - (float(n) + 1.0) * s) / (float(n) * s)
        import math

        assert r.gini == round(math.floor(g * 1e6 + 0.5) / 1e6, 6)
        assert 0.0 <= r.gini < 1.0
        assert r.n_users == n and r.n_events == s


def test_volume_anomaly_flag_is_exact_integer_rule(spark, sf_dir):
    """The anomaly flag must satisfy the cross-multiplied integer rule
    wherever a ratio is reported, and be 0 when under 3 trailing
    days."""
    rows = QUERIES["dq_volume_anomaly"].fn(spark, sf_dir).collect()
    assert rows
    flagged = 0
    for r in rows:
        if r.n_prev < 3:
            assert r.vol_ratio is None and r.is_anomaly == 0
        else:
            assert r.vol_ratio is not None and r.vol_ratio > 0
            flagged += r.is_anomaly
            if r.is_anomaly:
                assert r.vol_ratio >= 2.0 or r.vol_ratio <= 0.500001
    # the fixture has both calm and anomalous days at every SF
    assert 0 <= flagged < len(rows)


def test_group_moments_match_numpy(spark, sf_dir):
    """Skewness/kurtosis cross-check against an independent numpy
    population-moment computation (within one micro-unit of the
    quantized value)."""
    import numpy as np

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").toPandas()
    rows = QUERIES["agg_exact_group_moments"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        x = li.loc[li.l_returnflag == r.l_returnflag, "l_quantity"].to_numpy()
        mu, sd = x.mean(), x.std()  # population
        skew = ((x - mu) ** 3).mean() / sd**3
        kurt = ((x - mu) ** 4).mean() / sd**4 - 3.0
        assert r.n == len(x)
        assert abs(r.skewness - skew) < 2e-6, r
        assert abs(r.excess_kurtosis - kurt) < 2e-6, r


def test_scaling_params_match_numpy(spark, sf_dir):
    """Scaler fit parameters cross-check against numpy on the same
    deterministic integer cents."""
    import numpy as np

    cu = spark.read.parquet(f"{sf_dir}/customer.parquet").toPandas()
    rows = QUERIES["features_scaling_params"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        cents = np.floor(
            cu.loc[cu.c_mktsegment == r.c_mktsegment, "c_acctbal"].to_numpy()
            * 100.0
            + 0.5
        )
        assert r.n == len(cents)
        assert r.min_cents == int(cents.min())
        assert r.max_cents == int(cents.max())
        assert abs(r.mean_bal - cents.mean() / 100.0) < 2e-6
        assert abs(r.std_bal - cents.std() / 100.0) < 2e-6
