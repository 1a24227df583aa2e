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
