"""Invariant tests for the round-9 additions: the streaming CUSUM
change-point tier (VERDICT r8 #5)."""

from __future__ import annotations

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import QUERIES
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.streaming.jobs import (
    _cusum_peak,
)


def test_cusum_peak_matches_bruteforce():
    """The incremental tier's integer-exact argmax kernel must equal a
    brute-force recomputation of S_rk = nd*cum - rk*total with the
    batch twin's (|S| desc, day asc) pick, including the earliest-day
    tie-break."""
    cases = [
        (["d1", "d2", "d3", "d4"], [10, 10, 50, 50]),
        (["d1", "d2", "d3"], [5, 5, 5]),  # flat series: all S == 0
        (["d1", "d2", "d3", "d4"], [30, 10, 30, 10]),  # |S| ties
        (["d1"], [7]),
    ]
    for days, cnts in cases:
        nd_k, day_k, s_k = _cusum_peak(days, cnts)
        nd, total = len(days), sum(cnts)
        cum, scored = 0, []
        for rk, (d, c) in enumerate(zip(days, cnts), 1):
            cum += c
            s = nd * cum - rk * total
            scored.append((-abs(s), d, s))
        scored.sort()
        assert (nd_k, day_k, s_k) == (nd, scored[0][1], scored[0][2])


def test_streaming_cusum_equals_batch(spark, sf_dir):
    """The streamed day-count fold must equal the batch CUSUM query
    row-for-row: the state map after the final batch IS the batch day
    counts, so change day, peak value, and direction agree exactly."""
    stream = {
        r.event_type: (r.n_days, r.change_day, r.peak_cusum, r.direction)
        for r in QUERIES["streaming_cusum_changepoint"].fn(spark, sf_dir).collect()
    }
    batch = {
        r.event_type: (r.n_days, r.change_day, r.peak_cusum, r.direction)
        for r in QUERIES["events_cusum_changepoint"].fn(spark, sf_dir).collect()
    }
    assert stream == batch
