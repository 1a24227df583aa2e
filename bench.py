#!/usr/bin/env python
"""Benchmark harness: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (TWO JSON lines, r12 VERDICT #5 / ADVICE):
  1. the FULL driver-contract line: {"metric": ..., "value":
     total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...}
  2. LAST, a machine-parsable line tagged {"compact": true, ...} with
     metric/value/unit/sf/host_calibration_ratio/vs_baseline_total/
     regressions AND (since r17, VERDICT r16 #1) the per-query
     "queries" dict at ms precision, serialized with tight separators
     so the whole line stays under the driver's 2000-char tail
     capture (~1820 chars at 51 queries; a >1900-char line falls back
     to 2-decimal query values rather than risk truncation).
Consumers must parse from the END and pick the line shape they need:
the compact line is last so a tail-truncating capture always
preserves the totals (BENCH_r11/r12 lost a head-placed line; r16 lost
the per-query dict because only the head-placed full line carried
it). The full line directly precedes it and keeps the r12-r16 shape
(human-readable separators, vs_baseline ratios).
tools/baseline_reland.py is the reference consumer.

Each query is executed to completion via the no-op sink (full plan
runs, nothing materializes on the driver), which measures engine
throughput rather than collect/serialization cost.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (  # noqa: E402
    HEADLINE_QUERIES,
    QUERIES,
)
from real_estate_data_analysis_with_aws_data_pipeline_project_spark.session import (  # noqa: E402
    get_spark,
)


# Self-set baseline (BASELINE.md "Engine baseline", measured round 1 at
# sf0.1 local[32], warm JVM). vs_baseline ratios are only emitted when
# benching the same scale factor; the acceptance bar is 2x
# (BASELINE.json), enforced as a non-zero exit so regressions are
# mechanical, not judgement calls (VERDICT r1 next-round #8).
BASELINE_SF = 0.1
BASELINE_SEC = {
    # Wholesale re-land 2026-08-18 (r17; BASELINE.md "Round-17
    # notes"): min per query over FOUR calm-host full bench runs (two
    # tools/baseline_reland.py invocations, calibrations 1.01->1.0,
    # 1.02->1.11, 1.01->1.19, 1.08->1.19 -- all under the tool's 1.2
    # bar) under the unchanged r11 re-warm estimator. Lands the r17
    # optimization round's steady state: the session-cached families'
    # rows now measure the warm regime the bench actually times
    # (first-call vs warm walls per family are documented in
    # BASELINE.md Round-17 notes -- VERDICT r16 #2), and the
    # restructured queries (range_search 1.24->0.44, span_remediate
    # 1.965->1.085, theil 0.473->0.225, basket 1.407->0.673,
    # reconciliation/interval-overlap/equidepth/pack reshaped) get
    # baselines matching their new plans. Prior per-round rows are
    # preserved in BASELINE.md history.
    "flagship_enriched_sample": 0.636,
    "p6_match_rate": 0.252,
    "j1_broadcast_left_join": 0.299,
    "tpch_q1_pricing_summary": 0.315,
    "w2_stratified_sample_rows": 0.415,
    "sql_surface_revenue_by_nation": 0.772,
    "tpch_q6_forecast_revenue": 0.203,
    "tpch_q5_local_supplier_volume": 0.745,
    "tpch_q3_shipping_priority": 0.53,
    "heavy_shuffle_part_spend": 0.622,
    "join_lateral_recent_avg": 0.382,
    "text_quality_score": 0.756,
    "dedup_minhash_lsh": 0.319,
    "dedup_incremental_minhash": 0.309,
    "dedup_simhash_pairs": 0.426,
    "dedup_span_remediate": 1.085,
    "similarity_topk_bruteforce": 0.463,
    "similarity_ann_lsh": 0.469,
    "similarity_ivf_topk": 0.65,
    "corpus_embedding_decontaminate": 0.419,
    "embedding_covariance_whitening": 0.583,
    "embedding_effective_dim": 0.561,
    "embedding_kmeans_lloyd": 0.584,
    "similarity_range_search": 0.372,
    "events_session_window": 0.368,
    "events_time_weighted_avg": 0.31,
    "events_gini_concentration": 0.246,
    "events_holt_volume_forecast": 0.301,
    "events_did_estimator": 0.458,
    "events_msprt_always_valid": 0.701,
    "events_quantile_treatment_effect": 0.832,
    "events_mannwhitney_u": 0.892,
    "events_qini_uplift_deciles": 1.185,
    "join_interval_overlap": 1.16,
    "agg_theil_decomposition": 0.225,
    "agg_lorenz_deciles": 0.998,
    "basket_brand_rules": 0.673,
    "text_gopher_repetition": 1.063,
    "features_point_in_time": 0.372,
    "features_target_encoding_loo": 0.491,
    "features_global_equidepth_bins": 0.984,
    "features_mutual_information": 0.552,
    "features_pca_quality_axis": 0.686,
    "corpus_pack_token_shards": 0.701,
    "corpus_global_shuffle": 0.163,
    "sketch_bitmap_exact_distinct": 0.348,
    "quality_ks_drift": 0.638,
    "dq_order_reconciliation": 1.033,
    "retrieval_query_likelihood": 0.134,
    "graph_jaccard_similarity": 0.35,
    "graph_adamic_adar": 0.074,
}
REGRESSION_FACTOR = 2.0
# wall-clock noise floor: a 0.2s query that doubles is scheduler jitter,
# not a regression signal
REGRESSION_MIN_SEC = 0.5


def _host_calibration_sec() -> float:
    """Fixed single-thread CPU probe (pure-Python arithmetic loop, no
    allocation): its idle-machine time is recorded in BASELINE.md, so a
    benched JSON carries its own evidence of host CPU steal — if
    calibration reads 2× its reference, wall-clock inflation of the
    queries is the host, not a plan regression. Min of 3 runs."""
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0
        for i in range(2_000_000):
            acc += i ^ (i >> 3)
        best = min(best, time.perf_counter() - t0)
    return round(best, 4)


# idle-machine reference for _host_calibration_sec. Re-derived
# 2026-08-16 (r13) per the BASELINE.md Round-12 decision rule: three
# consecutive sessions (~90 idle probes over r11-r13) never read below
# 1.41x the original 0.12 s reference — r11 floor 1.41, r12 floor
# 1.43, r13 12-sample idle series 0.1706-0.1790 s (floor ratio 1.42
# against 0.12) — so ~0.17 s IS this host's idle steady state, not
# transient steal. The original 0.12 was measured 2026-08-13 in a
# regime the host never returned to. All baselines landed from r13 on
# use this reference; pre-r13 BENCH_r*.json calibrations can be
# reinterpreted by scaling with 0.12/0.17.
CALIBRATION_IDLE_SEC = 0.17


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark(app_name="bench")
    # Warm pass over ALL queries first, then a separate timing pass:
    # with warm-and-time interleaved per query, the first benched query
    # absorbed the session-wide JIT/codegen/shuffle-infra warm-up
    # (flagship read 1.5-1.9 s in r2 vs its 0.95 s steady state, and
    # the gap grew with the registered surface).  Two passes measure
    # steady-state engine throughput — the stated goal — uniformly.
    # The global warm pass is NOT redundant with the r11 per-query
    # re-warm below: steady state in an AGED session (every headline
    # query has run) is measurably FASTER than in a fresh one
    # (heavy_shuffle: 0.62 s aged vs 0.97 s fresh after five runs —
    # shared shuffle infra, broadcast relations, and JIT state), and
    # the aged regime is the one the baselines describe. One suite
    # pass buys that regime uniformly for all queries.
    timings: dict[str, float] = {}
    for name in HEADLINE_QUERIES:
        QUERIES[name].fn(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
    # Three timed runs per query, keep the MINIMUM: the host is a
    # shared VM whose background load injects multi-second spikes into
    # single runs (observed: the same warm query 3.5 s and 12.8 s
    # minutes apart). The min over repeats estimates intrinsic engine
    # cost — the quantity the baseline tracks — rather than host
    # jitter. r10 raised repeats 2 → 3 after two back-to-back full
    # runs each produced a DIFFERENT false single-query regression
    # (tpch_q1 2.53x then 0.83x; whitening 1.38x then 2.36x while its
    # run-alone min-of-3 read 1.35x and a light-session read 0.80x):
    # with spike probability p per run, min-of-2 passes a spike with
    # probability p^2 — at the observed p ~ 0.2 that is one false
    # regression most rounds — min-of-3 cuts it to p^3. The estimator
    # change tightens every query equally; baselines are unchanged.
    #
    # r11: one UNTIMED re-warm run immediately before each query's
    # timed repeats. Root cause of the heavy_shuffle_part_spend trend
    # (1.03x -> 1.24x -> 1.55x across r8-r10 while its executed plan
    # stayed bit-identical to the PLANS.md audit): by the time the
    # timing pass reaches a query, every other headline query has run
    # since its global warm — its codegen-compiled methods face JIT
    # code-cache pressure that GROWS with the suite (34 headline
    # queries in r10 vs 24 in r8), and its first timed run re-pays
    # compilation. Measured in the stolen-host regime the r10 bench
    # ran in (calibration ~1.5): aged-session run sequence 1.033,
    # 0.729, 0.707, 0.621, 0.651 s — the old min-of-3 lands on the
    # still-warming 0.707, the re-warmed min-of-3 on the steady-state
    # 0.621 (0.85x baseline). Same uniform-estimator precedent as the
    # r10 min-of-2 -> 3 change: every query tightens equally,
    # baselines are unchanged.
    for name in HEADLINE_QUERIES:
        fn = QUERIES[name].fn
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
    spark.stop()

    calib = _host_calibration_sec()
    result = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        # host-steal evidence: calibration vs its idle reference
        # (BASELINE.md host-noise note) — a ratio well above 1 means the
        # wall clocks above are inflated by the shared host, not by plans
        "host_calibration_sec": calib,
        "host_calibration_ratio": round(calib / CALIBRATION_IDLE_SEC, 2),
    }
    regressed: list[str] = []
    if sf == BASELINE_SF:
        ratios = {
            name: round(sec / BASELINE_SEC[name], 2)
            for name, sec in timings.items()
            if name in BASELINE_SEC
        }
        base_total = sum(BASELINE_SEC[n] for n in ratios)
        bench_total = sum(timings[n] for n in ratios)
        result["vs_baseline"] = ratios
        result["vs_baseline_total"] = (
            round(bench_total / base_total, 2) if base_total else None
        )
        regressed = [
            n
            for n, r in ratios.items()
            if r > REGRESSION_FACTOR and timings[n] >= REGRESSION_MIN_SEC
        ]
        if result["vs_baseline_total"] and result["vs_baseline_total"] > REGRESSION_FACTOR:
            regressed.append("TOTAL")
        result["regressions"] = regressed

    # Compact machine line LAST (r12 VERDICT #5): the driver keeps the
    # output TAIL, so r12 proved a head-placed line gets truncated away
    # (`parsed: null` in BENCH_r11 and BENCH_r12). Emitting the short
    # totals line as the very last line means tail capture always
    # preserves it even when the long per-query line is cut. It is
    # tagged "compact": true (r12 ADVICE) so a consumer can tell the
    # two line shapes apart — see the module docstring for the
    # two-line contract.
    compact = {"compact": True}
    compact.update(
        {
            k: result[k]
            for k in (
                "metric",
                "value",
                "unit",
                "queries",
                "sf",
                "host_calibration_ratio",
                "vs_baseline_total",
                "regressions",
            )
            if k in result
        }
    )
    # Stolen-host guard (r16: a calibration-1.2 run inflated eight
    # unchanged-plan rows past 2x and tripped the gate; minutes later
    # the idle probe read 1.81-2.00). The probe is a pure single-
    # thread Python loop — Spark plan cost cannot move it — so a
    # ratio past the bar is direct evidence the WALLS are inflated by
    # the host, not by plans. The regressions are still REPORTED
    # (tagged), but the non-zero exit is withheld: failing CI on host
    # weather trains people to ignore the gate.
    host_stolen = result["host_calibration_ratio"] > 1.5
    if regressed and host_stolen:
        result["regressions_unreliable_host_stolen"] = True
        compact["regressions_unreliable_host_stolen"] = True
    # leading newline: if any earlier write (e.g. a merged-stderr
    # progress fragment under 2>&1 capture) left a partial line, the
    # full JSON still starts at column 0 and stays line-parsable
    print("\n" + json.dumps(result), flush=True)
    # r17 (VERDICT r16 #1): the compact LAST line now carries the
    # per-query dict so the driver's 2000-char tail capture retains
    # per-query seconds (PERF_r16.per_query was empty because only the
    # head-placed full line had them). Tight separators keep 51
    # queries at ~1820 chars; if future growth pushes past 1900,
    # degrade query values to 2 decimals instead of risking the tail
    # cutting the line's head off (a clipped line is unparsable and
    # loses the TOTALS too).
    compact_line = json.dumps(compact, separators=(",", ":"))
    if len(compact_line) > 1900:
        compact["queries"] = {n: round(s, 2) for n, s in timings.items()}
        compact_line = json.dumps(compact, separators=(",", ":"))
    print(compact_line, flush=True)
    if regressed and not host_stolen:
        sys.exit(1)


if __name__ == "__main__":
    main()
