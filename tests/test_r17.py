"""Round-17 optimization tests.

Covers the r17 bench-contract fix (VERDICT r16 #1: the compact LAST
line must carry the per-query dict inside the driver's 2000-char tail
capture) and focused tests for operators whose internals this round's
optimizations change.
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def test_bench_compact_line_carries_queries_within_tail_budget():
    """VERDICT r16 #1: the driver keeps only a 2000-char output tail
    and parses the LAST line — so the compact line must (a) carry the
    per-query seconds dict and (b) serialize, with the tight
    separators bench.py uses, to well under 2000 chars even at
    worst-case value widths. This test rebuilds the exact compact dict
    shape main() emits for the CURRENT headline list with pessimistic
    5-char values; if a future headline promotion pushes the line past
    the budget, this fails before the driver silently loses per-query
    data again."""
    import bench
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
        HEADLINE_QUERIES,
    )

    # worst-case realistic widths: every wall 10-99 s at ms precision
    timings = {n: 12.345 for n in HEADLINE_QUERIES}
    compact = {
        "compact": True,
        "metric": "headline_queries_total_wall",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": bench.BASELINE_SF,
        "host_calibration_ratio": 1.13,
        "vs_baseline_total": 1.25,
        "regressions": [],
    }
    line = json.dumps(compact, separators=(",", ":"))
    assert len(line) < 1950, (
        f"compact bench line is {len(line)} chars at ms precision; the "
        "2-decimal fallback in bench.main() would engage — check "
        "whether the headline list grew past what the tail can carry"
    )
    parsed = json.loads(line)
    assert parsed["queries"] == timings
    for key in ("metric", "value", "unit", "sf"):
        assert key in parsed


def test_bench_main_emits_queries_on_last_line(monkeypatch, capsys):
    """End-to-end shape check of bench.main()'s stdout contract without
    Spark: stub the query registry and session, run main(), and assert
    the LAST stdout line is JSON tagged compact:true carrying the same
    per-query dict as the full line above it."""
    import bench

    class _FakeWrite:
        def mode(self, *_):
            return self

        def format(self, *_):
            return self

        def save(self):
            return None

    class _FakeDF:
        write = _FakeWrite()

    class _FakeSpec:
        fn = staticmethod(lambda spark, sf_dir: _FakeDF())

    class _FakeSpark:
        def stop(self):
            return None

    monkeypatch.setattr(bench, "HEADLINE_QUERIES", ["qa", "qb"])
    monkeypatch.setattr(
        bench, "QUERIES", {"qa": _FakeSpec(), "qb": _FakeSpec()}
    )
    monkeypatch.setattr(bench, "get_spark", lambda app_name: _FakeSpark())
    monkeypatch.setattr(bench, "_host_calibration_sec", lambda: 0.17)
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    bench.main()
    lines = [
        ln for ln in capsys.readouterr().out.strip().splitlines() if ln
    ]
    assert len(lines) == 2
    full = json.loads(lines[0])
    compact = json.loads(lines[-1])
    assert compact["compact"] is True
    assert set(compact["queries"]) == {"qa", "qb"}
    assert compact["queries"] == full["queries"]
    assert compact["metric"] == full["metric"] == (
        "headline_queries_total_wall"
    )
    assert compact["unit"] == "sec"
    # tight separators on the compact line (the full line keeps the
    # human-readable default separators)
    assert '", "' not in lines[-1] and '": ' not in lines[-1]
    assert '": ' in lines[0]


def test_session_cached_checkpoint_truncates_lineage(spark, sf_dir):
    """r17 (VERDICT r16 #6): session_cached(checkpoint=True) must (a)
    return the SAME DataFrame object on repeated calls (one
    materialization per session), (b) produce identical rows to the
    plain persist mode, and (c) truncate lineage — the consumer plan
    reads a Scan ExistingRDD, not the builder's full subtree (the
    plan-bloat that doubled agg_theil_decomposition's wall)."""
    from pyspark.sql import functions as F

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.operators.session_cache import (
        session_cached,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    def build():
        return (
            load_table(spark, sf_dir, "orders")
            .groupBy("o_custkey")
            .agg(F.count("*").alias("cnt"))
        )

    ck1 = session_cached(spark, "r17_test_ck", sf_dir, build, checkpoint=True)
    ck2 = session_cached(spark, "r17_test_ck", sf_dir, build, checkpoint=True)
    assert ck1 is ck2  # one entry per (name, sf_dir, fingerprint)
    plan = ck1._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan
    assert "FileScan" not in plan  # lineage truncated at the checkpoint
    expected = {
        (r["o_custkey"], r["cnt"]) for r in build().collect()
    }
    got = {(r["o_custkey"], r["cnt"]) for r in ck1.collect()}
    assert got == expected


def test_basket_rules_plan_reads_checkpoint_not_lineitem(spark, sf_dir):
    """ADVICE r16 asked for a plan-shape assertion that
    basket_brand_rules executes one lineitem scan; r17 went further —
    the basket relation is session-checkpointed (AQE exchange reuse
    never fired across the nb/supp/pairs branches), so the warm
    executed plan must contain ZERO lineitem file scans and read the
    checkpoint instead. A Spark upgrade that silently re-plans the
    branches against the raw tables would fail here."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
        QUERIES,
    )

    for name in ("basket_brand_rules", "basket_brand_rules3"):
        df = QUERIES[name].fn(spark, sf_dir)
        df.collect()  # materialize so the final adaptive plan is real
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "lineitem" not in plan, f"{name} re-scans lineitem"
        assert "ExistingRDD" in plan, f"{name} lost the checkpoint read"


def test_mi_chi2_cells_checkpoint_and_scan_count(spark, sf_dir):
    """r17 (VERDICT r16 #3): the MI/chi2 marginal branches must read
    the eagerly checkpointed cell relation — the final plan of the
    report action carries no orders file scan (the one 3-scan unpivot
    runs in the checkpoint job instead; r16's executed plans re-ran it
    per branch: 14-17 orders scans)."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
        QUERIES,
    )

    for name in ("features_mutual_information", "features_chi2_selection"):
        df = QUERIES[name].fn(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "orders" not in plan, f"{name} re-scans orders per branch"
        assert "ExistingRDD" in plan, f"{name} lost the checkpoint read"


def test_quantile_envelope_interpolation_matches_spark_percentile(
    spark, sf_dir
):
    """r17: sketch_quantile_envelope recomputes its exact reference
    quantiles via the two-pass bucket-rank kernel + Spark's own
    Percentile interpolation formula ((higher−pos)·lo + (pos−lower)·hi)
    instead of the buffer-everything `percentile` aggregate. The
    recomputed doubles must equal F.expr('percentile(...)')
    BIT-FOR-BIT before the 2-dp round, or the oracle hash contract is
    at risk."""
    from pyspark.sql import functions as F

    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.queries_sketch import (
        _QS_QUANTILES,
    )
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.sources.catalog import (
        load_table,
    )

    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    ref = li.agg(
        F.expr(
            "percentile(l_extendedprice, array("
            + ", ".join(str(q) for q in _QS_QUANTILES)
            + "))"
        ).alias("e")
    ).first()["e"]
    rows = sorted(
        r["m"]
        for r in li.select(
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("bigint")
            .alias("m")
        ).collect()
    )
    n = len(rows)
    for q, expected in zip(_QS_QUANTILES, ref):
        pos = q * (n - 1)
        lo = int(pos)
        hi = lo if pos == lo else lo + 1
        v_lo = rows[lo] / 100.0
        v_hi = rows[hi] / 100.0
        mine = v_lo if hi == lo else (hi - pos) * v_lo + (pos - lo) * v_hi
        assert mine == expected, (q, mine, expected)


def test_no_inferred_retokenize_filter_on_window_explodes(spark, sf_dir):
    """r17: exploding an ALIASED computed array column lets Spark's
    InferFiltersFromGenerate push a size(...)>0 filter below the
    projection, inlining the whole tokenize/window-hash chain into an
    interpreted Filter that re-evaluates it per document
    (dedup_repeated_substrings measured 17 s -> 1.7 s at sf0.1 when
    the generator input went inline). Guard the fixed call sites: no
    executed plan may contain a Filter that re-runs the tokenizer
    (split of a regexp_replace) below the Generate."""
    from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
        QUERIES,
    )

    for name in (
        "dedup_repeated_substrings",
        "dedup_span_remediate",
        "explode_top_tokens",
        "text_rake_keywords",
    ):
        df = QUERIES[name].fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            stripped = line.strip().lstrip("+:- *(0123456789)")
            assert not (
                stripped.startswith("Filter")
                and "regexp_replace" in stripped
            ), f"{name} re-tokenizes inside an inferred Filter:\n{line}"
