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
