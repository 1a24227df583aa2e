#!/usr/bin/env python
"""Wholesale baseline re-land under the current bench estimator.

BASELINE.md "Estimator-shift caveat" (r11): the per-query re-warm
shifted the measured quantity to steady state, so ratios against the
pre-re-warm baselines carry a ~10-15 % downward bias on
warmup-sensitive queries. The fix is a one-shot re-land of every
BASELINE_SEC entry from a CALM host — this tool makes that mechanical
and refuses to run in a stolen regime so an inflated host can never
be landed as the new truth.

    python tools/baseline_reland.py [--max-calibration 1.2] [--runs 2]

Runs the full bench --runs times (min per query wins, spanning
independent sessions), checks the host calibration before AND after
every run against the bar, and prints the BASELINE_SEC literal ready
to paste into bench.py plus the per-query delta vs the current
baselines. It does NOT edit bench.py — landing is a reviewed commit,
not a side effect.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def calibration_ratio() -> float:
    # reuse THE bench probe (r11 ADVICE: a hand-copied loop would
    # silently measure a different quantity if the bench probe or its
    # idle reference ever changes)
    return round(bench._host_calibration_sec() / bench.CALIBRATION_IDLE_SEC, 2)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-calibration", type=float, default=1.2)
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    best: dict[str, float] = {}
    for r in range(args.runs):
        pre = calibration_ratio()
        if pre > args.max_calibration:
            print(
                f"ABORT run {r + 1}: calibration {pre} > "
                f"{args.max_calibration} — a stolen host must never be "
                "landed as baseline truth"
            )
            return 1
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(__file__), "..", "bench.py")],
            capture_output=True,
            text=True,
        )
        # fail with a clear message, not IndexError/JSONDecodeError,
        # when bench.py dies or emits no JSON (r11 ADVICE). A nonzero
        # exit WITH result JSON is bench's regression flag against the
        # STALE baselines — the exact situation a re-land exists to
        # fix — so it is reported and the run proceeds (r12 review).
        # bench.py emits TWO JSON lines since r13 (full driver line,
        # then the tagged compact totals line LAST — see bench.py's
        # module docstring); parse candidates from the END, skip any
        # truncated/partial line instead of crashing (r12 ADVICE), and
        # prefer the line that carries the per-query dict. The compact
        # line (host_calibration_ratio + regressions, no "queries") is
        # a usable fallback for the calibration gate only.
        result = None
        for ln in reversed(out.stdout.strip().splitlines()):
            if not ln.startswith("{"):
                continue
            try:
                cand = json.loads(ln)
            except json.JSONDecodeError:
                continue  # truncated/partial line — try earlier ones
            if result is None or "queries" in cand:
                result = cand
            if "queries" in result:
                break
        if result is None:
            print(f"ABORT run {r + 1}: bench.py exited {out.returncode} "
                  "with no parsable JSON output\n"
                  f"--- stderr tail ---\n{out.stderr[-2000:]}")
            return 1
        if out.returncode != 0:
            print(f"note run {r + 1}: bench.py exited {out.returncode} "
                  "(regressions vs the STALE baselines: "
                  f"{result.get('regressions')}) — continuing; that is "
                  "what a re-land resolves")
        post = result["host_calibration_ratio"]
        if post > args.max_calibration:
            print(
                f"ABORT run {r + 1}: post-run calibration {post} > "
                f"{args.max_calibration} — the host turned mid-run"
            )
            return 1
        if "queries" not in result:
            print(f"ABORT run {r + 1}: only the compact totals line "
                  "survived (full per-query line truncated) — cannot "
                  "re-land baselines without per-query times")
            return 1
        for name, sec in result["queries"].items():
            best[name] = min(best.get(name, float("inf")), sec)
        print(f"run {r + 1}/{args.runs}: calibration {pre}->{post}, "
              f"total {result['value']}s", flush=True)

    print("\n# paste into bench.py (re-landed "
          f"{time.strftime('%Y-%m-%d')} under the re-warm estimator, "
          f"min over {args.runs} calm runs, calibration bar "
          f"{args.max_calibration}):")
    print("BASELINE_SEC = {")
    for name in bench.HEADLINE_QUERIES:
        if name in best:
            print(f'    "{name}": {best[name]},')
    print("}")
    print("\n# delta vs current baselines:")
    for name, sec in best.items():
        old = bench.BASELINE_SEC.get(name)
        if old:
            print(f"#   {name}: {old} -> {sec} ({sec / old:.2f}x)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
