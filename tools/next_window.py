"""Emit the next driver-window rotation from CORRECTNESS history.

VERDICT r4 #5: with 183 registered queries and a 50-slot driver window,
full driver coverage needs rotation across rounds — this tool makes the
rotation mechanical instead of hand-curated. It reads every
``CORRECTNESS_r*.json`` on disk, computes the cumulative driver-green
set, and prints the ``_ROTATION`` list for the NEXT round: the
never-driver-green oracle-backed queries, priority names first, the
rest in registration order, truncated to the free slots.

Usage::

    python tools/next_window.py            # print the proposed rotation
    python tools/next_window.py --verify   # exit 1 if api.py's current
                                           # rotation differs from the
                                           # tool's proposal (used by the
                                           # test suite to keep rotations
                                           # honest)

The window is ``_WINDOW_ANCHORS`` (stable regression canaries, one per
operator family, all driver-green in prior rounds) plus the rotation.
Priorities below are the judge-named at-risk surface for the upcoming
round; update them when planning a new round.
"""

from __future__ import annotations

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (  # noqa: E402
    QUERIES,
    _WINDOW_ANCHORS,
)

WINDOW_SIZE = 50

# Names the next rotation must include first (ahead of registration
# order). Empty since r7: the endgame window drained the backlog, so
# there is no judge-named at-risk surface to front-load — repopulate
# only if a future verdict names specific queries.
#
# r7 endgame (VERDICT r5 #2 / r6 #1): the r7 rotation carries ALL 30
# never-driver-green oracle-backed queries that existed when it was
# frozen — the 10-query pre-r6 backlog, the 11 r6 additions, and the
# 9 r7 first-batch additions, which topped the pool back up to
# exactly the slot count (no refresh picks needed). After
# CORRECTNESS_r07 lands, cumulative driver-green = 209 of the 216
# oracle-backed; the SEVEN r7 second-batch queries (ROADMAP backlog)
# registered after the window froze and therefore lead the r8
# rotation as its never-green front, followed by refresh picks.
#
# Refresh mode (VERDICT r6 #5, standing posture from r8 on): with an
# empty pool, next_rotation() emits a pure RE-VERIFICATION window —
# cumulative-green queries, newest-landed first (ties by registration
# order) — so the most recently changed surface gets re-driven every
# round with no manual PRIORITY edits. Queries added in a future
# round are never-green, so they automatically take the front of that
# round's rotation ahead of the refresh tail.
PRIORITY: tuple[str, ...] = ()

# Queries registered AFTER the live round's rotation was pinned. They
# must not displace the pinned rotation mid-round (the driver window is
# frozen when the round starts), so next_rotation() ignores them — they
# lead the NEXT round's never-green front automatically. RESET this to
# () whenever a new round's rotation is pinned, then append every
# post-pin registration. Before r9 the pin survived additions only by
# accident (the r8 pool exactly filled all 30 slots, so [:slots]
# truncation hid late registrations); with refresh slots in play the
# exclusion is load-bearing. An index cutoff can't express this:
# QUERIES order is module-import order, so a query appended to an
# early-imported module lands mid-registry.
# Reset at the r17 pin (the 25 r16 post-pin additions now lead the r17
# rotation's never-green front — VERDICT r16 #10); append every r17
# post-pin registration below as it lands. r17 is an optimization
# round, so this should stay empty.
POST_PIN_ADDITIONS: tuple[str, ...] = ()


def correctness_rounds() -> dict[int, dict]:
    out: dict[int, dict] = {}
    for path in REPO.glob("CORRECTNESS_r*.json"):
        rnd = int(path.stem.split("_r")[1])
        out[rnd] = json.loads(path.read_text())
    return out


def row_green(row: dict) -> bool:
    """THE driver-green predicate — single definition, reused by the
    window meta-tests (tests/test_driver_window.py) so the generator
    and the tests can never disagree about what counts as green."""
    return bool(
        row.get("rows_match")
        and row.get("schema_match")
        and row.get("hash_match")
    )


def green_rounds() -> dict[int, set[str]]:
    return {
        rnd: {name for name, row in rows.items() if row_green(row)}
        for rnd, rows in correctness_rounds().items()
    }


def green_before(round_no: int | None = None) -> set[str]:
    """Cumulative driver-green names across rounds strictly before
    ``round_no`` (all rounds when None)."""
    green: set[str] = set()
    for rnd, names in green_rounds().items():
        if round_no is None or rnd < round_no:
            green |= names
    return green


def next_rotation() -> list[str]:
    green = green_before(None)
    anchors = set(_WINDOW_ANCHORS)
    reg_order = {n: i for i, n in enumerate(QUERIES)}
    post_pin = set(POST_PIN_ADDITIONS)
    pool = [
        n
        for n, s in QUERIES.items()
        if s.oracle is not None
        and n not in green
        and n not in anchors
        and n not in post_pin
    ]
    known_priority = [n for n in PRIORITY if n in pool]
    rest = sorted(
        (n for n in pool if n not in set(known_priority)),
        key=reg_order.__getitem__,
    )
    slots = WINDOW_SIZE - len(_WINDOW_ANCHORS)
    rotation = (known_priority + rest)[:slots]
    if len(rotation) < slots:
        # Endgame (VERDICT r5 #2): fewer never-green names than slots.
        # Fill with RE-VERIFICATION picks — cumulative-green queries,
        # the STALEST green first (VERDICT r12 #4: oldest most-recent
        # driver-green round, ties by registration order), so the
        # longest-unverified surface — the r01/r02 cohort — gets
        # re-driven before recently-landed queries that just proved
        # themselves. The first-timer meta-test only constrains the
        # never-green subset (it checks membership in
        # green_before(landing round)), so these refreshed entries are
        # exempt by construction.
        last_green = {}
        for rnd, names in sorted(green_rounds().items()):
            for n in names:
                last_green[n] = rnd  # max round wins — most recent green
        refresh = sorted(
            (
                n
                for n in green
                if n in QUERIES
                and QUERIES[n].oracle is not None
                and n not in anchors
                and n not in set(rotation)
            ),
            key=lambda n: (last_green.get(n, 0), reg_order.get(n, 1 << 30)),
        )
        rotation += refresh[: slots - len(rotation)]
    return rotation


def main() -> int:
    proposal = next_rotation()
    if "--verify" in sys.argv:
        from real_estate_data_analysis_with_aws_data_pipeline_project_spark.api import (
            _ROTATION,
        )

        if list(_ROTATION) != proposal:
            print("api.py rotation differs from tool proposal:")
            print("  only in api.py :", sorted(set(_ROTATION) - set(proposal)))
            print("  only in proposal:", sorted(set(proposal) - set(_ROTATION)))
            return 1
        print(f"rotation in sync ({len(proposal)} entries)")
        return 0
    print(f"# next rotation ({len(proposal)} entries; paste into api.py)")
    print("_ROTATION: list[str] = [")
    for n in proposal:
        print(f'    "{n}",')
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
