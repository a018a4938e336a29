"""Compute the next round's driver verification window from the ledger.

The grading driver hash-checks the first 50 entries of ``queries()``
each round (CORRECTNESS_r{N}.json holds exactly those names).  Rounds
1-7 rotate so every hash-checkable registry entry is windowed at least
once; from round 8 on the window is maintenance: spill trio first, then
any currently-red names, then re-checks of whichever names' latest
driver-green is OLDEST, so the "green in latest check" property stays
fresh across the whole 339-entry registry instead of aging out.

This tool derives that ordering mechanically from the recorded
CORRECTNESS_r*.json files plus the pinned plans in ``__spark_entry__``
(ROUND7_PLAN / ROUND8_SPILL), so a future round's rotation is a
copy-paste of this tool's output into ``_PRIORITY`` rather than a
hand-derivation.

Usage:
    python tools/window_plan.py --audit        # ledger summary only
    python tools/window_plan.py --round 8      # print the round-8 window
    python tools/window_plan.py                # next unrecorded round
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from upc_sku_data_loader_spark.registry import ORACLES, QUERIES  # noqa: E402

WINDOW = 50


def load_ledger(
    repo: Path = REPO, max_round: int | None = None
) -> dict[str, tuple[int, bool]]:
    """name -> (latest windowed round, green in that latest check).

    ``max_round`` freezes the ledger to rounds <= N.  Historical pin tests
    MUST pass it (rounds < the pinned round): the live tree gains a new
    CORRECTNESS_r{N}.json after every driver run, so an unfrozen ledger
    makes any assertion about a past round's planner output go stale the
    moment the next round's results land (the r8 verdict's one red).
    """
    ledger: dict[str, tuple[int, bool]] = {}
    for path in sorted(repo.glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", path.name)
        if not m:
            continue
        rnd = int(m.group(1))
        if max_round is not None and rnd > max_round:
            continue
        data = json.loads(path.read_text())
        for name, res in data.items():
            green = bool(
                res.get("rows_match")
                and res.get("schema_match")
                and res.get("hash_match")
                and not res.get("err")
            )
            prev = ledger.get(name)
            if prev is None or rnd >= prev[0]:
                ledger[name] = (rnd, green)
    return ledger


def plan(round_no: int, ledger: dict[str, tuple[int, bool]]) -> list[str]:
    """The window for `round_no`, given a ledger recorded through round_no-1."""
    eligible = [n for n in QUERIES if n in ORACLES]  # rows-only never eligible
    if round_no <= 6:
        raise SystemExit(
            f"round {round_no} windows were hand-pinned; this tool plans round 7+"
        )
    if round_no == 7:
        return list(entrymod.ROUND7_PLAN)

    reds = [n for n in eligible if n in ledger and not ledger[n][1]]
    never = [n for n in eligible if n not in ledger]
    spill = [n for n in entrymod.ROUND8_SPILL if n not in ledger or not ledger[n][1]]
    # oldest driver-green first; alphabetical within a round for determinism
    greens = sorted(
        (n for n in eligible if n in ledger and ledger[n][1]),
        key=lambda n: (ledger[n][0], n),
    )
    window: list[str] = []
    for name in spill + reds + sorted(never) + greens:
        if name not in window:
            window.append(name)
        if len(window) == WINDOW:
            break
    return window


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=None)
    ap.add_argument("--audit", action="store_true")
    args = ap.parse_args()

    ledger = load_ledger()
    recorded = sorted({r for r, _ in ledger.values()})
    eligible = [n for n in QUERIES if n in ORACLES]
    reds = sorted(n for n in eligible if n in ledger and not ledger[n][1])
    never = sorted(n for n in eligible if n not in ledger)
    print(
        f"# ledger: {len(ledger)} distinct windowed across rounds {recorded}; "
        f"{len(reds)} currently-red; {len(never)} never-windowed "
        f"(of {len(eligible)} hash-checkable, {len(QUERIES)} total)"
    )
    if reds:
        print(f"# RED in latest check: {reds}")
    if args.audit:
        by_round: dict[int, int] = {}
        for rnd, green in ledger.values():
            if green:
                by_round[rnd] = by_round.get(rnd, 0) + 1
        for rnd in sorted(by_round):
            print(f"#   latest-green in r{rnd}: {by_round[rnd]} names")
        return 0

    round_no = args.round if args.round is not None else (max(recorded) + 1 if recorded else 7)
    window = plan(round_no, ledger)
    print(f"# round-{round_no} window ({len(window)} names) — paste into _PRIORITY:")
    print("_PRIORITY = [")
    for i in range(0, len(window), 3):
        print("    " + ", ".join(f'"{n}"' for n in window[i : i + 3]) + ",")
    print("]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
