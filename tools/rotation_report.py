"""Rotation coverage report: which catalog queries the round driver has
verified, and when.

The driver checks a fixed-size window per round (50 queries in rounds
1-4); the catalog orders itself least-recently-checked-first
(plans/__init__.py) so the window cycles through everything. This
report makes the rotation state inspectable: per-query last-checked
round and result, the set never yet driver-checked, and how many
rounds of windows the current catalog needs for full coverage.

Usage: python tools/rotation_report.py [window_size]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from github_etl_spark.plans import QUERIES, _check_history, _ordered  # noqa: E402


def main() -> None:
    window = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    last_round, last_green = _check_history()
    order = list(_ordered())
    total = len(QUERIES)
    never = [n for n in order if n not in last_round]
    red = sorted(n for n, ok in last_green.items() if not ok and n in QUERIES)
    by_round: dict[int, int] = {}
    for n in QUERIES:
        if n in last_round:
            by_round[last_round[n]] = by_round.get(last_round[n], 0) + 1

    print(f"catalog: {total} queries; driver window: {window}/round")
    for rnd in sorted(by_round):
        print(f"  last checked in r{rnd:02d}: {by_round[rnd]}")
    print(f"  never driver-checked: {len(never)}")
    if red:
        print(f"  RED on last driver check: {red}")
    rounds_needed = math.ceil(total / window)
    print(
        f"full-coverage cycle: {rounds_needed} rounds of {window}-query windows"
    )
    print("next window (first {} in rotation order):".format(min(window, total)))
    for n in order[:window]:
        tag = f"r{last_round[n]:02d}" if n in last_round else "never"
        print(f"  {n:45s} {tag}")


if __name__ == "__main__":
    main()
