"""Cold-vs-cold cross-round bench comparison (r13 verdict item 1).

The r13 bench committed per-query MINIMA over 3 sweeps in one warm JVM;
r12's artifact was a single (cold) sweep. Comparing envelope minima to a
cold sweep overstates code improvement by the warm-JVM factor (geomean
~1.14x, r13 verdict). This script compares *run 1 vs run 1* — the cold
sweep of each round — so the cross-round delta isolates code change from
bench methodology. It needs no Spark: it reads two committed BENCH_FULL
artifacts (paths or git revisions).

Usage:
    python scripts/cold_vs_cold.py OLD.json NEW.json [--top N]

For an artifact with ``runs[]`` (r13+), run 1's ``queries_normalized``
is used; for a pre-envelope artifact (single sweep) the top-level map IS
run 1. Prints per-query old/new speedups on the common query set, the
geomean, and the >10% regressed list, then a one-line JSON summary.
"""

from __future__ import annotations

import json
import math
import sys


def cold_map(path: str) -> dict:
    with open(path) as fh:
        art = json.load(fh)
    runs = art.get("runs")
    src = runs[0] if runs else art
    return {
        k: v
        for k, v in src.get("queries_normalized", {}).items()
        if v is not None and v > 0
    }


def main() -> None:
    argv = sys.argv[1:]
    top = 0
    if "--top" in argv:
        i = argv.index("--top")
        top = int(argv[i + 1])
        del argv[i : i + 2]
    args = argv
    if len(args) != 2:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    old, new = cold_map(args[0]), cold_map(args[1])
    common = sorted(set(old) & set(new))
    if not common:
        print("no common queries", file=sys.stderr)
        sys.exit(1)
    rows = sorted(
        ((old[n] / new[n], n) for n in common), reverse=True
    )
    gm = math.exp(sum(math.log(r) for r, _ in rows) / len(rows))
    regressed = [(n, round(1 / r, 2)) for r, n in rows if r < 1 / 1.1]
    shown = rows[:top] + rows[-top:] if top and len(rows) > 2 * top else rows
    print(f"{'query':45s} {'old_s':>8s} {'new_s':>8s} {'speedup':>8s}")
    for r, n in shown:
        print(f"{n:45s} {old[n]:8.3f} {new[n]:8.3f} {r:8.2f}")
    print()
    print(
        json.dumps(
            {
                "n_common": len(common),
                "cold_geomean_speedup": round(gm, 3),
                "cold_sum_old": round(sum(old[n] for n in common), 1),
                "cold_sum_new": round(sum(new[n] for n in common), 1),
                "regressed_gt10pct": regressed,
            }
        )
    )


if __name__ == "__main__":
    main()
