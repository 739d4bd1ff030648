"""Round-over-round bench comparison: diff two bench_detail JSON
files (per-query medians + spreads) and print the movers, so "did
anything regress" is one command instead of eyeballing 181 numbers.

A mover must clear BOTH a relative and an absolute bar (default 30%
and 0.5 s) — sub-second queries on a shared sandbox swing 2-8x run to
run (PLANS.md), so a pure ratio flags noise.  Queries present in only
one file are listed separately (added/removed).

Usage: python tools/bench_diff.py OLD.json NEW.json [rel_pct] [abs_s]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    old_p, new_p = sys.argv[1], sys.argv[2]
    rel = float(sys.argv[3]) / 100 if len(sys.argv) > 3 else 0.30
    abs_s = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    old = json.load(open(old_p))["queries"]
    new = json.load(open(new_p))["queries"]
    common = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    tot_old = sum(old[q] for q in common)
    tot_new = sum(new[q] for q in common)
    print(f"common {len(common)}: total {tot_old:.1f}s -> {tot_new:.1f}s "
          f"({(tot_new - tot_old) / tot_old:+.1%})")
    if added:
        print(f"added {len(added)} (+{sum(new[q] for q in added):.1f}s): "
              + ", ".join(added))
    if removed:
        print(f"removed {len(removed)}: " + ", ".join(removed))

    movers = []
    for q in common:
        d = new[q] - old[q]
        if abs(d) >= abs_s and abs(d) / max(old[q], 1e-9) >= rel:
            movers.append((d, q))
    movers.sort(reverse=True)
    if not movers:
        print(f"no movers past {rel:.0%} AND {abs_s}s")
    for d, q in movers:
        print(f"  {q}: {old[q]:.2f}s -> {new[q]:.2f}s ({d:+.2f}s)")
    return 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # `| head` is the normal usage
        raise SystemExit(0)
