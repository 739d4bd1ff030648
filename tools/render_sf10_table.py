"""Render the PLANS.md sf1->sf10 ratio table from
``benchmark/bench_detail_sf10.json`` (written by tools/bench_sf10_top.py)
against ``benchmark/bench_detail_sf1.0.json``.

Prints a markdown table sorted by ratio descending, flagging ratios
above the linear band (corpus is 10x sf1, so ~10x is linear for
corpus-bound queries; VERDICT r8 #4 asks for a named cause for any
ratio > 3x the data growth, i.e. > 30x here — sub-10x means fixed
per-query overhead still dominates).

Usage: python tools/render_sf10_table.py
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    with open(os.path.join(REPO, "benchmark", "bench_detail_sf10.json")) as f:
        d10 = json.load(f)
    with open(os.path.join(REPO, "benchmark", "bench_detail_sf1.0.json")) as f:
        sf1 = json.load(f)["queries"]

    rows = sorted(d10["sf1_ratio"].items(), key=lambda kv: -kv[1])
    print("| query | sf1 s | sf10 s | spread | 10x-data ratio |")
    print("|---|---|---|---|---|")
    for name, ratio in rows:
        lo, hi = d10["spread"][name]
        flag = " **(>30x: needs cause)**" if ratio > 30 else ""
        print(
            f"| {name} | {sf1[name]:.2f} | {d10['queries'][name]:.2f} "
            f"| [{lo:.1f}, {hi:.1f}] | {ratio:.1f}x{flag} |"
        )
    print(f"\ntotal (top {len(rows)}): {d10['value']:.1f} s; runs={d10['runs']}")
    skipped = d10.get("skipped", {})
    if skipped:
        print(f"skipped with committed causes: {len(skipped)}")
        for k, v in skipped.items():
            print(f"- {k}: {v}")
    return 0


if __name__ == "__main__":
    main()
