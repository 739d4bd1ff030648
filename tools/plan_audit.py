"""Physical-plan audit: one row per registry query with the plan-shape
metrics the PLANS.md claims are made of — scans, exchanges, join
strategies, windows, top-k compilation, and predicate pushdown — so
plan quality is reviewable at a glance (and diffable round-over-round)
without re-reading 106 explain dumps.

Builds every query's DataFrame at sf0.01 (plans, not execution; the
one-time index artifacts are prebuilt first) and parses
``executedPlan().toString()``.

Usage: python tools/plan_audit.py [sf_dir] [out_csv]
Defaults: /root/testdata/sf0.01, benchmark/plan_audit_r5.csv
"""

from __future__ import annotations

import csv
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIELDS = [
    "query",
    "file_scans",
    "exchanges",
    "broadcast_joins",
    "sortmerge_joins",
    "shuffledhash_joins",
    "nestedloop_joins",
    "windows",
    "take_ordered",
    "scans_with_pushed_filters",
    "has_python_stage",
]


def audit_plan(plan: str) -> dict[str, int]:
    scans = plan.count("FileScan")
    pushed = sum(
        1
        for seg in plan.split("PushedFilters: ")[1:]
        if not seg.startswith("[]")
    )
    return {
        "file_scans": scans,
        # semantic shuffles only: hash/range repartitions, not the
        # single-split spread or broadcast distribution
        "exchanges": plan.count("Exchange hashpartitioning")
        + plan.count("Exchange rangepartitioning"),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "shuffledhash_joins": plan.count("ShuffledHashJoin"),
        "nestedloop_joins": plan.count("NestedLoopJoin"),
        "windows": len(re.findall(r"\bWindow(?:GroupLimit)? ", plan)),
        "take_ordered": plan.count("TakeOrderedAndProject"),
        "scans_with_pushed_filters": pushed,
        "has_python_stage": int(
            any(
                node in plan
                for node in (
                    "ArrowEvalPython",
                    "BatchEvalPython",  # plain (non-Arrow) Python UDFs
                    "FlatMapGroupsInPandas",
                    "MapInPandas",
                    "FlatMapCoGroupsInPandas",
                    "WindowInPandas",
                    "AggregateInPandas",
                    "FlatMapGroupsInArrow",
                )
            )
        ),
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(os.path.dirname(__file__), "..", "benchmark", "plan_audit_r5.csv")
    )
    from confidential_storm_spark.plans.queries import QUERIES, prebuild_artifacts
    from confidential_storm_spark.session import get_spark

    spark = get_spark(app_name="csspark-plan-audit")
    prebuild_artifacts(spark, sf_dir)
    rows = []
    for name in sorted(QUERIES):
        try:
            df = QUERIES[name].builder(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            rows.append({"query": name, **audit_plan(plan)})
        except Exception as exc:  # audit must cover every row or say why
            print(f"ERROR {name}: {exc}", file=sys.stderr)
            return 1
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=FIELDS)
        w.writeheader()
        w.writerows(rows)
    totals = {
        k: sum(r[k] for r in rows) for k in FIELDS if k != "query"
    }
    print(f"{len(rows)} queries -> {os.path.normpath(out)}")
    print(totals)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
