"""Focused per-query timing for optimization A/B runs.

Times the named registry queries in ONE warm session with the same
action as bench.py (``df.count()``), printing per-run seconds and the
median, so a single change can be measured in isolation without a
full 205-query bench pass.  Optionally also times the noop sink
(guide §1.4: computes every column, removes sink/pruning artifacts
from the comparison) and dumps ``explain('formatted')`` to a file.

Usage:
  python tools/qtime.py [--runs N] [--noop] [--explain-dir DIR] \
      [--sf-dir DIR] query [query ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--warmup", type=int, default=1)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain-dir", default="")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from confidential_storm_spark.plans.queries import build_queries, prebuild_artifacts
    from confidential_storm_spark.session import get_spark

    spark = get_spark(app_name="csspark-qtime")
    spark.range(1).count()
    prebuild_artifacts(spark, args.sf_dir)
    qs = build_queries()
    unknown = [q for q in args.queries if q not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2

    import gc

    for name in args.queries:
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            import contextlib
            import io

            df = qs[name](spark, args.sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(args.explain_dir, f"{name}.txt"), "w") as f:
                f.write(buf.getvalue())
            del df
            gc.collect()
        samples: list[float] = []
        for i in range(args.warmup + args.runs):
            spark.sparkContext.setJobDescription(f"qtime:{name}:{i}")
            t0 = time.perf_counter()
            df = qs[name](spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            dt = time.perf_counter() - t0
            del df
            gc.collect()
            tag = "warm" if i < args.warmup else "run"
            print(f"# {name} {tag}{i}: {dt:.3f}s", file=sys.stderr)
            if i >= args.warmup:
                samples.append(dt)
        med = statistics.median(samples)
        print(f"{name}\tmedian={med:.3f}\truns={[round(s,3) for s in samples]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
