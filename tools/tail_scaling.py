"""Measure the tail-query scaling curve at an arbitrary SF directory.

Extends PLANS.md's 3-point (sf0.1/1/3) curve: run the same tail
queries at a bigger synthesized SF (tools/make_big_sf.py) and print
per-query warm wall times.  Protocol matches the sf3 measurement:
one cold pass to warm the JVM/code cache, then the measured pass;
py4j refs are dropped between queries so localCheckpoint blocks
don't accumulate GC pressure.

Usage: python tools/tail_scaling.py <sf_dir> [query ...]
Default query list = the PLANS.md tail table rows.
"""

from __future__ import annotations

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")

from confidential_storm_spark.plans.queries import QUERIES  # noqa: E402
from confidential_storm_spark.session import get_spark  # noqa: E402

TAIL = [
    "q1_pricing_summary",
    "q5_nation_revenue",
    "q12_priority_lines",
    "dp_bounded_histogram",
    "text_oov_rate",
    "dedup_spans",
    "text_diversity",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_ngram_jaccard",
]


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or TAIL
    spark = get_spark()
    out = {}
    for name in names:
        # "query:1" = single pass (for the heavy tail where a warm
        # re-run would double an already-long measurement)
        passes = 2
        if ":" in name:
            name, p = name.rsplit(":", 1)
            passes = int(p)
        fn = QUERIES[name].builder
        times = []
        for _ in range(passes):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count()
            times.append(round(time.perf_counter() - t0, 2))
            del df
            gc.collect()
        out[name] = {"cold": times[0], "warm": times[-1], "rows": n}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"sf_dir": sf_dir, "results": out}))


if __name__ == "__main__":
    main()
