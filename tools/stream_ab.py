"""A/B the stream_*_replay family under candidate session confs.

Runs every stream_*_replay registry query for --runs passes in ONE
session (extra conf pairs via --conf k=v, repeatable), printing
per-query medians, the family total, and an order-insensitive value
hash per query so configs can be compared for RESULT IDENTITY, not
just speed.

Usage:
  python tools/stream_ab.py [--runs 3] [--sf-dir DIR] [--conf k=v ...]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def value_hash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)].copy()
    if len(pdf) == 0:
        return hashlib.md5(b"").hexdigest()
    for c in pdf.columns:
        if pdf[c].dtype.kind == "f":
            pdf[c] = pdf[c].round(6)
        pdf[c] = pdf[c].astype(str)
    rows = sorted(pdf.apply("|".join, axis=1).tolist())
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    extra = dict(kv.split("=", 1) for kv in args.conf)
    from confidential_storm_spark.plans.queries import build_queries
    from confidential_storm_spark.session import get_spark

    spark = get_spark(app_name="stream-ab", extra_conf=extra)
    spark.range(1).count()
    qs = {k: v for k, v in build_queries().items() if k.startswith("stream_")}
    samples: dict[str, list[float]] = {k: [] for k in qs}
    hashes: dict[str, str] = {}
    for name, fn in qs.items():  # discarded warm pass
        fn(spark, args.sf_dir).count()
    for _ in range(args.runs):
        for name, fn in qs.items():
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            df.count()
            samples[name].append(time.perf_counter() - t0)
            if name not in hashes:
                hashes[name] = value_hash(df.toPandas())
    med = {k: statistics.median(v) for k, v in samples.items()}
    for k in sorted(med):
        print(f"{k:32s} {med[k]:6.2f}s  hash={hashes[k]}")
    print(f"TOTAL {sum(med.values()):.2f}s over {len(med)} queries, confs={extra}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
