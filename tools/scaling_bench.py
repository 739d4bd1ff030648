"""Scaling sweep (BASELINE §6 / benchmark/scripts/run-scaling-benchmark.sh).

The reference sweeps parallelism {4,8,16} with strong-scaling batch
sizes {0.5,1,2} GB and weak scaling at 0.125 GB/worker on a 3-node
Storm cluster.  Spark restatement: one subprocess per parallelism
(master=local[N]) running the micro-batch pipeline at the requested
size; CSV rows append to one file for cross-parallelism comparison.

Usage:
  python tools/scaling_bench.py [--parallelism 4,8,16]
      [--strong-gb 0.05] [--weak-gb-per-worker 0.005] [--out scaling.csv]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(parallelism: int, size_gb: float, mode: str, out_lines: list[str]) -> None:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(parallelism))
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(REPO, "tools", "microbatch_bench.py"),
            "--sizes-gb",
            str(size_gb),
            "--runs",
            "1",
        ],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line and not line.startswith(("run_id", "#")):
            out_lines.append(f"{mode},{line}")
            print(f"{mode},{line}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--parallelism", default="4,8,16")
    ap.add_argument("--strong-gb", type=float, default=0.05)
    ap.add_argument("--weak-gb-per-worker", type=float, default=0.005)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    header = "mode,run_id,parallelism,batch_id,size_gb,n_records,bytes_per_tuple,duration_ms,t_begin_epoch_ms,t_end_epoch_ms,dp_keys"
    lines = [header]
    print(header)
    for p in (int(x) for x in args.parallelism.split(",")):
        run_one(p, args.strong_gb, "strong", lines)
        run_one(p, args.weak_gb_per_worker * p, "weak", lines)

    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
