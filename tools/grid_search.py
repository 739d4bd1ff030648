"""Grid-search benchmark driver (reference parity:
``examples/scripts/run-grid-search.py`` + ``grid_search/runner.py``).

The reference sweeps (topology mode x supervisor scale x config) over
Storm cluster runs of the Synthetic DP Histogram topology, collecting
per-run profiler lifecycle CSVs (COMPONENT_STARTED, EPOCH_ADVANCED,
MAX_EPOCH_REACHED) into a labeled results tree with a manifest.

Spark restatement (single host, as the reference's legacy mode): the
grid is (mode in {baseline, confidential}) x parallelism x batch size
x run.  ``confidential`` rounds every record's value through the
AES-GCM envelope (seal at the spout boundary, open before bounding —
S4/S6: SyntheticSpout encrypted variant + SpoutPreprocessing re-seal),
all JVM-side ``aes_encrypt``/``aes_decrypt`` column expressions, so
the measured delta IS the crypto overhead the reference's
baseline-vs-enclave comparison reports.  Each parallelism value runs
in its own subprocess (master=local[N]) — the analog of the
reference re-deploying the cluster per scale value.

Results land in ``--out-dir/<label>/``:
  manifest.csv   one row per grid cell run (mode, parallelism,
                 size_gb, run, n_records, duration_ms, records_per_s,
                 dp_keys)
  lifecycle.csv  profiler-style events per run: COMPONENT_STARTED,
                 EPOCH_ADVANCED (one per DP epoch), MAX_EPOCH_REACHED
                 with epoch-millisecond timestamps.

Usage:
  python tools/grid_search.py --label smoke \
      --modes baseline,confidential --parallelism 8,32 \
      --sizes-gb 0.02 --runs 1
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BYTES_PER_TUPLE = 31  # MicroBatchConfig.java:33
NUM_USERS = 10_000_000
NUM_KEYS = 1_000_000
KEY_BYTES = b"0123456789abcdef"  # 16-byte AES-128 demo key (benchmark only)

MANIFEST_HEADER = (
    "mode,parallelism,size_gb,run,t_epochs,n_records,duration_ms,records_per_s,dp_keys"
)
LIFECYCLE_HEADER = "mode,parallelism,size_gb,run,event,epoch,ts_ms"


def _synthetic(spark, n_records: int, seed: int):
    """The microbatch generator (tools/microbatch_bench.py): Zipf-ish
    key skew, uniform users, value=1 — BaselineSpout's record shape."""
    from pyspark.sql import functions as F

    return (
        spark.range(n_records)
        .withColumn(
            "user_id",
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(NUM_USERS))).cast("string"),
        )
        .withColumn(
            "_u",
            (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(1 << 20)) + 1)
            / F.lit(float(1 << 20)),
        )
        .withColumn(
            "key",
            F.least(F.floor(F.pow(F.col("_u"), F.lit(-1.0 / 0.4))), F.lit(NUM_KEYS)).cast(
                "string"
            ),
        )
        .withColumn("value", F.lit(1.0))
        .withColumn("event_time", F.current_timestamp())
        .withColumn("seq", F.col("id"))
        .withColumn("epoch", F.pmod(F.col("id"), F.lit(4)).cast("int"))
        .drop("_u", "id")
    )


def run_cell(spark, mode: str, n_records: int, t: int, seed: int):
    """One grid cell: generate -> (seal -> open)? -> bound -> DP.

    Returns (dp_keys, duration_s, epochs_seen)."""
    from pyspark.sql import functions as F

    from confidential_storm_spark.functions.envelope import open_sealed, seal
    from confidential_storm_spark.operators.bounding import bounded_clamped
    from confidential_storm_spark.operators.dp_batch import DPParams, dp_histogram_batch

    df = _synthetic(spark, n_records, seed)
    if mode == "confidential":
        # S4: the spout seals (key/user routing metadata in the AAD,
        # SpoutPreprocessing re-seal semantics); the enclave stage
        # opens before any aggregation sees plaintext
        key = F.lit(KEY_BYTES)
        aad = F.concat_ws("|", "key", "user_id", "epoch")
        df = df.withColumn("_env", seal(F.col("value"), key, aad))
        df = df.withColumn(
            "value", open_sealed(F.col("_env"), key, cast_to="double")
        ).drop("_env")

    params = DPParams.from_budget(6.0, 1e-9, c=32, t=t, mu=0, seed=seed)
    t0 = time.time()
    bounded = bounded_clamped(df, 32, 1.0)
    dp = dp_histogram_batch(bounded, params, num_buckets=256)
    dp_keys = dp.count()
    dur = time.time() - t0
    return dp_keys, dur, t


def _cell_main(args) -> None:
    """Subprocess entry: run every (mode, size, run) cell at this
    process's parallelism; print manifest + lifecycle CSV lines
    prefixed M|/L| on stdout."""
    from confidential_storm_spark.session import get_spark

    spark = get_spark(app_name="grid-search")
    parallelism = spark.sparkContext.defaultParallelism
    # warm-up: session boot + whole-stage codegen + the Arrow python
    # worker pool are cluster-deploy cost, not run cost — run one
    # untimed tiny cell of each mode through the full pipeline
    for mode in args.modes.split(","):
        run_cell(spark, mode, 50_000, 2, seed=999)

    for size_gb in [float(s) for s in args.sizes_gb.split(",")]:
        n_records = int(size_gb * (1 << 30) / BYTES_PER_TUPLE)
        for mode in args.modes.split(","):
            for run in range(args.runs):
                started = int(time.time() * 1000)
                print(f"L|{mode},{parallelism},{size_gb},{run},COMPONENT_STARTED,-1,{started}")
                dp_keys, dur, t = run_cell(spark, mode, n_records, args.t, run)
                end = int(time.time() * 1000)
                # micro-batch epochs advance inside ONE synchronous job;
                # reconstruct the profiler's per-epoch ticks at the
                # observed uniform rate (the reference logs wall-clock
                # per epoch; the batch engine's epochs are data-parallel)
                for e in range(t):
                    print(
                        f"L|{mode},{parallelism},{size_gb},{run},EPOCH_ADVANCED,{e},"
                        f"{started + int((e + 1) * dur * 1000 / t)}"
                    )
                print(f"L|{mode},{parallelism},{size_gb},{run},MAX_EPOCH_REACHED,{t - 1},{end}")
                print(
                    f"M|{mode},{parallelism},{size_gb},{run},{args.t},{n_records},"
                    f"{int(dur * 1000)},{n_records / dur:.0f},{dp_keys}"
                )
                sys.stdout.flush()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", default="grid")
    ap.add_argument("--modes", default="baseline,confidential")
    ap.add_argument("--parallelism", default="32")
    ap.add_argument("--sizes-gb", default="0.02")
    ap.add_argument("--runs", type=int, default=1)
    ap.add_argument("--t", type=int, default=4)
    ap.add_argument("--out-dir", default=os.path.join(REPO, "benchmark", "grid"))
    ap.add_argument("--cell", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.cell:
        _cell_main(args)
        return

    out = os.path.join(args.out_dir, args.label)
    os.makedirs(out, exist_ok=True)
    manifest, lifecycle = [MANIFEST_HEADER], [LIFECYCLE_HEADER]
    for par in [int(p) for p in args.parallelism.split(",")]:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(par))
        cmd = [
            sys.executable, os.path.abspath(__file__), "--cell",
            "--modes", args.modes, "--sizes-gb", args.sizes_gb,
            "--runs", str(args.runs), "--t", str(args.t),
        ]
        proc = subprocess.run(cmd, capture_output=True, text=True, env=env, timeout=3600)
        if proc.returncode != 0:
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"cell subprocess failed at parallelism={par}")
        for line in proc.stdout.splitlines():
            if line.startswith("M|"):
                manifest.append(line[2:])
            elif line.startswith("L|"):
                lifecycle.append(line[2:])

    with open(os.path.join(out, "manifest.csv"), "w") as f:
        f.write("\n".join(manifest) + "\n")
    with open(os.path.join(out, "lifecycle.csv"), "w") as f:
        f.write("\n".join(lifecycle) + "\n")
    print("\n".join(manifest))
    print(f"# wrote {out}/manifest.csv and lifecycle.csv", file=sys.stderr)


if __name__ == "__main__":
    main()
