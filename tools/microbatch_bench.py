"""Micro-batch latency benchmark (SURVEY §3.3 / BASELINE §6 protocol).

The reference's protocol: batches sized {1,2,5} GB at 31 B/tuple
(1 GB ~ 34.6M records of (key, count, userId, routingKey)), BEGIN/END
markers + ZooKeeper completion handshake, the DP snapshot fires on END
(MicroBatchConfig.java:33-52).  Spark restatement: the micro-batch
barrier IS the BEGIN/END protocol — one synchronous batch per size,
timed end-to-end through bounding + the DP mechanism, emitting the
reference's CSV schema (run_id, parallelism, batch_id, size_gb,
n_records, bytes_per_tuple, duration_ms, ...).

Usage: python tools/microbatch_bench.py [--sizes-gb 0.05,0.1]
           [--runs 2] [--out microbatch.csv]
(defaults are scaled for local[32]; pass 1,2,5 on a real cluster)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BYTES_PER_TUPLE = 31  # MicroBatchConfig.java:33
NUM_USERS = 10_000_000
NUM_KEYS = 1_000_000

CSV_HEADER = (
    "run_id,parallelism,batch_id,size_gb,n_records,bytes_per_tuple,"
    "duration_ms,t_begin_epoch_ms,t_end_epoch_ms,dp_keys,producers\n"
)


def run_batch(spark, n_records: int, t: int, batch_seed: int):
    """One synchronous micro-batch: generate -> bound -> DP snapshot.

    Data is generated distributed (spark.range + column exprs, the
    Zipf-ish skew approximated with pow-law over hashed ids) so the
    generator does not bottleneck the measurement."""
    from pyspark.sql import functions as F

    from confidential_storm_spark.operators.bounding import bounded_clamped
    from confidential_storm_spark.operators.dp_batch import DPParams, dp_histogram_batch

    df = (
        spark.range(n_records)
        .withColumn("user_id", (F.pmod(F.xxhash64("id", F.lit(batch_seed)), F.lit(NUM_USERS))).cast("string"))
        # power-law key skew: rank = floor(u^(-1/(s-1))) over uniform u
        .withColumn("_u", (F.pmod(F.xxhash64("id", F.lit(batch_seed + 1)), F.lit(1 << 20)) + 1) / F.lit(float(1 << 20)))
        .withColumn("key", F.least(F.floor(F.pow(F.col("_u"), F.lit(-1.0 / 0.4))), F.lit(NUM_KEYS)).cast("string"))
        .withColumn("value", F.lit(1.0))
        .withColumn("event_time", F.current_timestamp())
        .withColumn("seq", F.col("id"))
        .withColumn("epoch", F.lit(0))
        .drop("_u")
    )
    params = DPParams.from_budget(6.0, 1e-9, c=32, t=t, mu=0, seed=batch_seed)
    t0 = time.time()
    bounded = bounded_clamped(df, 32, 1.0)
    dp = dp_histogram_batch(bounded, params, num_buckets=256)
    dp_keys = dp.count()
    t1 = time.time()
    return dp_keys, t0, t1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes-gb", default="0.05,0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--t", type=int, default=10)
    ap.add_argument("--out", default=None)
    ap.add_argument("--append", action="store_true")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    args = ap.parse_args()

    from confidential_storm_spark.session import get_spark

    spark = get_spark(
        app_name="microbatch-bench", shuffle_partitions=args.shuffle_partitions
    )
    parallelism = spark.sparkContext.defaultParallelism
    run_id = f"spark-{int(time.time())}"

    sizes = [float(s) for s in args.sizes_gb.split(",")]
    lines = [CSV_HEADER.strip()]
    batch_id = 0
    for size_gb in sizes:
        n_records = int(size_gb * (1 << 30) / BYTES_PER_TUPLE)
        for _ in range(args.runs):
            dp_keys, t0, t1 = run_batch(spark, n_records, args.t, batch_id)
            dur = int((t1 - t0) * 1000)
            # "producers" in the reference CSV is the spout producer
            # count; the distributed generator's equivalent is the
            # parallel task count feeding the batch
            line = (
                f"{run_id},{parallelism},{batch_id},{size_gb},{n_records},"
                f"{BYTES_PER_TUPLE},{dur},{int(t0 * 1000)},{int(t1 * 1000)},{dp_keys},"
                f"{parallelism}"
            )
            print(line)
            lines.append(line)
            batch_id += 1

    if args.out:
        mode = "a" if args.append and os.path.exists(args.out) else "w"
        body = lines[1:] if mode == "a" else lines
        with open(args.out, mode) as f:
            f.write("\n".join(body) + "\n")
    # throughput summary (records/sec of the largest size)
    print(
        f"# largest batch: {n_records:,} records in {dur} ms "
        f"= {n_records / (dur / 1000):,.0f} records/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
