"""Saturation ramp for the round-10 stateful streaming ops (VERDICT
r10 next-round #7): the deterministic k-min reservoir
(``streaming/stateful.py::reservoir_kmin_stream``, state = k
(hash, id) pairs per stratum, Python applyInPandasWithState) and the
forward-decay leaderboard (a plain JVM streaming SUM whose per-key
state is one double, the Cormode et al. VLDB'09 ingest-time-constant
trick).  Same method as ``tools/keyed_saturation.py``: offer a rate
source, record achieved rows/s plus batch-duration lag signals; the
knee is the first offered rate where achieved/offered collapses and
mean batch duration exceeds the trigger.

The state-size dimension is swept by key count: the reservoir holds
k pairs per stratum (group-invocation-bound — every touched stratum
is one Python state call per batch), the decay agg one double per
key (hash-agg bound; key count should barely matter).

Emits ``benchmark/stateful_saturation.csv``:
    mode,keys,offered_rps,seconds,input_rows,wall_s,achieved_rps,
    mean_batch_s,max_batch_s,n_batches

Usage: python tools/stateful_saturation.py [--rates 25000,...]
          [--seconds 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rate(spark, rows_per_second: int):
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .option("numPartitions", 8)
        .load()
    )


def reservoir_stream(spark, rows_per_second: int, n_keys: int):
    from pyspark.sql import functions as F

    from confidential_storm_spark.streaming.stateful import reservoir_kmin_stream

    docs = _rate(spark, rows_per_second).select(
        F.pmod(F.xxhash64("value"), F.lit(n_keys)).cast("string").alias("source"),
        F.col("value").alias("doc_id"),
    )
    return reservoir_kmin_stream(docs, key_col="source", id_col="doc_id", k=5)


def decay_stream(spark, rows_per_second: int, n_keys: int):
    from pyspark.sql import functions as F

    ev = _rate(spark, rows_per_second).select(
        F.pmod(F.xxhash64("value"), F.lit(n_keys))
        .cast("string")
        .alias("event_type"),
        F.col("timestamp"),
    )
    # forward decay: weight is a per-row constant at ingest, so the
    # decayed total is a commutative streaming SUM (the registry's
    # stream_decay_topk_replay shape, horizon pinned for the sweep)
    age = F.datediff(F.lit("2030-01-01").cast("date"), F.to_date("timestamp"))
    w = F.pow(F.lit(2.0), -age.cast("double") / F.lit(30.0))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"), F.sum(w).alias("decayed")
    )


def measure(spark, build, rows_per_second: int, seconds: float, n_keys: int) -> dict:
    out = build(spark, rows_per_second, n_keys)
    q = (
        out.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ssat_"))
        .start()
    )
    t0 = time.time()
    time.sleep(seconds)
    q.stop()
    q.awaitTermination(120)
    wall = time.time() - t0
    prog = [p for p in q.recentProgress if int(p["numInputRows"]) > 0]
    rows = sum(int(p["numInputRows"]) for p in prog)
    durs = [int(p["batchDuration"]) / 1000.0 for p in prog]
    return {
        "offered_rps": rows_per_second,
        "keys": n_keys,
        "seconds": seconds,
        "input_rows": rows,
        "wall_s": round(wall, 2),
        "achieved_rps": round(rows / wall) if wall else 0,
        "mean_batch_s": round(sum(durs) / len(durs), 2) if durs else 0.0,
        "max_batch_s": round(max(durs), 2) if durs else 0.0,
        "n_batches": len(prog),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", default="25000,50000,100000,200000,400000")
    ap.add_argument("--seconds", type=float, default=30.0)
    ap.add_argument("--out", default="benchmark/stateful_saturation.csv")
    args = ap.parse_args()

    from confidential_storm_spark.session import get_spark

    spark = get_spark(app_name="csspark-stateful-saturation")
    spark.range(1).count()

    rates = [int(r) for r in args.rates.split(",")]
    plans = [
        ("reservoir", reservoir_stream, 100),
        ("reservoir", reservoir_stream, 10_000),
        ("decay", decay_stream, 10),
        ("decay", decay_stream, 10_000),
    ]
    rows = []
    for mode, build, n_keys in plans:
        for rps in rates:
            m = measure(spark, build, rps, args.seconds, n_keys)
            rows.append(
                f"{mode},{m['keys']},{m['offered_rps']},{m['seconds']},"
                f"{m['input_rows']},{m['wall_s']},{m['achieved_rps']},"
                f"{m['mean_batch_s']},{m['max_batch_s']},{m['n_batches']}"
            )
            print(
                f"# {mode} keys={n_keys} offered={rps}: "
                f"achieved={m['achieved_rps']} rec/s, "
                f"mean_batch={m['mean_batch_s']}s max={m['max_batch_s']}s "
                f"({m['n_batches']} batches)",
                file=sys.stderr,
                flush=True,
            )
            if m["achieved_rps"] < 0.25 * rps:
                print("# deep saturation, stopping ramp", file=sys.stderr)
                break

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        f.write(
            "mode,keys,offered_rps,seconds,input_rows,wall_s,achieved_rps,"
            "mean_batch_s,max_batch_s,n_batches\n"
        )
        for r in rows:
            f.write(r + "\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
