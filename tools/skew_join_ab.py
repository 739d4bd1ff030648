"""Skew-join A/B: salting in the plan vs AQE's runtime skew split —
the measured comparison behind the 100 TB default (VERDICT r8 #6).

Workload: a deterministic zipf-skewed fact table (one key owns ~30%
of the rows, a second ~10%) shuffle-joined to a dim too large to
broadcast, then aggregated.  Three variants over the same data:

  baseline   plain sort-merge join, AQE skew split OFF — the wall:
             one reducer sorts/joins the hot key's whole volume
  aqe_skew   plain join, spark.sql.adaptive.skewJoin.enabled=true with
             thresholds scaled to sandbox partition sizes (at 100 TB
             the 256 MB defaults trip naturally; scaling the knobs,
             not the code, keeps the comparison honest)
  salted     operators/skew.salted_join (n_salt=16), AQE skew OFF —
             the in-plan fix that also covers what AQE cannot

All three must produce identical aggregates (asserted).  Each variant
is timed over N runs; the executed plan is checked for the expected
shape (the AQE run must actually mark the join skew=true, the salted
run must not).  Writes ``benchmark/skew_join_ab.csv``.

Usage: python tools/skew_join_ab.py [n_fact_millions] [runs]
"""

from __future__ import annotations

import csv
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

N_SALT = 16
N_DIM = 1_500_000
N_KEYS = 10_000  # dim keys; fact references the first N_KEYS


def main() -> int:
    n_fact = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 20_000_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pyspark.sql import functions as F

    from confidential_storm_spark.operators.skew import salted_join
    from confidential_storm_spark.session import get_spark

    spark = get_spark(app_name="skew-join-ab")
    sc = spark.conf

    # deterministic zipf-ish fact: ids 0..n; 30% of rows hit key 7,
    # 10% hit key 13, the rest spread uniformly over N_KEYS
    fact = spark.range(n_fact).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 3, F.lit(7))
        .when(F.col("id") % 10 == 3, F.lit(13))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .cast("long")
        .alias("key"),
        (F.col("id") % 1000).cast("double").alias("v"),
    )
    # dim: wide enough (padding column) that broadcasting is not the
    # trivial answer — at 100 TB the dim is a fact table itself
    dim = spark.range(N_DIM).select(
        F.col("id").alias("d_key"),
        F.pmod(F.col("id"), F.lit(25)).alias("segment"),
        F.repeat(F.lit("x"), 64).alias("pad"),
    )
    fact.write.mode("overwrite").parquet("/tmp/skew_ab/fact")
    dim.write.mode("overwrite").parquet("/tmp/skew_ab/dim")
    fact = spark.read.parquet("/tmp/skew_ab/fact")
    dim = spark.read.parquet("/tmp/skew_ab/dim")

    def agg(joined):
        # max(row_id) keeps an incompressible payload column flowing
        # through the shuffle: with only the (constant) hot key
        # surviving column pruning, the skewed partition compresses to
        # a few kB and AQE correctly sees no byte-level skew
        return (
            joined.groupBy("segment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v").cast("decimal(18,2)")).alias("s"),
                F.max("row_id").alias("m"),
            )
            .orderBy("segment")
        )

    def plain():
        return agg(fact.join(dim, fact["key"] == dim["d_key"]))

    def salted():
        return agg(salted_join(fact, dim, "key", "d_key", "row_id", n_salt=N_SALT))

    base_conf = {
        # force the shuffle join: the dim stands in for a 100 TB-scale
        # side that could never broadcast
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "false",
    }
    aqe_conf = dict(
        base_conf,
        **{
            "spark.sql.adaptive.skewJoin.enabled": "true",
            # sandbox-scaled thresholds (defaults: 256 MB / factor 5);
            # forceOptimize because the downstream re-aggregation
            # shuffle otherwise makes AQE skip the split — the exact
            # caveat the PLANS.md writeup documents
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2m",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "2m",
            "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
        },
    )
    variants = [
        ("baseline", plain, base_conf),
        ("aqe_skew", plain, aqe_conf),
        ("salted", salted, base_conf),
    ]

    all_keys = set(base_conf) | set(aqe_conf)
    saved = {k: sc.get(k, None) for k in all_keys}
    results, rows = {}, []
    try:
        for name, build, conf in variants:
            for k, v in {**{k: saved[k] for k in saved}, **conf}.items():
                if v is None:
                    sc.unset(k)
                else:
                    sc.set(k, v)
            walls = []
            for r in range(runs):
                t0 = time.time()
                df = build()
                out = df.collect()
                walls.append(time.time() - t0)
                if r == 0:
                    results[name] = [(row["segment"], row["n"], str(row["s"])) for row in out]
                    plan = df._jdf.queryExecution().executedPlan().toString()
                    skew_marked = "skew=true" in plan
                    print(f"{name}: skew-marked join in plan: {skew_marked}")
                    if name == "aqe_skew":
                        assert skew_marked, "AQE variant did not trigger a skew split"
                    else:
                        assert not skew_marked
                print(f"{name} run{r}: {walls[-1]:.2f}s", flush=True)
            rows.append(
                dict(
                    variant=name,
                    median_s=round(statistics.median(walls), 2),
                    min_s=round(min(walls), 2),
                    max_s=round(max(walls), 2),
                    runs=runs,
                    n_fact=n_fact,
                )
            )
    finally:
        for k, v in saved.items():
            if v is None:
                sc.unset(k)
            else:
                sc.set(k, v)

    assert results["baseline"] == results["aqe_skew"] == results["salted"], (
        "variants disagree on the aggregate"
    )
    out_path = os.path.join(REPO, "benchmark", "skew_join_ab.csv")
    with open(out_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    for r in rows:
        print(r)
    print(f"wrote {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
