"""Measured A/B: storage bucketing vs shuffle join.

The 100 TB pattern: a fact-fact join that RECURS (lineitem x orders
here; in a training pipeline, docs x annotations or shards x scores)
pays a full shuffle of both sides every run — unless both tables are
written bucketed on the join key, in which case the planner sees the
matching output partitioning and the join runs with ZERO exchanges
forever after.  Bucketing costs one extra write-time shuffle, paid
once.

This tool writes orders/lineitem (a) as plain parquet and (b) bucketed
by orderkey, runs the same revenue-per-orderpriority join-aggregate N
times on each layout, and records median wall + the exchange count
from the executed plan.  CSV: ``benchmark/bucketed_join_ab.csv``.

Usage: python tools/bucketed_join_ab.py [sf_dir] [reps] [buckets]
"""

from __future__ import annotations

import csv
import os
import shutil
import statistics
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import functions as F

    from confidential_storm_spark.session import get_spark
    from confidential_storm_spark.sources.writers import write_bucketed

    warehouse = "/tmp/spark_graft_bucket_ab_wh"
    shutil.rmtree(warehouse, ignore_errors=True)
    spark = get_spark(extra_conf={"spark.sql.warehouse.dir": warehouse})
    # fact-fact shape: at 100 TB neither side fits the broadcast
    # threshold, so the comparison is SMJ-vs-SMJ; at sf1 Spark would
    # happily broadcast orders and hide the difference
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    n_o, n_l = orders.count(), lineitem.count()

    spark.sql("CREATE DATABASE IF NOT EXISTS ab")
    write_bucketed(orders, "ab.orders_b", "o_orderkey", num_buckets=buckets)
    write_bucketed(lineitem, "ab.lineitem_b", "l_orderkey", num_buckets=buckets)

    def query(o, l):
        return (
            l.join(o, l["l_orderkey"] == o["o_orderkey"])
            .groupBy("o_orderpriority")
            .agg(
                F.round(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
                ).alias("revenue")
            )
            .orderBy("o_orderpriority")
        )

    def measure(make):
        walls, n_exch = [], None
        for _ in range(reps):
            df = make()
            t0 = time.time()
            df.collect()
            walls.append(time.time() - t0)
            plan = df._jdf.queryExecution().executedPlan().toString()
            n_exch = plan.count("Exchange")
        return statistics.median(walls), n_exch, walls

    plain = lambda: query(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
    )
    bucketed = lambda: query(spark.table("ab.orders_b"), spark.table("ab.lineitem_b"))

    # correctness: identical results on both layouts
    assert [tuple(r) for r in plain().collect()] == [
        tuple(r) for r in bucketed().collect()
    ]

    rows = []
    for name, make in (("plain_parquet", plain), ("bucketed", bucketed)):
        med, exch, walls = measure(make)
        rows.append(
            dict(
                layout=name,
                median_s=round(med, 2),
                exchanges=exch,
                runs=[round(w, 2) for w in walls],
                orders=n_o,
                lineitem=n_l,
                buckets=buckets,
            )
        )
        print(rows[-1], flush=True)

    out_csv = f"{REPO}/benchmark/bucketed_join_ab.csv"
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out_csv}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
