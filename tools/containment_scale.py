"""Containment-dedup scale law, measured: candidate volume for the
shingle inverted-index self-join is Σ_s df(s)² (df = a shingle's
document frequency), and the ``max_shingle_df`` stop-shingle cap bounds
it at Σ_s min(df, cap)².  This records the law's constants on the
actual corpora — doc counts, posting counts, df tails, capped vs
uncapped candidate volume, and surviving pair counts — so the
100 TB judgment in PLANS.md cites numbers, not prose.

Counts are exact aggregations (contention-immune), deliberately not
wall-clock: the law, not the machine, is the subject.

Usage: python tools/containment_scale.py [sf_dir ...] [--cap N]
Writes benchmark/containment_scale.csv
"""

from __future__ import annotations

import csv
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    cap = 1000
    for a in sys.argv[1:]:
        if a.startswith("--cap"):
            cap = int(a.split("=", 1)[1])
    sf_dirs = args or [
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]

    from pyspark.sql import functions as F

    from confidential_storm_spark.operators.dedup import containment_pairs, shingles_udf
    from confidential_storm_spark.plans.queries import (
        CONTAINMENT_THRESHOLD,
        SHINGLE_N,
    )
    from confidential_storm_spark.session import get_spark
    from confidential_storm_spark.sources.tables import load_table

    spark = get_spark(app_name="containment-scale", cpus=8, shuffle_partitions=8)
    rows = []
    for sf_dir in sf_dirs:
        docs = load_table(spark, sf_dir, "documents")
        post = (
            docs.select(
                F.col("doc_id").alias("_id"),
                shingles_udf(F.col("text"), SHINGLE_N).alias("_sh"),
            )
            .filter(F.size("_sh") > 0)
            .select("_id", F.explode("_sh").alias("_s"))
        )
        dfreq = post.groupBy("_s").agg(F.count(F.lit(1)).alias("df"))
        stats = dfreq.agg(
            F.count(F.lit(1)).alias("distinct_shingles"),
            F.sum("df").alias("postings"),
            F.max("df").alias("max_df"),
            # pairs per shingle = df*(df-1)/2; capped law substitutes min(df, cap)
            F.sum(F.col("df") * (F.col("df") - 1) / 2).alias("cand_uncapped"),
            F.sum(
                F.least(F.col("df"), F.lit(cap))
                * (F.least(F.col("df"), F.lit(cap)) - 1)
                / 2
            ).alias("cand_capped"),
            F.sum((F.col("df") > cap).cast("long")).alias("hot_shingles"),
        ).collect()[0]
        n_docs = docs.count()
        pairs = containment_pairs(
            docs,
            shingle_n=SHINGLE_N,
            containment_threshold=CONTAINMENT_THRESHOLD,
            max_shingle_df=cap,
        ).count()
        rows.append(
            {
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "postings": int(stats["postings"]),
                "distinct_shingles": int(stats["distinct_shingles"]),
                "max_df": int(stats["max_df"]),
                "cap": cap,
                "hot_shingles": int(stats["hot_shingles"]),
                "cand_uncapped": int(stats["cand_uncapped"]),
                "cand_capped": int(stats["cand_capped"]),
                "pairs_at_threshold": pairs,
            }
        )
        print(rows[-1], flush=True)

    out = os.path.join(REPO, "benchmark", "containment_scale.csv")
    with open(out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
