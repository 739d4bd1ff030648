"""Scalar-quantization compression ladder: bytes/vector vs recall@k.

Complements benchmark/ivfpq_sweep.csv (the IVF-PQ dial table) with the
OTHER compression family: per-dimension scalar quantization at 8 / 4 /
2 bits, measured against the exact float32 scan on real embeddings.
This is the table that justifies `knn_sq8` as the default 4x rung —
recall stays ~1.0 at 8 bits, degrades visibly at 4, collapses at 2 —
and shows where the ladder hands over to IVF-PQ (which wins below
1 byte/dim by quantizing SUBVECTORS jointly instead of dims
independently).

Usage:
  python tools/sq_ladder.py [--sf-dir /root/testdata/sf0.1]
      [--queries 20] [--k 10] [--out benchmark/sq_ladder.csv]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from confidential_storm_spark.operators.similarity import (  # noqa: E402
    _fold_cosine,
    _sq8_recon,
    grouped_topk,
    sq8_minmax,
)
from confidential_storm_spark.session import get_spark  # noqa: E402

RUNGS = [("f32_exact", None, 32.0), ("sq8", 256, 8.0), ("sq4", 16, 4.0), ("sq2", 4, 2.0)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="benchmark/sq_ladder.csv")
    args = ap.parse_args()

    spark = get_spark(app_name="sq-ladder")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    n_vec = emb.count()
    dim = len(emb.head()["embedding"])
    q = emb.filter(F.col("vec_id") < args.queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("_qv")
    )
    corpus = emb.select("vec_id", "embedding")
    los, his = sq8_minmax(emb)

    def topk(levels: int | None):
        # _sq8_recon/_fold_cosine take and return SQL expression
        # STRINGS since the round-11 py4j-construction fix — pass
        # column names and wrap the result in F.expr
        vec = (
            "embedding"
            if levels is None
            else _sq8_recon("embedding", los, his, levels=levels)
        )
        scored = corpus.join(F.broadcast(q)).select(
            "query_id",
            "vec_id",
            F.expr(f"round({_fold_cosine(vec, '_qv')}, 6)").alias("cosine"),
        )
        return grouped_topk(scored, "query_id", "cosine", "vec_id", args.k).select(
            "query_id", "vec_id"
        )

    exact = {(r["query_id"], r["vec_id"]) for r in topk(None).collect()}
    rows = []
    for name, levels, bits in RUNGS:
        t0 = time.time()
        got = {(r["query_id"], r["vec_id"]) for r in topk(levels).collect()}
        wall = time.time() - t0
        recall = len(exact & got) / len(exact)
        rows.append(
            {
                "method": name,
                "bits_per_dim": bits,
                "bytes_per_vec": bits * dim / 8,
                "compression_x": 32.0 / bits,
                "queries": args.queries,
                "k": args.k,
                "n_vec": n_vec,
                "recall_at_k": round(recall, 4),
                "wall_sec": round(wall, 2),
            }
        )
        print(rows[-1])

    with open(args.out, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0]))
        w.writeheader()
        w.writerows(rows)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
