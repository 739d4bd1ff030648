"""IVF-PQ recall/latency sweep: the ANN quality-vs-cost dial table.

Builds the IVF-PQ index once (``operators/pq.py::ivfpq_write_index``)
and sweeps the two query-time dials — ``n_probe`` (how many coarse
partitions are scanned; partition pruning makes cost ~linear in it)
and ``shortlist`` (how many ADC candidates get the exact re-rank) —
measuring recall@k against exact brute force and wall-clock per query.

This is the table an operator of a 100 TB embedding corpus reads to
pick the dials: recall rises with both knobs, cost rises with n_probe
(scan volume) and mildly with shortlist (re-rank rows).

Usage:
  python tools/ivfpq_sweep.py [--sf-dir /root/testdata/sf0.1]
      [--queries 20] [--k 10] [--out benchmark/ivfpq_sweep.csv]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CSV_HEADER = "n_probe,shortlist,n_clusters,m,ks,queries,k,recall_at_k,median_query_sec"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-clusters", type=int, default=16)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--ks", type=int, default=16)
    ap.add_argument("--out", default=os.path.join(REPO, "benchmark", "ivfpq_sweep.csv"))
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from confidential_storm_spark.operators.pq import ivfpq_topk, ivfpq_write_index
    from confidential_storm_spark.session import get_spark

    spark = get_spark(app_name="ivfpq-sweep")
    emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    dim = len(emb.select("embedding").head()["embedding"])
    n_corpus = emb.count()

    idx_path = os.path.join(tempfile.mkdtemp(prefix="ivfpq_sweep_"), "index")
    t0 = time.time()
    ivfpq_write_index(
        emb, idx_path, dim=dim, n_clusters=args.n_clusters, m=args.m, ks=args.ks
    )
    build_s = time.time() - t0
    print(f"# index built: {n_corpus:,} vectors dim={dim} in {build_s:.1f}s", file=sys.stderr)

    q_rows = emb.filter(F.col("vec_id") < args.queries).collect()
    queries = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in q_rows}

    # exact ground truth: full probe + corpus-wide shortlist is provably
    # brute force (operators/pq.py::ivfpq_topk docstring; pytest-pinned)
    truth = {}
    for qid, q in queries.items():
        rows = ivfpq_topk(
            spark, idx_path, q, k=args.k, n_probe=args.n_clusters, shortlist=n_corpus
        ).collect()
        truth[qid] = {r[0] for r in rows}

    lines = [CSV_HEADER]
    for n_probe in (1, 2, 4, 8, args.n_clusters):
        for shortlist in (20, 50, 100, 500):
            hits, times = 0, []
            for qid, q in queries.items():
                t0 = time.time()
                rows = ivfpq_topk(
                    spark, idx_path, q, k=args.k, n_probe=n_probe, shortlist=shortlist
                ).collect()
                times.append(time.time() - t0)
                hits += len({r[0] for r in rows} & truth[qid])
            recall = hits / (args.k * len(queries))
            med = sorted(times)[len(times) // 2]
            line = (
                f"{n_probe},{shortlist},{args.n_clusters},{args.m},{args.ks},"
                f"{len(queries)},{args.k},{recall:.4f},{med:.3f}"
            )
            print(line)
            lines.append(line)

    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
