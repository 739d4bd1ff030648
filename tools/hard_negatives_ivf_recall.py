"""Recall/wall-time ladder for IVF-pruned hard-negative mining
(operators/similarity.py::hard_negatives_ivf) vs the exact miner —
the committed evidence that partial probe is the 100 TB path: wall
time scales with n_probe/n_clusters while recall@k degrades
gracefully (and full probe is row-identical to exact, which the
registry certifies under the hash gate as ``knn_hard_negatives_ivf``).

Writes/appends benchmark/hard_negatives_ivf_recall.csv with one row
per (sf_dir, n_probe):
  sf,n_vectors,n_clusters,n_probe,wall_s,recall_at_k,rows

Usage: python tools/hard_negatives_ivf_recall.py [sf_dir] [n_clusters]
Defaults: /root/testdata/sf0.1, 16.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from confidential_storm_spark.operators.similarity import (
    hard_negatives,
    hard_negatives_ivf,
    ivf_write_index,
    read_centroid_matrix,
)
from confidential_storm_spark.session import get_spark

K, QUERY_MOD = 5, 101
CSV = os.path.join(os.path.dirname(__file__), "..", "benchmark",
                   "hard_negatives_ivf_recall.csv")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_clusters = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    spark = get_spark()
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_vectors = emb.count()

    # standing index: centroids fit once, reused by every probe point
    path = f"/tmp/hn_ivf_recall_{sf}_{n_clusters}"
    if not os.path.exists(f"{path}/centroids/_SUCCESS"):
        ivf_write_index(emb, path, n_clusters=n_clusters)
    cmat = read_centroid_matrix(spark, path)

    t0 = time.time()
    exact = {
        (r.query_id, r.neg_id)
        for r in hard_negatives(emb, k=K, query_mod=QUERY_MOD).collect()
    }
    exact_s = time.time() - t0

    rows_out = [
        f"{sf},{n_vectors},{n_clusters},exact,{exact_s:.3f},1.0,{len(exact)}"
    ]
    probes = sorted({1, 2, 4, n_clusters // 2, n_clusters})
    for n_probe in probes:
        t0 = time.time()
        got = {
            (r.query_id, r.neg_id)
            for r in hard_negatives_ivf(
                emb, k=K, query_mod=QUERY_MOD, n_probe=n_probe, centroids=cmat
            ).collect()
        }
        wall = time.time() - t0
        recall = len(got & exact) / max(len(exact), 1)
        rows_out.append(
            f"{sf},{n_vectors},{n_clusters},{n_probe},{wall:.3f},{recall:.4f},{len(got)}"
        )
        print(rows_out[-1])

    header = "sf,n_vectors,n_clusters,n_probe,wall_s,recall_at_k,rows\n"
    exists = os.path.exists(CSV)
    with open(CSV, "a") as f:
        if not exists:
            f.write(header)
        f.write("\n".join(rows_out) + "\n")
    print(f"appended {len(rows_out)} rows -> {CSV}")


if __name__ == "__main__":
    main()
