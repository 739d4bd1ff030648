"""PCA follow-through for the one-pass covariance query — the
measured answer to "how many principal dims does ANN actually need":

  covariance   the same mapInPandas partial-sum pass `emb_covariance`
               certifies (one corpus scan, O(batches * d^2) exchange)
  eigh         driver-side numpy eigendecomposition of the d x d
               result (MLlib RowMatrix design: the plan never sees it)
  spectrum     cumulative variance-explained per principal dim
  recall       exact cosine top-10 in r-dim PCA space vs exact top-10
               in full d-dim space, per r — the dial that prices a
               projection rung (cheaper scans, smaller SQ/PQ codes)
               against retrieval quality

Writes ``benchmark/pca_spectrum.csv`` (dim, eigenvalue,
cum_var_explained) and ``benchmark/pca_recall.csv`` (r, mean
recall@10 over the query sample).

Usage: python tools/pca_demo.py [sf_dir]
"""

from __future__ import annotations

import csv
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

K = 10
N_QUERIES = 32
RANKS = [2, 4, 8, 16, 24, 32, 48, 64]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from confidential_storm_spark.plans.queries import EMB_DIM, emb_covariance
    from confidential_storm_spark.session import get_spark

    spark = get_spark(cpus=8, shuffle_partitions=8)

    # 1) the certified one-pass covariance (upper triangle -> full)
    cov_rows = emb_covariance(spark, sf_dir).collect()
    d = EMB_DIM
    cov = np.zeros((d, d))
    for r in cov_rows:
        cov[r.i, r.j] = cov[r.j, r.i] = r.cov

    # 2) driver-side spectrum (eigh returns ascending; flip)
    evals, evecs = np.linalg.eigh(cov)
    evals, evecs = evals[::-1], evecs[:, ::-1]
    total = float(evals.sum())
    os.makedirs(os.path.join(REPO, "benchmark"), exist_ok=True)
    with open(os.path.join(REPO, "benchmark", "pca_spectrum.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["dim", "eigenvalue", "cum_var_explained"])
        cum = 0.0
        for i, ev in enumerate(evals):
            cum += float(ev)
            w.writerow([i, round(float(ev), 6), round(cum / total, 6)])

    # 3) recall@10 of exact search in r-dim PCA space vs full space.
    # The corpus at any registry SF is driver-sized for this offline
    # evaluation; at 100 TB the same measurement runs on a sample.
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r.vec_id for r in rows])
    X = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    qidx = np.argsort(ids)[:N_QUERIES]

    def topk(M: np.ndarray, qi: np.ndarray) -> np.ndarray:
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = Mn[qi] @ Mn.T
        # exclude self, take K best ids per query
        out = []
        for row_i, q in enumerate(qi):
            s = sims[row_i].copy()
            s[q] = -np.inf
            out.append(ids[np.argpartition(-s, K)[:K]])
        return np.array(out)

    exact = topk(Xn, qidx)
    mean_center = X.mean(axis=0)
    with open(os.path.join(REPO, "benchmark", "pca_recall.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["r", "cum_var_explained", "mean_recall_at_10"])
        for r in RANKS:
            P = evecs[:, :r]
            proj = (X - mean_center) @ P
            approx = topk(proj, qidx)
            rec = np.mean(
                [len(set(a) & set(e)) / K for a, e in zip(approx, exact)]
            )
            cumvar = float(evals[:r].sum() / total)
            w.writerow([r, round(cumvar, 6), round(float(rec), 4)])
            print(f"r={r:3d}  var={cumvar:.4f}  recall@10={rec:.4f}")
    print("wrote benchmark/pca_spectrum.csv, benchmark/pca_recall.csv")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
