"""Drift-triggered IVF re-clustering with an atomic serving switch —
the maintenance policy that closes the standing-ANN lifecycle
(build -> stream-append -> drift -> REBUILD -> serve).

The append path (:func:`operators.similarity.ivf_append`,
:mod:`streaming.ingest_ann`) assigns new vectors to their nearest
EXISTING centroid, so per-ingest cost stays proportional to the batch.
The price is drift: as the feed moves away from the build-time
distribution, partial-probe recall degrades (full probe stays exact).
This module makes the re-train decision a measured policy instead of a
cadence guess:

- the index records its build-time clustering quality (the corpus-wide
  mean squared distance to assigned centroids) in a ``_build_stats``
  sidecar;
- :func:`drift_ratio` re-measures that number against the CURRENT
  contents (one scan, k-row aggregate) and divides by the baseline;
- :func:`maybe_recluster` rebuilds into a NEW versioned location when
  the ratio crosses the threshold and atomically repoints a serving
  ALIAS (write-temp + rename of a one-line pointer file) — serving
  never observes a half-built index, and the old index stays on disk
  for rollback until garbage-collected.

At 100 TB the rebuild is the same one-time k-means + partitioned write
as the original build; the policy just decides WHEN it pays for
itself, with the drift ratio as the evidence.  Queries route through
:func:`topk_via_alias`, which resolves the pointer per query — the
switch is a metadata operation, not a data move.

Reference parity note: the reference engine has no ANN surface; this
is part of the beyond-reference training-data operator family
(SURVEY §6 / round-8 verdict "ANN lifecycle").
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "record_build_stats",
    "drift_ratio",
    "write_alias",
    "read_alias",
    "topk_via_alias",
    "maybe_recluster",
]

_ALIAS_FILE = "CURRENT.json"
_STATS_FILE = "_build_stats.json"


def _weighted_mean_dist2(spark: SparkSession, path: str, vec_col: str) -> float:
    """Corpus-wide mean squared distance to assigned centroids — the
    scalar the per-cluster :func:`similarity.ivf_drift_stats` relation
    rolls up to (one scan, one row back)."""
    vectors = spark.read.parquet(f"{path}/vectors")
    cent = spark.read.parquet(f"{path}/centroids").withColumnRenamed(
        "cluster", "_cluster"
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("centroid"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    row = vectors.join(F.broadcast(cent), "_cluster").agg(F.avg(d2)).collect()[0]
    return float(row[0])


def record_build_stats(spark: SparkSession, path: str, vec_col: str = "embedding") -> dict:
    """Measure and persist the just-built index's clustering quality —
    the baseline :func:`drift_ratio` compares against.  Call right
    after ``ivf_write_index`` (or a recluster)."""
    stats = {"mean_dist2": _weighted_mean_dist2(spark, path, vec_col)}
    with open(os.path.join(path, _STATS_FILE), "w") as f:
        json.dump(stats, f)
    return stats


def drift_ratio(spark: SparkSession, path: str, vec_col: str = "embedding") -> float:
    """Current mean squared assignment distance over the build-time
    baseline.  1.0 = as healthy as the day it was built; rising values
    mean the append feed has outgrown the coarse quantizer."""
    with open(os.path.join(path, _STATS_FILE)) as f:
        base = json.load(f)["mean_dist2"]
    return _weighted_mean_dist2(spark, path, vec_col) / base


def write_alias(alias_dir: str, index_path: str) -> None:
    """Atomically point the serving alias at ``index_path``: write a
    temp file in the same directory, then ``os.replace`` (atomic on
    POSIX) — a reader sees the old pointer or the new one, never a
    partial write."""
    os.makedirs(alias_dir, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=alias_dir, suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"path": os.path.abspath(index_path)}, f)
    os.replace(tmp, os.path.join(alias_dir, _ALIAS_FILE))


def read_alias(alias_dir: str) -> str:
    with open(os.path.join(alias_dir, _ALIAS_FILE)) as f:
        return json.load(f)["path"]


def topk_via_alias(
    spark: SparkSession,
    alias_dir: str,
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Serve through the alias: resolve the pointer, then the normal
    pruned-partition probe (:func:`similarity.ivf_topk_indexed`)."""
    from .similarity import ivf_topk_indexed

    return ivf_topk_indexed(
        spark, read_alias(alias_dir), query, k=k, n_probe=n_probe,
        vec_col=vec_col, id_col=id_col,
    )


def maybe_recluster(
    spark: SparkSession,
    alias_dir: str,
    threshold: float = 1.5,
    n_clusters: int | None = None,
    vec_col: str = "embedding",
    seed: int = 42,
) -> dict:
    """The policy: measure drift on the CURRENT index; if
    ``drift_ratio > threshold``, re-cluster its full contents (base +
    everything appended since) into a new ``<path>_v<N+1>`` location,
    record the new baseline, and atomically switch the alias.  Returns
    ``{"reclustered": bool, "drift": float, "path": str}`` —
    idempotent and safe to run on a cadence; serving is never blocked
    (the old index answers queries until the pointer flips)."""
    from .similarity import ivf_write_index

    cur = read_alias(alias_dir)
    drift = drift_ratio(spark, cur, vec_col)
    if drift <= threshold:
        return {"reclustered": False, "drift": drift, "path": cur}
    if n_clusters is None:
        n_clusters = spark.read.parquet(f"{cur}/centroids").count()
    base, ver = cur, 1
    if "_v" in os.path.basename(cur):
        stem, v = cur.rsplit("_v", 1)
        if v.isdigit():
            base, ver = stem, int(v)
    new_path = f"{base}_v{ver + 1}"
    all_vectors = spark.read.parquet(f"{cur}/vectors").drop("_cluster")
    ivf_write_index(all_vectors, new_path, n_clusters=n_clusters,
                    vec_col=vec_col, seed=seed)
    record_build_stats(spark, new_path, vec_col)
    write_alias(alias_dir, new_path)
    return {"reclustered": True, "drift": drift, "path": new_path}
