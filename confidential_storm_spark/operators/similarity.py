"""Similarity search over embedding columns.

Brute-force cosine top-k (the exactness baseline + DuckDB oracle) and
a random-hyperplane LSH-bucketed variant (the 100 TB scale path:
candidate set shrinks by ~2^planes, rerank is exact cosine).

Dot products use ``zip_with`` + ``aggregate`` — JVM-side, no Python.
A billion-vector deployment would pre-bucket (write bucketed parquet)
so queries prune to matching buckets at scan time.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cosine_to_query",
    "brute_force_topk",
    "lsh_bucket",
    "lsh_ann_topk",
    "ivf_index",
    "ivf_topk",
]


def cosine_to_query(vec: Column, query: list[float]) -> Column:
    """Cosine similarity of an array<float|double> column to a constant
    query vector, computed left-to-right in doubles (bit-compatible
    with the DuckDB oracle's list_cosine_similarity)."""
    q = [float(x) for x in query]
    qn = float(np.sqrt(sum(x * x for x in q)))
    qcol = F.array(*[F.lit(x) for x in q])
    v = vec.cast("array<double>")
    dot = F.aggregate(F.zip_with(v, qcol, lambda a, b: a * b), F.lit(0.0), lambda s, x: s + x)
    vn = F.sqrt(F.aggregate(v, F.lit(0.0), lambda s, x: s + x * x))
    return dot / (vn * F.lit(qn))


def brute_force_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: one narrow scan + a global top-k (Spark's
    ``orderBy.limit`` compiles to per-partition TakeOrdered, no full
    sort shuffle)."""
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_to_query(F.col(vec_col), query), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((num_planes, dim))


def lsh_bucket(vec: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane LSH bucket id: bit b = sign(vec . plane_b)."""
    v = vec.cast("array<double>")
    bucket = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        dot = F.aggregate(F.zip_with(v, p, lambda a, x: a * x), F.lit(0.0), lambda s, x: s + x)
        bucket = bucket + F.when(dot > 0, F.lit(1 << b)).otherwise(F.lit(0))
    return bucket


def ivf_index(
    df: DataFrame,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
):
    """Build an IVF (inverted-file) coarse quantizer: k-means over the
    embeddings; returns (assigned DataFrame with a ``_cluster`` column,
    centroid matrix).  At warehouse scale the assigned table is written
    out partitioned by ``_cluster`` so queries prune to probed
    partitions at scan time."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    if n_clusters < 2:
        raise ValueError("IVF needs n_clusters >= 2 (MLlib KMeans minimum); "
                         "with one cluster use brute_force_topk")
    feats = df.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_clusters, seed=seed, featuresCol="_features", predictionCol="_cluster").fit(
        feats
    )
    assigned = model.transform(feats).drop("_features")
    centroids = np.vstack([c for c in model.clusterCenters()])
    return assigned, centroids


def ivf_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: probe the ``n_probe`` clusters whose
    centroids are nearest (by cosine) to the query, exact-rerank within
    them.  Recall grows with n_probe (n_probe == n_clusters is exact)."""
    assigned, centroids = ivf_index(df, n_clusters, vec_col, seed)
    q = np.asarray(query, dtype=np.float64)
    cnorm = np.linalg.norm(centroids, axis=1)
    cnorm[cnorm == 0] = 1.0
    sims = (centroids @ q) / (cnorm * np.linalg.norm(q))
    probe = np.argsort(-sims)[:n_probe].tolist()
    return (
        assigned.filter(F.col("_cluster").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine_to_query(F.col(vec_col), query), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def lsh_ann_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    num_planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: restrict to the query's LSH bucket, then
    exact-cosine rerank.  Recall is tunable via num_planes (fewer
    planes => bigger buckets => higher recall); multi-probe (flipping
    low-margin bits) is the standard extension."""
    dim = len(query)
    planes = _hyperplanes(dim, num_planes, seed)
    qbits = sum(1 << b for b, plane in enumerate(planes) if float(np.dot(query, plane)) > 0)
    return (
        df.withColumn("_bucket", lsh_bucket(F.col(vec_col), planes))
        .filter(F.col("_bucket") == qbits)
        .select(
            F.col(id_col),
            F.round(cosine_to_query(F.col(vec_col), query), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )
