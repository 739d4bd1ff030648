"""Product quantization (PQ) for embedding compression + ANN.

Jegou et al., "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011) — the memory side of billion-scale ANN: split each
d-dim vector into ``m`` subvectors, k-means each subspace to ``ks``
centroids, store each vector as ``m`` small codes (d floats -> m
bytes at ks<=256), and answer queries with asymmetric distance
computation (ADC): one (m x ks) table of exact query-to-centroid
distances, then each candidate costs m table lookups instead of d
multiplies.  IVF-PQ (compose with the IVF index in
``operators/similarity.py``) is the standard billion-vector recipe.

Spark shape:
- training collects a driver SAMPLE (bounded, like the IVF centroid
  build) and runs per-subspace Lloyd in numpy — codebooks are a tiny
  (m, ks, d/m) constant;
- encoding is an Arrow-batched pandas UDF (argmin over broadcast
  codebooks), one scan, no shuffle — the codes table is the
  artifact you persist;
- ADC search broadcasts the distance TABLE (m*ks floats — not the
  codebooks' job at query time), scores with one vectorized lookup
  per batch, and finishes with TakeOrdered — identical plan shape
  to brute force but over m-byte codes instead of d-float vectors.

Determinism: seeding picks the lowest-``id_col`` sample rows and the
first-ks-per-subspace initial centroids, so codebooks, codes, and
search results are bit-reproducible (pytest-verified, plus a recall
floor against exact brute force — approximate by nature, so no SQL
oracle; the exact operators remain the registry's value-checked
paths)."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = [
    "pq_train",
    "pq_encode",
    "pq_topk_adc",
    "pq_topk_rerank",
    "ivfpq_write_index",
    "ivfpq_append",
    "ivfpq_topk",
]


def pq_train(
    df: DataFrame,
    dim: int,
    m: int = 16,
    ks: int = 64,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 4096,
) -> np.ndarray:
    """Train PQ codebooks: per-subspace Lloyd's on the lowest-id
    ``sample_rows`` vectors (deterministic).  Returns float64
    ``(m, ks, dim//m)``.

    Defaults ``m=16, ks=64`` after measurement on dim-64 synthetic
    embeddings (benchmark/ivfpq_sweep.csv = m=16/ks=64;
    benchmark/ivfpq_sweep_m8.csv = m=8/ks=64): re-ranked recall@10 at
    full probe + 500-shortlist is 0.99 for m=16/ks=64 vs 0.85 for
    m=8/ks=64 vs ~0.72 for m=8/ks=16 — BOTH quantizer dials (subspace
    count and codebook size), not probe width, are the recall levers.
    ks<=256 keeps the ADC table broadcast-tiny either way; ``dim``
    must stay divisible by ``m``."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    sub = dim // m
    rows = (
        df.orderBy(id_col).limit(sample_rows).select(vec_col).collect()
    )  # TakeOrdered sample — bounded driver footprint like the IVF build
    X = np.array([r[0] for r in rows], dtype=np.float64)
    books = np.empty((m, ks, sub))
    for j in range(m):
        Xj = X[:, j * sub : (j + 1) * sub]
        C = Xj[:ks].copy()  # deterministic seeding: first ks sample rows
        for _ in range(iters):
            d2 = ((Xj[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(ks):
                mask = assign == c
                if mask.any():
                    C[c] = Xj[mask].mean(axis=0)
        books[j] = C
    return books


def pq_encode(
    df: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Encode each vector to its ``m`` nearest-subspace-centroid
    indices: ``(id_col, pq_code array<int>)`` — the compressed
    standing artifact (d floats -> m small ints per vector)."""
    m, ks, sub = codebooks.shape
    B = np.ascontiguousarray(codebooks)

    @pandas_udf("array<int>")
    def encode(vs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        n = X.shape[0]
        codes = np.empty((n, m), dtype=np.int32)
        for j in range(m):
            Xj = X[:, j * sub : (j + 1) * sub]
            d2 = ((Xj[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return df.select(id_col, encode(F.col(vec_col)).alias(code_col))


def pq_topk_adc(
    codes: DataFrame,
    query: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
) -> DataFrame:
    """Asymmetric-distance top-k over a PQ-coded table: exact
    query-to-centroid distance table (m x ks, computed once,
    broadcast), each candidate scored with m lookups; returns
    ``(id_col, approx_dist2)`` ascending with id tiebreak."""
    m, ks, sub = codebooks.shape
    q = np.asarray(query, dtype=np.float64)
    if q.shape[0] != m * sub:
        raise ValueError(f"query dim {q.shape[0]} != {m * sub}")
    # ADC table: exact distance from each query subvector to every centroid
    table = np.empty((m, ks))
    for j in range(m):
        table[j] = ((codebooks[j] - q[j * sub : (j + 1) * sub]) ** 2).sum(axis=1)

    @pandas_udf("double")
    def score(cs: pd.Series) -> pd.Series:
        C = np.stack([np.asarray(c, dtype=np.int64) for c in cs])
        return pd.Series(table[np.arange(m)[None, :], C].sum(axis=1))

    return (
        codes.select(id_col, F.round(score(F.col(code_col)), 6).alias("approx_dist2"))
        .orderBy("approx_dist2", id_col)
        .limit(k)
    )


def pq_topk_rerank(
    codes: DataFrame,
    vectors: DataFrame,
    query: list[float],
    codebooks: np.ndarray,
    k: int = 10,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "pq_code",
) -> DataFrame:
    """The production PQ recipe: ADC over the compressed codes builds
    a ``shortlist`` (cheap, m lookups per candidate), then ONLY the
    shortlist's full vectors are fetched and re-ranked by exact
    distance (Jegou et al. §V; every IVF-PQ system ships this).
    Returns ``(id_col, dist2)`` exact-distance ascending, id
    tiebreak.  The full-vector join touches ``shortlist`` rows, not
    the corpus — at scale the codes table is the only full scan."""
    short = pq_topk_adc(
        codes, query, codebooks, k=shortlist, id_col=id_col, code_col=code_col
    ).select(id_col)
    q = np.asarray(query, dtype=np.float64)

    @pandas_udf("double")
    def exact(vs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        return pd.Series(((X - q) ** 2).sum(axis=1))

    return (
        vectors.join(F.broadcast(short), id_col)
        .select(id_col, F.round(exact(F.col(vec_col)), 6).alias("dist2"))
        .orderBy("dist2", id_col)
        .limit(k)
    )


def ivfpq_write_index(
    df: DataFrame,
    path: str,
    dim: int,
    n_clusters: int = 16,
    m: int = 16,
    ks: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> tuple[np.ndarray, np.ndarray]:
    """IVF-PQ: THE billion-vector index (Jegou et al. §VI).  Coarse
    IVF clusters partition the corpus (probing prunes partitions at
    scan time); within each partition rows carry the PQ codes AND the
    full vector (codes drive the cheap ADC shortlist, the vector
    serves the re-rank without a second table).  Layout:

    - ``{path}/vectors`` — parquet partitioned by ``_cluster`` with
      (id, pq_code, vector) rows,
    - ``{path}/centroids`` — the tiny coarse-centroid table,
    - ``{path}/codebooks`` — the (m*ks) codebook rows.

    Returns ``(centroids, codebooks)``."""
    from .similarity import ivf_index

    assigned, centroids = ivf_index(df, n_clusters, vec_col, seed)
    books = pq_train(df, dim, m=m, ks=ks, vec_col=vec_col, id_col=id_col)
    coded = pq_encode(assigned, books, vec_col=vec_col, id_col=id_col).join(
        assigned.select(id_col, vec_col, "_cluster"), id_col
    )
    coded.write.partitionBy("_cluster").mode("overwrite").parquet(f"{path}/vectors")
    spark = df.sparkSession
    spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    spark.createDataFrame(
        [
            (j, c, [float(x) for x in books[j, c]])
            for j in range(m)
            for c in range(ks)
        ],
        "subspace int, code int, centroid array<double>",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/codebooks")
    return centroids, books


def ivfpq_append(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Append NEW vectors to a standing IVF-PQ index without touching
    the trained artifacts: coarse-assign each to its euclidean-nearest
    EXISTING centroid, PQ-encode with the EXISTING codebooks (so every
    stored code stays comparable — ADC lookup tables are built
    per-query from the same books), and append (id, code, vector,
    _cluster) rows under the matching partitions.

    No re-cluster, no codebook retrain, per-ingest cost ∝ the batch —
    the compressed sibling of :func:`similarity.ivf_append`.  As the
    corpus drifts away from the trained codebooks the QUANTIZATION
    error of new codes grows (ADC shortlists get noisier), but the
    exact re-rank stage bounds the damage and full-probe +
    corpus-shortlist remains provably exact; retrain the books when
    the appended fraction dominates, as with any trained index."""
    from .similarity import assign_to_centroids, read_centroid_matrix

    spark = df.sparkSession
    cmat = read_centroid_matrix(spark, path)
    book_rows = spark.read.parquet(f"{path}/codebooks").collect()
    if not book_rows:
        raise ValueError(f"no codebooks at {path}/codebooks — build with ivfpq_write_index")
    m = max(r["subspace"] for r in book_rows) + 1
    ks = max(r["code"] for r in book_rows) + 1
    books = np.zeros((m, ks, len(book_rows[0]["centroid"])))
    for r in book_rows:
        books[r["subspace"], r["code"]] = r["centroid"]

    assigned = assign_to_centroids(df, cmat, vec_col)
    coded = pq_encode(assigned, books, vec_col=vec_col, id_col=id_col).join(
        assigned.select(id_col, vec_col, "_cluster"), id_col
    )
    coded.write.partitionBy("_cluster").mode("append").parquet(f"{path}/vectors")


def ivfpq_topk(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    shortlist: int = 100,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Query the prebuilt IVF-PQ index: rank coarse centroids on the
    driver (tiny), scan ONLY the probed ``_cluster=`` partitions
    (partition pruning), ADC-shortlist on the codes, exact re-rank on
    the in-partition vectors.  Returns ``(id, dist2)`` ascending.
    At full probe with shortlist >= corpus this is exactly brute
    force — the compression/recall dials are n_probe and shortlist."""
    from .similarity import _probe_clusters

    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    centroids = np.zeros((len(cent_rows), len(cent_rows[0]["centroid"])))
    for r in cent_rows:
        centroids[r["cluster"]] = r["centroid"]
    book_rows = spark.read.parquet(f"{path}/codebooks").collect()
    m = max(r["subspace"] for r in book_rows) + 1
    ks = max(r["code"] for r in book_rows) + 1
    sub = len(book_rows[0]["centroid"])
    books = np.zeros((m, ks, sub))
    for r in book_rows:
        books[r["subspace"], r["code"]] = r["centroid"]
    probe = _probe_clusters(centroids, query, n_probe)
    part = spark.read.parquet(f"{path}/vectors").filter(F.col("_cluster").isin(probe))
    return pq_topk_rerank(
        part.select(id_col, "pq_code"),
        part.select(id_col, vec_col),
        query,
        books,
        k=k,
        shortlist=shortlist,
        id_col=id_col,
        vec_col=vec_col,
    )
