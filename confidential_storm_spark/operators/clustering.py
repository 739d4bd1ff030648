"""Distributed k-means over the embedding column (Lloyd's algorithm)
— the clustering primitive behind corpus curation (topic balancing,
semantic dedup blocking, IVF coarse quantizers).

Spark-first shape (the same one MLlib's KMeans uses, re-expressed on
DataFrames):

* centroids are a k x d matrix held on the DRIVER and broadcast into
  an Arrow-batched assignment UDF — k*d doubles (a few KB), never a
  shuffle;
* the centroid UPDATE is computed as per-partition partial sums
  (``mapInPandas`` emits one (cluster, count, sum-vector) row per
  cluster per partition) and combined on the driver — the exchange
  carries O(partitions * k) tiny rows instead of shuffling N vectors
  into k skewed groups;
* per iteration the corpus is scanned exactly once; iterations are a
  driver loop exactly like MLlib (``RDD.treeAggregate`` there,
  ``mapInPandas`` + driver combine here).

Determinism (for the cross-engine oracle): seeds are the k
lowest-id vectors; assignment ties break toward the smallest cluster
id; empty clusters are dropped.  Distances use float64 throughout, so
the DuckDB twin reproduces the same trajectory (FP summation-order
differences are ~1e-13 against inter-centroid gaps of O(0.1) — they
cannot flip an argmin on real embeddings).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["kmeans_fit", "kmeans_assign", "kmeans_sql"]


def kmeans_assign(
    df: DataFrame,
    cids: np.ndarray,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Nearest-centroid assignment: squared-L2 argmin over the
    broadcast ``centroids`` (k x d float64), labeled with ``cids``
    (ascending, so the first-minimum tie-break lands on the smallest
    cluster id)."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    ids = np.asarray(cids, dtype=np.int64)

    @pandas_udf("long")
    def nearest(vs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vs])
        D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(ids[D.argmin(axis=1)])

    return df.withColumn(out_col, nearest(F.col(vec_col)))


def _assign_partial_sums(
    vecs: DataFrame, cids: np.ndarray, centroids: np.ndarray, vec_col: str
) -> pd.DataFrame:
    """Fused Lloyd iteration body: nearest-centroid argmin AND the
    per-cluster (count, sum-vector) partials in ONE ``mapInPandas``
    stage, so each iteration crosses the JVM<->Python boundary once
    instead of twice (assignment UDF + separate partial-sum pass) —
    the vectors are the heavy column and previously made the Arrow
    round trip twice per round (guide §4: pass the batch through one
    Python stage, do all the numpy work there).  Distance formula,
    tie-breaking (first minimum == smallest cluster id) and per-group
    summation order are byte-identical to the unfused form."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    ids = np.asarray(cids, dtype=np.int64)

    def part(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            D = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            lab = D.argmin(axis=1)
            rows = []
            for j in np.unique(lab):
                m = lab == j
                rows.append((int(ids[j]), int(m.sum()), X[m].sum(axis=0)))
            yield pd.DataFrame(rows, columns=["cluster", "cnt", "sums"])

    return (
        vecs.select(vec_col)
        .mapInPandas(part, "cluster long, cnt long, sums array<double>")
        .toPandas()
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[np.ndarray, np.ndarray]:
    """Lloyd's algorithm: seeds = the ``k`` lowest-``id_col`` vectors
    (deterministic), ``iters`` assignment/update rounds.  Returns
    ``(cids, centroids)`` — cluster ids ascending and their k' x d
    float64 centers (k' <= k if clusters emptied)."""
    # Lloyd's re-reads the vectors every iteration: materialize the
    # (id, vec) projection ONCE so the scan/shuffle above it isn't
    # re-executed per round — the canonical cache-before-iterate
    # pattern for iterative algorithms on Spark.  Spread BEFORE the
    # checkpoint: localCheckpoint pins the partitioning, and a
    # single-row-group parquet scan arrives as ONE split, which would
    # run every assignment + partial-sum round on one core.
    from .dedup import _spread

    vecs = _spread(df.select(id_col, vec_col), id_col, hint_from=df).localCheckpoint(
        eager=True
    )
    seed_rows = (
        vecs.orderBy(id_col).limit(k).select(vec_col).collect()
    )  # TakeOrdered: no full sort
    C = np.array([r[0] for r in seed_rows], dtype=np.float64)
    cids = np.arange(len(C), dtype=np.int64)
    for _ in range(iters):
        parts = _assign_partial_sums(vecs, cids, C, vec_col)
        merged = parts.groupby("cluster", sort=True).agg(
            cnt=("cnt", "sum"), sums=("sums", lambda s: np.sum(np.stack(s.to_numpy()), axis=0))
        )
        cids = merged.index.to_numpy(dtype=np.int64)
        C = np.stack(merged["sums"].to_numpy()) / merged["cnt"].to_numpy()[:, None]
    return cids, C


def _kmeans_ctes(
    k: int = 8,
    iters: int = 4,
    dim: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """The shared CTE chain: seed -> [assign -> update] * iters ->
    ``afinal(vec_id, cid)`` plus ``pts(vec_id, v)``."""
    sq = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> (p.v[i] - c.v[i]) * (p.v[i] - c.v[i])))"
    )

    def assign(cent: str, name: str) -> str:
        return f"""{name} AS (
    SELECT {id_col}, cid FROM (
        SELECT p.{id_col}, c.cid,
               ROW_NUMBER() OVER (
                   PARTITION BY p.{id_col}
                   ORDER BY {sq} ASC, c.cid ASC
               ) AS rn
        FROM pts p CROSS JOIN {cent} c
    ) WHERE rn = 1
)"""

    def update(asg: str, name: str) -> str:
        return f"""{name} AS (
    SELECT cid, list(av ORDER BY dim) AS v FROM (
        SELECT a.cid, r.dim, AVG(p.v[r.dim]) AS av
        FROM {asg} a JOIN pts p USING ({id_col})
        CROSS JOIN range(1, {dim + 1}) r(dim)
        GROUP BY a.cid, r.dim
    ) GROUP BY cid
)"""

    ctes = [
        f"""pts AS (
    SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
    FROM {table}
)""",
        f"""c0 AS (
    SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS cid, v
    FROM (SELECT {id_col}, v FROM pts ORDER BY {id_col} LIMIT {k})
)""",
    ]
    for i in range(iters):
        ctes.append(assign(f"c{i}", f"a{i + 1}"))
        ctes.append(update(f"a{i + 1}", f"c{i + 1}"))
    ctes.append(assign(f"c{iters}", "afinal"))
    return "WITH " + ",\n".join(ctes)


def kmeans_sql(
    k: int = 8,
    iters: int = 4,
    dim: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of fit+assign: the same trajectory as unrolled CTE
    iterations (seed -> [assign -> update] * iters -> assignment)."""
    return (
        _kmeans_ctes(k, iters, dim, table, vec_col, id_col)
        + f"\nSELECT {id_col}, cid AS cluster FROM afinal"
    )


# the scale default for semantic dedup: clusters sized so the
# within-cluster exact pair stage stays LINEAR in the corpus
# (k = N / TARGET ⇒ per-cluster work TARGET² · N/TARGET ∝ N); the
# sf10 table measured what ignoring this dial costs (133x on 10x
# data at fixed k)
SEMANTIC_TARGET_CLUSTER = 2_000


def semantic_neardup_pairs(
    df: DataFrame,
    k: int | None = None,
    iters: int = 4,
    threshold: float = 0.85,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_size: int | None = 20_000,
    target_cluster_size: int = SEMANTIC_TARGET_CLUSTER,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al.
    2023): k-means the embeddings, then compare vectors ONLY within
    their cluster — the classic blocking trick that turns O(N^2)
    cosine dedup into k * O((N/k)^2), with the cluster structure
    reusable for curation.

    ``k=None`` (the DEFAULT) applies the scale law in code:
    ``k = clamp(ceil(N / target_cluster_size), 2, ...)`` — cluster
    population stays ~constant as the corpus grows, so the pair stage
    is linear at any scale (the dial the sf10 table showed costs 133x
    when fixed).  Passing an explicit ``k`` pins the fixed-k form the
    registry oracle certifies (the DuckDB twin unrolls exactly k
    seeded Lloyd's iterations, so it cannot depend on a data count).

    Within-cluster comparison is one Arrow batch per cluster (numpy
    normalize + matmul).  ``max_cluster_size`` is the scale guard: a
    cluster bigger than the cap is sub-blocked deterministically (by
    id order) and compared block-vs-block, so task memory stays
    O(cap^2) no matter how skewed the clustering — same policy as the
    dedup operators' bucket caps.  Cross-cluster near-dups at the
    Voronoi boundary are missed by design (the SemDeDup trade).
    """
    if k is None:
        import math

        k = max(2, math.ceil(df.count() / max(target_cluster_size, 1)))
    cids, C = kmeans_fit(df, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    assigned = kmeans_assign(df, cids, C, vec_col=vec_col).select(
        id_col, "cluster", vec_col
    )

    cap = max_cluster_size

    def pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col)
        ids = pdf[id_col].to_numpy()
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        out_a, out_b, out_c = [], [], []
        n = len(ids)
        step = cap if cap else n
        for i0 in range(0, n, step):
            Xi = X[i0 : i0 + step]
            for j0 in range(i0, n, step):
                S = Xi @ X[j0 : j0 + step].T
                ai, bj = np.nonzero(np.round(S, 6) >= threshold)
                if i0 == j0:
                    keep = ai < bj
                else:
                    keep = np.ones(len(ai), dtype=bool)
                ai, bj = ai[keep], bj[keep]
                out_a.append(ids[i0 + ai])
                out_b.append(ids[j0 + bj])
                out_c.append(np.round(S[ai, bj], 6))
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a) if out_a else np.array([], dtype=np.int64),
                "id_b": np.concatenate(out_b) if out_b else np.array([], dtype=np.int64),
                "cosine": np.concatenate(out_c) if out_c else np.array([], dtype=np.float64),
            }
        )

    return assigned.groupBy("cluster").applyInPandas(
        pairs, "id_a long, id_b long, cosine double"
    )


def semantic_pairs_sql(
    k: int = 8,
    iters: int = 4,
    dim: int = 64,
    threshold: float = 0.85,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin: kmeans CTE chain + within-cluster cosine join."""
    dot = f"list_sum(list_transform(range(1, {dim + 1}), i -> pa.v[i] * pb.v[i]))"
    nrm = f"sqrt(list_sum(list_transform(range(1, {dim + 1}), i -> {{p}}.v[i] * {{p}}.v[i])))"
    na, nb = nrm.format(p="pa"), nrm.format(p="pb")
    return f"""{_kmeans_ctes(k, iters, dim, table, vec_col, id_col)},
scored AS (
    SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
           ROUND({dot} / ({na} * {nb}), 6) AS cosine
    FROM afinal a JOIN afinal b ON a.cid = b.cid AND a.{id_col} < b.{id_col}
    JOIN pts pa ON pa.{id_col} = a.{id_col}
    JOIN pts pb ON pb.{id_col} = b.{id_col}
)
SELECT id_a, id_b, cosine FROM scored WHERE cosine >= {threshold}
"""


def centroid_outliers(
    df: DataFrame,
    k: int = 8,
    iters: int = 4,
    z_threshold: float = 2.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-space outlier detection: fit k-means, then score every
    vector by the z-score of its squared distance to its assigned
    centroid WITHIN that cluster — the standard curation probe for
    mislabeled / off-distribution / garbage embeddings (an outlier is
    far from its own cluster's core, not just far from a global mean,
    so dense and sparse regions each keep their own scale).

    Plan shape: k-means fit (cached iterate), one Arrow assignment
    pass, then JVM-only arithmetic — the k-row centroid table is
    broadcast, dist2 folds left-to-right inside codegen (bit-compatible
    with the DuckDB twin's ``list_sum``), and the per-cluster
    mean/stddev aggregate is k rows.  No shuffle wider than the k-row
    stats join.  ``stddev_pop`` (not sample) so a singleton cluster
    yields 0, which the z-guard maps to z = 0, never NULL."""
    spark = df.sparkSession
    cids, C = kmeans_fit(df, k=k, iters=iters, vec_col=vec_col, id_col=id_col)
    assigned = kmeans_assign(df, cids, C, vec_col=vec_col).select(
        id_col, "cluster", vec_col
    )
    cent = spark.createDataFrame(
        [(int(c), [float(x) for x in C[i]]) for i, c in enumerate(cids)],
        "cluster long, _centroid array<double>",
    )
    dist2 = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("_centroid"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    # materialize the narrow (id, cluster, d2) projection once: both
    # the stats aggregate and the final join consume it, and without
    # this the Arrow assignment pass runs twice
    scored = (
        assigned.join(F.broadcast(cent), "cluster")
        .select(id_col, "cluster", dist2.alias("_d2"))
        .localCheckpoint(eager=True)
    )
    stats = scored.groupBy("cluster").agg(
        F.avg("_d2").alias("_m"), F.stddev_pop("_d2").alias("_s")
    )
    z_raw = (F.col("_d2") - F.col("_m")) / F.col("_s")
    return (
        scored.join(F.broadcast(stats), "cluster")
        .select(
            F.col(id_col),
            F.col("cluster"),
            F.round("_d2", 6).alias("dist2"),
            F.round(F.when(F.col("_s") > 0, z_raw).otherwise(F.lit(0.0)), 4).alias("z_score"),
            F.when((F.col("_s") > 0) & (z_raw > F.lit(z_threshold)), F.lit(True))
            .otherwise(F.lit(False))
            .alias("is_outlier"),
        )
        .orderBy(id_col)
    )


def centroid_outliers_sql(
    k: int = 8,
    iters: int = 4,
    z_threshold: float = 2.0,
    dim: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`centroid_outliers`: same unrolled Lloyd
    trajectory as :func:`kmeans_sql`, extended with the dist2 /
    per-cluster z-score tail."""
    sq = (
        f"list_sum(list_transform(range(1, {dim + 1}), "
        f"i -> (p.v[i] - c.v[i]) * (p.v[i] - c.v[i])))"
    )
    return (
        _kmeans_ctes(k, iters, dim, table, vec_col, id_col)
        + f""",
d AS (SELECT p.{id_col}, a.cid AS cluster, {sq} AS dist2
      FROM pts p JOIN afinal a USING ({id_col}) JOIN c{iters} c ON a.cid = c.cid),
st AS (SELECT cluster, AVG(dist2) AS m, stddev_pop(dist2) AS s FROM d GROUP BY cluster)
SELECT d.{id_col}, d.cluster,
       ROUND(d.dist2, 6) AS dist2,
       ROUND(CASE WHEN st.s > 0 THEN (d.dist2 - st.m) / st.s ELSE 0.0 END, 4) AS z_score,
       CASE WHEN st.s > 0 AND (d.dist2 - st.m) / st.s > {z_threshold!r} THEN TRUE ELSE FALSE END AS is_outlier
FROM d JOIN st USING (cluster)
ORDER BY d.{id_col}
"""
    )
