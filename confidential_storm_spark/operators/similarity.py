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
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine_to_query",
    "brute_force_topk",
    "lsh_bucket",
    "lsh_ann_topk",
    "lsh_topk_sql",
    "lsh_multiprobe_topk_sql",
    "ivf_index",
    "ivf_write_index",
    "ivf_append",
    "read_centroid_matrix",
    "assign_to_centroids",
    "ivf_drift_stats",
    "ivf_topk",
    "ivf_topk_indexed",
    "hard_negatives",
    "hard_negatives_ivf",
    "hard_negatives_sql",
]


def cosine_to_query(vec_col: str, query: list[float]) -> Column:
    """Cosine similarity of an array<float|double> column (by NAME) to
    a constant query vector, computed left-to-right in doubles
    (bit-compatible with the DuckDB oracle's list_cosine_similarity).
    One SQL string — the Column form paid a py4j round trip per query
    coordinate."""
    q = [float(x) for x in query]
    qn = float(np.sqrt(sum(x * x for x in q)))
    qarr = "array(" + ", ".join(f"{x!r}D" for x in q) + ")"
    v = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    dot = f"aggregate(zip_with({v}, {qarr}, (a, b) -> a * b), 0.0D, (s, x) -> s + x)"
    vn = f"sqrt(aggregate({v}, 0.0D, (s, x) -> s + x * x))"
    return F.expr(f"{dot} / ({vn} * {qn!r}D)")


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
            F.round(cosine_to_query(vec_col, query), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((num_planes, dim))


def lsh_bucket(vec_col: str, planes: np.ndarray) -> Column:
    """Random-hyperplane LSH bucket id: bit b = sign(vec . plane_b).
    ``vec_col`` is the vector column's NAME; the expression is built
    as one SQL string — the Column form paid a py4j round trip per
    plane coordinate (~0.4 s at 4 planes x 64 dims)."""
    v = f"CAST({vec_col} AS ARRAY<DOUBLE>)"
    terms = []
    for b, plane in enumerate(planes):
        p = "array(" + ", ".join(f"{float(x)!r}D" for x in plane) + ")"
        dot = f"aggregate(zip_with({v}, {p}, (a, x) -> a * x), 0.0D, (s, x) -> s + x)"
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << b}L ELSE 0L END)")
    return F.expr("CAST(0 AS BIGINT) + " + " + ".join(terms))


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


def ivf_write_index(
    df: DataFrame,
    path: str,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Materialize an IVF index: the assigned vectors are written as a
    parquet table PARTITIONED BY the coarse cluster (so probing prunes
    non-probed partitions at scan time — this is the 100 TB query
    path), plus a tiny centroids table.  Returns the centroid matrix."""
    assigned, centroids = ivf_index(df, n_clusters, vec_col, seed)
    assigned.write.partitionBy("_cluster").mode("overwrite").parquet(f"{path}/vectors")
    cent = df.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster int, centroid array<double>",
    )
    cent.coalesce(1).write.mode("overwrite").parquet(f"{path}/centroids")
    return centroids


def ivf_append(
    df: DataFrame,
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Append NEW vectors to a standing IVF index WITHOUT re-clustering
    — the ANN sibling of the minhash standing band index
    (sources/writers.py): per-ingest cost ∝ the batch, never the
    corpus, which is the only maintenance model that survives a daily
    feed into a 100 TB embedding table.

    Each new vector is assigned to its EUCLIDEAN-nearest existing
    centroid — the same argmin KMeans used to place the base vectors,
    via the |c|^2 - 2 v·c expansion (|v|^2 is constant per row) — in
    one Arrow-batched mapInPandas pass over a driver-broadcast
    centroid matrix (n_clusters x dim floats: tiny).  Rows land under
    their ``_cluster=`` partition directories, so
    :func:`ivf_topk_indexed` prunes appended and base vectors alike.

    Centroids drift as the corpus grows; the probe path stays EXACT at
    full probe regardless (every partition scans), while partial-probe
    recall degrades gradually — re-cluster when the appended fraction
    gets large, exactly like rebuilding any secondary index."""
    cmat = read_centroid_matrix(df.sparkSession, path)
    (
        assign_to_centroids(df, cmat, vec_col)
        .write.partitionBy("_cluster")
        .mode("append")
        .parquet(f"{path}/vectors")
    )


def read_centroid_matrix(spark, path: str) -> np.ndarray:
    """Load ``{path}/centroids`` into the (n_clusters x dim) matrix the
    driver-side probe/assign helpers use."""
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    if not cent_rows:
        raise ValueError(f"no centroids at {path}/centroids — build with ivf_write_index")
    cmat = np.zeros((len(cent_rows), len(cent_rows[0]["centroid"])), dtype=np.float64)
    for r in cent_rows:
        cmat[r["cluster"]] = r["centroid"]
    return cmat


def assign_to_centroids(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Add ``_cluster`` = index of the euclidean-nearest centroid, via
    one Arrow-batched mapInPandas pass over the broadcast matrix."""
    from typing import Iterator

    import pandas as pd

    cmat = np.ascontiguousarray(centroids, dtype=np.float64)
    c_sq = (cmat * cmat).sum(axis=1)  # |c|^2 per centroid

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            v = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            # argmin ||v - c||^2 over c == argmin |c|^2 - 2 v.c
            pdf = pdf.copy()
            pdf["_cluster"] = (c_sq - 2.0 * (v @ cmat.T)).argmin(axis=1).astype("int32")
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", _cluster int"
    return df.mapInPandas(assign, schema)


def ivf_drift_stats(spark, path: str, vec_col: str = "embedding") -> DataFrame:
    """Per-cluster health of a standing IVF index: (cluster, n_vectors,
    mean_dist2) where mean_dist2 is the average squared distance of
    stored vectors to their assigned centroid — THE re-train trigger
    for the append-maintenance model.  A fresh k-means index minimizes
    this by construction; as appends drift away from the training
    distribution the number rises, and comparing snapshots over time
    (or against the build-time baseline) tells you when re-clustering
    pays for itself.  Full probe stays exact regardless — this is a
    recall/cost dial, never a correctness one.

    One scan + a k-row aggregate: dist2 folds JVM-side (zip_with over
    the broadcast-joined centroid array), partial aggregation map-side;
    no driver materialization beyond k rows."""
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
    return (
        vectors.join(F.broadcast(cent), "_cluster")
        .groupBy("_cluster")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg(d2), 6).alias("mean_dist2"),
        )
        .orderBy("_cluster")
    )


def _probe_clusters(centroids: np.ndarray, query: list[float], n_probe: int) -> list[int]:
    q = np.asarray(query, dtype=np.float64)
    cnorm = np.linalg.norm(centroids, axis=1)
    cnorm[cnorm == 0] = 1.0
    sims = (centroids @ q) / (cnorm * np.linalg.norm(q))
    return np.argsort(-sims, kind="stable")[:n_probe].tolist()


def ivf_topk_indexed(
    spark,
    path: str,
    query: list[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF top-k against a PREBUILT index (see :func:`ivf_write_index`)
    — the query path does no KMeans fit: rank centroids on the driver
    (tiny), scan only the probed ``_cluster=`` partitions (partition
    pruning, visible in the plan's PartitionFilters), exact-rerank.
    ``n_probe == n_clusters`` is provably identical to
    :func:`brute_force_topk`."""
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    centroids = np.zeros((len(cent_rows), len(cent_rows[0]["centroid"])))
    for r in cent_rows:
        centroids[r["cluster"]] = r["centroid"]
    probe = _probe_clusters(centroids, query, n_probe)
    vectors = spark.read.parquet(f"{path}/vectors")
    return (
        vectors.filter(F.col("_cluster").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine_to_query(vec_col, query), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


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
    probe = _probe_clusters(centroids, query, n_probe)
    return (
        assigned.filter(F.col("_cluster").isin(probe))
        .select(
            F.col(id_col),
            F.round(cosine_to_query(vec_col, query), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def lsh_topk_sql(
    dim: int,
    k: int = 10,
    num_planes: int = 4,
    seed: int = 42,
    table: str = "embeddings",
    query_id: int = 0,
) -> str:
    """DuckDB oracle for :func:`lsh_ann_topk`: the seeded hyperplanes
    are deterministic constants, so the bucket assignment (bit b =
    sign of dot with plane b) is reproduced with ``list_dot_product``
    literals, then the query's bucket is filtered and reranked by
    exact cosine, exactly like the Spark form."""
    planes = _hyperplanes(dim, num_planes, seed)
    bucket_terms = " + ".join(
        f"(CASE WHEN list_dot_product(v, [{', '.join(repr(float(x)) for x in plane)}]) > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b, plane in enumerate(planes)
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}),
bk AS (SELECT vec_id, v, {bucket_terms} AS bucket FROM e),
qb AS (SELECT bucket AS qbucket, v AS qv FROM bk WHERE vec_id = {query_id})
SELECT b.vec_id, ROUND(list_cosine_similarity(b.v, q.qv), 6) AS cosine
FROM bk b, qb q
WHERE b.bucket = q.qbucket
ORDER BY cosine DESC, vec_id
LIMIT {k}
"""


def lsh_multiprobe_topk_sql(
    dim: int,
    k: int = 10,
    num_planes: int = 4,
    seed: int = 42,
    n_probe: int = 4,
    table: str = "embeddings",
    query_id: int = 0,
) -> str:
    """DuckDB oracle for MULTI-PROBE :func:`lsh_ann_topk`: reproduces
    the Lv et al. probe order in SQL — enumerate all 2^planes flip
    masks, cost = sum of |dot_b| over flipped bits, take the n_probe
    cheapest (ties by mask, matching ``_probe_sequence``'s sort), then
    rerank the union of probed buckets by exact cosine."""
    planes = _hyperplanes(dim, num_planes, seed)
    dot_exprs = ", ".join(
        f"list_dot_product(v, [{', '.join(repr(float(x)) for x in plane)}])"
        for plane in planes
    )
    bucket_expr = " + ".join(
        f"(CASE WHEN dots[{b + 1}] > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(num_planes)
    )
    cost_expr = " + ".join(
        f"(CASE WHEN (m.mask & {1 << b}) > 0 THEN abs(q.qdots[{b + 1}]) ELSE 0.0 END)"
        for b in range(num_planes)
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}),
d AS (SELECT vec_id, v, [{dot_exprs}] AS dots FROM e),
bk AS (SELECT vec_id, v, {bucket_expr} AS bucket FROM d),
q AS (SELECT b.bucket AS qbucket, d.dots AS qdots, b.v AS qv
      FROM bk b JOIN d ON b.vec_id = d.vec_id WHERE b.vec_id = {query_id}),
probes AS (
  SELECT xor(q.qbucket, m.mask) AS bucket
  FROM q CROSS JOIN (SELECT unnest(range({1 << num_planes})) AS mask) m
  ORDER BY {cost_expr}, m.mask
  LIMIT {n_probe}
)
SELECT b.vec_id, ROUND(list_cosine_similarity(b.v, q.qv), 6) AS cosine
FROM bk b JOIN probes p ON b.bucket = p.bucket CROSS JOIN q
ORDER BY cosine DESC, vec_id
LIMIT {k}
"""


def _probe_sequence(dots: np.ndarray, n_probe: int) -> list[int]:
    """Multi-probe order (Lv et al., VLDB'07): buckets reached by
    flipping subsets of the query's hyperplane bits, cheapest total
    flip cost (sum of |margin| of flipped bits) first.  Element 0 is
    always the query's own bucket."""
    num_planes = len(dots)
    qbits = sum(1 << b for b, d in enumerate(dots) if d > 0)
    if n_probe <= 1:
        return [qbits]
    costs = np.abs(dots)
    subsets: list[tuple[float, int]] = []
    for mask in range(1 << num_planes):
        flip_cost = float(sum(costs[b] for b in range(num_planes) if mask & (1 << b)))
        subsets.append((flip_cost, mask))
    subsets.sort()
    return [qbits ^ mask for _, mask in subsets[:n_probe]]


def lsh_ann_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    num_planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    n_probe: int = 1,
) -> DataFrame:
    """Approximate top-k: restrict to the query's LSH bucket(s), then
    exact-cosine rerank.  Recall is tunable two ways: fewer planes =>
    bigger buckets; ``n_probe > 1`` => MULTI-PROBE — also scan the
    buckets reached by flipping the lowest-|margin| hyperplane bits
    (the standard fix for the single-probe recall cliff; probing all
    ``2^num_planes`` buckets is provably brute force).  At warehouse
    scale the bucket id is a partition column and the probe list
    prunes to ``n_probe`` partitions at scan time."""
    dim = len(query)
    planes = _hyperplanes(dim, num_planes, seed)
    dots = np.array([float(np.dot(query, p)) for p in planes])
    probes = _probe_sequence(dots, n_probe)
    bucket = lsh_bucket(vec_col, planes)
    cond = F.col("_bucket") == probes[0] if len(probes) == 1 else F.col("_bucket").isin(probes)
    return (
        df.withColumn("_bucket", bucket)
        .filter(cond)
        .select(
            F.col(id_col),
            F.round(cosine_to_query(vec_col, query), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.col(id_col))
        .limit(k)
    )


def hard_negatives(
    df: DataFrame,
    k: int = 5,
    query_mod: int = 101,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query
    vector (the deterministic ``id % query_mod == 0`` sample), the
    top-k most-similar vectors with a DIFFERENT label — the negatives
    that actually teach an embedding model (random negatives are too
    easy; same-label neighbors are positives).

    Plan shape at scale: the query sample is tiny by construction
    (N / query_mod rows) — it is collected, L2-normalized, and
    broadcast as ONE numpy matrix; the corpus streams through a
    single Arrow-batched ``mapInPandas`` that matmuls each batch
    against it (BLAS — measured 20x over the per-element Catalyst
    fold this replaced: sf10 mining was 614 s interpreted) and emits
    only each query's per-batch top-(k + margin) candidates with one
    1e-6 grid step of slack below the cut (numpy's rounding and
    Spark's F.round can disagree by one step on boundary doubles, so
    the selection keeps a strict superset of every row the final
    rounded order could rank top-k).  Final
    rounding (``F.round``, 1e-6) and the per-query ranking window
    stay declarative, so the certified (cosine DESC, id ASC) order is
    byte-identical to the previous expression implementation.

    EAGER at construction: the query-sample collect (and its
    broadcast, which lives until the session drops it) runs before
    the returned plan exists — plan-only callers pay that scan.
    Zero-norm vectors get norm 1.0 (cosine 0, rankable, never NaN;
    NaN cosines are dropped by the isfinite selection) — pinned by
    tests/test_hard_negatives.py.

    Returns (query_id, neg_id, cosine, rank), rank 1..k.
    """
    import numpy as np
    import pandas as pd

    q_rows = (
        df.filter(F.col(id_col) % query_mod == 0)
        .select(id_col, vec_col, label_col)
        .collect()
    )
    spark = df.sparkSession
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id long, neg_id long, cosine double, rank int"
        )
    qids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    qlabels = np.array([r[label_col] for r in q_rows])
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    bq = spark.sparkContext.broadcast((qids, Q / qn[:, None], qlabels))
    margin = 16

    def score(batches):
        b_qids, b_qn, b_ql = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            xn = np.linalg.norm(X, axis=1)
            xn[xn == 0] = 1.0
            sims = (X / xn[:, None]) @ b_qn.T  # n x M raw cosines
            sims[pdf[label_col].to_numpy()[:, None] == b_ql[None, :]] = -np.inf
            # half-away-from-zero at 1e-6 — the F.round order the final
            # ranking uses; selection under it (ties included) keeps
            # every row the global rounded top-k could need
            r = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
            ids = pdf[id_col].to_numpy()
            out_q, out_id, out_c = [], [], []
            kk = min(k + margin, r.shape[0])
            for j in range(r.shape[1]):
                col = r[:, j]
                thresh = np.partition(col, -kk)[-kk]
                # one 1e-6 step of slack below the numpy-rounded threshold:
                # numpy's floor(|x|*1e6+0.5) and Spark's F.round (BigDecimal
                # HALF_UP on the decimal repr) can disagree by one grid step
                # on boundary doubles, so top-k containment must not assume
                # the two total orders agree exactly
                sel = np.flatnonzero((col >= thresh - 1e-6) & np.isfinite(col))
                out_q.append(np.full(len(sel), b_qids[j], dtype=np.int64))
                out_id.append(ids[sel])
                out_c.append(sims[sel, j])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neg_id": np.concatenate(out_id),
                    "cosine": np.concatenate(out_c),
                }
            )

    # a small parquet arrives as 1-2 splits (often ONE row group),
    # which would run the whole matmul on 1-2 cores; re-spread (no-op
    # at scale where the scan provides the partitions)
    c = df.select(id_col, vec_col, label_col)
    target = spark.sparkContext.defaultParallelism
    if c.rdd.getNumPartitions() < target:
        c = c.repartition(target, F.col(id_col))
    scored = c.mapInPandas(score, "query_id long, neg_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neg_id"))
    return (
        scored.withColumn("cosine", F.round("cosine", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hard_negatives_ivf(
    df: DataFrame,
    k: int = 5,
    query_mod: int = 101,
    n_clusters: int = 16,
    n_probe: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    seed: int = 42,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF-pruned hard-negative mining — the 100 TB path for
    :func:`hard_negatives`, whose exact matmul is corpus x queries and
    therefore quadratic-ish at warehouse scale (measured 220x at sf10
    before the matmul rewrite).  Here every corpus vector scores ONLY
    against the queries that PROBE its coarse cluster: assign the
    corpus to ``n_clusters`` k-means centroids (or a caller-provided
    standing-index centroid matrix — the :func:`ivf_write_index`
    maintenance model), rank centroids per query by cosine (the exact
    :func:`_probe_clusters` rule), and inside each Arrow batch matmul
    each cluster's row block against just its probing queries'
    sub-matrix.  Work shrinks by ~``n_probe / n_clusters`` with ZERO
    added shuffles (the per-batch group-by-cluster is in-memory; on a
    standing index partitioned by ``_cluster`` the batches arrive
    cluster-pure).

    ``n_probe == n_clusters`` (the default) is provably identical to
    the exact miner: every query probes every cluster, so every
    (corpus row, query) pair is scored under the same rounded-cosine
    total order with the same per-batch top-(k + margin)
    ties-included selection — that identity is the certified registry
    point (``knn_hard_negatives_ivf``), exactly the ``knn_ivf``
    full-probe pattern.  Partial-probe recall vs the exact miner is
    measured in ``benchmark/hard_negatives_ivf_recall.csv`` and
    pinned by tests/test_hard_negatives.py.

    Note: like :func:`hard_negatives` this is EAGER at construction —
    the query sample (and the k-means fit when ``centroids`` is None)
    runs before the returned plan exists, and the query broadcast
    lives until the session drops it (it is consumed lazily, so it
    cannot be unpersisted here).  Zero-norm vectors get their norm
    substituted to 1.0 (cosine 0, rankable, never NaN) — pinned by
    tests/test_hard_negatives.py.  Returns (query_id, neg_id,
    cosine, rank), rank 1..k."""
    import pandas as pd

    spark = df.sparkSession
    if centroids is None:
        assigned, cmat = ivf_index(df, n_clusters, vec_col, seed)
    else:
        cmat = np.ascontiguousarray(centroids, dtype=np.float64)
        assigned = assign_to_centroids(df, cmat, vec_col)
        n_clusters = cmat.shape[0]
    # resolve the full-probe default AFTER n_clusters reflects a
    # caller-provided centroid matrix, so "n_probe=None means exact"
    # holds for standing indexes whose cluster count differs from the
    # n_clusters parameter default
    if n_probe is None:
        n_probe = n_clusters
    n_probe = min(n_probe, n_clusters)

    q_rows = (
        df.filter(F.col(id_col) % query_mod == 0)
        .select(id_col, vec_col, label_col)
        .collect()
    )
    if not q_rows:
        return spark.createDataFrame(
            [], "query_id long, neg_id long, cosine double, rank int"
        )
    qids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in q_rows])
    qlabels = np.array([r[label_col] for r in q_rows])
    qn = np.linalg.norm(Q, axis=1)
    qn[qn == 0] = 1.0
    Qn = Q / qn[:, None]

    # per-query probe sets under the _probe_clusters rule (cosine to
    # centroid, stable argsort), inverted to cluster -> query indices
    cnorm = np.linalg.norm(cmat, axis=1)
    cnorm[cnorm == 0] = 1.0
    csims = Qn @ (cmat / cnorm[:, None]).T  # M x n_clusters
    cluster_to_q: dict[int, np.ndarray] = {}
    order = np.argsort(-csims, axis=1, kind="stable")[:, :n_probe]
    for c in range(n_clusters):
        hits = np.flatnonzero((order == c).any(axis=1))
        if len(hits):
            cluster_to_q[c] = hits
    bq = spark.sparkContext.broadcast((qids, Qn, qlabels, cluster_to_q))
    margin = 16

    def score(batches):
        b_qids, b_qn, b_ql, b_c2q = bq.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_q, out_id, out_c = [], [], []
            for c, sub in pdf.groupby("_cluster", sort=True):
                qidx = b_c2q.get(int(c))
                if qidx is None:
                    continue
                X = np.stack(sub[vec_col].to_numpy()).astype(np.float64)
                xn = np.linalg.norm(X, axis=1)
                xn[xn == 0] = 1.0
                sims = (X / xn[:, None]) @ b_qn[qidx].T
                sims[
                    sub[label_col].to_numpy()[:, None] == b_ql[qidx][None, :]
                ] = -np.inf
                # same half-away-from-zero 1e-6 selection order as the
                # exact miner — partial top-k with boundary ties kept
                r = np.sign(sims) * np.floor(np.abs(sims) * 1e6 + 0.5) / 1e6
                ids = sub[id_col].to_numpy()
                kk = min(k + margin, r.shape[0])
                for jj, j in enumerate(qidx):
                    col = r[:, jj]
                    thresh = np.partition(col, -kk)[-kk]
                    # one 1e-6 step of slack below the numpy-rounded threshold:
                    # numpy's floor(|x|*1e6+0.5) and Spark's F.round (BigDecimal
                    # HALF_UP on the decimal repr) can disagree by one grid step
                    # on boundary doubles, so top-k containment must not assume
                    # the two total orders agree exactly
                    sel = np.flatnonzero((col >= thresh - 1e-6) & np.isfinite(col))
                    out_q.append(np.full(len(sel), b_qids[j], dtype=np.int64))
                    out_id.append(ids[sel])
                    out_c.append(sims[sel, jj])
            if out_q:
                yield pd.DataFrame(
                    {
                        "query_id": np.concatenate(out_q),
                        "neg_id": np.concatenate(out_id),
                        "cosine": np.concatenate(out_c),
                    }
                )

    c = assigned.select(id_col, vec_col, label_col, "_cluster")
    target = spark.sparkContext.defaultParallelism
    if c.rdd.getNumPartitions() < target:
        c = c.repartition(target, F.col(id_col))
    scored = c.mapInPandas(score, "query_id long, neg_id long, cosine double")
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.col("neg_id"))
    return (
        scored.withColumn("cosine", F.round("cosine", 6))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def hard_negatives_sql(
    k: int = 5,
    query_mod: int = 101,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> str:
    """DuckDB twin of :func:`hard_negatives`."""
    return f"""
WITH q AS (
  SELECT {id_col} AS query_id, CAST({vec_col} AS DOUBLE[]) AS qv, {label_col} AS ql
  FROM {table} WHERE {id_col} % {query_mod} = 0
),
c AS (
  SELECT {id_col} AS neg_id, CAST({vec_col} AS DOUBLE[]) AS v, {label_col} AS l
  FROM {table}
),
s AS (
  SELECT query_id, neg_id,
         ROUND(list_cosine_similarity(v, qv), 6) AS cosine
  FROM c JOIN q ON c.l <> q.ql
),
r AS (
  SELECT query_id, neg_id, cosine,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neg_id) AS rank
  FROM s
)
SELECT query_id, neg_id, cosine, rank FROM r WHERE rank <= {k}
ORDER BY query_id, rank
"""


# ---------------------------------------------------------------------------
# Scalar quantization (SQ8) — the middle rung of the compression ladder
# ---------------------------------------------------------------------------


def sq8_minmax(
    df: DataFrame, vec_col: str = "embedding"
) -> tuple[list[float], list[float]]:
    """Per-dimension (min, max) of an embedding column — the SQ8
    codebook.  One narrow scan + a dim-row aggregate (map-side
    combinable, collect is d rows — the k-row-reduction pattern this
    repo allows at the driver)."""
    rows = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>")).alias("d", "x"))
        .groupBy("d")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
        .orderBy("d")
        .collect()
    )
    return [r["lo"] for r in rows], [r["hi"] for r in rows]


def _dlit(v: float) -> str:
    """A double literal that round-trips exactly (repr + D suffix —
    Spark parses it with Double.parseDouble, IEEE-exact).  Non-finite
    values need the CAST spelling: repr gives 'nan'/'inf', and
    'nanD'/'infD' are parse errors where the old F.lit form propagated
    them (a NaN coordinate in a query vector, a degenerate sq8
    lo/hi)."""
    v = float(v)
    if v != v:
        return "CAST('NaN' AS DOUBLE)"
    if v == float("inf"):
        return "CAST('Infinity' AS DOUBLE)"
    if v == float("-inf"):
        return "CAST('-Infinity' AS DOUBLE)"
    return f"{v!r}D"


def _sq8_recon(
    vec_sql: str, los: list[float], his: list[float], levels: int = 256
) -> str:
    """Reconstructed (de-quantized) vector as a SQL expression string:
    each coordinate snapped to the nearest of ``levels`` evenly spaced
    levels on that dimension's [lo, hi] range.  floor(x + 0.5) instead
    of round() so both engines share one tie rule; degenerate dims
    (hi == lo) reconstruct to the constant.  (String form: the Column
    form built 2 dim-element literal arrays through py4j, ~0.9 s of
    driver time per call at dim 64 — same construction-cost disease as
    lsh_keyed.)"""
    dim = len(los)
    top = _dlit(levels - 1)
    lo = "array(" + ", ".join(_dlit(v) for v in los) + ")"
    hi = "array(" + ", ".join(_dlit(v) for v in his) + ")"
    v = f"CAST(({vec_sql}) AS ARRAY<DOUBLE>)"
    return (
        f"transform(sequence(1, {dim}), i -> "
        f"CASE WHEN element_at({hi}, i) = element_at({lo}, i)"
        f" THEN element_at({lo}, i)"
        f" ELSE element_at({lo}, i) + floor({top}"
        f" * (element_at({v}, i) - element_at({lo}, i))"
        f" / (element_at({hi}, i) - element_at({lo}, i))"
        f" + 0.5D)"
        f" * (element_at({hi}, i) - element_at({lo}, i))"
        f" / {top} END)"
    )


def sq8_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate cosine top-k over SQ8-quantized vectors — the
    4x-compression rung between raw floats (``brute_force_topk``) and
    IVF-PQ's 32x (``operators/pq.py``).  At 100 TB the win is the
    scan: one byte per dimension instead of four moves the
    brute-force scan from IO-bound to CPU-bound, with recall loss
    bounded by the per-dim quantization step (range/255 — far inside
    cosine's top-k margins for natural embeddings).

    The codebook is 2·d doubles (driver-collected, broadcast as
    literals); scoring folds left-to-right in doubles exactly like
    :func:`cosine_to_query`, so the DuckDB twin reproduces the hash.
    Plan: one scan + TakeOrdered — no shuffle, no join."""
    los, his = sq8_minmax(df, vec_col)
    q = [float(x) for x in query]
    qn = float(np.sqrt(sum(x * x for x in q)))
    qarr = "array(" + ", ".join(_dlit(x) for x in q) + ")"
    rv = _sq8_recon(vec_col, los, his)
    dot = f"aggregate(zip_with({rv}, {qarr}, (a, b) -> a * b), 0.0D, (s, x) -> s + x)"
    vn = f"sqrt(aggregate({rv}, 0.0D, (s, x) -> s + x * x))"
    return (
        df.select(
            F.col(id_col),
            F.expr(f"round({dot} / ({vn} * {_dlit(qn)}), 6)").alias("approx_cosine"),
        )
        .orderBy(F.desc("approx_cosine"), F.col(id_col))
        .limit(k)
    )


def sq8_topk_sql(
    k: int = 10,
    dim: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id: int = 0,
) -> str:
    """DuckDB twin of :func:`sq8_topk`: the codebook is derived
    in-SQL from the same data (MIN/MAX of identical doubles are
    bit-identical to the Spark-collected literals)."""
    return f"""
WITH pts AS (SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
             FROM {table}),
qv AS (SELECT v AS q FROM pts WHERE {id_col} = {query_id}),
mm AS (SELECT i AS d, MIN(v[i]) AS lo, MAX(v[i]) AS hi
       FROM pts CROSS JOIN range(1, {dim + 1}) r(i) GROUP BY i),
cb AS (SELECT list(lo ORDER BY d) AS lo, list(hi ORDER BY d) AS hi FROM mm),
rec AS (SELECT {id_col},
               list_transform(range(1, {dim + 1}), i ->
                 CASE WHEN cb.hi[i] = cb.lo[i] THEN cb.lo[i]
                      ELSE cb.lo[i] + floor(255.0 * (v[i] - cb.lo[i]) /
                           (cb.hi[i] - cb.lo[i]) + 0.5) * (cb.hi[i] - cb.lo[i]) / 255.0
                 END) AS rv
        FROM pts, cb)
SELECT {id_col}, ROUND(list_cosine_similarity(rv, qv.q), 6) AS approx_cosine
FROM rec, qv
ORDER BY approx_cosine DESC, {id_col}
LIMIT {k}
"""


def _fold_cosine(vec_sql: str, qvec_sql: str) -> str:
    """Cosine between two array expressions as a SQL string, folded
    left-to-right in doubles (same order both engines)."""
    a = f"CAST(({vec_sql}) AS ARRAY<DOUBLE>)"
    b = f"CAST(({qvec_sql}) AS ARRAY<DOUBLE>)"
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (s, x) -> s + x)"
    an = f"sqrt(aggregate({a}, 0.0D, (s, x) -> s + x * x))"
    bn = f"sqrt(aggregate({b}, 0.0D, (s, x) -> s + x * x))"
    return f"{dot} / ({an} * {bn})"


def grouped_topk(
    scored: DataFrame,
    group_col: str | list[str],
    score_col: str,
    id_col: str,
    k: int,
) -> DataFrame:
    """Per-group top-k under the registry's total order (rounded score
    DESC, id ASC).  Declarative window + rank filter on purpose:
    Spark >= 3.5 plans ``row_number() <= k`` as WindowGroupLimit —
    per-partition partial top-k BEFORE the shuffle — so the M-query
    scatter-gather ships M·k·P candidate rows, not M·N scores.
    ``group_col`` accepts one name or a composite key list."""
    from pyspark.sql import Window

    groups = [group_col] if isinstance(group_col, str) else list(group_col)
    w = Window.partitionBy(*groups).orderBy(F.desc(score_col), F.col(id_col))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def sq8_recall_eval(
    df: DataFrame,
    n_queries: int = 8,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Batched ANN evaluation harness: recall@k of the quantized scan
    against the exact scan, per (method, query) — the measurement loop
    any production ANN deployment runs continuously (serve
    approximate, audit recall on a query sample).  Two rungs share the
    same codebook: ``sq8`` (256 levels — near-lossless at this dim)
    and ``sq4`` (16 levels — visibly lossy), so the certified rows pin
    BOTH the compression ladder's safe step and its failure onset.
    The ``n_queries`` lowest-id vectors play the query batch
    (broadcast — the corpus never re-shuffles per query); all rankings
    share one total order (rounded cosine DESC, id ASC) so the
    comparison is deterministic cross-engine."""
    q = (
        df.filter(F.col(id_col) < n_queries)
        .select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    )
    # the scoring stage is CPU-bound (3 methods x d-term folded cosine
    # per (row, query) pair) and would otherwise inherit the parquet
    # FILE count as its parallelism (sf1 measured: 2 tasks on 32
    # cores, 50 s); spread the corpus across the executors first — the
    # one-time shuffle of N vectors is ~1% of the scoring work
    corpus = df.select(id_col, vec_col).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    los, his = sq8_minmax(df, vec_col)
    # ONE corpus pass prices the whole ladder: each (corpus row, query)
    # pair evaluates the exact AND every quantized cosine, exploded to
    # (method, cosine) rows — 3x the window rows, but one scan, one
    # broadcast join, one WindowGroupLimit shuffle instead of three of
    # each
    variants = [
        "named_struct('method', 'exact', 'cosine',"
        f" round({_fold_cosine(vec_col, '_qv')}, 6))"
    ]
    for method, levels in (("sq4", 16), ("sq8", 256)):
        rv = _sq8_recon(vec_col, los, his, levels=levels)
        variants.append(
            f"named_struct('method', '{method}', 'cosine',"
            f" round({_fold_cosine(rv, '_qv')}, 6))"
        )
    scored = (
        corpus.join(F.broadcast(q))
        .select(
            "query_id",
            F.col(id_col),
            F.explode(F.expr("array(" + ", ".join(variants) + ")")).alias("_mc"),
        )
        .select(
            "query_id",
            id_col,
            F.col("_mc.method").alias("method"),
            F.col("_mc.cosine").alias("cosine"),
        )
    )
    # materialize the (3·M·k)-row top-k relation once: every downstream
    # consumer (hits, per-query k, method spine) would otherwise
    # re-evaluate the full corpus scoring lineage — the plan audit
    # showed 12 corpus scans without this
    top = (
        grouped_topk(scored, ["method", "query_id"], "cosine", id_col, k)
        .select("method", "query_id", id_col)
        .localCheckpoint(eager=True)
    )
    exact = top.where(F.col("method") == "exact").select("query_id", id_col)
    approx = top.where(F.col("method") != "exact")

    hits = (
        exact.join(approx, ["query_id", id_col])
        .groupBy("method", "query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    ks = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("_k"))
    methods = approx.select("method").distinct()
    return (
        methods.crossJoin(ks)
        .join(hits, ["method", "query_id"], "left")
        .select(
            "method",
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            F.round(F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("_k"), 4).alias(
                "recall_at_k"
            ),
        )
        .orderBy("method", "query_id")
    )


def matryoshka_recall_eval(
    df: DataFrame,
    dims: tuple[int, ...] = (8, 16, 32),
    n_queries: int = 8,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Matryoshka-truncation evaluation: recall@k of PREFIX-truncated
    cosine (dims[i] leading coordinates of corpus AND query) against
    the full-dimension exact scan — the audit a pipeline runs before
    serving MRL-style truncated embeddings (Kusupati et al. 2022),
    where shipping the 8- or 16-dim prefix cuts index bytes 8-4x IF
    recall holds.  Same harness shape as :func:`sq8_recall_eval`: the
    query batch broadcasts, ONE corpus pass scores every (dim, query)
    pair (exploded variants), one WindowGroupLimit ranks all rungs
    under the shared total order (rounded cosine DESC, id ASC).
    Returns (method, query_id, n_hits, recall_at_k)."""
    q = df.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    corpus = df.select(id_col, vec_col).repartition(
        df.sparkSession.sparkContext.defaultParallelism
    )
    variants = [
        "named_struct('method', 'exact', 'cosine',"
        f" round({_fold_cosine(vec_col, '_qv')}, 6))"
    ]
    for d in dims:
        variants.append(
            f"named_struct('method', 'd{d}', 'cosine',"
            f" round({_fold_cosine(f'slice({vec_col}, 1, {d})', f'slice(_qv, 1, {d})')}, 6))"
        )
    scored = (
        corpus.join(F.broadcast(q))
        .select(
            "query_id",
            F.col(id_col),
            F.explode(F.expr("array(" + ", ".join(variants) + ")")).alias("_mc"),
        )
        .select(
            "query_id",
            id_col,
            F.col("_mc.method").alias("method"),
            F.col("_mc.cosine").alias("cosine"),
        )
    )
    top = (
        grouped_topk(scored, ["method", "query_id"], "cosine", id_col, k)
        .select("method", "query_id", id_col)
        .localCheckpoint(eager=True)
    )
    exact = top.where(F.col("method") == "exact").select("query_id", id_col)
    approx = top.where(F.col("method") != "exact")
    hits = (
        exact.join(approx, ["query_id", id_col])
        .groupBy("method", "query_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    ks = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("_k"))
    methods = approx.select("method").distinct()
    return (
        methods.crossJoin(ks)
        .join(hits, ["method", "query_id"], "left")
        .select(
            "method",
            "query_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            F.round(
                F.coalesce(F.col("n_hits"), F.lit(0)) / F.col("_k"), 4
            ).alias("recall_at_k"),
        )
        .orderBy("method", "query_id")
    )


def matryoshka_recall_eval_sql(
    dims: tuple[int, ...] = (8, 16, 32),
    n_queries: int = 8,
    k: int = 10,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`matryoshka_recall_eval`."""
    methods_values = ", ".join(f"('d{d}', {d})" for d in dims)
    return f"""
WITH pts AS (SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
             FROM {table}),
q AS (SELECT {id_col} AS query_id, v AS qv FROM pts WHERE {id_col} < {n_queries}),
exact AS (
  SELECT query_id, {id_col} FROM (
    SELECT q.query_id, p.{id_col},
           ROW_NUMBER() OVER (PARTITION BY q.query_id
               ORDER BY ROUND(list_cosine_similarity(p.v, q.qv), 6) DESC, p.{id_col})
               AS rn
    FROM pts p CROSS JOIN q
  ) WHERE rn <= {k}
),
approx AS (
  SELECT method, query_id, {id_col} FROM (
    SELECT m.method, q.query_id, p.{id_col},
           ROW_NUMBER() OVER (PARTITION BY m.method, q.query_id
               ORDER BY ROUND(list_cosine_similarity(
                   list_slice(p.v, 1, m.d), list_slice(q.qv, 1, m.d)), 6) DESC,
               p.{id_col}) AS rn
    FROM pts p CROSS JOIN q CROSS JOIN (VALUES {methods_values}) m(method, d)
  ) WHERE rn <= {k}
),
hits AS (SELECT method, query_id, COUNT(*) AS n_hits
         FROM exact JOIN approx USING (query_id, {id_col}) GROUP BY method, query_id),
ks AS (SELECT query_id, COUNT(*) AS kk FROM exact GROUP BY query_id),
methods AS (SELECT DISTINCT method FROM approx)
SELECT methods.method, ks.query_id,
       COALESCE(hits.n_hits, 0) AS n_hits,
       ROUND(COALESCE(hits.n_hits, 0) / ks.kk, 4) AS recall_at_k
FROM methods CROSS JOIN ks LEFT JOIN hits USING (method, query_id)
ORDER BY methods.method, ks.query_id
"""


def sq8_recall_eval_sql(
    n_queries: int = 8,
    k: int = 10,
    dim: int = 64,
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB twin of :func:`sq8_recall_eval`."""
    return f"""
WITH pts AS (SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
             FROM {table}),
q AS (SELECT {id_col} AS query_id, v AS qv FROM pts WHERE {id_col} < {n_queries}),
mm AS (SELECT i AS d, MIN(v[i]) AS lo, MAX(v[i]) AS hi
       FROM pts CROSS JOIN range(1, {dim + 1}) r(i) GROUP BY i),
cb AS (SELECT list(lo ORDER BY d) AS lo, list(hi ORDER BY d) AS hi FROM mm),
rec AS (SELECT m.method, m.top, p.{id_col},
               list_transform(range(1, {dim + 1}), i ->
                 CASE WHEN cb.hi[i] = cb.lo[i] THEN cb.lo[i]
                      ELSE cb.lo[i] + floor(m.top * (p.v[i] - cb.lo[i]) /
                           (cb.hi[i] - cb.lo[i]) + 0.5) * (cb.hi[i] - cb.lo[i]) / m.top
                 END) AS rv
        FROM pts p CROSS JOIN cb
        CROSS JOIN (VALUES ('sq4', 15.0), ('sq8', 255.0)) m(method, top)),
exact AS (
  SELECT query_id, {id_col} FROM (
    SELECT q.query_id, p.{id_col},
           ROW_NUMBER() OVER (PARTITION BY q.query_id
               ORDER BY ROUND(list_cosine_similarity(p.v, q.qv), 6) DESC, p.{id_col})
               AS rn
    FROM pts p CROSS JOIN q
  ) WHERE rn <= {k}
),
approx AS (
  SELECT method, query_id, {id_col} FROM (
    SELECT r.method, q.query_id, r.{id_col},
           ROW_NUMBER() OVER (PARTITION BY r.method, q.query_id
               ORDER BY ROUND(list_cosine_similarity(r.rv, q.qv), 6) DESC, r.{id_col})
               AS rn
    FROM rec r CROSS JOIN q
  ) WHERE rn <= {k}
),
hits AS (SELECT method, query_id, COUNT(*) AS n_hits
         FROM exact JOIN approx USING (query_id, {id_col}) GROUP BY method, query_id),
ks AS (SELECT query_id, COUNT(*) AS kk FROM exact GROUP BY query_id),
methods AS (SELECT DISTINCT method FROM approx)
SELECT methods.method, ks.query_id,
       COALESCE(hits.n_hits, 0) AS n_hits,
       ROUND(COALESCE(hits.n_hits, 0) / ks.kk, 4) AS recall_at_k
FROM methods CROSS JOIN ks LEFT JOIN hits USING (method, query_id)
ORDER BY methods.method, ks.query_id
"""
