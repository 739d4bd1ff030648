"""Round-3 curation operators: contamination, sequence packing,
stratified sampling, k-means clustering."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# benchmark contamination
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_contamination_benchmark_members_score_one(spark):
    from confidential_storm_spark.operators.contamination import ngram_contamination

    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa"),
            (3, "completely different words here now"),
        ],
    )
    bench = docs.filter(F.col("doc_id") == 1)
    out = {
        r["doc_id"]: r
        for r in ngram_contamination(docs, bench, n=3).collect()
    }
    assert out[1]["contamination_frac"] == 1.0
    assert out[2]["n_hit"] == 0 and out[3]["n_hit"] == 0
    # 5 words, n=3 -> 3 grams
    assert out[1]["n_ngrams"] == 3


def test_contamination_partial_overlap(spark):
    from confidential_storm_spark.operators.contamination import ngram_contamination

    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),  # grams: abc, bcd
            (2, "alpha beta gamma nine"),  # shares only "alpha beta gamma"
        ],
    )
    bench = docs.filter(F.col("doc_id") == 1)
    row = (
        ngram_contamination(docs, bench, n=3)
        .filter(F.col("doc_id") == 2)
        .collect()[0]
    )
    assert row["n_ngrams"] == 2 and row["n_hit"] == 1
    assert row["contamination_frac"] == 0.5


def test_contamination_shuffle_path_matches_broadcast(spark):
    from confidential_storm_spark.operators.contamination import ngram_contamination

    docs = _docs(
        spark,
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} common tail words") for i in range(20)],
    )
    bench = docs.filter(F.col("doc_id") % 5 == 0)
    a = sorted(
        ngram_contamination(docs, bench, n=3, broadcast_limit=8 << 20).collect()
    )
    b = sorted(ngram_contamination(docs, bench, n=3, broadcast_limit=0).collect())
    assert a == b


# ---------------------------------------------------------------------------
# sequence packing
# ---------------------------------------------------------------------------


def test_pack_assign_first_token_rule(spark):
    from confidential_storm_spark.operators.packing import pack_assign

    # shard 'a': token counts 4, 3, 2 with budget 5:
    #   doc 1 offset 0 -> pack 0; doc 2 offset 4 -> pack 0 (straddles);
    #   doc 3 offset 7 -> pack 1
    df = spark.createDataFrame(
        [
            (1, "a", "t1 t2 t3 t4"),
            (2, "a", "t1 t2 t3"),
            (3, "a", "t1 t2"),
            (4, "b", "x1 x2 x3 x4 x5 x6"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {
        r["doc_id"]: r
        for r in pack_assign(df, budget=5, shard_col="lang").collect()
    }
    assert (out[1]["pack_offset"], out[1]["pack_id"]) == (0, 0)
    assert (out[2]["pack_offset"], out[2]["pack_id"]) == (4, 0)
    assert (out[3]["pack_offset"], out[3]["pack_id"]) == (7, 1)
    # shard b packs independently from offset 0
    assert (out[4]["pack_offset"], out[4]["pack_id"]) == (0, 0)


def test_pack_stats_tokens_conserved(spark, sf_dir):
    from confidential_storm_spark.functions.text import token_count
    from confidential_storm_spark.operators.packing import pack_stats
    from confidential_storm_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    stats = pack_stats(docs, budget=512)
    total_packed = stats.agg(F.sum("pack_tokens")).collect()[0][0]
    total_tokens = docs.select(
        F.sum(token_count(F.col("text"))).alias("t")
    ).collect()[0][0]
    assert total_packed == total_tokens
    # every pack's start is below the next pack's start (prefix-sum sanity)
    per_lang = stats.groupBy("lang").agg(
        F.max("pack_id").alias("mx"), F.count(F.lit(1)).alias("n")
    )
    for r in per_lang.collect():
        assert r["mx"] == r["n"] - 1  # pack ids contiguous 0..n-1


def test_pack_assign_stable_under_repartition(spark):
    from confidential_storm_spark.operators.packing import pack_assign

    rows = [(i, "en" if i % 2 else "de", "w " * (i % 7 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    a = sorted(
        (r["doc_id"], r["pack_id"])
        for r in pack_assign(df, 64, shard_col="lang").collect()
    )
    b = sorted(
        (r["doc_id"], r["pack_id"])
        for r in pack_assign(df.repartition(7), 64, shard_col="lang").collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# stratified sampling
# ---------------------------------------------------------------------------


def test_stratified_topn_exact_counts(spark, sf_dir):
    from confidential_storm_spark.operators.sampling import stratified_topn
    from confidential_storm_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sizes = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    out = stratified_topn(docs, 5)
    got = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {lang: min(5, n) for lang, n in sizes.items()}


def test_stratified_topn_deterministic(spark, sf_dir):
    from confidential_storm_spark.operators.sampling import stratified_topn
    from confidential_storm_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    a = sorted(r["doc_id"] for r in stratified_topn(docs, 7).collect())
    b = sorted(
        r["doc_id"] for r in stratified_topn(docs.repartition(13), 7).collect()
    )
    assert a == b


def test_stratified_topn_uses_window_group_limit(spark, sf_dir):
    """The rank<=n filter must trigger Spark's WindowGroupLimit rewrite
    (partial per-partition top-n before the shuffle)."""
    from confidential_storm_spark.operators.sampling import stratified_topn
    from confidential_storm_spark.sources.tables import load_table

    plan = stratified_topn(
        load_table(spark, sf_dir, "documents"), 5
    )._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


def _blob_df(spark, centers, per=30, dim=8, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for ci, c in enumerate(centers):
        for _ in range(per):
            v = (np.asarray(c, dtype=np.float64) + rng.normal(0, 0.05, dim)).astype(
                float
            )
            rows.append((vid, [float(x) for x in v], ci))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, truth int"
    )


def test_kmeans_recovers_separated_blobs(spark):
    from confidential_storm_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
    )

    dim = 8
    centers = [np.zeros(dim), np.full(dim, 5.0), -np.full(dim, 5.0)]
    df = _blob_df(spark, centers, per=30, dim=dim)
    cids, C = kmeans_fit(df, k=3, iters=5)
    out = kmeans_assign(df, cids, C).select("truth", "cluster").collect()
    # every truth-group maps to exactly one cluster and vice versa
    mapping = {}
    for r in out:
        mapping.setdefault(r["truth"], set()).add(r["cluster"])
    assert all(len(v) == 1 for v in mapping.values())
    assert len({next(iter(v)) for v in mapping.values()}) == 3


def test_kmeans_centroids_near_truth(spark):
    from confidential_storm_spark.operators.clustering import kmeans_fit

    dim = 8
    centers = [np.zeros(dim), np.full(dim, 5.0)]
    df = _blob_df(spark, centers, per=40, dim=dim)
    cids, C = kmeans_fit(df, k=2, iters=5)
    dists = [
        min(np.linalg.norm(C[i] - np.asarray(c)) for i in range(len(C)))
        for c in centers
    ]
    assert max(dists) < 0.1


def test_semantic_neardup_blocks_by_cluster(spark):
    from confidential_storm_spark.operators.clustering import (
        semantic_neardup_pairs,
    )

    dim = 8
    # two far blobs; inside blob A, vectors 0/1 are near-identical
    base_a = np.full(dim, 1.0)
    base_b = np.full(dim, -1.0)
    rows = [
        (0, [float(x) for x in base_a]),
        (1, [float(x) for x in base_a + 0.001]),
        (2, [float(x) for x in base_a + np.linspace(0, 2, dim)]),
        (3, [float(x) for x in base_b]),
        (4, [float(x) for x in base_b * 1.01]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in semantic_neardup_pairs(df, k=2, iters=3, threshold=0.99).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.999
    assert (3, 4) in pairs
    # cross-blob pairs never compared (opposite clusters)
    assert not any(a <= 2 < b for a, b in pairs)


def test_semantic_neardup_cluster_cap_subblocks(spark):
    """With max_cluster_size smaller than the cluster, pairs are still
    complete (block-vs-block covers all combinations)."""
    from confidential_storm_spark.operators.clustering import (
        semantic_neardup_pairs,
    )

    dim = 4
    base = np.full(dim, 2.0)
    rows = [
        (i, [float(x) for x in base + i * 1e-4]) for i in range(10)
    ]  # all mutually near-dup
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    uncapped = set(
        (r["id_a"], r["id_b"])
        for r in semantic_neardup_pairs(
            df, k=1, iters=1, threshold=0.999, max_cluster_size=None
        ).collect()
    )
    capped = set(
        (r["id_a"], r["id_b"])
        for r in semantic_neardup_pairs(
            df, k=1, iters=1, threshold=0.999, max_cluster_size=3
        ).collect()
    )
    assert uncapped == capped == {(a, b) for a in range(10) for b in range(a + 1, 10)}


def test_kmeans_drops_empty_clusters(spark):
    from confidential_storm_spark.operators.clustering import kmeans_fit

    # two tight blobs, k=4: the two seeds landing inside a blob that
    # another seed wins lose all points and are dropped
    dim = 4
    centers = [np.zeros(dim), np.full(dim, 9.0)]
    df = _blob_df(spark, centers, per=25, dim=dim)
    cids, C = kmeans_fit(df, k=4, iters=6)
    assert len(cids) == len(C) <= 4
    assert sorted(cids) == list(cids)  # ids stay ascending for tie-break


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------


def test_sessionize_gap_splits(spark):
    from confidential_storm_spark.operators.sessionize import sessionize

    us = 1_000_000
    rows = [
        # user 1: events at 0s, 10s, 2000s, 2010s -> sessions 0,0,1,1 (gap 30s)
        (0, 1, 0 * us),
        (1, 1, 10 * us),
        (2, 1, 2000 * us),
        (3, 1, 2010 * us),
        # user 2: single event
        (4, 2, 5 * us),
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts_us long")
    out = {
        r["event_id"]: r["session_id"]
        for r in sessionize(df, gap_us=30 * us).collect()
    }
    assert out == {0: 0, 1: 0, 2: 1, 3: 1, 4: 0}


def test_session_stats_single_exchange(spark, sf_dir):
    """lag + running-sum + groupBy must share ONE shuffle on user_id."""
    from confidential_storm_spark.operators.sessionize import session_stats

    plan = (
        session_stats(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    n_exchanges = len(re.findall(r"Exchange (?:hash|range)partitioning", plan))
    # one hash exchange for the windows/agg + one range for the final sort
    assert n_exchanges <= 2, plan[:2000]


# ---------------------------------------------------------------------------
# random projection
# ---------------------------------------------------------------------------


def test_random_projection_preserves_distances(spark, sf_dir):
    from confidential_storm_spark.operators.projection import (
        projection_matrix,
        random_project,
    )
    from confidential_storm_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").limit(50)
    pdf = emb.select(
        "vec_id", random_project(F.col("embedding"), 64, 16).alias("p")
    ).toPandas()
    orig = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    proj = {r["vec_id"]: np.asarray(r["p"]) for _, r in pdf.iterrows()}
    # JL: pairwise distance ratios concentrate around 1
    ids = sorted(orig)[:20]
    ratios = []
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        d0 = np.linalg.norm(orig[a] - orig[b])
        d1 = np.linalg.norm(proj[a] - proj[b])
        ratios.append(d1 / d0)
    assert 0.5 < np.mean(ratios) < 1.5
    # projection matches the driver-side matmul exactly
    R = projection_matrix(64, 16)
    a = ids[0]
    np.testing.assert_allclose(proj[a], orig[a] @ R, rtol=1e-12)


def test_semantic_neardup_default_k_scale_law(spark):
    """k=None applies k = clamp(ceil(N / target_cluster_size), 2, ..)
    — the linear-pair-stage scale default; identical to the explicit
    fixed-k call at the implied k."""
    import math

    from confidential_storm_spark.operators.clustering import (
        semantic_neardup_pairs,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    target = 100
    implied_k = max(2, math.ceil(n / target))
    auto = {
        (r.id_a, r.id_b)
        for r in semantic_neardup_pairs(
            emb, threshold=0.4, target_cluster_size=target
        ).collect()
    }
    fixed = {
        (r.id_a, r.id_b)
        for r in semantic_neardup_pairs(emb, k=implied_k, threshold=0.4).collect()
    }
    assert auto == fixed
