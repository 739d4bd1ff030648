"""IVF approximate-nearest-neighbor tests."""

import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.operators.similarity import (
    brute_force_topk,
    ivf_index,
    ivf_topk,
)
from confidential_storm_spark.plans.queries import _query_vec
from confidential_storm_spark.sources.tables import load_table


def test_ivf_index_partitions_all_vectors(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = ivf_index(emb, n_clusters=8)
    assert centroids.shape == (8, 64)
    assert assigned.count() == emb.count()
    clusters = {r["_cluster"] for r in assigned.select("_cluster").distinct().collect()}
    assert clusters <= set(range(8)) and len(clusters) > 1


def test_ivf_topk_recall_and_exactness(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    bf = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]
    # full probe == exact
    full = [r["vec_id"] for r in ivf_topk(emb, q, k=10, n_clusters=8, n_probe=8).collect()]
    assert full == bf
    # partial probe: query's own vector (vec_id 0) must rank first, and
    # recall@10 should be reasonable for random embeddings
    part = [r["vec_id"] for r in ivf_topk(emb, q, k=10, n_clusters=8, n_probe=3).collect()]
    assert part[0] == 0
    assert len(set(part) & set(bf)) >= 3
