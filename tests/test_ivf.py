"""IVF approximate-nearest-neighbor tests."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.operators.similarity import (
    brute_force_topk,
    ivf_index,
    ivf_topk,
    ivf_topk_indexed,
    ivf_write_index,
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


def test_ivf_prebuilt_index_prunes_partitions(spark, sf_dir, tmp_path):
    """The warehouse-scale query path: index written once partitioned
    by cluster; a probe scans ONLY the probed partitions (visible as a
    PartitionFilters entry on the parquet scan) and full probe equals
    brute force exactly."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    path = str(tmp_path / "ivf")
    ivf_write_index(emb, path, n_clusters=8)

    full = ivf_topk_indexed(spark, path, q, k=10, n_probe=8)
    bf = brute_force_topk(emb, q, k=10)
    assert [tuple(r) for r in full.collect()] == [tuple(r) for r in bf.collect()]

    part = ivf_topk_indexed(spark, path, q, k=10, n_probe=2)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        part.explain(True)
    plan = buf.getvalue()
    # the _cluster IN (...) predicate must reach the scan as a
    # partition filter, not a post-scan filter
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "_cluster" in seg
    rows = part.collect()
    assert rows[0]["vec_id"] == 0 and len(rows) == 10


def test_lsh_multi_probe_recall(spark, sf_dir):
    """Multi-probe LSH: recall grows monotonically with n_probe, and
    probing every bucket (2^planes) is exactly brute force."""
    from confidential_storm_spark.operators.similarity import lsh_ann_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = _query_vec(spark, sf_dir)
    bf = [r["vec_id"] for r in brute_force_topk(emb, q, k=10).collect()]

    def recall(n_probe):
        got = [
            r["vec_id"]
            for r in lsh_ann_topk(emb, q, k=10, num_planes=4, n_probe=n_probe).collect()
        ]
        return len(set(got) & set(bf)) / len(bf)

    r1, r4, r16 = recall(1), recall(4), recall(16)
    assert r1 <= r4 <= r16
    assert r16 == 1.0  # full probe == exact
    full = [
        tuple(r)
        for r in lsh_ann_topk(emb, q, k=10, num_planes=4, n_probe=16).collect()
    ]
    exact = [tuple(r) for r in brute_force_topk(emb, q, k=10).collect()]
    assert full == exact
