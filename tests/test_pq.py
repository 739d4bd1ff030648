"""Product quantization: determinism, compression contract, recall."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

DIM = 32


def _vecs(spark, n=600, n_clusters=6, seed=4):
    """Clustered synthetic vectors (PQ recall is meaningful only on
    structured data — uniform noise has no neighbors to find)."""
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, DIM)) * 4
    rows = []
    for i in range(n):
        c = centers[i % n_clusters]
        rows.append((i, (c + rng.normal(size=DIM) * 0.6).tolist()))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


def test_pq_encode_is_deterministic_and_compact(spark):
    from confidential_storm_spark.operators.pq import pq_encode, pq_train

    df, _ = _vecs(spark)
    books = pq_train(df, DIM, m=8, ks=16)
    assert books.shape == (8, 16, 4)
    b2 = pq_train(df, DIM, m=8, ks=16)
    assert np.array_equal(books, b2)  # deterministic training

    codes = {r["vec_id"]: r["pq_code"] for r in pq_encode(df, books).collect()}
    assert len(codes) == 600
    assert all(len(c) == 8 and all(0 <= x < 16 for x in c) for c in codes.values())
    codes2 = {r["vec_id"]: r["pq_code"] for r in pq_encode(df, books).collect()}
    assert codes == codes2  # deterministic encoding


def test_pq_adc_recall_against_brute_force(spark):
    from confidential_storm_spark.operators.pq import pq_encode, pq_topk_adc, pq_train

    df, rows = _vecs(spark)
    books = pq_train(df, DIM, m=8, ks=16)
    codes = pq_encode(df, books)

    from confidential_storm_spark.operators.pq import pq_topk_rerank

    X = np.array([r[1] for r in rows])
    rng = np.random.default_rng(9)
    adc_recalls, rr_recalls = [], []
    for t in range(5):
        q = X[rng.integers(0, len(X))] + rng.normal(size=DIM) * 0.1
        exact = set(np.argsort(((X - q) ** 2).sum(axis=1), kind="stable")[:10].tolist())
        adc = {
            r["vec_id"] for r in pq_topk_adc(codes, q.tolist(), books, k=10).collect()
        }
        adc_recalls.append(len(exact & adc) / 10)
        rr = {
            r["vec_id"]
            for r in pq_topk_rerank(codes, df, q.tolist(), books, k=10).collect()
        }
        rr_recalls.append(len(exact & rr) / 10)
    # raw ADC at 8x16 codes is coarse (that is the compression trade);
    # the shortlist+exact-rerank recipe recovers near-exact recall
    assert sum(adc_recalls) / 5 >= 0.2, adc_recalls
    assert sum(rr_recalls) / 5 >= 0.9, rr_recalls


def test_pq_dim_validation(spark):
    from confidential_storm_spark.operators.pq import pq_topk_adc, pq_train

    df, _ = _vecs(spark)
    with pytest.raises(ValueError):
        pq_train(df, DIM, m=5)  # 32 % 5 != 0
    books = pq_train(df, DIM, m=4, ks=8)
    from confidential_storm_spark.operators.pq import pq_encode

    codes = pq_encode(df, books)
    with pytest.raises(ValueError):
        pq_topk_adc(codes, [0.0] * 16, books)  # wrong query dim


def test_ivfpq_index_prunes_and_full_probe_matches_brute_force(spark, tmp_path):
    from confidential_storm_spark.operators.pq import ivfpq_topk, ivfpq_write_index

    df, rows = _vecs(spark)
    path = str(tmp_path / "ivfpq")
    centroids, books = ivfpq_write_index(df, path, DIM, n_clusters=6, m=8, ks=16)
    assert centroids.shape[1] == DIM and books.shape == (8, 16, 4)

    X = np.array([r[1] for r in rows])
    q = (X[17] + 0.05).tolist()
    exact = np.argsort(((X - np.array(q)) ** 2).sum(axis=1), kind="stable")[:10]

    # full probe + corpus-wide shortlist == exact brute force
    full = ivfpq_topk(spark, path, q, k=10, n_probe=6, shortlist=len(rows))
    assert [r["vec_id"] for r in full.collect()] == exact.tolist()

    # pruned probe: the scan must touch only the probed partitions
    pruned = ivfpq_topk(spark, path, q, k=10, n_probe=2, shortlist=100)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "_cluster" in plan
    got = {r["vec_id"] for r in pruned.collect()}
    assert len(got & set(exact.tolist())) >= 8  # clustered data: high recall


def test_ivfpq_append_standing_index(spark, tmp_path):
    """Standing-index maintenance for IVF-PQ: appended vectors are
    PQ-encoded with the EXISTING codebooks (codes match a fresh
    pq_encode run bit-for-bit), placed under their euclidean-nearest
    centroid's partition, and full probe + corpus shortlist over the
    appended index equals exact brute force over base+appended."""
    from confidential_storm_spark.operators.pq import (
        ivfpq_append,
        ivfpq_topk,
        ivfpq_write_index,
        pq_encode,
    )

    df, rows = _vecs(spark)
    base = df.filter(F.col("vec_id") % 5 != 0)
    new = df.filter(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "ivfpq_incr")
    centroids, books = ivfpq_write_index(base, path, DIM, n_clusters=6, m=8, ks=16)
    ivfpq_append(new, path)

    stored = {
        r["vec_id"]: (r["_cluster"], list(r["pq_code"]))
        for r in spark.read.parquet(f"{path}/vectors")
        .join(new.select("vec_id"), "vec_id", "left_semi")
        .collect()
    }
    assert len(stored) == new.count()
    # codes bit-match a fresh encode with the same books
    fresh = {r["vec_id"]: list(r["pq_code"]) for r in pq_encode(new, books).collect()}
    assert {k: v[1] for k, v in stored.items()} == fresh
    # placement: euclidean argmin against the stored centroids
    X = {r[0]: np.array(r[1]) for r in rows}
    for vid, (cl, _code) in stored.items():
        want = int(((centroids - X[vid]) ** 2).sum(axis=1).argmin())
        assert cl == want

    # full probe + corpus shortlist == exact over base+appended
    q = (X[17] + 0.05).tolist()
    exact = np.argsort(
        ((np.array([r[1] for r in rows]) - np.array(q)) ** 2).sum(axis=1),
        kind="stable",
    )[:10]
    full = ivfpq_topk(spark, path, q, k=10, n_probe=6, shortlist=len(rows))
    assert [r["vec_id"] for r in full.collect()] == exact.tolist()
