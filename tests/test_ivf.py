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


def test_ivf_append_standing_index(spark, sf_dir, tmp_path):
    """Standing-index maintenance: vectors appended with ivf_append
    land under the EXACT partition a fresh numpy nearest-centroid
    assignment picks, the appended index at full probe equals brute
    force over base+appended together, and a partial probe of an
    appended vector's own cluster finds it."""
    import numpy as np

    from confidential_storm_spark.operators.similarity import ivf_append

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    new = emb.filter(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "ivf_incr")
    ivf_write_index(base, path, n_clusters=8)
    ivf_append(new, path)

    # (a) placement: euclidean argmin against the stored centroids
    cent_rows = spark.read.parquet(f"{path}/centroids").collect()
    cmat = np.zeros((8, len(cent_rows[0]["centroid"])))
    for r in cent_rows:
        cmat[r["cluster"]] = r["centroid"]
    stored = {
        r["vec_id"]: (r["_cluster"], np.asarray(r["embedding"], dtype=np.float64))
        for r in spark.read.parquet(f"{path}/vectors")
        .join(new.select("vec_id"), "vec_id", "left_semi")
        .collect()
    }
    assert len(stored) == new.count()
    for vid, (cl, v) in stored.items():
        want = int(((cmat - v) ** 2).sum(axis=1).argmin())
        assert cl == want, f"vec {vid} stored in {cl}, argmin is {want}"

    # (b) full probe over the appended index == brute force over ALL
    q = _query_vec(spark, sf_dir)
    full = ivf_topk_indexed(spark, path, q, k=10, n_probe=8)
    bf = brute_force_topk(emb, q, k=10)
    assert [tuple(r) for r in full.collect()] == [tuple(r) for r in bf.collect()]

    # (c) an appended vector is reachable at n_probe=1 through its own
    # cluster.  Storage assigns by EUCLIDEAN argmin (matching KMeans);
    # the probe ranks centroids by COSINE — pick a vector where the
    # two agree (most do; centroids of unit vectors aren't unit, so
    # the metrics can legitimately disagree near cluster boundaries)
    cnorm = np.linalg.norm(cmat, axis=1)
    probe_vid = next(
        vid
        for vid, (cl, v) in sorted(stored.items())
        if int(((cmat @ v) / (cnorm * np.linalg.norm(v))).argmax()) == cl
    )
    own_vec = stored[probe_vid][1]
    got = ivf_topk_indexed(spark, path, [float(x) for x in own_vec], k=1, n_probe=1)
    assert got.collect()[0]["vec_id"] == probe_vid


def test_ivf_append_batch_proportional(spark, sf_dir, tmp_path):
    """ivf_append never touches the standing vectors table: its write
    is append-mode partitioned parquet, so the base files are intact
    afterwards (byte-identical file list) — per-ingest cost ∝ batch."""
    import os

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf_ap")
    ivf_write_index(emb.filter(F.col("vec_id") % 5 != 0), path, n_clusters=8)

    def file_set():
        out = set()
        for root, _dirs, files in os.walk(f"{path}/vectors"):
            for f in files:
                if f.endswith(".parquet"):
                    p = os.path.join(root, f)
                    out.add((p, os.path.getsize(p)))
        return out

    before = file_set()
    from confidential_storm_spark.operators.similarity import ivf_append

    ivf_append(emb.filter(F.col("vec_id") % 5 == 0), path)
    after = file_set()
    assert before <= after and len(after) > len(before)


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


def test_ivf_compaction_and_drift_stats(spark, sf_dir, tmp_path):
    """Index lifecycle close-out: after appends fragment the standing
    table into many small files, compact_partitioned rewrites it to one
    file per cluster with byte-identical query results and the same
    partition dirs; ivf_drift_stats reports k rows covering every
    stored vector with the centroid-distance health number."""
    import os

    import numpy as np

    from confidential_storm_spark.operators.similarity import (
        ivf_append,
        ivf_drift_stats,
    )
    from confidential_storm_spark.sources.writers import compact_partitioned

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    ivf_write_index(emb.filter(F.col("vec_id") % 3 == 0), path, n_clusters=8)
    ivf_append(emb.filter(F.col("vec_id") % 3 == 1), path)
    ivf_append(emb.filter(F.col("vec_id") % 3 == 2), path)

    q = _query_vec(spark, sf_dir)
    before = [tuple(r) for r in ivf_topk_indexed(spark, path, q, k=10, n_probe=8).collect()]
    assert before == [tuple(r) for r in brute_force_topk(emb, q, k=10).collect()]

    # drift stats: every vector counted, k rows, positive distances
    drift = ivf_drift_stats(spark, path).collect()
    assert sum(r["n_vectors"] for r in drift) == emb.count()
    assert all(r["mean_dist2"] > 0 for r in drift) and len(drift) <= 8

    # compact: one file per cluster, same dirs, identical results
    out = str(tmp_path / "ivf_c")
    os.makedirs(out)
    n_in = compact_partitioned(
        spark, f"{path}/vectors", f"{out}/vectors", "_cluster"
    )
    assert n_in >= 3 * 8 - 8  # three writes fragmented the table
    dirs_before = {d for d in os.listdir(f"{path}/vectors") if d.startswith("_cluster=")}
    dirs_after = {d for d in os.listdir(f"{out}/vectors") if d.startswith("_cluster=")}
    assert dirs_after == dirs_before
    for d in dirs_after:
        files = [f for f in os.listdir(f"{out}/vectors/{d}") if f.endswith(".parquet")]
        assert len(files) == 1, f"{d}: {len(files)} files after compaction"
    # serve from the compacted copy: byte-identical top-k
    import shutil

    shutil.copytree(f"{path}/centroids", f"{out}/centroids")
    after = [tuple(r) for r in ivf_topk_indexed(spark, out, q, k=10, n_probe=8).collect()]
    assert after == before
