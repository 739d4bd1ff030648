"""Drift-triggered IVF re-clustering policy (operators/ann_maintain):
measured drift, threshold gate, atomic alias switch, and recall
recovery vs brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.operators.ann_maintain import (
    drift_ratio,
    maybe_recluster,
    read_alias,
    record_build_stats,
    topk_via_alias,
    write_alias,
)
from confidential_storm_spark.operators.similarity import (
    brute_force_topk,
    ivf_append,
    ivf_topk_indexed,
    ivf_write_index,
)

D, K = 16, 8


def _mkdf(spark, arr, off):
    return spark.createDataFrame(
        [(off + i, row.tolist()) for i, row in enumerate(arr)],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture()
def drifted_index(spark, tmp_path):
    """Base index on N(0,1)^16, then four far-off drifted modes
    appended — the construction that measurably degrades partial-probe
    recall under the build-time quantizer."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(400, D))
    modes = rng.normal(size=(4, D))
    modes = 6 * modes / np.linalg.norm(modes, axis=1, keepdims=True)
    drifted = np.concatenate([m + 0.3 * rng.normal(size=(50, D)) for m in modes])
    path = str(tmp_path / "ivf")
    alias = str(tmp_path / "alias")
    ivf_write_index(_mkdf(spark, base, 0), path, n_clusters=K)
    record_build_stats(spark, path)
    write_alias(alias, path)
    ivf_append(_mkdf(spark, drifted, 1000), path)
    full = _mkdf(spark, base, 0).union(_mkdf(spark, drifted, 1000))
    queries = [(m + 0.3 * rng.normal(size=D)).tolist() for m in modes]
    return path, alias, full, queries


def _recalls(spark, alias, full, queries, k=10, n_probe=2):
    out = []
    for q in queries:
        got = {r.vec_id for r in topk_via_alias(spark, alias, q, k=k, n_probe=n_probe).collect()}
        want = {r.vec_id for r in brute_force_topk(full, q, k=k).collect()}
        out.append(len(got & want) / k)
    return out


def test_drift_ratio_baseline_and_rise(spark, drifted_index):
    path, _, _, _ = drifted_index
    # appended drift rises the ratio well above the healthy baseline
    assert drift_ratio(spark, path) > 1.3


def test_policy_noop_below_threshold(spark, drifted_index):
    path, alias, _, _ = drifted_index
    res = maybe_recluster(spark, alias, threshold=10.0)
    assert res == {"reclustered": False, "drift": pytest.approx(res["drift"]), "path": path}
    assert read_alias(alias) == path


def test_recluster_switches_alias_and_recovers_recall(spark, drifted_index):
    path, alias, full, queries = drifted_index
    before = _recalls(spark, alias, full, queries)
    res = maybe_recluster(spark, alias, threshold=1.3)
    assert res["reclustered"] and res["path"].endswith("_v2")
    assert read_alias(alias) == res["path"]
    # fresh baseline: the new index is healthy by construction
    assert drift_ratio(spark, res["path"]) == pytest.approx(1.0)
    after = _recalls(spark, alias, full, queries)
    assert min(after) >= min(before) and sum(after) >= sum(before)
    assert min(after) == 1.0  # modes own their clusters post-rebuild
    # the policy is idempotent right after a rebuild
    res2 = maybe_recluster(spark, alias, threshold=1.3)
    assert not res2["reclustered"]


def test_full_probe_stays_exact_through_drift_and_rebuild(spark, drifted_index):
    path, alias, full, queries = drifted_index
    q = queries[0]
    want = [tuple(r) for r in brute_force_topk(full, q, k=10).collect()]
    got = [tuple(r) for r in ivf_topk_indexed(spark, path, q, k=10, n_probe=K).collect()]
    assert got == want
    maybe_recluster(spark, alias, threshold=1.3)
    got2 = [
        tuple(r)
        for r in ivf_topk_indexed(spark, read_alias(alias), q, k=10, n_probe=K).collect()
    ]
    assert got2 == want
