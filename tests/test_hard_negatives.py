"""Hard-negative mining: numpy brute-force differential, cross-label
invariant, determinism of the tie-break, and plan shape.
"""

import numpy as np
from pyspark.sql import functions as F

from confidential_storm_spark.operators.similarity import hard_negatives


def _fixture(spark, n=60, dim=8, n_labels=3, seed=3):
    rng = np.random.default_rng(seed)
    rows = [
        (i, [float(x) for x in rng.normal(size=dim)], int(i % n_labels))
        for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def _ref(rows, k, mod):
    out = []
    for qid, qv, ql in rows:
        if qid % mod != 0:
            continue
        qv = np.array(qv)
        cands = []
        for nid, v, l in rows:
            if l == ql:
                continue
            v = np.array(v)
            c = round(float(v @ qv / (np.linalg.norm(v) * np.linalg.norm(qv))), 6)
            cands.append((c, nid))
        cands.sort(key=lambda t: (-t[0], t[1]))
        for r, (c, nid) in enumerate(cands[:k], 1):
            out.append((qid, nid, c, r))
    return out


def test_matches_numpy_brute_force(spark):
    rows, df = _fixture(spark)
    got = [tuple(r) for r in hard_negatives(df, k=4, query_mod=10).collect()]
    assert got == _ref(rows, 4, 10)


def test_negatives_never_share_the_query_label(spark):
    rows, df = _fixture(spark)
    labels = {i: l for i, _, l in rows}
    for r in hard_negatives(df, k=5, query_mod=10).collect():
        assert labels[r["neg_id"]] != labels[r["query_id"]]


def test_ranks_are_dense_per_query(spark):
    rows, df = _fixture(spark)
    out = hard_negatives(df, k=3, query_mod=10).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r["rank"])
    assert by_q and all(sorted(v) == [1, 2, 3] for v in by_q.values())


def test_plan_scores_in_arrow_and_keys_the_window(spark):
    _, df = _fixture(spark)
    plan = (
        hard_negatives(df, k=3, query_mod=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # scoring is one Arrow-batched matmul pass, not a per-pair join
    assert "MapInPandas" in plan and "Join" not in plan
    # the ranking window partitions by query_id (no global window)
    import re

    frags = re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan)
    assert frags and all("query_id" in f for f in frags)


def test_ivf_full_probe_identical_to_exact(spark):
    """n_probe == n_clusters scores every (row, query) pair under the
    same selection rule, so the IVF miner is row-identical to the
    exact one — the identity the registry certifies."""
    from confidential_storm_spark.operators.similarity import hard_negatives_ivf

    rows, df = _fixture(spark, n=120)
    exact = [tuple(r) for r in hard_negatives(df, k=4, query_mod=10).collect()]
    ivf = [
        tuple(r)
        for r in hard_negatives_ivf(
            df, k=4, query_mod=10, n_clusters=6, n_probe=6
        ).collect()
    ]
    assert ivf == exact == _ref(rows, 4, 10)


def test_ivf_partial_probe_recall_and_pruning(spark):
    """At n_probe < n_clusters the miner still returns well-formed
    top-k with useful recall, and with caller-provided centroids the
    per-query candidate universe shrinks to the probed clusters only
    (the pruning that makes it the 100 TB path)."""
    from confidential_storm_spark.operators.similarity import (
        assign_to_centroids,
        hard_negatives_ivf,
    )

    rows, df = _fixture(spark, n=240, dim=8, seed=11)
    k, mod, n_clusters, n_probe = 4, 12, 8, 3
    rng = np.random.default_rng(0)
    cents = rng.normal(size=(n_clusters, 8))

    exact = {}
    for qid, nid, c, r in _ref(rows, k, mod):
        exact.setdefault(qid, set()).add(nid)
    got = {}
    out = hard_negatives_ivf(
        df, k=k, query_mod=mod, n_probe=n_probe, centroids=cents
    ).collect()
    for r in out:
        got.setdefault(r.query_id, set()).add(r.neg_id)

    # every emitted negative lies in a probed cluster (pruning is real)
    assigned = {
        r.vec_id: r._cluster
        for r in assign_to_centroids(df, cents).select("vec_id", "_cluster").collect()
    }
    cn = np.linalg.norm(cents, axis=1)
    for qid, negs in got.items():
        qv = np.array(dict((i, v) for i, v, _ in rows)[qid])
        sims = (cents @ qv) / (cn * np.linalg.norm(qv))
        probed = set(np.argsort(-sims, kind="stable")[:n_probe].tolist())
        assert {assigned[n] for n in negs} <= probed

    # aggregate recall vs exact is meaningfully high at 3/8 probes
    hits = sum(len(got.get(q, set()) & s) for q, s in exact.items())
    total = sum(len(s) for s in exact.values())
    assert hits / total >= 0.35, hits / total


def test_zero_norm_vectors_rank_last_never_nan(spark):
    """Degenerate (all-zero) corpus vectors score cosine 0 against
    every query — rankable, never NaN, never rank-1 ahead of real
    neighbors (the pre-round-9 expression form ranked NaN first)."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),   # query (id % 10 == 0)
        (1, [1.0, 0.1, 0.0, 0.0], 1),   # strong cross-label neighbor
        (2, [0.0, 0.0, 0.0, 0.0], 1),   # zero-norm cross-label row
        (3, [-1.0, 0.0, 0.0, 0.0], 1),  # negative-cosine row
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    got = hard_negatives(df, k=3, query_mod=10).collect()
    by_rank = {r.rank: (r.neg_id, r.cosine) for r in got}
    assert by_rank[1][0] == 1
    assert by_rank[2] == (2, 0.0)       # zero-norm: cosine exactly 0
    assert by_rank[3][0] == 3 and by_rank[3][1] < 0
    assert all(r.cosine == r.cosine for r in got)  # no NaN anywhere


def test_ivf_none_probe_is_full_probe_with_caller_centroids(spark):
    """n_probe=None must mean FULL probe against the caller-provided
    centroid matrix's own cluster count, not the n_clusters parameter
    default — with 8 standing-index centroids and n_clusters left at a
    smaller value, the old resolution order silently pruned to
    partial probe (ADVICE r10)."""
    from confidential_storm_spark.operators.similarity import hard_negatives_ivf

    rows, df = _fixture(spark, n=120)
    rng = np.random.default_rng(7)
    cents = rng.normal(size=(8, 8))
    exact = _ref(rows, 4, 10)
    got = [
        tuple(r)
        for r in hard_negatives_ivf(
            df, k=4, query_mod=10, n_clusters=2, centroids=cents
        ).collect()
    ]
    assert got == exact
