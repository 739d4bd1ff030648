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
