"""PageRank: exactness vs an independent numpy power iteration,
structural invariants, and the SQL twin on the same edge list."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from confidential_storm_spark.operators.graph import pagerank, pagerank_sql, symmetrize

PAIRS = [(0, 1), (1, 2), (2, 3), (0, 3), (4, 5)]  # a 4-cycle + an isolated pair


def _numpy_pagerank(pairs, iters, damping):
    nodes = sorted({x for p in pairs for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros((n, n))
    for a, b in pairs:
        out[idx[a], idx[b]] = 1.0
        out[idx[b], idx[a]] = 1.0
    deg = out.sum(axis=1)
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        pr = (1 - damping) / n + damping * (out.T @ (pr / deg))
    return {nodes[i]: pr[i] for i in range(n)}


@pytest.fixture()
def edges(spark):
    pairs = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    return symmetrize(pairs)


def test_pagerank_matches_power_iteration(spark, edges):
    got = {r["id"]: r["pr"] for r in pagerank(edges, iters=8, damping=0.85).collect()}
    want = _numpy_pagerank(PAIRS, 8, 0.85)
    assert got.keys() == want.keys()
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)


def test_pagerank_sums_to_one(spark, edges):
    prs = [r["pr"] for r in pagerank(edges, iters=12).collect()]
    assert sum(prs) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_ranks_hub_highest(spark):
    star = [(0, i) for i in range(1, 6)]  # node 0 is the hub
    e = symmetrize(spark.createDataFrame(star, "id_a long, id_b long"))
    got = {r["id"]: r["pr"] for r in pagerank(e, iters=8).collect()}
    assert got[0] == max(got.values())
    leaves = [v for k, v in got.items() if k != 0]
    assert max(leaves) == pytest.approx(min(leaves), abs=1e-12)


def test_pagerank_sql_twin_matches_spark(spark, edges):
    got = {r["id"]: r["pr"] for r in pagerank(edges, iters=6).collect()}
    pairs_cte = "SELECT * FROM (VALUES " + ", ".join(
        f"({a}, {b})" for a, b in PAIRS
    ) + ") t(id_a, id_b)"
    sql = pagerank_sql(pairs_cte, iters=6)
    twin = {int(r[0]): float(r[1]) for r in duckdb.sql(sql).fetchall()}
    assert got.keys() == twin.keys()
    for k in got:
        assert got[k] == pytest.approx(twin[k], abs=1e-12)


def test_pagerank_rejects_zero_iters(spark, edges):
    with pytest.raises(ValueError):
        pagerank(edges, iters=0)
