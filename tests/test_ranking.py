"""BM25 / TF-IDF ranking operators."""

from __future__ import annotations

import math

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


CORPUS = [
    (1, "spark joins the table with spark hash joins"),
    (2, "the vector scan reads the column store"),
    (3, "spark vector engine"),
    (4, "unrelated words entirely different content"),
]


def test_bm25_matches_hand_computation(spark):
    from confidential_storm_spark.operators.ranking import bm25_topk

    docs = _docs(spark, CORPUS)
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(docs, ["spark", "vector"], k=4).collect()
    }

    # hand-computed BM25 (k1=1.2, b=0.75): N=4, dl = token counts,
    # avgdl = mean(dl), idf = ln(1 + (N - df + .5)/(df + .5))
    texts = {d: t.split() for d, t in CORPUS}
    n = len(texts)
    avgdl = sum(len(w) for w in texts.values()) / n
    dfreq = {
        t: sum(1 for ws in texts.values() if t in ws) for t in ("spark", "vector")
    }
    expect = {}
    for d, ws in texts.items():
        s = 0.0
        for t in ("spark", "vector"):
            tf = ws.count(t)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(ws) / avgdl))
        if s > 0:
            expect[d] = round(s, 6)
    assert got == pytest.approx(expect, abs=1e-6)


def test_bm25_topk_orders_desc_and_breaks_ties_by_id(spark):
    from confidential_storm_spark.operators.ranking import bm25_topk

    docs = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a b"), (4, "c d")])
    rows = bm25_topk(docs, ["a"], k=2).collect()
    assert [r["doc_id"] for r in rows] == [1, 2]  # equal scores -> id order


def test_tfidf_weights_and_min_df(spark):
    from confidential_storm_spark.operators.ranking import tfidf

    docs = _docs(spark, CORPUS)
    rows = tfidf(docs, min_df=2).collect()
    by_key = {(r["doc_id"], r["term"]): r for r in rows}
    # "spark" appears in docs 1 (tf=2) and 3 (tf=1): df=2, N=4
    assert by_key[(1, "spark")]["tf"] == 2
    assert by_key[(1, "spark")]["tfidf"] == pytest.approx(
        round(2 * math.log(4 / 2), 6)
    )
    # min_df=2 drops hapax terms like "unrelated" (df=1)
    assert not any(t == "unrelated" for _, t in by_key)
    # "the" (df=2: docs 1 and 2) keeps its ln(N/df) weight
    assert by_key[(1, "the")]["tfidf"] == pytest.approx(
        round(math.log(4 / 2), 6)
    )


def test_bm25_empty_query_terms_raises_in_both_engines(spark):
    from confidential_storm_spark.operators.ranking import bm25_topk, bm25_topk_sql

    docs = _docs(spark, CORPUS)
    with pytest.raises(ValueError):
        bm25_topk(docs, [])
    with pytest.raises(ValueError):
        bm25_topk_sql([])


def test_rrf_fuse_hand_computed(spark):
    """RRF against hand-computed reciprocal ranks, incl. id-tiebreak
    ranks and ids present in only one ranking."""
    from confidential_storm_spark.operators.fusion import rrf_fuse, with_rank

    r1 = spark.createDataFrame(
        [(1, 3.0), (2, 2.0), (3, 2.0), (4, 1.0)], "doc_id long, s double"
    )
    r2 = spark.createDataFrame([(2, 9.0), (5, 8.0)], "doc_id long, s double")
    # tie at s=2.0: id 2 ranks ahead of id 3
    ranks = {r.doc_id: r.rank for r in with_rank(r1, "doc_id", "s").collect()}
    assert ranks == {1: 1, 2: 2, 3: 3, 4: 4}
    got = [(r.doc_id, r.rrf) for r in rrf_fuse([(r1, "s"), (r2, "s")], "doc_id").collect()]
    want = {
        1: 1 / 61,
        2: 1 / 62 + 1 / 61,
        3: 1 / 63,
        4: 1 / 64,
        5: 1 / 62,
    }
    expect = sorted(
        ((d, round(v, 6)) for d, v in want.items()), key=lambda t: (-t[1], t[0])
    )
    assert got == expect
