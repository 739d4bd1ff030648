"""Round-4 operators: incremental dedup, span-dup fraction, PMI
collocations, distinct-n diversity (hand-computed semantics; the
oracle registry covers cross-engine values)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows, schema="doc_id long, text string"):
    return spark.createDataFrame(rows, schema)


def test_incremental_dedup_drops_corpus_and_batch_dups(spark):
    from confidential_storm_spark.operators.dedup import incremental_dedup

    corpus = _docs(spark, [(1, "old news"), (2, "evergreen words")])
    batch = _docs(
        spark,
        [
            (10, "old news"),        # already in corpus -> dropped
            (11, "fresh content"),   # new -> survives
            (12, "fresh content"),   # batch-internal dup -> folded into 11
            (13, "evergreen words"), # corpus dup -> dropped
        ],
    )
    out = {r["survivor_id"]: r["n_copies"] for r in incremental_dedup(corpus, batch).collect()}
    assert out == {11: 2}


def test_span_dup_fraction_counts_cross_doc_spans(spark):
    from confidential_storm_spark.operators.dedup import span_dup_fraction

    shared = "one two three four five"          # the only 5-word span of both docs
    docs = _docs(
        spark,
        [
            (1, shared + " alpha unique tail"),  # spans: 4 total, 1 shared
            (2, shared),                          # 1 span, shared
            (3, "totally different words here"), # < 5 words -> 0 spans
        ],
    )
    rows = {r["doc_id"]: r for r in span_dup_fraction(docs).collect()}
    assert rows[2]["n_spans"] == 1 and rows[2]["dup_spans"] == 1
    assert rows[2]["dup_frac"] == 1.0
    assert rows[1]["n_spans"] == 4 and rows[1]["dup_spans"] == 1
    assert rows[1]["dup_frac"] == 0.25
    assert rows[3]["n_spans"] == 0 and rows[3]["dup_frac"] == 0.0


def test_collocations_pmi_hand_computed(spark):
    from confidential_storm_spark.operators.collocations import collocations_pmi

    # corpus: "a b" x3, "a c" x1 -> tokens: a=4, b=3, c=1, N=8
    docs = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a b"), (4, "a c")])
    rows = collocations_pmi(docs, k=5, min_count=1).collect()
    got = {(r["w1"], r["w2"]): (r["n_pair"], r["pmi"]) for r in rows}
    assert got[("a", "b")][0] == 3
    assert got[("a", "b")][1] == pytest.approx(round(math.log(3 * 8 / (4 * 3)), 6))
    assert got[("a", "c")][0] == 1
    assert got[("a", "c")][1] == pytest.approx(round(math.log(1 * 8 / (4 * 1)), 6))
    # both PMIs are ln 2 (tie) -> deterministic (w1, w2) tiebreak
    assert [(r["w1"], r["w2"]) for r in rows] == [("a", "b"), ("a", "c")]


def test_collocations_min_count_filters(spark):
    from confidential_storm_spark.operators.collocations import collocations_pmi

    docs = _docs(spark, [(1, "a b"), (2, "a b"), (3, "a c")])
    rows = collocations_pmi(docs, k=5, min_count=2).collect()
    assert [(r["w1"], r["w2"]) for r in rows] == [("a", "b")]


def test_ngram_diversity_hand_computed(spark):
    from confidential_storm_spark.operators.collocations import ngram_diversity

    docs = spark.createDataFrame(
        [
            (1, "x x x x", "rep"),       # unigrams 4/1 distinct, bigrams 3/1, trigrams 2/1
            (2, "p q r s", "div"),       # all distinct
        ],
        "doc_id long, text string, source string",
    )
    rows = {(r["source"], r["n"]): r for r in ngram_diversity(docs).collect()}
    assert rows[("rep", 1)]["total_ngrams"] == 4
    assert rows[("rep", 1)]["distinct_ngrams"] == 1
    assert rows[("rep", 2)]["distinct_frac"] == pytest.approx(round(1 / 3, 6))
    assert rows[("div", 3)]["total_ngrams"] == 2
    assert rows[("div", 3)]["distinct_ngrams"] == 2
    assert rows[("div", 1)]["distinct_frac"] == 1.0


def test_incremental_dedup_differential_vs_exact(spark):
    """Differential property on a collision-heavy random corpus:
    incremental survivors == exact_dedup of the batch restricted to
    digests absent from the corpus."""
    import random

    from confidential_storm_spark.operators.dedup import exact_dedup, incremental_dedup

    rng = random.Random(7)
    vocab = ["w%d" % i for i in range(12)]
    rows = [
        (i, " ".join(rng.choices(vocab, k=rng.randint(1, 3)))) for i in range(200)
    ]
    corpus = _docs(spark, rows[:80])
    batch = _docs(spark, rows[80:])
    got = {
        (r["digest"], r["survivor_id"], r["n_copies"])
        for r in incremental_dedup(corpus, batch).collect()
    }
    corpus_digests = {
        r["digest"] for r in exact_dedup(corpus).select("digest").collect()
    }
    expect = {
        (r["digest"], r["survivor_id"], r["n_copies"])
        for r in exact_dedup(batch).collect()
        if r["digest"] not in corpus_digests
    }
    assert got == expect and len(got) > 0


def test_conversion_funnel_orders_strictly(spark):
    """Ordering matters: a click BEFORE the first view must not count,
    a purchase requires a click after the view."""
    from confidential_storm_spark.operators.funnel import conversion_funnel

    rows = [
        # u1: full ordered path
        ("u1", "view", 10), ("u1", "click", 20), ("u1", "purchase", 30),
        # u2: click precedes the view -> stalls at view
        ("u2", "click", 5), ("u2", "view", 10),
        # u3: view then purchase but never clicks -> stalls at view
        ("u3", "view", 1), ("u3", "purchase", 9),
        # u4: no view at all -> never enters
        ("u4", "click", 1), ("u4", "purchase", 2),
        # u5: simultaneous view/click (strict > excludes the tie)
        ("u5", "view", 7), ("u5", "click", 7),
    ]
    ev = spark.createDataFrame(rows, "user_id string, event_type string, ts_us long")
    got = {r["stage"]: r["n_users"] for r in conversion_funnel(ev).collect()}
    assert got == {"view": 4, "click": 1, "purchase": 1}


def test_vocab_kl_flags_shifted_tokens(spark):
    from confidential_storm_spark.operators.drift import vocab_kl_topk

    p = _docs(spark, [(1, "alpha alpha alpha beta"), (2, "alpha gamma")])
    q = _docs(spark, [(3, "beta beta gamma gamma"), (4, "beta delta")])
    rows = vocab_kl_topk(p, q, k=10).collect()
    by_w = {r["w"]: r for r in rows}
    # alpha: frequent in P, absent in Q -> largest positive contribution
    assert rows[0]["w"] == "alpha" and rows[0]["contrib"] > 0
    # delta: absent in P, present in Q -> negative contribution
    assert by_w["delta"]["contrib"] < 0
    assert by_w["alpha"]["n_p"] == 4 and by_w["alpha"]["n_q"] == 0


def test_bigram_cross_entropy_matches_reference_model(spark):
    """Exact agreement with an independent python add-alpha bigram LM,
    plus the property the unigram model can't deliver: a doc with
    GARBLED word order scores higher than the same words in their
    corpus-typical order."""
    import math
    import re
    from collections import Counter

    from confidential_storm_spark.functions.text import bigram_cross_entropy

    docs = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the mat"),
        (2, "the cat sat on the rug"),
        (3, "mat the on sat cat the"),  # same words as 0, garbled order
        (4, "single"),                   # < 2 words -> 0 bigrams
        (5, ""),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.cross_entropy) for r in bigram_cross_entropy(df).collect()}

    tok = lambda s: [w for w in re.split(r"\W+", s.lower()) if w]
    pairs, ctx = Counter(), Counter()
    vocab = set()
    for _, t in docs:
        ws = tok(t)
        vocab |= set(ws)
        for v, w in zip(ws, ws[1:]):
            pairs[(v, w)] += 1
            ctx[v] += 1
    a, V = 0.5, len(vocab)
    for doc_id, t in docs:
        ws = tok(t)
        bgs = list(zip(ws, ws[1:]))
        want_n = len(bgs)
        want_ce = (
            round(
                sum(-math.log((pairs[b] + a) / (ctx[b[0]] + a * V)) for b in bgs)
                / want_n,
                6,
            )
            if bgs
            else 0.0
        )
        assert got[doc_id] == (want_n, want_ce), doc_id
    # sequence-awareness: garbled ordering of the SAME words costs more
    assert got[3][1] > got[0][1]
