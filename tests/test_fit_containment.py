"""Grouped closed-form OLS (operators/fit.py) and containment dedup
(operators/dedup.py::containment_pairs): numpy / brute-force
differentials, degenerate-group NULL contract, stop-shingle cap
semantics, and partition-layout invariance."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.operators.dedup import (
    FP_PRIME,
    containment_pairs,
)
from confidential_storm_spark.operators.fit import grouped_linear_fit

_NONWORD = re.compile(r"[^a-zA-Z0-9_]+")


# ---------------------------------------------------------------------------
# grouped_linear_fit
# ---------------------------------------------------------------------------


def _fixture(spark):
    rows = []
    rng = np.random.default_rng(7)
    # g0: exact line y = 3 + 2x -> slope 2, intercept 3, r2 1
    for x in range(10):
        rows.append(("g0", x, 3 + 2 * x))
    # g1: noisy integer line
    for x in range(20):
        rows.append(("g1", x, int(50 + 5 * x + rng.integers(-10, 11))))
    # g2: single point -> NULLs
    rows.append(("g2", 4, 9))
    # g3: zero x-variance -> NULLs
    for _ in range(5):
        rows.append(("g3", 2, 11))
    # g4: constant y -> slope 0, r2 NULL (zero y-variance)
    for x in range(6):
        rows.append(("g4", x, 7))
    return spark.createDataFrame(rows, "g string, x long, y long")


def _np_fit(xs, ys):
    x = np.asarray(xs, dtype=np.float64)
    y = np.asarray(ys, dtype=np.float64)
    n = len(x)
    den = n * (x * x).sum() - x.sum() ** 2
    if den == 0:
        return None, None, None
    slope = (n * (x * y).sum() - x.sum() * y.sum()) / den
    intercept = (y.sum() * (x * x).sum() - x.sum() * (x * y).sum()) / den
    deny = n * (y * y).sum() - y.sum() ** 2
    r2 = None if deny == 0 else (n * (x * y).sum() - x.sum() * y.sum()) ** 2 / (den * deny)
    return slope, intercept, r2


def test_fit_matches_numpy(spark):
    df = _fixture(spark)
    got = {
        r["g"]: r
        for r in grouped_linear_fit(df, ["g"], "x", "y").collect()
    }
    pdf = df.toPandas()
    for g, grp in pdf.groupby("g"):
        slope, intercept, r2 = _np_fit(grp["x"], grp["y"])
        row = got[g]
        assert row["n"] == len(grp)
        for name, want in (("slope", slope), ("intercept", intercept), ("r2", r2)):
            if want is None:
                assert row[name] is None, (g, name)
            else:
                assert row[name] == pytest.approx(want, abs=2e-6), (g, name)


def test_fit_exact_line_and_layout_invariance(spark):
    df = _fixture(spark)
    one = grouped_linear_fit(df.coalesce(1), ["g"], "x", "y").collect()
    many = grouped_linear_fit(df.repartition(7, "y"), ["g"], "x", "y").collect()
    as_map = lambda rows: {r["g"]: (r["n"], r["slope"], r["intercept"], r["r2"]) for r in rows}
    assert as_map(one) == as_map(many)  # EXACT equality: stats are decimal-exact
    g0 = as_map(one)["g0"]
    assert g0 == (10, 2.0, 3.0, 1.0)


def test_fit_duckdb_twin_bit_identical(spark):
    duckdb = pytest.importorskip("duckdb")
    from confidential_storm_spark.operators.fit import grouped_linear_fit_sql

    df = _fixture(spark)
    spark_rows = {
        r["g"]: (r["n"], r["slope"], r["intercept"], r["r2"])
        for r in grouped_linear_fit(df, ["g"], "x", "y").collect()
    }
    con = duckdb.connect()
    con.register("obs", df.toPandas())
    sql = grouped_linear_fit_sql("obs", ["g"], "x", "y")
    duck_rows = {
        g: (n, s, i, r) for g, n, s, i, r in con.execute(sql).fetchall()
    }
    assert spark_rows == duck_rows  # bit-for-bit, not approx


# ---------------------------------------------------------------------------
# containment_pairs
# ---------------------------------------------------------------------------


def _shingle_set(text: str, n: int = 3) -> set[int]:
    ws = [w for w in _NONWORD.split(text.lower()) if w]
    grams = [" ".join(ws)] if len(ws) < n else [
        " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
    ]
    return {
        int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % FP_PRIME for g in grams
    }


def _brute_containment(texts: dict[int, str], threshold: float, max_df=None):
    sets = {i: _shingle_set(t) for i, t in texts.items() if _shingle_set(t)}
    if max_df is not None:
        from collections import Counter

        df_count = Counter(s for sh in sets.values() for s in sh)
        hot = {s for s, c in df_count.items() if c > max_df}
        sets = {i: sh - hot for i, sh in sets.items()}
        sets = {i: sh for i, sh in sets.items() if sh}
    out = {}
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            c = round(inter / min(len(sets[a]), len(sets[b])), 6)
            if c >= threshold:
                out[(a, b)] = c
    return out


CORPUS = {
    0: "the quick brown fox jumps over the lazy dog near the river bank",
    # 1 contains 0's text verbatim inside a larger doc: high containment,
    # low jaccard (the pair minhash-LSH misses)
    1: (
        "intro paragraph with plenty of extra words before the quote "
        "the quick brown fox jumps over the lazy dog near the river bank "
        "and then a long discussion follows with many more unrelated words "
        "covering storage engines shuffle plans and broadcast joins in detail"
    ),
    2: "completely different content about spark catalyst optimizer rules",
    3: "the quick brown fox jumps over the lazy dog near the river bank",  # exact dup of 0
    4: "spark catalyst optimizer rules are completely different content about",
}


def _corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in CORPUS.items()], "doc_id long, text string"
    )


def test_containment_matches_brute_force(spark):
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(
            _corpus_df(spark), containment_threshold=0.5, max_shingle_df=None
        ).collect()
    }
    want = _brute_containment(CORPUS, 0.5)
    assert got == want
    assert got[(0, 1)] == 1.0  # the quoted-subset pair jaccard would miss
    assert got[(0, 3)] == 1.0  # exact dup
    assert (0, 2) not in got


def test_containment_asymmetric_pair_invisible_to_jaccard(spark):
    from confidential_storm_spark.operators.dedup import minhash_lsh_pairs

    jac = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            _corpus_df(spark), jaccard_threshold=0.5, max_bucket_size=None
        ).collect()
    }
    assert (0, 3) in jac  # resemblance finds the exact dup
    assert (0, 1) not in jac  # ...but not the quoted subset


def test_containment_stop_shingle_cap(spark):
    # cap at df > 2: shingles shared by 3+ docs leave the universe;
    # semantics = containment over the FILTERED sets, mirrored brute-force
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_pairs(
            _corpus_df(spark), containment_threshold=0.3, max_shingle_df=2
        ).collect()
    }
    want = _brute_containment(CORPUS, 0.3, max_df=2)
    assert got == want


def test_containment_duckdb_twin(spark):
    duckdb = pytest.importorskip("duckdb")
    from confidential_storm_spark.operators.dedup import containment_pairs_sql

    df = _corpus_df(spark)
    spark_rows = sorted(
        tuple(r)
        for r in containment_pairs(
            df, containment_threshold=0.5, max_shingle_df=2
        ).collect()
    )
    con = duckdb.connect()
    con.register("documents", df.toPandas())
    duck_rows = sorted(
        tuple(r)
        for r in con.execute(
            containment_pairs_sql(
                containment_threshold=0.5, max_shingle_df=2
            )
        ).fetchall()
    )
    assert spark_rows == duck_rows


# ---------------------------------------------------------------------------
# gap-fill registry query: density + zero-fill contract at sf0.001
# ---------------------------------------------------------------------------


def test_gapfill_dense_spine(spark, sf_dir):
    from confidential_storm_spark.plans.queries import QUERIES

    out = QUERIES["events_daily_gapfill"].builder(spark, sf_dir).collect()
    types = {r["event_type"] for r in out}
    assert len(out) == 31 * len(types)  # one row per type per January day
    per_type = {}
    for r in out:
        per_type.setdefault(r["event_type"], []).append(r)
    for rows in per_type.values():
        days = [r["day"] for r in rows]
        assert len(set(days)) == 31
        # ma7 over the dense series matches a python replay exactly
        rows = sorted(rows, key=lambda r: r["day"])
        ns = [r["n_events"] for r in rows]
        for i, r in enumerate(rows):
            lo = max(0, i - 6)
            want = round(sum(ns[lo : i + 1]) / (i + 1 - lo), 6)
            assert r["ma7"] == pytest.approx(want, abs=1e-9)
