"""Planted-case tests for the round-10 registry operators — the
oracle gate certifies values on the synthetic corpus; these pin the
SEMANTICS on corpora constructed to exercise each rule/branch."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, (t, lang, src) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


def _run(spark, tmp_path, df, qname):
    """Run a registry builder against a scratch sf_dir holding df as
    the documents table."""
    import confidential_storm_spark.plans.queries as Q

    d = str(tmp_path / qname)
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    return Q.QUERIES[qname].builder(spark, d)


def test_gopher_rules_each_rule_fires(spark, tmp_path):
    """Four planted docs, each failing exactly one rule; one doc
    passing all four."""
    good = "the quick brown fox and a dog " * 10  # long, stopworded, varied
    rows = [
        (good, "en", "s"),
        ("tiny doc", "en", "s"),                      # fails word count
        ("aaaaaaaaaaaaaa " * 40, "en", "s"),          # mean word len > 8
        ("zebra yak xylophone wolf vole umbrella trout snake rhino quail "
         * 5, "en", "s"),                             # no stopwords
        (("the " * 120) + "word dog cat fox run sun " * 5, "en", "s"),  # top word > 1/5
    ]
    out = {r.source: r for r in _run(spark, tmp_path, _docs(spark, rows), "docs_gopher_rules").collect()}
    r = out["s"]
    assert r.n_docs == 5
    assert r.pass_wordcount == 4   # only the tiny doc fails
    assert r.pass_all == 1         # only the good doc passes everything


def test_keyness_sign_and_symmetry(spark, tmp_path):
    """A word exclusive to the en slice gets positive keyness, an
    exclusive non-en word negative, and a balanced word sits near 0."""
    rows = [
        ("shared english english", "en", "s"),
        ("shared french french", "fr", "s"),
    ]
    got = {r.word: r for r in _run(spark, tmp_path, _docs(spark, rows), "text_keyness").collect()}
    assert got["english"].keyness > 0 > got["french"].keyness
    assert abs(got["shared"].keyness) < abs(got["english"].keyness)
    # smoothed log-odds replicated by hand for the en-exclusive word
    te = 3  # en tokens: shared, english, english
    tr = 3
    want = math.log((2 + 0.5) / (te - 2 + 0.5)) - math.log(0.5 / (tr + 0.5))
    assert got["english"].keyness == pytest.approx(round(want, 6), abs=1e-6)


def test_padding_waste_exact_accounting(spark, tmp_path):
    """Token counts planted on bucket boundaries: waste must be the
    exact capacity difference, overflow docs clamp into the last
    bucket."""
    import confidential_storm_spark.plans.queries as Q

    rows = [
        ("w " * 16, "en", "s"),    # exactly 16 tokens -> bucket 16, zero pad
        ("w " * 17, "en", "s"),    # 17 -> bucket 32, pad 15
        ("w " * 999, "en", "s"),   # overflow -> clamped to last bucket
    ]
    out = {r.bucket: r for r in _run(spark, tmp_path, _docs(spark, rows), "pack_padding_waste").collect()}
    assert out[16].padding_tokens == 0 and out[16].waste_share == 0.0
    assert out[32].padding_tokens == 15
    last = Q._PACK_BUCKETS[-1]
    assert out[last].total_tokens == 999
    assert out[last].padding_tokens == 0  # clamped: capacity == clamped mass


def test_neyman_allocation_proportional_to_n_sigma(spark, tmp_path):
    """Two strata, one with zero variance: the constant stratum gets
    zero labels, the varying one the whole budget."""
    import confidential_storm_spark.plans.queries as Q

    rows = (
        [("x" * 100, "en", "flat")] * 4
        + [("x" * n, "en", "vary") for n in (10, 400, 10, 400)]
    )
    out = {r.source: r for r in _run(spark, tmp_path, _docs(spark, rows), "sample_neyman").collect()}
    assert out["flat"].sigma_chars == 0.0 and out["flat"].n_alloc == 0.0
    assert out["vary"].n_alloc == pytest.approx(Q._NEYMAN_BUDGET, abs=1e-6)


def test_zorder_buckets_partition_and_span(spark, sf_dir):
    """Every order lands in exactly one bucket, bucket ids cover the
    6-bit range, and z-ordering bounds BOTH spans vs the linear-sort
    worst case (a date-sorted layout leaves custkey spans ~full)."""
    import confidential_storm_spark.plans.queries as Q

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rows = Q.QUERIES["q_zorder_layout"].builder(spark, sf_dir).collect()
    assert sum(r.n_rows for r in rows) == orders.count()
    assert all(0 <= r.z_bucket < 64 for r in rows)
    ck_lo = orders.agg(F.min("o_custkey"), F.max("o_custkey")).first()
    full_span = ck_lo[1] - ck_lo[0]
    # median bucket's custkey span is a small fraction of the full range
    spans = sorted(r.ck_span for r in rows)
    assert spans[len(spans) // 2] <= full_span / 2


def test_reservoir_matches_duckdb_twin_on_planted(spark, tmp_path):
    """sample_reservoir == its own DuckDB twin on a planted table, and
    is invariant to row order (hash-determined)."""
    import duckdb

    import confidential_storm_spark.plans.queries as Q

    rows = [(f"doc {i}", "en", f"s{i % 3}") for i in range(60)]
    df = _docs(spark, rows)
    d = str(tmp_path / "resv")
    df.orderBy(F.desc("doc_id")).coalesce(1).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    got = [tuple(r) for r in Q.QUERIES["sample_reservoir"].builder(spark, d).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'")
    want = [tuple(r) for r in con.execute(Q.QUERIES["sample_reservoir"].oracle).fetchall()]
    assert got == want and len(got) == 3 * Q._RESERVOIR_K
