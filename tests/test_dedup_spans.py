"""Span-level dedup: planted shared spans, df-cap bounds."""

from __future__ import annotations

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_shared_span_pairs_finds_planted_span(spark):
    from confidential_storm_spark.operators.dedup import shared_span_pairs

    span = "one two three four five"
    docs = _docs(
        spark,
        [
            (1, f"alpha beta {span} gamma"),
            (2, f"delta {span} epsilon zeta"),
            (3, "totally different words with no overlap at all here"),
            (4, f"{span} six seven"),
        ],
    )
    rows = {
        (r["id_a"], r["id_b"]): r["n_shared_spans"]
        for r in shared_span_pairs(docs, span_n=5, max_span_df=None).collect()
    }
    assert rows == {(1, 2): 1, (1, 4): 1, (2, 4): 1}


def test_shared_span_pairs_counts_distinct_spans(spark):
    from confidential_storm_spark.operators.dedup import shared_span_pairs

    text = "a b c d e f"  # two 5-spans: 'a b c d e', 'b c d e f'
    docs = _docs(spark, [(1, text), (2, text)])
    rows = shared_span_pairs(docs, span_n=5, max_span_df=None).collect()
    assert len(rows) == 1 and rows[0]["n_shared_spans"] == 2


def test_shared_span_pairs_short_docs_emit_nothing(spark):
    from confidential_storm_spark.operators.dedup import shared_span_pairs

    docs = _docs(spark, [(1, "only four words here"), (2, "only four words here")])
    assert shared_span_pairs(docs, span_n=5).count() == 0


def test_shared_span_pairs_df_cap_bounds_hot_span(spark):
    from confidential_storm_spark.operators.dedup import shared_span_pairs

    # one boilerplate span in 30 docs -> 435 pairs uncapped; the cap
    # drops the hot span from the postings entirely
    docs = _docs(spark, [(i, "common header line repeated verbatim") for i in range(30)])
    assert shared_span_pairs(docs, span_n=5, max_span_df=None).count() == 435
    assert shared_span_pairs(docs, span_n=5, max_span_df=10).count() == 0


def test_shared_span_pairs_capped_sql_twin_matches(spark):
    """The registry certifies the CAPPED path (round-5): the DuckDB
    twin's HAVING-df cap must reproduce the operator's capped
    semantics exactly on a corpus where the cap actually engages —
    hot boilerplate spans dropped, legit shared spans kept."""
    import duckdb

    from confidential_storm_spark.operators.dedup import (
        shared_span_pairs,
        shared_span_pairs_sql,
    )

    span = "one two three four five"
    rows = [(i, f"common header line repeated verbatim tail{i}") for i in range(30)]
    rows += [
        (100, f"alpha beta {span} gamma"),
        (101, f"delta {span} epsilon zeta"),
    ]
    docs = _docs(spark, rows)
    got = {
        (r["id_a"], r["id_b"], r["n_shared_spans"])
        for r in shared_span_pairs(docs, span_n=5, max_span_df=10).collect()
    }
    # the hot 'common header line repeated verbatim' span (df=30 > 10)
    # leaves the postings; the planted span (df=2) survives
    assert got == {(100, 101, 1)}

    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    sql = shared_span_pairs_sql(span_n=5, max_span_df=10)
    oracle = {tuple(t) for t in con.execute(sql).fetchall()}
    assert got == oracle

    # uncapped twin agrees with the uncapped operator on the same corpus
    got_uncapped = {
        (r["id_a"], r["id_b"], r["n_shared_spans"])
        for r in shared_span_pairs(docs, span_n=5, max_span_df=None).collect()
    }
    oracle_uncapped = {
        tuple(t)
        for t in con.execute(shared_span_pairs_sql(span_n=5)).fetchall()
    }
    assert got_uncapped == oracle_uncapped
    assert len(got_uncapped) == 30 * 29 // 2 + 1


def test_span_rewrite_semantics(spark):
    from confidential_storm_spark.operators.dedup import span_rewrite

    rows = [
        (1, "alpha beta gamma delta epsilon zeta"),       # owner: keeps all
        (2, "intro words alpha beta gamma delta epsilon tail piece"),
        (3, "alpha beta gamma delta epsilon"),            # fully covered
        (4, "completely unrelated text with six words"),  # untouched
        (5, ""),                                          # empty passthrough
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.n_removed, r.text_clean) for r in span_rewrite(df, span_n=5).collect()}
    assert got[1] == (6, 0, "alpha beta gamma delta epsilon zeta")   # min-id owner keeps
    assert got[2] == (9, 5, "intro words tail piece")                # interior span cut
    assert got[3] == (5, 5, "")                                      # fully-covered doc survives as a row
    assert got[4] == (6, 0, "completely unrelated text with six words")
    assert got[5] == (0, 0, "")


def test_span_rewrite_within_doc_repeats_not_cut(spark):
    from confidential_storm_spark.operators.dedup import span_rewrite

    # the span repeats INSIDE one doc only -> cross-doc rule leaves it
    rows = [(1, "one two three four five and one two three four five")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = span_rewrite(df, span_n=5).collect()[0]
    assert r["n_removed"] == 0


def test_span_rewrite_untouched_docs_roundtrip_words(spark):
    from confidential_storm_spark.functions.text import words
    from confidential_storm_spark.operators.dedup import span_rewrite
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = span_rewrite(docs)
    base = docs.select("doc_id", F.concat_ws(" ", words(F.col("text"))).alias("w"))
    joined = out.join(base, "doc_id")
    # every zero-removal doc reconstructs its full word stream exactly
    assert joined.filter((F.col("n_removed") == 0) & (F.col("text_clean") != F.col("w"))).count() == 0
    # and removals are consistent: n_words - n_removed == rebuilt word count
    assert (
        joined.filter(
            F.size(F.split(F.col("text_clean"), " ")) - F.when(F.col("text_clean") == "", 1).otherwise(0)
            != F.col("n_words") - F.col("n_removed")
        ).count()
        == 0
    )
