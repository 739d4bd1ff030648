"""Curation-funnel pipeline: monotone stage counts, stage semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# lang-ID markers are corpus-vocabulary words (en: the/order/table);
# > 200 chars so the length stage keeps it
GOOD_EN = (
    "the quick brown fox jumps over that lazy dog near an order of owls "
    "and then runs far away into one green forest table where many small "
    "animals live happily together under big trees beside quiet rivers "
    "watching bright stars"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_funnel_counts_monotone_and_dedup_cuts(spark):
    from confidential_storm_spark.operators.funnel import curation_funnel

    docs = _docs(
        spark,
        [
            (1, GOOD_EN, "en"),
            (2, GOOD_EN, "en"),                 # exact dup of 1 -> cut at dedup
            (3, "the order table " * 16, "en"),  # repetitive -> cut
            (4, "xx yy zz", "en"),               # too short -> cut at quality
            (5, GOOD_EN + " extra tail words here", "fr"),  # lang mismatch
        ],
    )
    rows = curation_funnel(docs).collect()
    counts = {r["stage"]: r["n_docs"] for r in rows}
    order = [r["n_docs"] for r in sorted(rows, key=lambda r: r["stage_idx"])]
    assert order == sorted(order, reverse=True)  # monotone funnel
    assert counts["input"] == 5
    assert counts["lang_match"] == 4            # doc 5 mispredicted vs label
    assert counts["quality"] == 3               # doc 4 too short
    assert counts["repetition"] == 2            # doc 3 repetitive
    assert counts["dedup"] == 1                 # doc 2 is a dup of doc 1
    assert counts["length"] == 1


def test_funnel_single_aggregation_plan(spark):
    """The dashboard must cost ONE scalar aggregation, not a count()
    job per stage: the optimized plan contains no more exchanges than
    the doc_id-keyed feature joins plus the final single-row agg."""
    from confidential_storm_spark.operators.funnel import curation_funnel

    docs = _docs(spark, [(1, GOOD_EN, "en")])
    plan = curation_funnel(docs)._jdf.queryExecution().optimizedPlan().toString()
    # one Aggregate over the conjunction sums + one per feature op;
    # crucially NO per-stage scans: the documents relation is read a
    # bounded number of times (features), not once per stage
    assert plan.count("LocalRelation") + plan.count("LogicalRDD") <= 6


def test_funnel_non_default_column_names(spark):
    """id_col / text_col / lang_col are threaded through every stage
    (they were once silently hardcoded to doc_id/lang)."""
    from confidential_storm_spark.operators.funnel import curation_funnel

    docs = _docs(
        spark, [(1, GOOD_EN, "en"), (2, GOOD_EN, "en"), (3, "xx yy", "en")]
    ).select(
        F.col("doc_id").alias("docid"),
        F.col("text").alias("body"),
        F.col("lang").alias("language"),
    )
    rows = curation_funnel(
        docs, text_col="body", id_col="docid", lang_col="language"
    ).collect()
    counts = {r["stage"]: r["n_docs"] for r in rows}
    assert counts["input"] == 3
    assert counts["dedup"] == 1
