"""Sliding-window chunking invariants."""

from __future__ import annotations

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_windows_cover_and_overlap(spark):
    from confidential_storm_spark.operators.chunking import chunk_documents

    words = " ".join(f"w{i}" for i in range(10))
    docs = _docs(spark, [(1, words)])
    rows = sorted(
        chunk_documents(docs, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r["chunk_id"],
    )
    # stride 2 over 10 tokens: starts 0,2,4,6,8
    assert [r["start_tok"] for r in rows] == [0, 2, 4, 6, 8]
    assert [r["n_tokens"] for r in rows] == [4, 4, 4, 4, 2]
    assert rows[0]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[1]["chunk_text"] == "w2 w3 w4 w5"   # 2-token overlap
    assert rows[-1]["chunk_text"] == "w8 w9"        # short tail


def test_chunk_small_doc_single_chunk_and_empty_skipped(spark):
    from confidential_storm_spark.operators.chunking import chunk_documents

    docs = _docs(spark, [(1, "a b c"), (2, "   ")])
    rows = chunk_documents(docs, chunk_tokens=8, overlap=2).collect()
    assert len(rows) == 1
    assert rows[0]["doc_id"] == 1 and rows[0]["n_tokens"] == 3


def test_chunk_rejects_bad_overlap(spark):
    from confidential_storm_spark.operators.chunking import chunk_documents

    docs = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_tokens=4, overlap=4)
