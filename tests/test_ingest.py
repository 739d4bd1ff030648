"""JSONL/CSV ingestion with corrupt-record quarantine."""

from __future__ import annotations


def test_jsonl_quarantine_routes_broken_lines(spark, tmp_path):
    from confidential_storm_spark.sources.ingest import (
        read_documents_jsonl,
        split_corrupt,
    )

    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "web", "n_chars": 11}\n'
        'this is not json at all\n'
        '{"doc_id": 2, "text": "hola", "lang": "es", "source": "web", "n_chars": 4}\n'
        '{"doc_id": 3, "text": "truncated...\n'
    )
    clean, rejects, source = split_corrupt(
        read_documents_jsonl(spark, str(p)), return_source=True
    )
    try:
        rows = {r["doc_id"]: r["text"] for r in clean.collect()}
        assert rows == {1: "hello world", 2: "hola"}
        assert "_corrupt_record" not in clean.columns
        raw = sorted(r["raw"] for r in rejects.collect())
        assert len(raw) == 2
        assert "this is not json at all" in raw
    finally:
        source.unpersist()


def test_csv_quarantine_routes_bad_rows(spark, tmp_path):
    from confidential_storm_spark.sources.ingest import (
        read_documents_csv,
        split_corrupt,
    )

    p = tmp_path / "docs.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello world,en,web,11\n"
        "not_a_number,broken,en,web,zz\n"
        "2,hola,es,web,4\n"
    )
    clean, rejects, source = split_corrupt(
        read_documents_csv(spark, str(p)), return_source=True
    )
    try:
        assert {r["doc_id"] for r in clean.collect()} == {1, 2}
        assert rejects.count() == 1
    finally:
        source.unpersist()
