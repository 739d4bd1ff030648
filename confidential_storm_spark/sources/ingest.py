"""Raw-text ingestion sources: JSONL / CSV with corrupt-record
quarantine.

Real document corpora arrive as JSONL (one doc per line) or CSV long
before they are parquet; the ingestion contract that matters at scale
is what happens to the MALFORMED 0.1% — a 100 TB read must never die
on one broken line, and silently dropping lines is unauditable.
Spark-first: PERMISSIVE parsing with an explicit
``columnNameOfCorruptRecord`` routes every unparseable line into a
quarantine column, so one pass yields both the clean relation and the
reject audit (count, raw payloads) — the standard
bronze-layer pattern.

Note Spark's restriction: a query may not reference ONLY the corrupt
column of a just-parsed relation; :func:`split_corrupt` materializes
via the row-count check so both halves are queryable independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_documents_jsonl", "read_documents_csv", "split_corrupt"]

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _with_corrupt(schema: str) -> str:
    return f"{schema}, {CORRUPT_COL} string"


def read_documents_jsonl(
    spark: SparkSession, path: str, schema: str = DOCUMENTS_SCHEMA
) -> DataFrame:
    """JSONL documents with quarantine: clean rows carry null
    ``_corrupt_record``; unparseable lines carry the raw line there
    (and nulls elsewhere).  Explicit schema — never infer on a large
    read (inference is a full extra pass)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def read_documents_csv(
    spark: SparkSession,
    path: str,
    schema: str = DOCUMENTS_SCHEMA,
    header: bool = True,
) -> DataFrame:
    """CSV twin of :func:`read_documents_jsonl` (same quarantine
    contract)."""
    return (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .csv(path)
    )


def split_corrupt(
    parsed: DataFrame, return_source: bool = False
) -> tuple[DataFrame, ...]:
    """Split a quarantined read into ``(clean, rejects)``: clean rows
    without the quarantine column, rejects as ``(raw)`` payloads for
    the audit sink.  Caches the parsed relation first — Spark forbids
    selecting only the corrupt column straight off the parser, and the
    cache also makes the two downstream passes share one parse.

    Long-lived sessions should pass ``return_source=True`` to also
    receive the CACHED parsed relation and ``unpersist()`` it once
    both halves are consumed — unpersisting a derived half does not
    release the source cache."""
    parsed = parsed.cache()
    parsed.count()  # materialize so both halves are independently queryable
    clean = parsed.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    rejects = parsed.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw")
    )
    if return_source:
        return clean, rejects, parsed
    return clean, rejects
