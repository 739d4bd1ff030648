"""Document chunking: sliding fixed-size token windows with overlap —
the unit-of-training transform (pretraining context windows, RAG
passage extraction) that complements sequence packing
(:mod:`.packing` concatenates small docs; this splits large ones).

Chunk k of a doc covers tokens ``[k*stride, k*stride + chunk_tokens)``
with ``stride = chunk_tokens - overlap``; every start strictly inside
the doc yields a chunk, the last one possibly short.  Deterministic,
per-row, no shuffle: the explode happens inside the scan projection,
so a 100 TB corpus chunks at full scan speed with column pruning
intact (only id + text are read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words, words_sql

__all__ = ["chunk_documents", "chunk_documents_sql"]


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per chunk: ``(doc_id, chunk_id, start_tok, n_tokens,
    chunk_text)``; empty docs yield no chunks."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    ws = words(F.col(text_col))
    starts = F.sequence(F.lit(0), F.size(ws) - 1, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s, k: F.struct(
            k.alias("chunk_id"),
            s.alias("start_tok"),
            F.least(F.size(ws) - s, F.lit(chunk_tokens)).alias("n_tokens"),
            F.concat_ws(" ", F.slice(ws, s + 1, chunk_tokens)).alias("chunk_text"),
        ),
    )
    return (
        df.filter(F.size(ws) > 0)
        .select(F.col(id_col), F.explode(chunks).alias("_c"))
        .select(
            id_col,
            F.col("_c.chunk_id").alias("chunk_id"),
            F.col("_c.start_tok").alias("start_tok"),
            F.col("_c.n_tokens").alias("n_tokens"),
            F.col("_c.chunk_text").alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    chunk_tokens: int = 64,
    overlap: int = 16,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`chunk_documents`."""
    stride = chunk_tokens - overlap
    ws = words_sql(text_col)
    return f"""
WITH _w AS (SELECT {id_col}, {ws} AS ws FROM {table}),
_starts AS (
  SELECT {id_col}, ws, unnest(range(0, len(ws), {stride})) AS start_tok
  FROM _w WHERE len(ws) > 0
)
SELECT {id_col},
       CAST(start_tok / {stride} AS INTEGER) AS chunk_id,
       CAST(start_tok AS INTEGER) AS start_tok,
       CAST(LEAST(len(ws) - start_tok, {chunk_tokens}) AS INTEGER) AS n_tokens,
       array_to_string(ws[start_tok + 1 : start_tok + {chunk_tokens}], ' ') AS chunk_text
FROM _starts
"""
