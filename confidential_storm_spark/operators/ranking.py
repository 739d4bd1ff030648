"""Relevance ranking over the documents table: TF-IDF weights and
BM25 top-k keyword search.

A training-data pipeline uses these two ways: (a) keyword search over
a crawled corpus ("find the docs about X" during curation debugging),
(b) TF-IDF vectors as cheap sparse features for quality classifiers
and near-dup triage.  Both are pure relational plans — tokenize,
explode, aggregate, broadcast-join the tiny term statistics — so
Catalyst keeps everything JVM-side with map-side partial aggregation.

Scale design (100 TB):
- The only wide shuffle is the ``groupBy(doc, term)`` term-frequency
  aggregation, keyed by document — skew-free (documents are
  hash-distributed) and map-side combinable.
- Per-term document frequencies for a keyword query are at most
  ``|query|`` rows — broadcast.  The corpus-wide scalar stats (N,
  avgdl) are one row — broadcast.  Neither re-shuffles the postings.
- Top-k is ``orderBy(...).limit(k)`` → Spark's TakeOrderedAndProject:
  per-partition heaps, no global sort.
- For full-corpus TF-IDF (``tfidf``) the df table is |vocab| rows;
  it stays a shuffle join only when the vocabulary is genuinely
  large — Spark's AQE converts it to broadcast when it measures
  small.

BM25 follows Robertson/Sparck-Jones with the non-negative
``ln(1 + (N - df + .5)/(df + .5))`` idf (the Lucene variant).  All
arithmetic is double-precision and engine-agnostic; per-document
scores are rounded AFTER the term sum (registry discipline: both
engines round identically so partial-sum order cannot flip a hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words, words_sql

__all__ = ["bm25_topk", "bm25_topk_sql", "tfidf", "tfidf_sql"]


def _doc_lengths(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("_id"), words(F.col(text_col)).alias("_ws")
    ).withColumn("_dl", F.size("_ws"))


def bm25_topk(
    df: DataFrame,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k docs for a bag-of-words query.

    Returns ``(doc_id, bm25)`` ordered by score desc then id (the id
    tiebreak makes the k-boundary deterministic across engines).
    """
    if not query_terms:
        raise ValueError("bm25_topk: query_terms must be non-empty")
    docs = _doc_lengths(df, text_col, id_col)
    # corpus scalars: one row, broadcast — never joins the postings
    stats = docs.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_dl").alias("_avgdl")
    )
    terms = (
        docs.select("_id", "_dl", F.explode("_ws").alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy("_id", "_dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("_df"))
    idf = F.log(
        (F.col("_n") - F.col("_df") + 0.5) / (F.col("_df") + 0.5) + 1.0
    )
    norm = F.col("tf") + k1 * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
    return (
        terms.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .withColumn("_s", idf * F.col("tf") * (k1 + 1.0) / norm)
        .groupBy("_id")
        .agg(F.round(F.sum("_s"), 6).alias("bm25"))
        .select(F.col("_id").alias(id_col), "bm25")
        .orderBy(F.desc("bm25"), id_col)
        .limit(k)
    )


def bm25_topk_sql(
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`bm25_topk` (identical tokenizer, idf,
    rounding, and tiebreak)."""
    if not query_terms:
        # the Spark twin raises too; an empty IN () is a SQL syntax error
        raise ValueError("bm25_topk_sql: query_terms must be non-empty")
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in query_terms)
    ws = words_sql(text_col)
    return f"""
WITH d AS (SELECT {id_col} AS _id, {ws} AS ws FROM {table}),
dl AS (SELECT _id, len(ws) AS _dl, ws FROM d),
stats AS (SELECT COUNT(*) AS _n, AVG(_dl) AS _avgdl FROM dl),
t AS (SELECT _id, _dl, unnest(ws) AS term FROM dl),
tf AS (SELECT _id, _dl, term, COUNT(*) AS tf FROM t
       WHERE term IN ({in_list}) GROUP BY _id, _dl, term),
dfreq AS (SELECT term, COUNT(*) AS _df FROM tf GROUP BY term)
SELECT _id AS {id_col},
       ROUND(SUM(ln((_n - _df + 0.5) / (_df + 0.5) + 1.0)
                 * tf * ({k1} + 1.0)
                 / (tf + {k1} * (1.0 - {b} + {b} * _dl / _avgdl))), 6) AS bm25
FROM tf JOIN dfreq USING (term) CROSS JOIN stats
GROUP BY _id
ORDER BY bm25 DESC, {id_col}
LIMIT {k}
"""


def tfidf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """Sparse TF-IDF weights, one row per (doc, term):
    ``(doc_id, term, tf, tfidf)`` with ``tfidf = tf * ln(N/df)``
    (raw-count tf, natural-log idf — the textbook form).

    ``min_df`` drops hapax noise terms before weighting.
    """
    docs = _doc_lengths(df, text_col, id_col)
    stats = docs.agg(F.count(F.lit(1)).alias("_n"))
    tf = (
        docs.select("_id", F.explode("_ws").alias("term"))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_df)
    )
    return (
        tf.join(dfreq, "term")
        .join(F.broadcast(stats))
        .select(
            F.col("_id").alias(id_col),
            "term",
            "tf",
            F.round(
                F.col("tf") * F.log(F.col("_n") / F.col("_df")), 6
            ).alias("tfidf"),
        )
    )


def tfidf_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> str:
    """DuckDB twin of :func:`tfidf`."""
    ws = words_sql(text_col)
    return f"""
WITH d AS (SELECT {id_col} AS _id, {ws} AS ws FROM {table}),
stats AS (SELECT COUNT(*) AS _n FROM d),
tf AS (SELECT _id, unnest(ws) AS term FROM d),
tfc AS (SELECT _id, term, COUNT(*) AS tf FROM tf GROUP BY _id, term),
dfreq AS (SELECT term, COUNT(*) AS _df FROM tfc GROUP BY term HAVING COUNT(*) >= {min_df})
SELECT _id AS {id_col}, term, tf,
       ROUND(tf * ln(CAST(_n AS DOUBLE) / _df), 6) AS tfidf
FROM tfc JOIN dfreq USING (term) CROSS JOIN stats
"""


def inverted_index(
    df: DataFrame,
    min_df: int = 5,
    max_df_ratio: float = 0.79,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materialize the posting-list relation ``(word, df, postings)``
    — the search-index build step of a curation warehouse (BM25/TF-IDF
    above SCORE against term stats; this op persists the index itself
    so lookups become a join, not a corpus scan).

    Two-pass on purpose: document frequencies are computed and pruned
    FIRST (``min_df`` kills hapax noise, ``max_df_ratio`` kills
    stopwords), and only surviving terms aggregate their posting
    arrays — so the giant stopword postings (the skewed keys: at 100 TB
    "the" would collect a posting per document) are never built.  The
    corpus-size scalar is a 1-row broadcast; both groupBys are
    map-side combinable and keyed by word (hash-distributed, pruned of
    the hot head by construction)."""
    dw = (
        df.select(F.col(id_col).alias("doc_id"), F.explode(words(F.col(text_col))).alias("word"))
        .distinct()
    )
    dfreq = dw.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    total = df.select(F.count(F.lit(1)).alias("_n"))
    kept = (
        dfreq.crossJoin(F.broadcast(total))
        .filter((F.col("df") >= min_df) & (F.col("df") <= F.lit(max_df_ratio) * F.col("_n")))
        .select("word", "df")
    )
    return (
        dw.join(kept, "word")
        .groupBy("word")
        .agg(
            F.first("df").alias("df"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias("postings"),
        )
        .orderBy("word")
    )


def inverted_index_sql(
    min_df: int = 5,
    max_df_ratio: float = 0.79,
    text_col: str = "text",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`inverted_index` (same prune-then-collect
    shape)."""
    ws = words_sql(text_col)
    return f"""
WITH dw AS (SELECT DISTINCT doc_id, word FROM
            (SELECT {id_col} AS doc_id, unnest({ws}) AS word FROM {table})),
dfreq AS (SELECT word, COUNT(*) AS df FROM dw GROUP BY word),
tot AS (SELECT COUNT(*) AS n FROM {table}),
kept AS (SELECT word, df FROM dfreq, tot
         WHERE df >= {min_df} AND df <= {max_df_ratio!r} * n)
SELECT k.word, k.df,
       array_to_string(list(d.doc_id ORDER BY d.doc_id), ',') AS postings
FROM kept k JOIN dw d USING (word)
GROUP BY k.word, k.df
ORDER BY k.word
"""
