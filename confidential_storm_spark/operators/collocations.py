"""Corpus n-gram statistics: PMI collocations and distinct-n diversity.

Two corpus-health operators a training-data pipeline runs alongside
dedup (beyond the reference's operator set, like the rest of the
curation family):

- :func:`collocations_pmi` — top-k adjacent word pairs by pointwise
  mutual information (Church & Hanks 1990), the standard collocation /
  multi-word-expression extractor and a building block for
  tokenizer-vocabulary induction.
- :func:`ngram_diversity` — distinct-n: the fraction of n-gram
  occurrences that are distinct, per group (Li et al. 2016,
  arXiv:1510.03055 use it for generation diversity; over a corpus it
  flags template-heavy or repetitive sources).

Scale shape: both are explode -> groupBy chains (partial aggregation
map-side, uniform hash keys), one scan each; the PMI join brings the
two unigram count columns to the bigram rows via two joins on the
word — broadcast-sized for natural vocabularies (vocabulary grows
~O(sqrt(corpus)), Heaps' law) and a plain shuffle join beyond that.
All arithmetic is exact integers plus one final rounded double, so
the DuckDB twins reproduce identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words, words_sql

__all__ = [
    "collocations_pmi",
    "collocations_pmi_sql",
    "ngram_diversity",
    "ngram_diversity_sql",
]


def collocations_pmi(
    df: DataFrame,
    text_col: str = "text",
    k: int = 20,
    min_count: int = 5,
) -> DataFrame:
    """Top-``k`` adjacent word bigrams by PMI:
    ``pmi = ln(c_xy * N / (c_x * c_y))`` over corpus token counts,
    keeping bigrams with ``c_xy >= min_count`` (the classic low-count
    PMI blowup guard).  Returns ``(w1, w2, n_pair, pmi)`` ordered by
    pmi desc then words (deterministic k-boundary)."""
    ws = words(F.col(text_col))
    toks = df.select(ws.alias("_ws"))
    unigrams = (
        toks.select(F.explode("_ws").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    total = unigrams.agg(F.sum("c_w").alias("n_tokens"))
    bigram_arr = F.when(
        F.size("_ws") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_ws") - 1),
            lambda i: F.struct(
                F.element_at("_ws", i).alias("w1"),
                F.element_at("_ws", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bigrams = (
        toks.select(F.explode(bigram_arr).alias("bg"))
        .select("bg.w1", "bg.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    u1 = unigrams.select(F.col("w").alias("w1"), F.col("c_w").alias("c_1"))
    u2 = unigrams.select(F.col("w").alias("w2"), F.col("c_w").alias("c_2"))
    return (
        bigrams.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .join(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    F.col("n_pair").cast("double")
                    * F.col("n_tokens")
                    / (F.col("c_1").cast("double") * F.col("c_2"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(k)
    )


def collocations_pmi_sql(
    k: int = 20,
    min_count: int = 5,
    table: str = "documents",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`collocations_pmi`."""
    ws = words_sql(text_col)
    return f"""
WITH t AS (SELECT {ws} AS ws FROM {table}),
u AS (SELECT w, COUNT(*) AS c_w
      FROM (SELECT unnest(ws) AS w FROM t) GROUP BY w),
n AS (SELECT SUM(c_w) AS n_tokens FROM u),
bg AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2
  FROM (SELECT ws, unnest(range(1, len(ws))) AS i FROM t WHERE len(ws) >= 2)
),
bc AS (SELECT w1, w2, COUNT(*) AS n_pair FROM bg GROUP BY w1, w2
       HAVING COUNT(*) >= {min_count})
SELECT w1, w2, n_pair,
       ROUND(ln(CAST(n_pair AS DOUBLE) * n_tokens
                / (CAST(u1.c_w AS DOUBLE) * u2.c_w)), 6) AS pmi
FROM bc
JOIN u u1 ON bc.w1 = u1.w
JOIN u u2 ON bc.w2 = u2.w
CROSS JOIN n
ORDER BY pmi DESC, w1, w2
LIMIT {k}
"""


def ngram_diversity(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    max_n: int = 3,
) -> DataFrame:
    """Distinct-n diversity per ``group_col``: for n = 1..``max_n``,
    the number of n-gram occurrences, the number of distinct n-grams,
    and their ratio.  Low distinct-frac at n >= 2 is the template /
    boilerplate signature.  Returns
    ``(group, n, total_ngrams, distinct_ngrams, distinct_frac)``.

    One scan: the n dimension is generated inline (posexplode over the
    per-n gram arrays), then a single two-level aggregation."""
    ws = words(F.col(text_col))
    per_n = F.transform(
        F.sequence(F.lit(1), F.lit(max_n)),
        lambda n: F.when(
            F.size(ws) >= n,
            F.transform(
                F.sequence(F.lit(1), F.size(ws) - n + 1),
                lambda i: F.concat_ws(" ", F.slice(ws, i, n)),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )
    grams = (
        df.select(F.col(group_col).alias("grp"), F.posexplode(per_n).alias("_pos", "_garr"))
        .select("grp", (F.col("_pos") + 1).alias("n"), F.explode("_garr").alias("g"))
    )
    counts = grams.groupBy("grp", "n", "g").agg(F.count(F.lit(1)).alias("c"))
    return (
        counts.groupBy("grp", "n")
        .agg(
            F.sum("c").alias("total_ngrams"),
            F.count(F.lit(1)).alias("distinct_ngrams"),
        )
        .select(
            F.col("grp").alias("source"),
            F.col("n").cast("long").alias("n"),
            "total_ngrams",
            "distinct_ngrams",
            F.round(F.col("distinct_ngrams") / F.col("total_ngrams"), 6).alias(
                "distinct_frac"
            ),
        )
        .orderBy("source", "n")
    )


def ngram_diversity_sql(
    table: str = "documents",
    text_col: str = "text",
    group_col: str = "source",
    max_n: int = 3,
) -> str:
    """DuckDB twin of :func:`ngram_diversity`."""
    ws = words_sql(text_col)
    return f"""
WITH t AS (SELECT {group_col} AS grp, {ws} AS ws FROM {table}),
g AS (
  SELECT grp, n, array_to_string(ws[i:i+n-1], ' ') AS g
  FROM (SELECT grp, ws, unnest(range(1, {max_n} + 1)) AS n FROM t),
       LATERAL (SELECT unnest(range(1, len(ws) - n + 2)) AS i)
  WHERE len(ws) >= n
),
c AS (SELECT grp, n, g, COUNT(*) AS c FROM g GROUP BY grp, n, g)
SELECT grp AS source, CAST(n AS BIGINT) AS n,
       CAST(SUM(c) AS BIGINT) AS total_ngrams,
       CAST(COUNT(*) AS BIGINT) AS distinct_ngrams,
       ROUND(COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS distinct_frac
FROM c GROUP BY grp, n ORDER BY source, n
"""
