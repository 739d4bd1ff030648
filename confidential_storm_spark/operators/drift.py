"""Corpus distribution drift: smoothed vocabulary KL divergence.

The mixture-tuning monitor a training-data pipeline runs when a
source is added or reweighted: how far has the token distribution
moved, and WHICH tokens moved it.  KL(P || Q) over word unigrams with
add-alpha smoothing on the union vocabulary (so q = 0 never blows
up), reported as the top-k per-token contributions
``p * ln(p / q)`` — the terms that sum to the divergence.

Scale shape: one explode -> groupBy per side (map-side combined,
uniform word keys), a full-outer join of the two count relations on
the word, and three broadcast scalars (vocabulary size, token
totals).  All counts are exact integers; the double arithmetic is a
single identical expression tree per row in both engines, rounded to
6 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words, words_sql

__all__ = ["vocab_kl_topk", "vocab_kl_topk_sql"]


def _word_counts(df: DataFrame, text_col: str, out: str) -> DataFrame:
    return (
        df.select(F.explode(words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias(out))
    )


def vocab_kl_topk(
    df_p: DataFrame,
    df_q: DataFrame,
    text_col: str = "text",
    alpha: float = 0.5,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` tokens by contribution to KL(P || Q), where P/Q are
    the add-``alpha``-smoothed word distributions of the two corpora.
    Returns ``(w, n_p, n_q, contrib)`` ordered by contribution desc
    then word (deterministic k-boundary); ``contrib`` can be negative
    for tokens over-represented in Q."""
    cp = _word_counts(df_p, text_col, "n_p")
    cq = _word_counts(df_q, text_col, "n_q")
    joined = cp.join(cq, "w", "full_outer").select(
        "w",
        F.coalesce("n_p", F.lit(0)).alias("n_p"),
        F.coalesce("n_q", F.lit(0)).alias("n_q"),
    )
    scalars = joined.agg(
        F.count(F.lit(1)).alias("_v"),
        F.sum("n_p").alias("_tp"),
        F.sum("n_q").alias("_tq"),
    )
    p = (F.col("n_p") + F.lit(alpha)) / (F.col("_tp") + F.lit(alpha) * F.col("_v"))
    q = (F.col("n_q") + F.lit(alpha)) / (F.col("_tq") + F.lit(alpha) * F.col("_v"))
    return (
        joined.join(F.broadcast(scalars))
        .select("w", "n_p", "n_q", F.round(p * F.log(p / q), 6).alias("contrib"))
        .orderBy(F.desc("contrib"), "w")
        .limit(k)
    )


def vocab_kl_topk_sql(
    p_where: str,
    q_where: str,
    table: str = "documents",
    text_col: str = "text",
    alpha: float = 0.5,
    k: int = 20,
) -> str:
    """DuckDB twin of :func:`vocab_kl_topk` for P/Q defined by WHERE
    clauses over the same table."""
    ws = words_sql(text_col)
    return f"""
WITH cp AS (SELECT w, COUNT(*) AS n_p
            FROM (SELECT unnest({ws}) AS w FROM {table} WHERE {p_where}) GROUP BY w),
cq AS (SELECT w, COUNT(*) AS n_q
       FROM (SELECT unnest({ws}) AS w FROM {table} WHERE {q_where}) GROUP BY w),
j AS (SELECT COALESCE(cp.w, cq.w) AS w,
             COALESCE(n_p, 0) AS n_p, COALESCE(n_q, 0) AS n_q
      FROM cp FULL OUTER JOIN cq ON cp.w = cq.w),
s AS (SELECT COUNT(*) AS v, SUM(n_p) AS tp, SUM(n_q) AS tq FROM j)
SELECT w, CAST(n_p AS BIGINT) AS n_p, CAST(n_q AS BIGINT) AS n_q,
       ROUND(((n_p + {alpha}) / (tp + {alpha} * v))
             * ln(((n_p + {alpha}) / (tp + {alpha} * v))
                  / ((n_q + {alpha}) / (tq + {alpha} * v))), 6) AS contrib
FROM j CROSS JOIN s
ORDER BY contrib DESC, w
LIMIT {k}
"""
