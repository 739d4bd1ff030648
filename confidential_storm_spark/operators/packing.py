"""Sequence packing — assign documents to fixed token-budget training
sequences (the "pack" step that turns a filtered corpus into
uniform-length pretraining examples).

Semantics: documents are laid end-to-end in a deterministic order and
cut every ``budget`` tokens; a document belongs to the pack where its
FIRST token lands (greedy concat-and-chunk, the streaming packer every
data loader implements).  The assignment is a pure prefix-sum:

    pack_id = floor(exclusive_running_sum(tokens) / budget)

Spark-first shape: one window prefix-sum **partitioned by a shard
column** (here the language; at 100 TB, a (source, shard) bucket) —
each shard packs independently and in parallel, so there is no global
ordering bottleneck: the plan is scan -> one shuffle on the shard key
-> running_sum -> map-side pack aggregation.  A single global pack
order would serialize 100 TB through one task — that is exactly what
partition-local packing avoids, and cross-shard packs are worthless
anyway (a loader reads shards independently).

Determinism: ordering by a unique id column makes the assignment
reproducible across runs and engines — the DuckDB oracle recomputes
the identical prefix sums.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count

__all__ = ["pack_assign", "pack_stats", "pack_stats_sql"]


def pack_assign(
    df: DataFrame,
    budget: int,
    shard_col: str = "lang",
    order_col: str = "doc_id",
    tokens: Column | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Add ``n_tokens``, ``pack_id`` (within-shard), and
    ``pack_offset`` (the doc's first-token offset inside the shard's
    token stream) to ``df``."""
    toks = tokens if tokens is not None else token_count(F.col(text_col))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (
        df.withColumn("n_tokens", toks.cast("long"))
        .withColumn("pack_offset", prev)
        .withColumn("pack_id", F.floor(F.col("pack_offset") / budget))
    )


def pack_stats(
    df: DataFrame,
    budget: int,
    shard_col: str = "lang",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(shard, pack) summary: docs packed, token total, and fill
    ratio vs the budget (interior packs fill ~1.0 + the spill of the
    doc straddling the cut; the shard's last pack trails off)."""
    return (
        pack_assign(df, budget, shard_col, order_col, text_col=text_col)
        .groupBy(shard_col, "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.round(F.sum("n_tokens") / budget, 6).alias("fill_ratio"),
        )
    )


def pack_stats_sql(
    budget: int,
    shard_col: str = "lang",
    order_col: str = "doc_id",
    words_expr: str | None = None,
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`pack_stats` (identical prefix sums)."""
    from ..functions.text import words_sql

    we = words_expr or words_sql("text")
    return f"""
WITH toks AS (
    SELECT {shard_col}, {order_col}, CAST(len({we}) AS BIGINT) AS n_tokens
    FROM {table}
),
assigned AS (
    SELECT {shard_col}, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY {shard_col} ORDER BY {order_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           // {budget} AS pack_id
    FROM toks
)
SELECT {shard_col}, pack_id,
       COUNT(*)                                  AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT)             AS pack_tokens,
       ROUND(SUM(n_tokens) * 1.0 / {budget}, 6)  AS fill_ratio
FROM assigned
GROUP BY {shard_col}, pack_id
"""
