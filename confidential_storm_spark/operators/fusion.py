"""Reciprocal-rank fusion — the standard hybrid-retrieval combiner
(Cormack, Clarke & Buettcher, SIGIR 2009): fuse N rankings of the
same id space with ``score(d) = sum_i 1 / (c + rank_i(d))``.  The
canonical use is lexical + vector hybrid search (BM25 top-k fused
with cosine kNN top-k) — rank-based fusion needs no score
calibration between incomparable scales, which is why every hybrid
search stack defaults to it.

Determinism/scale notes: inputs are top-k lists (bounded, k rows), so
ranks are computed with a k^2 self-join — count of strictly-better
rows plus an id tiebreak — rather than a single-partition global
window (the no-unpartitioned-WindowExec rule this codebase pins;
for k <= a few hundred the join is trivially cheap and
partition-layout invariant).  RRF scores are sums of <= N rational
terms, identical across engines; the DuckDB twin reproduces them
bit-for-bit under the 6-decimal rounding contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_rank", "rrf_fuse", "rrf_fuse_sql"]


def with_rank(df: DataFrame, id_col: str, score_col: str) -> DataFrame:
    """(id, rank) with rank 1-based by ``score_col`` desc, id asc on
    ties — via the bounded better-row count, no global window."""
    a, b = df.alias("_ra"), df.alias("_rb")
    better = (F.col(f"_rb.{score_col}") > F.col(f"_ra.{score_col}")) | (
        (F.col(f"_rb.{score_col}") == F.col(f"_ra.{score_col}"))
        & (F.col(f"_rb.{id_col}") < F.col(f"_ra.{id_col}"))
    )
    return (
        a.join(b, better, "left")
        .groupBy(F.col(f"_ra.{id_col}").alias(id_col))
        .agg((F.count(F.col(f"_rb.{id_col}")) + 1).alias("rank"))
    )


def rrf_fuse(
    rankings: list[tuple[DataFrame, str]],
    id_col: str,
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Fuse ``[(df, score_col), ...]`` rankings over a shared
    ``id_col``: returns ``(id_col, rrf)`` — the top-k by summed
    reciprocal ranks (ids missing from a ranking contribute nothing
    for it, the standard convention for top-k inputs)."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    parts = [
        with_rank(df, id_col, score_col).select(
            id_col, (1.0 / (F.col("rank") + F.lit(float(c)))).alias("_rr")
        )
        for df, score_col in rankings
    ]
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return (
        allp.groupBy(id_col)
        .agg(F.round(F.sum("_rr"), 6).alias("rrf"))
        .orderBy(F.desc("rrf"), id_col)
        .limit(k)
    )


def rrf_fuse_sql(
    rankings: list[tuple[str, str]],
    id_col: str,
    k: int = 10,
    c: int = 60,
) -> str:
    """DuckDB twin: each entry of ``rankings`` is ``(sql, score_col)``
    where ``sql`` is a complete SELECT yielding ``(id_col, score_col)``
    rows; ranks use the identical better-row count."""
    if not rankings:
        raise ValueError("rrf_fuse_sql: need at least one ranking")
    ctes, legs = [], []
    for i, (sql, score) in enumerate(rankings):
        ctes.append(f"_in{i} AS ({sql})")
        legs.append(
            f"SELECT a.{id_col} AS _id, 1.0 / ({c} + 1 + ("
            f"SELECT COUNT(*) FROM _in{i} b "
            f"WHERE b.{score} > a.{score} "
            f"OR (b.{score} = a.{score} AND b.{id_col} < a.{id_col}))) AS _rr "
            f"FROM _in{i} a"
        )
    union = " UNION ALL ".join(f"({leg})" for leg in legs)
    return (
        "WITH " + ", ".join(ctes) + f"""
SELECT _id AS {id_col}, ROUND(SUM(_rr), 6) AS rrf
FROM ({union})
GROUP BY _id
ORDER BY rrf DESC, {id_col}
LIMIT {k}
"""
    )
