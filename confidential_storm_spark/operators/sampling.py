"""Deterministic mixture sampling — the data-mixing / source-weighting
primitive of an LLM training-data pipeline (sample each stratum at its
mixture weight, reproducibly, with no RNG state).

Acceptance is a pure hash test: ``md5(id) mod M < rate * M`` — so the
sample is (a) deterministic across runs/engines (the DuckDB oracle
recomputes the identical decision), (b) stable under re-partitioning
(per-ROW decision, no per-partition RNG), and (c) a plain Catalyst
expression: the filter fuses with the scan in one WholeStageCodegen
span — NO shuffle, no UDF, and column pruning still applies.  At 100 TB, subsampling a source is
exactly this one predicate.

The same ``hash < threshold`` family also gives consistent train/test
splits (disjoint hash ranges) and incremental re-sampling (raising a
rate only ADDS documents — the accepted set is monotone in the rate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "hash_accept",
    "mixture_sample",
    "mixture_sample_sql",
    "stratified_topn",
    "stratified_topn_sql",
    "split_assign",
    "split_assign_sql",
    "weighted_sample_topk",
    "weighted_sample_topk_sql",
]

_MOD = 1_000_000


def hash_accept(id_col: Column, rate: Column | float) -> Column:
    """Deterministic per-row acceptance at ``rate``: uniform hash in
    [0, 1M) from the md5 of the id, compared to rate * 1M."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast(
        "long"
    ) % _MOD
    threshold = (
        F.lit(int(round(rate * _MOD))) if isinstance(rate, (int, float)) else rate
    )
    return h < threshold


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    strat_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row with its stratum's mixture weight (strata missing
    from ``rates`` get ``default_rate``).  Pure expression — the
    decision codegens fused with the scan, no shuffle."""
    rate_map = F.create_map(
        *[F.lit(x) for kv in rates.items() for x in (kv[0], int(round(kv[1] * _MOD)))]
    )
    threshold = F.coalesce(
        F.element_at(rate_map, F.col(strat_col)),
        F.lit(int(round(default_rate * _MOD))),
    )
    return df.filter(hash_accept(F.col(id_col), threshold))


def mixture_sample_sql(
    rates: dict[str, float],
    strat_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> str:
    """DuckDB twin of the acceptance predicate (identical md5 decision,
    see the md5->BIGINT equivalence used throughout the oracles)."""
    cases = " ".join(
        f"WHEN '{s}' THEN {int(round(r * _MOD))}" for s, r in rates.items()
    )
    return (
        f"(CAST('0x' || substr(md5(CAST({id_col} AS VARCHAR)), 1, 8) AS BIGINT) % {_MOD}) "
        f"< (CASE {strat_col} {cases} ELSE {int(round(default_rate * _MOD))} END)"
    )


def stratified_topn(
    df: DataFrame,
    n: int,
    strat_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-N-per-stratum deterministic sample: rank each stratum's
    rows by ``md5(id)`` (a uniform, engine-independent shuffle order)
    and keep the first ``n``.  The fixed-COUNT complement of
    :func:`mixture_sample`'s fixed-RATE sampling — what "give me 10k
    eval docs per language" needs.

    Scale shape: the ``row_number <= n`` filter triggers Spark's
    WindowGroupLimit rewrite — each input partition keeps only its
    local top-``n`` per stratum BEFORE the shuffle, so the exchange
    carries O(partitions * strata * n) rows, not the corpus.  Skewed
    strata therefore cost the same as uniform ones.
    """
    order = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(strat_col).orderBy(order.asc(), F.col(id_col).asc())
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= n)
        .drop("sample_rank")
    )


def stratified_topn_sql(
    n: int,
    columns: str,
    strat_col: str = "lang",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin (identical md5 ordering; hex compares the same)."""
    return f"""
SELECT {columns} FROM (
    SELECT *, ROW_NUMBER() OVER (
        PARTITION BY {strat_col}
        ORDER BY md5(CAST({id_col} AS VARCHAR)) ASC, {id_col} ASC
    ) AS sample_rank
    FROM {table}
) WHERE sample_rank <= {n}
"""


def split_assign(
    df: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint dataset split (train/val/test): each row
    lands in exactly one split by hash-range partition of
    ``md5(salt:id)`` — reproducible across runs and engines, stable
    under repartitioning, and (because ranges are CUMULATIVE) growing
    one split's weight only moves rows across the adjacent boundary.

    ``splits`` maps name -> weight (weights sum to <= 1; any residual
    hash range falls into the LAST split, so the canonical
    {train .8, val .1, test .1} is airtight).  Pure expression:
    codegens fused with the scan, no shuffle, no RNG state.
    """
    if not splits:
        raise ValueError("split_assign: splits must be non-empty")
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string"))), 1, 8),
        16,
        10,
    ).cast("long") % _MOD
    names = list(splits)
    expr = F.lit(names[-1])
    acc = 0
    conds = []
    for name, w in list(splits.items())[:-1]:
        acc += int(round(w * _MOD))
        conds.append((acc, name))
    for acc_v, name in reversed(conds):
        expr = F.when(h < acc_v, F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


_WS_DEN = float((1 << 48) + 1)


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis & Spirakis
    (2006) A-ES: give each row the key ``u^(1/w)`` for a uniform
    ``u`` and keep the k largest keys; the result is distributed
    exactly as sequential weighted draws without replacement.  This is
    the quality-weighted subset-selection primitive of a training-data
    mix (sample 10M docs, high-quality docs proportionally more
    likely) — the weighted complement of :func:`mixture_sample`'s
    per-stratum rates.

    Determinism: ``u`` is an md5-derived 48-bit uniform of the id (no
    RNG state), so the drawn set is reproducible across runs, engines,
    and partitionings.  We order by the monotone-equivalent key
    ``ln(u)/w`` (u in (0,1] so ln(u) <= 0; larger is better) to avoid
    the ``u^(1/w)`` underflow for large weights.

    Plan shape: a pure scan-fused expression plus ``orderBy().limit``
    — TakeOrderedAndProject, so each partition contributes its local
    top-k and the driver merges k-sized heaps; no global sort shuffle,
    no RNG, no UDF.  Weights are clamped to >= 1 so a zero-weight row
    cannot produce a NaN/inf key.
    """
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws:"), F.col(id_col).cast("string"))), 1, 12),
        16,
        10,
    ).cast("double")
    w = F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    key = F.log((h + 1.0) / F.lit(_WS_DEN)) / w
    return (
        df.select(
            F.col(id_col),
            w.cast("long").alias("weight"),
            # + 0.0 normalizes IEEE -0.0 (a key rounding to zero) to
            # +0.0 so both engines print the same value
            (F.round(key, 6) + F.lit(0.0)).alias("sample_key"),
            key.alias("_key"),
        )
        .orderBy(F.col("_key").desc(), F.col(id_col).asc())
        .limit(k)
        .drop("_key")
    )


def weighted_sample_topk_sql(
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin of :func:`weighted_sample_topk` (identical md5
    uniform, identical ln-key ordering)."""
    h = (
        f"CAST(CAST('0x' || substr(md5('ws:' || CAST({id_col} AS VARCHAR)), 1, 12) "
        f"AS BIGINT) AS DOUBLE)"
    )
    w = f"GREATEST(CAST({weight_col} AS DOUBLE), 1.0)"
    key = f"(ln(({h} + 1.0) / {_WS_DEN!r}) / {w})"
    return f"""
SELECT {id_col}, CAST({w} AS BIGINT) AS weight, (ROUND({key}, 6) + 0.0) AS sample_key
FROM {table}
ORDER BY {key} DESC, {id_col} ASC
LIMIT {k}
"""


def split_assign_sql(
    splits: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> str:
    """DuckDB twin of the :func:`split_assign` expression (yields the
    split name for one row)."""
    h = (
        f"(CAST('0x' || substr(md5('{salt}:' || CAST({id_col} AS VARCHAR)), 1, 8) "
        f"AS BIGINT) % {_MOD})"
    )
    if not splits:
        raise ValueError("split_assign_sql: splits must be non-empty")
    q = lambda s: "'" + s.replace("'", "''") + "'"
    names = list(splits)
    if len(names) == 1:
        # a CASE with zero WHENs is a syntax error; everything lands in
        # the single split (same as the Spark expression)
        return q(names[0])
    acc = 0
    whens = []
    for name, w in list(splits.items())[:-1]:
        acc += int(round(w * _MOD))
        whens.append(f"WHEN {h} < {acc} THEN {q(name)}")
    return "CASE " + " ".join(whens) + f" ELSE {q(names[-1])} END"
