"""Declarative data-quality constraint suite (Deequ-style) compiled
into ONE aggregation pass.

A 100 TB ingest pipeline gates every landing batch on a contract —
row volume, completeness, key uniqueness, value domains, pattern
conformity, referential integrity — and the naive implementation runs
one scan per check.  The Spark-native shape (the same design as AWS
Deequ's analyzer runs, Schelter et al., VLDB 2018) is to compile the
whole suite into a single ``agg`` over the fact table: every metric
below is algebraic (counts, conditional counts, min/max — all
commutative-monoid partials), so the entire report costs one
map-side-combinable pass over the data plus a k-row projection,
regardless of how many constraints are declared.  Referential
integrity is the one check that genuinely needs a second relation; it
joins the (small) key dimension broadcast-anti style and contributes
one more single-pass metric.

Determinism contract: every metric is either an exact BIGINT count, an
exact min/max of stored values, or a single IEEE division of two exact
counts — bit-identical in any engine at any partitioning, so the
DuckDB twin reproduces the report hash exactly.

Reference parity: confidentialstorm validates per-tuple envelope
integrity (SURVEY §2.4 V1-V3) but has no relation-level contract
checking; this is part of the beyond-reference training-data-pipeline
family.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "Check",
    "check_suite",
    "suite_metric_columns",
    "suite_report",
    "referential_check",
    "check_suite_sql",
]


@dataclass(frozen=True)
class Check:
    """One declared constraint: ``name`` labels the report row,
    ``metric`` is a zero-arg thunk producing the aggregate Column over
    the input relation (a thunk, not a Column, so a suite — and its
    SQL twin — can be declared before any SparkSession exists; classic
    PySpark Columns need a live JVM), ``metric_sql`` its DuckDB twin
    expression, and the inclusive ``[lo, hi]`` bounds decide
    ``passed`` (None = unbounded)."""

    name: str
    metric: Callable[[], Column]
    metric_sql: str
    lo: float | None = None
    hi: float | None = None


def _ratio(num: Column, den: Column) -> Column:
    # single division of two exact longs; 1.0 for the empty relation
    # (a vacuous contract holds) — mirrored in the SQL twin
    return F.when(den == 0, F.lit(1.0)).otherwise(
        num.cast("double") / den.cast("double")
    )


def ratio_sql(num: str, den: str) -> str:
    return f"CASE WHEN {den} = 0 THEN 1.0 ELSE CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE) END"


def completeness(col: str) -> tuple[Callable[[], Column], str]:
    """Fraction of rows with ``col`` non-null."""
    return (
        lambda: _ratio(F.count(F.col(col)), F.count(F.lit(1))),
        ratio_sql(f"COUNT({col})", "COUNT(*)"),
    )


def uniqueness(col: str) -> tuple[Callable[[], Column], str]:
    """distinct/count — 1.0 iff ``col`` is a key.  The one metric in
    the family that is NOT cheap at scale (exact distinct shuffles the
    key column); swap in ``approx_count_distinct`` when the gate can
    tolerate a ±2% band."""
    return (
        lambda: _ratio(F.countDistinct(F.col(col)), F.count(F.col(col))),
        ratio_sql(f"COUNT(DISTINCT {col})", f"COUNT({col})"),
    )


def conformity(
    pred: Callable[[], Column], pred_sql: str
) -> tuple[Callable[[], Column], str]:
    """Fraction of rows satisfying a row predicate (domain membership,
    regex shape, range).  ``pred`` is a thunk producing the predicate
    Column (see :class:`Check`)."""
    return (
        lambda: _ratio(
            F.count(F.when(pred(), F.lit(1))),
            F.count(F.lit(1)),
        ),
        ratio_sql(f"COUNT(CASE WHEN {pred_sql} THEN 1 END)", "COUNT(*)"),
    )


def check_suite(
    df: DataFrame, checks: list[Check], by: list[str] | None = None
) -> DataFrame:
    """Evaluate every declared check in ONE aggregation pass.

    Returns (by..., constraint string, value double, passed boolean),
    one row per check (per group when ``by`` is given — the per-batch
    / per-partition / per-source contract report), ordered by the
    group then constraint name.  Plan: a single partial -> final
    HashAggregate over ``df`` (one row per group out), then a
    stateless explode of that row into the report relation — adding a
    constraint adds a column to the agg, never a scan.  Every metric
    is algebraic, so the same agg runs as a streaming aggregation
    (update mode) for a live per-epoch contract monitor.
    """
    by = by or []
    agged = (
        df.groupBy(*by).agg(*suite_metric_columns(checks))
        if by
        else df.agg(*suite_metric_columns(checks))
    )
    return suite_report(agged, checks, by)


def suite_metric_columns(checks: list[Check]) -> list[Column]:
    """The suite's aggregate columns (``_m0.._mN``) — exposed so a
    STREAMING aggregation can compute the same metrics per group
    (every metric is algebraic, hence update-mode legal) and feed the
    rows to :func:`suite_report` batch-side."""
    return [
        c.metric().cast("double").alias(f"_m{i}") for i, c in enumerate(checks)
    ]


def suite_report(
    agged: DataFrame, checks: list[Check], by: list[str] | None = None
) -> DataFrame:
    """Explode a ``(by..., _m0.._mN)`` metric relation (from
    :func:`suite_metric_columns`) into the ordered
    (by..., constraint, value, passed) report."""
    by = by or []

    def _passed(c: Check, i: int) -> Column:
        m = F.col(f"_m{i}")
        ok = F.lit(True)
        if c.lo is not None:
            ok = ok & (m >= F.lit(float(c.lo)))
        if c.hi is not None:
            ok = ok & (m <= F.lit(float(c.hi)))
        return ok

    rows = F.array(
        *[
            F.struct(
                F.lit(c.name).alias("constraint"),
                F.col(f"_m{i}").alias("value"),
                _passed(c, i).alias("passed"),
            )
            for i, c in enumerate(checks)
        ]
    )
    return (
        agged.select(*by, F.explode(rows).alias("r"))
        .select(*by, "r.constraint", "r.value", "r.passed")
        .orderBy(*by, "constraint")
    )


def referential_check(
    fact: DataFrame, fact_key: str, dim: DataFrame, dim_key: str
) -> DataFrame:
    """Orphan count: fact rows whose key has no dim match (left-anti
    join — Spark broadcasts the dim key set when it is small, which is
    the common fact->dimension shape at warehouse scale).  Returns a
    1-row (value double) relation for splicing into a report."""
    return (
        fact.select(F.col(fact_key).alias("_k"))
        .join(dim.select(F.col(dim_key).alias("_k")), "_k", "left_anti")
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
    )


def check_suite_sql(
    relation: str,
    checks: list[Check],
    extra_rows: str = "",
    by: list[str] | None = None,
) -> str:
    """DuckDB twin of :func:`check_suite` over ``relation``: the same
    one-pass aggregate, exploded by a UNION ALL over the constraint
    list.  ``extra_rows`` appends UNION ALL report rows (e.g. the
    referential check, which aggregates a different relation)."""
    by = by or []
    bysel = "".join(f"{b}, " for b in by)
    group = f"  GROUP BY {', '.join(by)}\n" if by else ""
    metrics = ",\n         ".join(
        f"CAST({c.metric_sql} AS DOUBLE) AS _m{i}" for i, c in enumerate(checks)
    )

    def bound(c: Check, i: int) -> str:
        conds = []
        if c.lo is not None:
            conds.append(f"_m{i} >= {float(c.lo)!r}")
        if c.hi is not None:
            conds.append(f"_m{i} <= {float(c.hi)!r}")
        return " AND ".join(conds) if conds else "TRUE"

    rows = "\nUNION ALL\n".join(
        f'SELECT {bysel}\'{c.name}\' AS "constraint", _m{i} AS value, '
        f"{bound(c, i)} AS passed FROM _agg"
        for i, c in enumerate(checks)
    )
    order = "".join(f"{b}, " for b in by) + '"constraint"'
    return f"""
WITH _agg AS (
  SELECT {bysel}{metrics}
  FROM {relation}
{group})
SELECT * FROM (
{rows}
{extra_rows}
) ORDER BY {order}
"""
