"""Table profiling — the ANALYZE / data-quality pass every warehouse
runs before (and after) a pipeline: per-column null counts, exact
distinct cardinalities, and numeric ranges, in ONE scan.

Shape: all per-column aggregates compile into a single HashAggregate
row (Catalyst evaluates them in the same whole-stage-codegen pass over
the scan), which then unpivots to the tall (column, stats) release
form — so profiling an N-column 100 TB table costs one read, not N.
Exact ``count(distinct)`` over multiple columns would normally force
one Expand pass per column; at warehouse scale swap in
``approx_count_distinct`` via ``exact_distinct=False`` — HLL-based,
still one scan, no expand — the same trade `sketches.hll_distinct`
documents.  Numeric mins/maxes stay DOUBLE columns (never stringified:
engines format floats differently, values compare exactly).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

__all__ = ["profile_table"]


def profile_table(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = True,
    round_to: int = 6,
) -> DataFrame:
    """Tall per-column profile: ``(col_name, n_rows, n_nulls,
    n_distinct, min_num, max_num)``, one row per profiled column,
    ordered by column name.  ``min_num``/``max_num`` are NULL for
    non-numeric columns; distincts count non-null values (SQL COUNT
    DISTINCT semantics, cross-engine identical)."""
    names = cols if cols is not None else df.columns
    if not names:
        raise ValueError("profile_table: no columns to profile")
    for c in names:
        # names are interpolated into selectExpr/SQL text below; the
        # identifier whitelist keeps that injection-proof and the
        # generated _min_/_max_ aliases parseable
        if not re.fullmatch(r"\w+", c):
            raise ValueError(
                f"profile_table: column name {c!r} is not a plain identifier"
            )
    aggs = [F.count(F.lit(1)).alias("_n")]
    numeric = {
        f.name for f in df.schema.fields if isinstance(f.dataType, NumericType)
    }
    for c in names:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"_nulls_{c}"))
        aggs.append(
            (
                F.count_distinct(F.col(c))
                if exact_distinct
                else F.approx_count_distinct(c)
            ).alias(f"_nd_{c}")
        )
        if c in numeric:
            aggs.append(F.round(F.min(c).cast("double"), round_to).alias(f"_min_{c}"))
            aggs.append(F.round(F.max(c).cast("double"), round_to).alias(f"_max_{c}"))
    wide = df.agg(*aggs)
    # unpivot the single stats row to the tall release form via stack()
    # — pure projection work on one row, no second scan
    parts = []
    for c in names:
        mn = f"_min_{c}" if c in numeric else "CAST(NULL AS DOUBLE)"
        mx = f"_max_{c}" if c in numeric else "CAST(NULL AS DOUBLE)"
        parts.append(f"'{c}', _n, `_nulls_{c}`, `_nd_{c}`, {mn}, {mx}")
    stack = (
        f"stack({len(names)}, {', '.join(parts)}) AS "
        "(col_name, n_rows, n_nulls, n_distinct, min_num, max_num)"
    )
    return wide.selectExpr(stack).orderBy("col_name")


def profile_sql(
    table: str, cols: list[str], numeric_cols: list[str], round_to: int = 6
) -> str:
    """DuckDB twin: UNION ALL of per-column stat rows (clarity over
    one-pass elegance — the oracle certifies VALUES, the Spark plan
    carries the scale argument)."""
    if not re.fullmatch(r"\w+", table):
        raise ValueError(f"profile_sql: table name {table!r} is not a plain identifier")
    for c in cols:
        if not re.fullmatch(r"\w+", c):
            raise ValueError(f"profile_sql: column name {c!r} is not a plain identifier")
    if not cols:
        raise ValueError("profile_sql: no columns to profile")
    selects = []
    for c in cols:
        if c in numeric_cols:
            mn = f"ROUND(MIN(CAST({c} AS DOUBLE)), {round_to})"
            mx = f"ROUND(MAX(CAST({c} AS DOUBLE)), {round_to})"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
        selects.append(
            f"SELECT '{c}' AS col_name, COUNT(*) AS n_rows, "
            f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls, "
            f"COUNT(DISTINCT {c}) AS n_distinct, {mn} AS min_num, {mx} AS max_num "
            f"FROM {table}"
        )
    return " UNION ALL ".join(selects) + " ORDER BY col_name"
