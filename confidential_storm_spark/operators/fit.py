"""Per-group closed-form model fitting: exact-arithmetic grouped OLS.

The many-small-models shape of a training-data pipeline (a trend per
source, a drift slope per feature, a rate curve per cohort) does not
need an iterative solver: simple least squares has a closed form over
five sufficient statistics, and sufficient statistics are exactly what
a distributed engine aggregates well — ONE map-side-combinable
``groupBy`` pass produces (n, Σx, Σy, Σxy, Σx², Σy²) per group, and the
fit itself is a stateless projection over the k-row result.  Compare
``groupBy().applyInPandas(fit)``: that shuffles every observation row
to its group's task and runs Python per group; this shuffles only the
partial sums (bytes per group per partition) and stays in codegen.

Determinism contract: inputs must be exact integers (or values
pre-scaled to an integer grid — the caller rounds floats to a decimal
grid first, same rule as the DP and robust-stats operators).  Sums
accumulate in DECIMAL(38,0), so every sufficient statistic is exact and
engine-independent; slope/intercept/r² are then single IEEE-754 double
operations over those exact integers, which round identically in any
engine — the DuckDB twin reproduces every output bit.

Reference parity: the reference engine has no regression operator at
all (SURVEY §2 — its aggregations stop at windowed sums); this is part
of the beyond-reference training-data family, like the quality probe
(operators/quality_model.py) which fits ONE global model iteratively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["grouped_linear_fit", "grouped_linear_fit_sql"]


def grouped_linear_fit(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> Column | DataFrame:
    """Per-group simple OLS ``y = intercept + slope * x`` via exact
    sufficient statistics.

    Returns one row per group: (keys..., n, slope, intercept, r2).
    ``x_col`` / ``y_col`` must hold exact integer values (see module
    docstring).  Groups with zero x-variance (or fewer than 2 points)
    return NULL slope/intercept/r2 rather than a division artifact —
    mirrored by the twin's CASE guard.

    Plan: one partial-aggregatable HashAggregate (six sums), then a
    stateless k-row projection.  No window, no second scan, no Python.
    """
    xl = F.col(x_col).cast("decimal(18,0)")
    yl = F.col(y_col).cast("decimal(18,0)")
    g = (
        df.select(*key_cols, xl.alias("_x"), yl.alias("_y"))
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).cast("decimal(18,0)").alias("_n"),
            F.sum("_x").alias("_sx"),
            F.sum("_y").alias("_sy"),
            F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
            F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
            F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        )
    )
    # every numerator/denominator is an exact DECIMAL(38,0) integer;
    # one double cast + one division per output keeps the float work
    # to single exactly-rounded IEEE ops
    num = (F.col("_n") * F.col("_sxy") - F.col("_sx") * F.col("_sy")).cast("double")
    den = (F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")).cast("double")
    deny = (F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")).cast("double")
    inum = (F.col("_sy") * F.col("_sxx") - F.col("_sx") * F.col("_sxy")).cast("double")
    ok = den != F.lit(0.0)
    return g.select(
        *key_cols,
        F.col("_n").cast("long").alias("n"),
        F.round(F.when(ok, num / den), round_to).alias("slope"),
        F.round(F.when(ok, inum / den), round_to).alias("intercept"),
        F.round(
            F.when(ok & (deny != F.lit(0.0)), (num * num) / (den * deny)), round_to
        ).alias("r2"),
    )


def grouped_linear_fit_sql(
    inner: str,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> str:
    """DuckDB twin of :func:`grouped_linear_fit` over the relation
    ``inner`` — HUGEINT sufficient statistics (exact, like the Spark
    side's DECIMAL(38,0)), identical single-division float finish."""
    keys = ", ".join(key_cols)
    return f"""
WITH _obs AS (SELECT {keys}, CAST({x_col} AS HUGEINT) AS _x, CAST({y_col} AS HUGEINT) AS _y FROM {inner}),
_stats AS (
  SELECT {keys}, CAST(COUNT(*) AS HUGEINT) AS _n,
         SUM(_x) AS _sx, SUM(_y) AS _sy,
         SUM(_x * _y) AS _sxy, SUM(_x * _x) AS _sxx, SUM(_y * _y) AS _syy
  FROM _obs GROUP BY {keys})
SELECT {keys}, CAST(_n AS BIGINT) AS n,
  ROUND(CASE WHEN _n * _sxx - _sx * _sx <> 0 THEN
    CAST(_n * _sxy - _sx * _sy AS DOUBLE) / CAST(_n * _sxx - _sx * _sx AS DOUBLE)
  END, {round_to}) AS slope,
  ROUND(CASE WHEN _n * _sxx - _sx * _sx <> 0 THEN
    CAST(_sy * _sxx - _sx * _sxy AS DOUBLE) / CAST(_n * _sxx - _sx * _sx AS DOUBLE)
  END, {round_to}) AS intercept,
  ROUND(CASE WHEN _n * _sxx - _sx * _sx <> 0 AND _n * _syy - _sy * _sy <> 0 THEN
    (CAST(_n * _sxy - _sx * _sy AS DOUBLE) * CAST(_n * _sxy - _sx * _sy AS DOUBLE))
    / (CAST(_n * _sxx - _sx * _sx AS DOUBLE) * CAST(_n * _syy - _sy * _sy AS DOUBLE))
  END, {round_to}) AS r2
FROM _stats
"""
