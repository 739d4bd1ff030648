"""Contribution bounding + clamping operators (SURVEY §2 P2, P3, A2).

Batch form of the reference's ``UserContributionLimiter`` /
``AbstractUserContributionBoundingServiceProvider`` (enclave side
:66-114): keep each user's first C contributions (deterministic
arrival order = ``(event_time, seq)``), clamp each kept value to
[-L_m, +L_m].  ``user_id IS NULL`` rows bypass the bound (event-level
privacy), mirroring ``UserContributionLimiter.allow:22-28``.

Scale notes
-----------
``row_number() OVER (PARTITION BY user_id ...)`` shuffles once on
``user_id``.  At 100 TB this is the right plan *if* users are not
pathologically hot: each user's rows must fit one task.  Real user
data (C-bounded at ingest anyway) satisfies this; a single synthetic
mega-user would need pre-aggregation or salted two-phase top-C.  The
groupBy alternative (collect first-C per user via aggregation) does
not preserve "first by time" without the same shuffle, so the window
is the minimal-shuffle plan.  AQE skew handling stays enabled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["clamp_values", "bound_contributions", "bounded_clamped"]


def clamp_values(df: DataFrame, value_col: str = "value", clamp: float = 1.0) -> DataFrame:
    """P2: clamp ``value_col`` to [-clamp, +clamp] (ref
    BaselineContributionBoundingBolt.java:56)."""
    c = F.col(value_col)
    return df.withColumn(
        value_col, F.least(F.greatest(c, F.lit(-clamp)), F.lit(float(clamp)))
    )


def bound_contributions(
    df: DataFrame,
    max_contributions: int,
    user_col: str = "user_id",
    order_cols: tuple[str, ...] = ("event_time", "seq"),
) -> DataFrame:
    """A2 (batch): admit each user's first C rows by arrival order;
    NULL users always pass (event-level privacy)."""
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col(user_col).isNull() | (F.col("_rn") <= max_contributions))
        .drop("_rn")
    )


def bounded_clamped(
    df: DataFrame,
    max_contributions: int,
    per_record_clamp: float,
    user_col: str = "user_id",
    value_col: str = "value",
    order_cols: tuple[str, ...] = ("event_time", "seq"),
) -> DataFrame:
    """The bounding stage of the DP pipeline: clamp then C-bound."""
    return bound_contributions(
        clamp_values(df, value_col, per_record_clamp),
        max_contributions,
        user_col,
        order_cols,
    )


def bounded_sql(
    inner_sql: str,
    max_contributions: int,
    per_record_clamp: float,
    user_col: str = "user_id",
    order_cols: tuple[str, ...] = ("event_time", "seq"),
    value_col: str = "value",
) -> str:
    """ANSI-SQL equivalent of :func:`bounded_clamped` for the DuckDB
    oracle, applied over ``inner_sql`` as a subquery."""
    order = ", ".join(order_cols)
    return f"""
SELECT * EXCLUDE (_rn) FROM (
    SELECT
        * REPLACE (LEAST(GREATEST({value_col}, -{per_record_clamp}), {per_record_clamp}) AS {value_col}),
        ROW_NUMBER() OVER (PARTITION BY {user_col} ORDER BY {order}) AS _rn
    FROM ({inner_sql})
) WHERE {user_col} IS NULL OR _rn <= {max_contributions}
"""
