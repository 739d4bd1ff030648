"""Incremental materialized-view maintenance — partial-aggregate
merge, exact and sketch-valued.

The 100 TB pattern this encodes: a recurring pipeline must NOT rescan
the fact table to refresh its rollups.  Store the aggregate's PARTIAL
state (per-group exact sums/counts, or per-group sketch registers),
aggregate only the newly-arrived delta, and MERGE — cost per refresh
is ``O(|MV| + |delta|)``, independent of the fact table's history.
Both flavors rest on the same algebra: the stored rows are the
commutative-monoid partials Spark's own map-side combine uses, so
``union -> re-aggregate`` is exactly equivalent to a full recompute
(and the driver's value-hash gate proves it, since the oracle IS the
full recompute).

- :func:`revenue_partials` / :func:`merge_revenue_partials` — exact
  DECIMAL partial sums + counts for the money contract (order-stable
  integer arithmetic; see plans/queries.py "exact money arithmetic").
  AVG is derived at finish time from (sum, count) — never averaged
  across partials.
- sketch rollups reuse :func:`..operators.sketches.hll_registers_keyed`
  partials: a register table stored per fine key (day, event_type)
  answers any coarser slice by register-wise max
  (:func:`..operators.sketches.hll_merge_registers`), bit-identical
  to a direct scan of the slice because max is associative,
  commutative, and idempotent.

Reference parity note: the reference's only merge operation is the
per-epoch histogram partial merge (SURVEY §2 A14,
``AbstractHistogramAggregationServiceProvider``) — the same monoid
idea, fixed to one operator.  This module generalizes it to arbitrary
grouped aggregates and sketch state, which the reference cannot
express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "revenue_partials",
    "merge_revenue_partials",
    "finish_revenue",
]

_PRICE_D = "decimal(18,2)"


def revenue_partials(orders: DataFrame, key_cols: list[str]) -> DataFrame:
    """Per-key mergeable partials over orders: exact DECIMAL revenue
    sum + order count.  This relation IS the stored MV state."""
    return orders.groupBy(*key_cols).agg(
        F.sum(F.col("o_totalprice").cast(_PRICE_D)).alias("rev_partial"),
        F.count(F.lit(1)).alias("cnt_partial"),
    )


def merge_revenue_partials(*partials: DataFrame) -> DataFrame:
    """Union any number of partial relations and re-aggregate — the
    monoid merge.  Keys appearing in only one input pass through
    unchanged; shared keys add exactly (DECIMAL integer arithmetic,
    any order)."""
    merged = partials[0]
    for p in partials[1:]:
        merged = merged.unionByName(p)
    keys = [c for c in merged.columns if c not in ("rev_partial", "cnt_partial")]
    return merged.groupBy(*keys).agg(
        F.sum("rev_partial").alias("rev_partial"),
        F.sum("cnt_partial").alias("cnt_partial"),
    )


def finish_revenue(mv: DataFrame) -> DataFrame:
    """Finish stored partials into the user-facing view: total revenue
    (double), order count, average order value (exact-decimal sum over
    exact count, divided once in double)."""
    keys = [c for c in mv.columns if c not in ("rev_partial", "cnt_partial")]
    return mv.select(
        *keys,
        F.col("rev_partial").cast("double").alias("revenue"),
        F.col("cnt_partial").alias("order_count"),
        F.round(
            F.col("rev_partial").cast("double")
            / F.col("cnt_partial").cast("double"),
            6,
        ).alias("avg_order_value"),
    )
