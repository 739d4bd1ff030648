"""Histogram aggregation operators (SURVEY §2.5 A1, A13-A16; §2.7 O1).

All expressed as native DataFrame aggregations so Catalyst plans
partial (map-side) + final aggregation — the explicit fan-in merge the
reference hand-codes (AbstractHistogramAggregationServiceProvider
.mergePartial:104-223) is exactly Spark's partial+final hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "keyed_sum",
    "histogram_release",
    "merge_partials",
    "ground_truth",
    "utility_metrics",
]


def keyed_sum(df: DataFrame, key_col: str = "key", value_col: str = "value") -> DataFrame:
    """A1: per-key SUM of (clamped) contributions."""
    return df.groupBy(key_col).agg(F.sum(value_col).alias("total"))


def histogram_release(
    df: DataFrame, key_col: str = "key", value_col: str = "value"
) -> DataFrame:
    """A13 + O1: round half-up, clamp negatives to zero, sort desc
    (ref StreamingDPMechanism.produceHistogram:517-531).

    ``floor(x + 0.5)`` matches Java ``Math.round`` (Spark/DuckDB
    ``round`` use HALF_UP for positives but differ on negative .5)."""
    return (
        df.groupBy(key_col)
        .agg(
            F.greatest(
                F.floor(F.sum(value_col) + F.lit(0.5)).cast("long"), F.lit(0).cast("long")
            ).alias("count")
        )
        .orderBy(F.desc("count"), key_col)
    )


def merge_partials(
    partials: DataFrame,
    key_col: str = "key",
    value_col: str = "partial_sum",
    epoch_col: str = "epoch",
    producer_col: str = "producer_id",
    dummy_col: str | None = "is_dummy",
) -> DataFrame:
    """A14 + T6: merge per-replica partial histograms — discard
    dummies, dedup (epoch, producer), then fan-in SUM per key.

    The reference tracks per-epoch completion with a TreeMap of <=8
    pending epochs (ref :41,152-161); in batch Spark epochs are
    complete by construction, so the merge is the dedup + re-aggregate.
    """
    df = partials
    if dummy_col is not None and dummy_col in df.columns:
        df = df.filter(~F.col(dummy_col))
    # one partial per (epoch, producer): drop exact duplicate deliveries
    df = df.dropDuplicates([epoch_col, producer_col, key_col])
    return df.groupBy(key_col).agg(F.sum(value_col).alias("total"))


def ground_truth(df: DataFrame, key_col: str = "key", value_col: str = "value") -> DataFrame:
    """A15: exact (non-DP, non-bounded) histogram."""
    return df.groupBy(key_col).agg(F.sum(value_col).alias("gt_total"))


def utility_metrics(
    dp: DataFrame,
    gt: DataFrame,
    key_col: str = "key",
    dp_col: str = "count",
    gt_col: str = "gt_total",
) -> DataFrame:
    """A16: L0/Linf/L1/L2 error of a DP histogram vs ground truth over
    the full outer join of the two key sets (ref
    BaselineHistogramAggregationBolt.writeReport:247-266).

    The small DP side could be broadcast, but both sides are
    aggregates of the same scan, so a shuffled full-outer on the agg
    key is already minimal.
    """
    joined = dp.select(key_col, dp_col).join(
        gt.select(key_col, gt_col), on=key_col, how="full_outer"
    )
    d = F.coalesce(F.col(dp_col).cast("double"), F.lit(0.0))
    g = F.coalesce(F.col(gt_col).cast("double"), F.lit(0.0))
    err = d - g
    return joined.agg(
        F.count(F.when(d > 0, 1)).alias("l0"),
        F.round(F.max(F.abs(err)), 6).alias("l_inf"),
        F.round(F.sum(F.abs(err)), 6).alias("l1"),
        F.round(F.sqrt(F.sum(err * err)), 6).alias("l2"),
    )
