"""Streaming HyperLogLog — bounded-memory distinct counts per
event-time window on a live stream.

Streaming ``COUNT(DISTINCT)`` is the canonical unbounded-state trap:
exact dedup state grows with distinct values per window.  The HLL
register relation caps it at m=4096 rows per (window, key) whatever
the cardinality — and because the md5 register math here is the SAME
as the batch operator's (``operators/sketches.py``), the streaming
estimate is bit-identical to the batch estimate over the same rows
(differential-tested).

Mechanism: Spark 4 supports CHAINED stateful aggregations in append
mode — ``groupBy(window, key, register).max(rho)`` followed by
``groupBy(window, key).sum/count`` — with the watermark closing both
levels; the finishing harmonic-sum arithmetic is stateless column
math on the second aggregation's output.  Register state evicts with
the watermark like any windowed aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import HLL_M, _HLL_ALPHA, _HLL_RANK_BITS, _hll_bucket, _hll_rho

__all__ = ["hll_distinct_stream"]


def hll_distinct_stream(
    events: DataFrame,
    value_col: str,
    key_cols: list[str],
    window: str = "1 minute",
    ts_col: str = "ts",
    watermark_delay: str = "1 minute",
    out_col: str = "approx_distinct",
) -> DataFrame:
    """Append-mode per-window HLL distinct counts:
    ``(window_start, window_end, *key_cols, out_col)`` — one row per
    closed window, estimate identical to the batch
    :func:`operators.sketches.hll_distinct` over the same rows."""
    v = F.col(value_col).cast("string")
    regs = (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window),
            *[F.col(c) for c in key_cols],
            _hll_bucket(v).alias("_b"),
        )
        .agg(F.max(_hll_rho(v)).alias("_rho"))
    )
    per_key = regs.groupBy("window", *key_cols).agg(
        F.sum(
            F.expr(f"CAST(power(2.0, {_HLL_RANK_BITS + 1} - _rho) AS BIGINT)")
        ).alias("_s_hit"),
        F.count(F.lit(1)).alias("_hit"),
    )
    m, scale = HLL_M, float(1 << (_HLL_RANK_BITS + 1))
    v_empty = F.lit(m) - F.col("_hit")
    s_full = F.col("_s_hit") + v_empty * F.lit(1 << (_HLL_RANK_BITS + 1))
    e_raw = F.lit(_HLL_ALPHA * m * m * scale) / s_full.cast("double")
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v_empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v_empty.cast("double")),
    ).otherwise(e_raw)
    return per_key.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *key_cols,
        F.round(est, 4).alias(out_col),
    )
