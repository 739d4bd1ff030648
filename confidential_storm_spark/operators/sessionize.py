"""Sessionization — split each user's event stream into sessions at
inactivity gaps (the batch twin of Structured Streaming's session
windows, and the standard prep step for behavioral / agent-trajectory
training data).

Spark-first shape: ONE shuffle on ``user_id``; the gap detection
(``lag``), the session counter (a running sum of gap flags), and the
per-session aggregation all reuse that single hash partitioning and
sort — Catalyst plans the two windows plus the final ``groupBy`` with
no additional exchange.  At 100 TB this is the minimal-movement plan:
each user's timeline lands on one task, and no task ever holds more
than one user's events in the sort buffer spill unit.

Time is handled in epoch MICROseconds on both engines (``ts`` is
normalized by ``sources.tables.ts_to_micros`` whatever the parquet
representation; DuckDB sees micro precision natively), so gap
arithmetic is exact cross-engine integer math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, ts_to_micros

__all__ = ["sessionize", "session_stats", "session_stats_sql"]

DEFAULT_GAP_US = 1_800_000_000  # 30 min


def sessionize(
    events: DataFrame,
    gap_us: int = DEFAULT_GAP_US,
    user_col: str = "user_id",
    ts_us_col: str = "ts_us",
) -> DataFrame:
    """Add ``session_id`` (0-based per user): a new session starts
    when the gap since the user's previous event exceeds ``gap_us``."""
    w = Window.partitionBy(user_col).orderBy(ts_us_col, "event_id")
    prev = F.lag(ts_us_col).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(ts_us_col) - prev > gap_us), 1
    ).otherwise(0)
    run = Window.partitionBy(user_col).orderBy(ts_us_col, "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return events.withColumn("session_id", F.sum(is_new).over(run) - 1)


def session_stats(
    spark: SparkSession, sf_dir: str, gap_us: int = DEFAULT_GAP_US
) -> DataFrame:
    """Per-session summary over the events table: bounds, size, value
    total, duration."""
    ev = load_table(spark, sf_dir, "events")
    ev = ev.select(
        "event_id",
        "user_id",
        ts_to_micros(ev).alias("ts_us"),
        "value",
    )
    return (
        sessionize(ev, gap_us)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts_us").alias("start_us"),
            F.max("ts_us").alias("end_us"),
            (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
            F.round(F.sum("value"), 4).alias("session_value"),
        )
    )


def session_stats_sql(gap_us: int = DEFAULT_GAP_US) -> str:
    """DuckDB twin (epoch_us, identical window arithmetic)."""
    return f"""
WITH ev AS (
    SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events
),
flagged AS (
    SELECT *, CASE WHEN ts_us - LAG(ts_us) OVER w > {gap_us}
                   OR LAG(ts_us) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
    FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sessions AS (
    SELECT *, CAST(SUM(is_new) OVER (
        PARTITION BY user_id ORDER BY ts_us, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1
        AS session_id
    FROM flagged
)
SELECT user_id, session_id,
       COUNT(*)                        AS n_events,
       MIN(ts_us)                      AS start_us,
       MAX(ts_us)                      AS end_us,
       MAX(ts_us) - MIN(ts_us)        AS duration_us,
       ROUND(CAST(SUM(value) AS DOUBLE), 4) AS session_value
FROM sessions
GROUP BY user_id, session_id
"""
