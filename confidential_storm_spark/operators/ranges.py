"""Grid-bucketed interval (range) join — the scale-safe form of
``event.ts BETWEEN interval.start AND interval.end``.

Why an operator: Spark compiles a raw range-predicate join with no
equi-key to BroadcastNestedLoopJoin — an all-pairs scan that dies the
moment neither side broadcasts.  The standard fix (used by every
warehouse engine's range-join optimization) is to overlay a uniform
grid: every point lands in exactly ONE cell (``ts div grid``), every
interval is exploded to the cells it covers, and the join becomes a
plain equi-join on the cell id followed by the exact range filter.
Catalyst then picks broadcast/shuffle hash join, AQE handles skew, and
the candidate set is |points| x (intervals overlapping each point's
cell) instead of |points| x |intervals|.

Choosing ``grid``: >= the max interval length means every interval
covers at most 2 cells (replication factor <= 2); smaller grids trade
interval replication for tighter candidate sets.  The exact filter
makes any grid choice correct — the grid is purely a pruning key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join", "interval_join_cells"]


def interval_join_cells(
    intervals: DataFrame, start_col: str, end_col: str, grid: int
) -> DataFrame:
    """Explode each interval row to one row per covered grid cell
    (``_cell`` long).  Closed intervals: a point p matches iff
    start <= p <= end, so cells floor(start/g)..floor(end/g)."""
    return intervals.withColumn(
        "_cell",
        F.explode(
            F.sequence(
                (F.col(start_col) / grid).cast("long"),
                (F.col(end_col) / grid).cast("long"),
            )
        ),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    grid: int,
    how: str = "inner",
) -> DataFrame:
    """Join every point row to every interval row whose
    ``[start_col, end_col]`` (closed) contains ``ts_col``, via the
    grid equi-key.  Columns of both inputs survive (no renames);
    the caller aggregates/projects downstream.

    Plan shape: explode(sequence) on the interval side (replication
    <= len/grid + 1 rows per interval), ONE equi-join on ``_cell``
    (broadcast when the exploded interval side is small, shuffle-hash
    otherwise — Catalyst/AQE decide), then the exact
    ``BETWEEN``-filter.  No nested-loop join appears at any size.
    """
    if grid <= 0:
        raise ValueError("grid must be a positive number of ts units")
    pts = points.withColumn("_cell", (F.col(ts_col) / grid).cast("long"))
    iv = interval_join_cells(intervals, start_col, end_col, grid)
    joined = pts.join(iv, "_cell", how).filter(
        F.col(ts_col).between(F.col(start_col), F.col(end_col))
    )
    return joined.drop("_cell")
