"""Grid-bucketed interval join (operators/ranges.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.operators.ranges import interval_join


def _naive(points, intervals, spark):
    """Reference: the raw range-predicate join (nested-loop shape)."""
    return points.crossJoin(intervals).filter(
        F.col("ts").between(F.col("s"), F.col("e"))
    )


@pytest.fixture()
def data(spark):
    pts = spark.createDataFrame(
        [(i, i * 7 % 100) for i in range(200)], "pid long, ts long"
    )
    ivs = spark.createDataFrame(
        [(j, j * 11 % 80, j * 11 % 80 + (j % 23)) for j in range(40)],
        "iid long, s long, e long",
    )
    return pts, ivs


@pytest.mark.parametrize("grid", [1, 5, 23, 100])
def test_interval_join_matches_naive_for_any_grid(spark, data, grid):
    """The grid is a pruning key only — every grid size yields the
    exact naive-join result (incl. grids smaller than the longest
    interval and one spanning everything)."""
    pts, ivs = data
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(pts, ivs, "ts", "s", "e", grid=grid).collect()
    )
    want = sorted((r.pid, r.iid) for r in _naive(pts, ivs, spark).collect())
    assert got == want and len(want) > 100  # non-trivial match volume


def test_interval_join_boundaries_closed(spark):
    pts = spark.createDataFrame([(1, 10), (2, 20), (3, 9), (4, 21)], "pid long, ts long")
    ivs = spark.createDataFrame([(7, 10, 20)], "iid long, s long, e long")
    got = sorted(r.pid for r in interval_join(pts, ivs, "ts", "s", "e", grid=8).collect())
    assert got == [1, 2]  # closed on both ends, 9 and 21 excluded


def test_interval_join_plan_has_no_nested_loop(spark, data):
    """The point of the operator: the range predicate becomes a hash
    equi-join on the grid cell, never BroadcastNestedLoopJoin."""
    pts, ivs = data
    plan = interval_join(
        pts, ivs, "ts", "s", "e", grid=23
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    # an equi-join on the grid cell: hash or sort-merge, AQE's choice
    assert "HashJoin" in plan or "SortMergeJoin" in plan
    # while the NAIVE formulation does nested-loop — the thing we avoid
    naive_plan = _naive(pts, ivs, spark)._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" in naive_plan or "CartesianProduct" in naive_plan


def test_interval_join_rejects_bad_grid(spark, data):
    pts, ivs = data
    with pytest.raises(ValueError):
        interval_join(pts, ivs, "ts", "s", "e", grid=0)
