"""Theta/KMV sketch set algebra, incremental-MV partial merges, and
the session-window boundary semantics the replay oracle encodes."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.operators.mv import (
    finish_revenue,
    merge_revenue_partials,
    revenue_partials,
)
from confidential_storm_spark.operators.sketches import (
    hll_distinct,
    hll_finish_keyed,
    hll_merge_registers,
    hll_registers_keyed,
)
from confidential_storm_spark.operators.theta import (
    kmv_sketch,
    theta_set_estimates,
)


def _ids(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id").alias("v"), F.lit(tag).alias("tag")
    )


def test_theta_unsaturated_sets_are_exact(spark):
    # both cohorts below k distinct values -> theta = 2^60, estimates
    # collapse to exact counts
    df = _ids(spark, 0, 30, "a").unionByName(_ids(spark, 20, 50, "b"))
    row = theta_set_estimates(
        df, "v", F.col("tag") == "a", F.col("tag") == "b", k=64
    ).collect()[0]
    assert row.est_a == 30.0
    assert row.est_b == 30.0
    assert row.est_intersection == 10.0
    assert row.est_union == 50.0
    assert row.est_a_not_b == 20.0


def test_theta_saturated_estimates_within_error(spark):
    # |A| = 3000, |B| = 3000, |A ∩ B| = 1000; k = 256 -> relative
    # error ~ 1/sqrt(k-2) ≈ 6%; allow 4 sigma on the set estimates
    k = 256
    df = _ids(spark, 0, 3000, "a").unionByName(_ids(spark, 2000, 5000, "b"))
    row = theta_set_estimates(
        df, "v", F.col("tag") == "a", F.col("tag") == "b", k=k
    ).collect()[0]
    tol = 4 / (k - 2) ** 0.5
    assert abs(row.est_a - 3000) / 3000 < tol
    assert abs(row.est_b - 3000) / 3000 < tol
    assert abs(row.est_union - 5000) / 5000 < tol
    # intersection uses only ~n_intersection samples: wider tolerance
    assert abs(row.est_intersection - 1000) / 1000 < 0.35
    # the sample-domain identity is exact by construction
    assert row.n_a == row.n_intersection + (
        row.n_a - row.n_intersection
    )
    assert row.est_a == pytest.approx(
        row.est_intersection + row.est_a_not_b, abs=1e-6
    )


def test_theta_disjoint_sets_zero_intersection(spark):
    df = _ids(spark, 0, 2000, "a").unionByName(_ids(spark, 5000, 7000, "b"))
    row = theta_set_estimates(
        df, "v", F.col("tag") == "a", F.col("tag") == "b", k=128
    ).collect()[0]
    assert row.est_intersection == 0.0
    assert row.n_intersection == 0


def test_kmv_sketch_is_k_smallest_distinct(spark):
    df = spark.range(0, 500).select(F.col("id").alias("v"))
    dup = df.unionByName(df)  # duplicates must not change the sketch
    a = [r.h for r in kmv_sketch(df, "v", 32).collect()]
    b = [r.h for r in kmv_sketch(dup, "v", 32).collect()]
    assert sorted(a) == sorted(b)
    assert len(set(a)) == 32


def _orders(spark):
    rows = [
        ("1-URGENT", datetime(1995, 3, 1), 100.10),
        ("1-URGENT", datetime(1999, 3, 1), 200.20),
        ("2-HIGH", datetime(1996, 5, 1), 50.55),
        ("2-HIGH", datetime(1999, 6, 1), 70.45),
        ("2-HIGH", datetime(1999, 6, 2), 30.00),
    ]
    return spark.createDataFrame(
        rows, "o_orderpriority string, o_orderdate timestamp, o_totalprice double"
    )


def test_mv_partial_merge_equals_full_recompute(spark):
    orders = _orders(spark).withColumn(
        "order_year", F.year("o_orderdate").cast("long")
    )
    keys = ["o_orderpriority", "order_year"]
    base = orders.where(F.col("o_orderdate") < "1999-01-01")
    delta = orders.where(F.col("o_orderdate") >= "1999-01-01")
    merged = finish_revenue(
        merge_revenue_partials(
            revenue_partials(base, keys), revenue_partials(delta, keys)
        )
    )
    full = finish_revenue(revenue_partials(orders, keys))
    got = {tuple(r[:2]): r[2:] for r in merged.collect()}
    want = {tuple(r[:2]): r[2:] for r in full.collect()}
    assert got == want
    # exact decimal money: the 1999 2-HIGH cell is 70.45 + 30.00
    assert got[("2-HIGH", 1999)][0] == pytest.approx(100.45, abs=0)


def test_mv_merge_with_empty_delta_is_identity(spark):
    orders = _orders(spark).withColumn(
        "order_year", F.year("o_orderdate").cast("long")
    )
    keys = ["o_orderpriority", "order_year"]
    p = revenue_partials(orders, keys)
    empty = revenue_partials(orders.where(F.lit(False)), keys)
    assert sorted(map(tuple, finish_revenue(merge_revenue_partials(p, empty)).collect())) == sorted(
        map(tuple, finish_revenue(p).collect())
    )


def test_hll_rollup_registers_equal_direct_sketch(spark):
    # estimates from per-day stored registers merged down to the key
    # must be BIT-identical to a direct sketch of the same slice
    df = spark.range(0, 4000).select(
        (F.col("id") % 7).alias("day"),
        (F.col("id") % 3).cast("string").alias("key"),
        (F.col("id") % 997).alias("user"),
    )
    regs = hll_registers_keyed(df, ["day", "key"], "user")
    rolled = hll_finish_keyed(hll_merge_registers(regs, ["key"]), ["key"])
    direct = hll_distinct(df, ["key"], "user")
    assert sorted(map(tuple, rolled.collect())) == sorted(
        map(tuple, direct.collect())
    )
    # a day-range slice rolls up identically too
    sl = F.col("day") < 3
    rolled_sl = hll_finish_keyed(
        hll_merge_registers(regs.where(sl), ["key"]), ["key"]
    )
    direct_sl = hll_distinct(df.where(sl), ["key"], "user")
    assert sorted(map(tuple, rolled_sl.collect())) == sorted(
        map(tuple, direct_sl.collect())
    )


def test_session_window_boundary_matches_island_rule(spark):
    # the replay oracle breaks sessions when gap > 6h; Spark must
    # MERGE an exactly-6h gap and BREAK 6h + 1us
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0)),
        (1, datetime(2024, 1, 1, 6, 0, 0)),       # exactly the gap: merge
        (2, datetime(2024, 1, 1, 0, 0, 0)),
        (2, datetime(2024, 1, 1, 6, 0, 0, 1)),    # 1us over: break
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = (
        df.groupBy("user_id", F.session_window("ts", "6 hours"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", "n")
        .collect()
    )
    per_user = sorted((r.user_id, r.n) for r in out)
    assert per_user == [(1, 2), (2, 1), (2, 1)]


def test_kmv_keyed_merge_equals_direct_build(spark):
    # the lossless-merge property the theta rollup MV rests on: per-day
    # sketches merged down to the coarse key == the sketch built
    # directly from the slice (k-min containment), and the finished
    # estimates match bit-for-bit
    from confidential_storm_spark.operators.theta import (
        kmv_finish_keyed,
        kmv_merge_keyed,
        kmv_sketch_keyed,
    )

    k = 16
    rows = [
        (d, "g%d" % (v % 2), v * 7919 % 501)  # overlapping values across days
        for d in range(3)
        for v in range(400)
    ]
    df = spark.createDataFrame(rows, "day int, grp string, v int")
    fine = kmv_sketch_keyed(df, ["day", "grp"], "v", k)
    merged = kmv_merge_keyed(fine, ["grp"], k)
    direct = kmv_sketch_keyed(df, ["grp"], "v", k)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    est_m = sorted(map(tuple, kmv_finish_keyed(merged, ["grp"], k).collect()))
    est_d = sorted(map(tuple, kmv_finish_keyed(direct, ["grp"], k).collect()))
    assert est_m == est_d
    # a day-range slice rolls up identically too
    sl = F.col("day") < 2
    m_sl = kmv_merge_keyed(fine.where(sl), ["grp"], k)
    d_sl = kmv_sketch_keyed(df.where(sl), ["grp"], "v", k)
    assert sorted(map(tuple, m_sl.collect())) == sorted(
        map(tuple, d_sl.collect())
    )


def test_kmv_finish_unsaturated_is_exact(spark):
    # below k distinct values the sketch retains everything and the
    # estimate collapses to the exact distinct count
    from confidential_storm_spark.operators.theta import (
        kmv_finish_keyed,
        kmv_sketch_keyed,
    )

    df = spark.createDataFrame(
        [("a", v) for v in range(10)] + [("b", v) for v in range(25)],
        "grp string, v int",
    )
    out = {
        r.grp: (r.est_distinct, r.n_retained)
        for r in kmv_finish_keyed(
            kmv_sketch_keyed(df, ["grp"], "v", 64), ["grp"], 64
        ).collect()
    }
    assert out == {"a": (10.0, 10), "b": (25.0, 25)}
