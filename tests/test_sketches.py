"""HyperLogLog / Count-Min sketch operators: accuracy bounds,
branch coverage, mergeability."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _values(spark, n, prefix="v", copies=1):
    df = spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("val")
    )
    for _ in range(copies - 1):
        df = df.union(df.limit(n))
    return df


def test_hll_large_range_within_relative_error(spark):
    from confidential_storm_spark.operators.sketches import hll_distinct

    n = 30_000  # well past linear counting for m=4096
    df = _values(spark, n).withColumn("g", F.lit("a"))
    est = hll_distinct(df, ["g"], "val").collect()[0]["approx_distinct"]
    # HLL stderr ~ 1.04/sqrt(4096) = 1.6%; assert 3 sigma
    assert abs(est - n) / n < 0.05


def test_hll_small_range_linear_counting_near_exact(spark):
    from confidential_storm_spark.operators.sketches import hll_distinct

    df = _values(spark, 100).withColumn("g", F.lit("a"))
    est = hll_distinct(df, ["g"], "val").collect()[0]["approx_distinct"]
    assert abs(est - 100) <= 3  # linear counting is near-exact here


def test_hll_insensitive_to_duplicates(spark):
    from confidential_storm_spark.operators.sketches import hll_distinct

    once = _values(spark, 500).withColumn("g", F.lit("a"))
    thrice = _values(spark, 500, copies=3).withColumn("g", F.lit("a"))
    e1 = hll_distinct(once, ["g"], "val").collect()[0]["approx_distinct"]
    e3 = hll_distinct(thrice, ["g"], "val").collect()[0]["approx_distinct"]
    assert e1 == e3


def test_hll_per_key_independent(spark):
    from confidential_storm_spark.operators.sketches import hll_distinct

    a = _values(spark, 200).withColumn("g", F.lit("a"))
    b = _values(spark, 50, prefix="w").withColumn("g", F.lit("b"))
    rows = {
        r["g"]: r["approx_distinct"]
        for r in hll_distinct(a.union(b), ["g"], "val").collect()
    }
    assert abs(rows["a"] - 200) <= 5 and abs(rows["b"] - 50) <= 3


def test_cms_upper_bounds_true_counts(spark):
    from confidential_storm_spark.operators.sketches import cms_estimates

    # skewed corpus: value i appears i+1 times, 200 distinct values
    df = spark.range(200).select(
        F.explode(
            F.transform(F.sequence(F.lit(0), F.col("id")), lambda _: F.concat(F.lit("k"), F.col("id")))
        ).alias("val")
    )
    exact = {r["val"]: r["n"] for r in df.groupBy("val").agg(F.count(F.lit(1)).alias("n")).collect()}
    est = {r["val"]: r["cms_count"] for r in cms_estimates(df, "val").collect()}
    assert set(est) == set(exact)
    overshoot = [est[v] - exact[v] for v in exact]
    assert all(o >= 0 for o in overshoot)  # one-sided error, always
    # with 200 values in 4x1024 the vast majority collide nowhere
    assert sorted(overshoot)[len(overshoot) // 2] == 0


def test_hll_union_merge_equals_direct_sketch(spark):
    """Register-wise max of two sketches IS the sketch of the union —
    merged estimate equals the direct estimate exactly, and all four
    set estimates land within HLL error of the true cardinalities."""
    from confidential_storm_spark.operators.sketches import (
        _hll_finish,
        _hll_regs,
        hll_set_estimates,
    )
    from pyspark.sql import functions as F

    # two overlapping cohorts: a = 0..999, b = 600..1599 (overlap 400)
    df = spark.createDataFrame(
        [(i, "a") for i in range(1000)] + [(i, "b") for i in range(600, 1600)],
        "uid long, grp string",
    )
    row = hll_set_estimates(
        df, "uid", F.col("grp") == "a", F.col("grp") == "b"
    ).collect()[0]
    # merged union estimate == direct sketch of the union (same registers)
    direct = _hll_finish(
        _hll_regs(df.select("uid").distinct(), "uid"), "est"
    ).collect()[0]["est"]
    assert row["est_union"] == direct
    # p=12 standard error is ~1.04/sqrt(4096) = 1.6%; allow 3 sigma,
    # intersection compounds three estimates so allow a wider band
    assert abs(row["est_a"] - 1000) / 1000 < 0.05
    assert abs(row["est_b"] - 1000) / 1000 < 0.05
    assert abs(row["est_union"] - 1600) / 1600 < 0.05
    assert abs(row["est_intersection"] - 400) / 400 < 0.25
