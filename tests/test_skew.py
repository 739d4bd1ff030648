"""Salted join / salted aggregation: result-identity with the naive
plans, edge cases, and the spread mechanism itself."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.operators.skew import salted_aggregate, salted_join


@pytest.fixture()
def skewed(spark):
    # 1000 rows, 90% on key 7 — the hot-key shape
    return spark.range(1000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") * 1.5).alias("v"),
    )


@pytest.fixture()
def dim(spark):
    return spark.range(100).select(
        F.col("id").alias("dk"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(skewed, dim):
    plain = skewed.join(dim, skewed.k == dim.dk).select("row_id", "k", "v", "name")
    salted = salted_join(skewed, dim, "k", "dk", "row_id", n_salt=8).select(
        "row_id", "k", "v", "name"
    )
    assert _rows(salted) == _rows(plain)


def test_salted_join_left_keeps_unmatched(spark, dim):
    big = spark.range(5).select(
        F.col("id").alias("row_id"), (F.col("id") + 98).alias("k")
    )  # keys 98..102; 100+ unmatched in dim(0..99)
    out = salted_join(big, dim, "k", "dk", "row_id", n_salt=4, how="left")
    assert out.count() == 5
    assert out.filter(F.col("name").isNull()).count() == 3


def test_salted_join_n_salt_one_is_plain(skewed, dim):
    plain = skewed.join(dim, skewed.k == dim.dk).count()
    assert salted_join(skewed, dim, "k", "dk", "row_id", n_salt=1).count() == plain


def test_salted_join_duplicate_small_keys_fan_out(spark):
    big = spark.range(4).select(F.col("id").alias("row_id"), F.lit(1).alias("k"))
    small = spark.createDataFrame([(1, "a"), (1, "b")], "dk long, tag string")
    out = salted_join(big, small, "k", "dk", "row_id", n_salt=4)
    assert out.count() == 8  # 4 big rows x 2 matching small rows


def test_salted_aggregate_equals_plain_groupby(skewed):
    plain = {
        (r["k"]): (r["n"], round(r["s"], 6))
        for r in skewed.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r["k"]): (r["n_rows"], round(r["sum_v"], 6))
        for r in salted_aggregate(skewed, ["k"], ["v"], "row_id", n_salt=8).collect()
    }
    assert salted == plain


def test_salted_aggregate_multiple_keys_and_sums(spark):
    df = spark.range(100).select(
        F.col("id").alias("row_id"),
        (F.col("id") % 3).alias("a"),
        (F.col("id") % 2).alias("b"),
        F.col("id").cast("double").alias("x"),
        (F.col("id") * 2.0).alias("y"),
    )
    out = salted_aggregate(df, ["a", "b"], ["x", "y"], "row_id", n_salt=5)
    assert out.count() == 6
    total = out.agg(F.sum("n_rows"), F.sum("sum_x"), F.sum("sum_y")).first()
    assert tuple(total) == (100, float(sum(range(100))), float(2 * sum(range(100))))


def test_rejects_bad_n_salt(skewed, dim):
    with pytest.raises(ValueError):
        salted_join(skewed, dim, "k", "dk", "row_id", n_salt=0)
    with pytest.raises(ValueError):
        salted_aggregate(skewed, ["k"], ["v"], "row_id", n_salt=-1)


def test_salted_join_spreads_hot_key_without_broadcast(spark, skewed, dim):
    """The mechanism itself: with broadcast off, the shuffle join's
    keys must include the salt, so a hot key hashes to n_salt
    different reducer slots instead of one."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = salted_join(skewed, dim, "k", "dk", "row_id", n_salt=8)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan, plan
        assert "BroadcastHashJoin" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
