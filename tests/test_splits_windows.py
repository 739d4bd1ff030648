"""Deterministic dataset splits and event-time window queries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_split_assign_partitions_exhaustively(spark):
    from confidential_storm_spark.operators.sampling import split_assign

    df = spark.range(5000).withColumnRenamed("id", "doc_id")
    out = split_assign(df, {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sum(counts.values()) == 5000  # every row in exactly one split
    assert abs(counts["train"] / 5000 - 0.8) < 0.03
    assert abs(counts["val"] / 5000 - 0.1) < 0.02
    assert abs(counts["test"] / 5000 - 0.1) < 0.02


def test_split_assign_stable_under_repartition_and_salt_sensitive(spark):
    from confidential_storm_spark.operators.sampling import split_assign

    df = spark.range(500).withColumnRenamed("id", "doc_id")
    a = dict(split_assign(df, {"train": 0.5, "test": 0.5}).collect())
    b = dict(split_assign(df.repartition(7), {"train": 0.5, "test": 0.5}).collect())
    assert a == b  # per-row hash decision, partitioning-independent
    c = dict(split_assign(df, {"train": 0.5, "test": 0.5}, salt="other").collect())
    assert a != c  # different salt -> different (still valid) split


def test_event_windows_cover_all_events(spark, sf_dir):
    from confidential_storm_spark.plans.queries import (
        q_event_windows,
        q_event_windows_hop,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    n = ev.count()
    tumbling = q_event_windows(spark, sf_dir)
    assert tumbling.agg(F.sum("n_events")).collect()[0][0] == n
    # hopping 12h/6h double-counts every event exactly twice
    hop = q_event_windows_hop(spark, sf_dir)
    assert hop.agg(F.sum("n_events")).collect()[0][0] == 2 * n
