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


def test_split_assign_sql_single_split_and_quote_escaping(spark):
    import duckdb

    from confidential_storm_spark.operators.sampling import (
        split_assign,
        split_assign_sql,
    )

    # single-entry splits: a CASE with no WHENs is invalid SQL — the
    # twin must emit a plain literal, and both engines put every row
    # in the one split
    expr = split_assign_sql({"all": 1.0})
    assert expr == "'all'"
    con = duckdb.connect()
    assert con.execute(f"SELECT {expr} FROM (SELECT 7 AS doc_id)").fetchone()[0] == "all"

    # names containing a single quote are escaped in the SQL twin and
    # agree with the Spark expression row-by-row
    splits = {"it's train": 0.5, "it's test": 0.5}
    df = spark.range(200).withColumnRenamed("id", "doc_id")
    spark_rows = dict(split_assign(df, splits).collect())
    sql = split_assign_sql(splits)
    duck_rows = dict(
        con.execute(
            f"SELECT doc_id, {sql} AS split FROM (SELECT UNNEST(RANGE(200)) AS doc_id)"
        ).fetchall()
    )
    assert spark_rows == duck_rows

    with pytest.raises(ValueError):
        split_assign(df, {})
    with pytest.raises(ValueError):
        split_assign_sql({})


def test_win_start_floors_down_for_negative_micros(spark):
    """Pre-epoch timestamps must floor DOWN (DuckDB time_bucket
    semantics), not truncate toward zero."""
    import duckdb

    from confidential_storm_spark.plans.queries import _6H_US, _win_start

    micros = [-1, -_6H_US, -_6H_US - 1, 0, 1, _6H_US + 5]
    df = spark.createDataFrame([(n,) for n in micros], "us long")
    got = {
        r["us"]: r["w"]
        for r in df.select("us", _win_start(F.col("us"), _6H_US).alias("w")).collect()
    }
    duck = duckdb.connect()
    for n in micros:
        expect = duck.execute(
            f"SELECT time_bucket(INTERVAL 6 HOUR, make_timestamp({n}))"
        ).fetchone()[0]
        assert got[n] == expect, (n, got[n], expect)


def test_ts_to_micros_handles_timestamp_and_long_nanos(spark):
    """The events source normalizer dispatches on the actual ts dtype:
    TIMESTAMP_NTZ (current driver parquet) and legacy long nanos give
    the same epoch-micros value."""
    import datetime as dt

    from confidential_storm_spark.sources.tables import ts_to_micros

    when = dt.datetime(2024, 1, 15, 7, 30, 0, 123456)
    us = int(when.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    ntz = spark.createDataFrame([(when,)], "ts timestamp_ntz")
    assert ntz.select(ts_to_micros(ntz).alias("us")).collect()[0]["us"] == us
    legacy = spark.createDataFrame([(us * 1000 + 789,)], "ts long")  # nanos
    assert legacy.select(ts_to_micros(legacy).alias("us")).collect()[0]["us"] == us
    # LTZ branch (a session with inferTimestampNTZ disabled reads the
    # same column as TIMESTAMP): unix_micros is UTC-anchored, so the
    # value still matches DuckDB's epoch_us under any session timezone
    ltz = spark.createDataFrame(
        [(when.replace(tzinfo=dt.timezone.utc),)], "ts timestamp"
    )
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert ltz.select(ts_to_micros(ltz).alias("us")).collect()[0]["us"] == us
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    import pytest

    with pytest.raises(TypeError):
        bad = spark.createDataFrame([("x",)], "ts string")
        ts_to_micros(bad)


def test_contributions_epoch_is_session_timezone_invariant(spark, sf_dir):
    """Round-5 review fix: epoch must be derived on the naive-UTC
    timeline (pure micros arithmetic), not via event_time.cast('date')
    — the date cast shifts at the SESSION timezone's midnights, so a
    non-UTC session silently disagreed with both the DuckDB oracle
    (naive CAST(ts AS DATE)) and the streaming event-time window
    derivation (UTC-aligned F.window)."""
    from confidential_storm_spark.sources.tables import contributions_view

    utc = [
        (r["event_id"], r["epoch"])
        for r in contributions_view(spark, sf_dir).select("event_id", "epoch").collect()
    ]
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        ny = [
            (r["event_id"], r["epoch"])
            for r in contributions_view(spark, sf_dir)
            .select("event_id", "epoch")
            .collect()
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    assert sorted(utc) == sorted(ny)
