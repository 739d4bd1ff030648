"""Deterministic availableNow replay harness (streaming/replay.py):
epoch ordering, final-state selection, and the three driver-gate
replay queries' self-consistency (two runs produce identical results;
the MG replay matches a driver-side mg_merge fold over the same epoch
sequence)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from confidential_storm_spark.streaming.replay import replay_available_now


def test_replay_epoch_order_and_latest_per(spark):
    """Epochs replay in ascending order (one file per micro-batch) and
    latest_per keeps each key's final emission only."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    rows = [(e, f"v{e}") for e in (2, 0, 1)]  # insertion order != epoch order
    inp = spark.createDataFrame(rows, "epoch long, v string")

    def running_concat(key, pdfs, state: GroupState):
        acc = state.get[0] if state.exists else ""
        for pdf in pdfs:
            for v in sorted(pdf["v"]):
                acc = acc + "," + v if acc else v
        state.update((acc,))
        yield pd.DataFrame({"k": [int(key[0])], "seen": [acc]})

    def transform(s):
        return (
            s.withColumn("k", F.lit(0))
            .groupBy("k")
            .applyInPandasWithState(
                running_concat,
                outputStructType="k int, seen string",
                stateStructType="acc string",
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            )
        )

    out = replay_available_now(
        spark, inp, "epoch", transform, output_mode="update", latest_per=["k"]
    ).collect()
    assert len(out) == 1
    # ascending epoch order, one batch per epoch, final state only
    assert out[0]["seen"] == "v0,v1,v2"


def test_heavy_hitters_replay_matches_mg_fold(spark, sf_dir):
    """The streamed final MG summary equals a driver-side mg_merge fold
    over the same epoch sequence — the associativity contract the
    DuckDB oracle also relies on."""
    import zlib

    from confidential_storm_spark.plans.queries import (
        _HH_CAPACITY,
        _HH_EPOCHS,
        _HH_SHARDS,
        stream_heavy_hitters_replay,
    )
    from confidential_storm_spark.streaming.heavy_hitters import mg_merge

    got = {
        (r["shard"], r["value"]): (r["count"], r["err_bound"])
        for r in stream_heavy_hitters_replay(spark, sf_dir).collect()
    }

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            (F.col("event_id") % _HH_EPOCHS).alias("epoch"),
            F.col("user_id").cast("string").alias("v"),
            (
                F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 4), 16, 10)
                .cast("long")
                % _HH_SHARDS
            ).cast("int").alias("shard"),
        )
        .toPandas()
    )
    expected = {}
    for shard, sub in ev.groupby("shard"):
        counts, err = {}, 0
        for epoch in range(_HH_EPOCHS):
            batch = sub[sub["epoch"] == epoch]["v"]
            if not len(batch):
                continue
            counts, inc = mg_merge(counts, batch.value_counts(), _HH_CAPACITY)
            err += inc
        for v, c in counts.items():
            expected[(shard, v)] = (c, err)
    assert got == expected


def test_dedup_replay_suppresses_cross_epoch_duplicates(spark, sf_dir):
    """Every digest emits exactly once with first_epoch in {0, 1}: the
    copies injected into epochs 2-3 must all be suppressed by state
    carried across micro-batches."""
    from confidential_storm_spark.plans.queries import stream_dedup_replay

    rows = stream_dedup_replay(spark, sf_dir).collect()
    digests = [r["digest"] for r in rows]
    assert len(digests) == len(set(digests))
    assert all(r["first_epoch"] in (0, 1) for r in rows)


def test_interval_join_replay_matches_batch_join(spark, sf_dir):
    """The replayed stream-stream interval join emits exactly the batch
    interval join's pair set, each pair once, whatever the epoch
    chopping — the inner-join determinism contract the DuckDB oracle
    relies on."""
    from confidential_storm_spark.plans.queries import stream_join_replay
    from confidential_storm_spark.sources.tables import load_table, ts_to_micros

    streamed = sorted(
        (r["view_id"], r["purchase_id"])
        for r in stream_join_replay(spark, sf_dir).collect()
    )
    ev = load_table(spark, sf_dir, "events")
    ev = ev.withColumn("ts", F.timestamp_micros(ts_to_micros(ev)))
    v = ev.where(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), F.col("ts").alias("view_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = sorted(
        (r["view_id"], r["purchase_id"])
        for r in v.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (F.col("purchase_ts") <= F.col("view_ts") + F.expr("INTERVAL 1 HOUR")),
        ).collect()
    )
    assert streamed == batch
    assert len(streamed) == len(set(streamed))  # each pair exactly once


def test_trending_replay_closed_windows_and_ranks(spark, sf_dir):
    """Every real window closes exactly once (sentinel window absent),
    ranks are 1..k dense per window, and counts equal a batch replay
    of the same synthetic timestamps."""
    from confidential_storm_spark.functions.text import words
    from confidential_storm_spark.plans.queries import (
        _TRENDING_K,
        stream_trending_replay,
    )
    from confidential_storm_spark.sources.tables import load_table

    rows = stream_trending_replay(spark, sf_dir).collect()
    assert rows, "no closed windows emitted"
    by_window: dict = {}
    for r in rows:
        # 2-day windows are epoch-aligned: the first real window starts
        # 2023-12-31 (contains 2024-01-01); the sentinel's December-2024
        # window must never appear
        assert r["window_start"] < __import__("datetime").datetime(2024, 2, 1)
        by_window.setdefault(r["window_start"], []).append(r)
    for ws, grp in by_window.items():
        ranks = sorted(r["rank"] for r in grp)
        assert ranks == list(range(1, len(grp) + 1))
        assert len(grp) <= _TRENDING_K
        ns = [r["n"] for r in sorted(grp, key=lambda r: r["rank"])]
        assert ns == sorted(ns, reverse=True)
    # batch twin: same synthetic ts -> same per-window counts
    docs = load_table(spark, sf_dir, "documents").select(
        F.timestamp_seconds(F.lit(1704067200) + (F.col("doc_id") % 6) * 86400).alias("ts"),
        "text",
    )
    batch = {
        (r["w"]["start"], r["word"]): r["n"]
        for r in docs.select(F.col("ts"), F.explode(words(F.col("text"))).alias("word"))
        .groupBy(F.window("ts", "2 days").alias("w"), "word")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        assert batch[(r["window_start"], r["word"])] == r["n"]


def test_replay_derived_partitions_match_explicit(spark):
    """The input-size-derived streaming shuffle partition count
    (round-11: clamp(rows/25k, 2, session setting)) yields the same
    rows as an explicit count — state layout is an execution detail."""
    rows = [(i % 3, i, i % 7) for i in range(600)]
    inp = spark.createDataFrame(rows, "epoch long, v long, k long")

    def transform(s):
        return s.groupBy("k").count()

    kwargs = dict(output_mode="update", latest_per=["k"])
    derived = replay_available_now(spark, inp, "epoch", transform, **kwargs)
    explicit = replay_available_now(
        spark, inp, "epoch", transform, shuffle_partitions=5, **kwargs
    )
    assert {(r.k, r["count"]) for r in derived.collect()} == {
        (r.k, r["count"]) for r in explicit.collect()
    }
