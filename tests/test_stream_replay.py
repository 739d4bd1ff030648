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
