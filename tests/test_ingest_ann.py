"""Streaming embedding ingest into the standing IVF index."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from confidential_storm_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk_indexed,
    ivf_write_index,
)
from confidential_storm_spark.sources.tables import load_table
from confidential_storm_spark.streaming.ingest_ann import ann_ingest_stream


def test_ann_ingest_stream_appends_every_batch(spark, sf_dir, tmp_path):
    """Base index on 60% of embeddings; the other 40% arrives as a
    4-file stream.  After the stream drains, the standing index serves
    EXACT full-probe results over base+streamed together, and every
    streamed vector is present exactly once."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 > 1)
    feed = emb.filter(F.col("vec_id") % 5 <= 1)
    path = str(tmp_path / "ivf")
    ivf_write_index(base, path, n_clusters=8)

    src = str(tmp_path / "feed")
    feed.repartition(4).write.parquet(src)
    stream = spark.readStream.schema(emb.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = ann_ingest_stream(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination(240)

    vec = spark.read.parquet(f"{path}/vectors")
    ids = [r["vec_id"] for r in vec.select("vec_id").collect()]
    assert sorted(ids) == sorted(r["vec_id"] for r in emb.select("vec_id").collect())

    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    full = ivf_topk_indexed(spark, path, qv, k=10, n_probe=8)
    bf = brute_force_topk(emb, qv, k=10)
    assert [tuple(r) for r in full.collect()] == [tuple(r) for r in bf.collect()]


def test_ann_ingest_stream_compressed(spark, tmp_path):
    """compressed=True routes through ivfpq_append: streamed rows gain
    pq_code columns that bit-match a fresh encode with the standing
    codebooks."""
    from confidential_storm_spark.operators.pq import (
        ivfpq_write_index,
        pq_encode,
    )

    rng = np.random.default_rng(9)
    rows = [(i, rng.normal(size=16).tolist()) for i in range(240)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.filter(F.col("vec_id") % 4 != 0)
    feed = df.filter(F.col("vec_id") % 4 == 0)
    path = str(tmp_path / "ivfpq")
    _cent, books = ivfpq_write_index(base, path, 16, n_clusters=4, m=4, ks=8)

    src = str(tmp_path / "feed")
    feed.repartition(2).write.parquet(src)
    stream = spark.readStream.schema(df.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = ann_ingest_stream(stream, path, str(tmp_path / "ckpt"), compressed=True)
    q.awaitTermination(240)

    stored = {
        r["vec_id"]: list(r["pq_code"])
        for r in spark.read.parquet(f"{path}/vectors")
        .join(feed.select("vec_id"), "vec_id", "left_semi")
        .collect()
    }
    fresh = {r["vec_id"]: list(r["pq_code"]) for r in pq_encode(feed, books).collect()}
    assert stored == fresh and len(stored) == feed.count()


def test_ann_ingest_replay_is_idempotent(spark, tmp_path):
    """The epoch ledger makes a checkpoint-replayed batch a no-op:
    running the same availableNow stream twice with the SAME source
    (fresh checkpoint, so every epoch replays) appends nothing the
    second time; with idempotent=False the replay double-appends."""
    rng = np.random.default_rng(17)
    rows = [(i, rng.normal(size=16).tolist()) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    base = df.filter(F.col("vec_id") % 4 != 0)
    feed = df.filter(F.col("vec_id") % 4 == 0)
    src = str(tmp_path / "feed")
    feed.repartition(2).write.parquet(src)

    for flag, expect in ((True, feed.count()), (False, 2 * feed.count())):
        path = str(tmp_path / f"ivf_{flag}")
        ivf_write_index(base, path, n_clusters=4)

        def run(ck):
            stream = (
                spark.readStream.schema(df.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            q = ann_ingest_stream(stream, path, str(tmp_path / ck), idempotent=flag)
            q.awaitTermination(240)

        run(f"ck1_{flag}")
        run(f"ck2_{flag}")  # fresh checkpoint: every epoch replays
        n_feed_rows = (
            spark.read.parquet(f"{path}/vectors")
            .join(feed.select("vec_id"), "vec_id", "left_semi")
            .count()
        )
        assert n_feed_rows == expect, (flag, n_feed_rows, expect)
