"""Document-stream sources (SURVEY §2.1 S1, S2).

The reference's word-count demo samples a random sealed joke document
every 250 ms (RandomJokeSpout.java:54-73) from a JSON dataset of
``{userId, payload:{header, nonce(b64), ciphertext(b64)}}`` entries
(JokeReader.java:45-98).  Spark-first restatement:

- S2: ``read_sealed_documents`` parses the JSON dataset with
  ``from_json`` + ``unbase64`` into the envelope struct (P10).
- S1: ``rate_document_stream`` drives a ``rate`` streaming source and
  joins each tick to a pseudo-random document — the idiomatic
  replacement for a throttled sampling spout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["read_sealed_documents", "rate_document_stream"]

SEALED_ENTRY_SCHEMA = (
    "userId string, payload struct<header string, nonce string, ciphertext string>"
)


def read_sealed_documents(spark: SparkSession, path: str) -> DataFrame:
    """S2: parse a JSON array of sealed entries into
    ``(user_id, envelope(aad, nonce, ciphertext))`` with base64 fields
    decoded (JokeReader.java:80-101)."""
    raw = spark.read.option("multiLine", True).json(path)
    return raw.select(
        F.col("userId").alias("user_id"),
        F.struct(
            F.col("payload.header").alias("aad"),
            F.unbase64(F.col("payload.nonce")).alias("nonce"),
            F.unbase64(F.col("payload.ciphertext")).alias("ciphertext"),
        ).alias("envelope"),
    )


def rate_document_stream(
    spark: SparkSession,
    documents: DataFrame,
    rows_per_second: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """S1: a rate source emitting ``rows_per_second`` ticks, each tick
    deterministically (hash of tick value) picking one document — the
    reference's 1-joke-per-250 ms sampling spout as a declarative
    stream.  The documents side is broadcast (it is a demo dataset)."""
    n_docs = documents.count()
    ticks = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    picked = ticks.withColumn("_pick", F.pmod(F.xxhash64("value"), F.lit(n_docs)))
    return picked.join(
        F.broadcast(documents.withColumn("_pick", F.col(id_col) % n_docs)),
        "_pick",
    ).drop("_pick")
