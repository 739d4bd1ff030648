"""SimHash near-duplicate pair tests."""

import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.operators.dedup import simhash64, simhash_neardup_pairs


def test_simhash_identical_and_near_texts(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # identical -> hamming 0
            (3, base.replace("dog", "cat")),  # one word changed -> small hamming
            (4, "completely different words about database engines and shuffles here"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, max_hamming=16, approximate=True).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and 0 < pairs[(1, 3)] <= 16
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_simhash_guaranteed_recall_equals_all_pairs(spark, sf_dir):
    """At max_hamming <= bands-1 the banded join is EXACT (pigeonhole):
    it must equal the brute-force all-pairs Hamming join."""
    from confidential_storm_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    banded = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, max_hamming=3, bands=4).collect()
    }
    sigs = simhash64(docs).withColumnRenamed("doc_id", "_id")
    brute = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in (
            sigs.alias("a")
            .join(sigs.alias("b"), F.col("a._id") < F.col("b._id"))
            .select(
                F.col("a._id").alias("id_a"),
                F.col("b._id").alias("id_b"),
                F.bit_count(
                    F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
                ).alias("hamming"),
            )
            .filter(F.col("hamming") <= 3)
        ).collect()
    }
    assert banded == brute


def test_simhash_rejects_unguaranteed_hamming():
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_neardup_pairs(None, max_hamming=12, bands=4)


def test_simhash_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"text number {i} with shared words") for i in range(20)],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert a == b
