"""SimHash near-duplicate pair tests."""

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
        for r in simhash_neardup_pairs(docs, max_hamming=16).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and 0 < pairs[(1, 3)] <= 16
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_simhash_deterministic(spark):
    docs = spark.createDataFrame(
        [(i, f"text number {i} with shared words") for i in range(20)],
        "doc_id long, text string",
    )
    a = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash64(docs).collect()}
    assert a == b
