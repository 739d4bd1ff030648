"""Bloom pre-filter + weighted sampling (round-5 training-data ops)."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.operators.bloom import (
    bloom_build,
    bloom_flag,
    bloom_pack,
)
from confidential_storm_spark.operators.sampling import weighted_sample_topk

K, M = 4, 1 << 12  # small m so false positives actually occur in tests


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, digest string")


def _py_positions(value: str, k: int = K, m: int = M) -> set[int]:
    return {
        int(hashlib.md5(f"{j}:{value}".encode()).hexdigest()[:8], 16) % m
        for j in range(k)
    }


def test_bloom_no_false_negatives_and_exact_positions(spark):
    corpus = _docs(spark, [(i, f"val-{i}") for i in range(200)])
    batch = _docs(
        spark,
        [(1000 + i, f"val-{i}") for i in range(50)]  # true members
        + [(2000 + i, f"new-{i}") for i in range(50)],  # unseen
    )
    positions = bloom_build(corpus, "digest", k=K, m=M)
    # the relational bitmap is exactly the python-side reference bitmap
    want = set()
    for i in range(200):
        want |= _py_positions(f"val-{i}")
    got = {r.pos for r in positions.collect()}
    assert got == want
    flags = {
        r.doc_id: r.maybe_dup
        for r in bloom_flag(batch, positions, "digest", "doc_id", k=K, m=M).collect()
    }
    # Bloom guarantee: every true member flagged (no false negatives)
    assert all(flags[1000 + i] for i in range(50))
    # unseen rows flag only when ALL their bits collide (mirror exactly)
    for i in range(50):
        assert flags[2000 + i] == (_py_positions(f"new-{i}") <= want)


def test_bloom_union_is_merge_and_pack_matches(spark):
    a = _docs(spark, [(i, f"a-{i}") for i in range(100)])
    b = _docs(spark, [(i, f"b-{i}") for i in range(100)])
    merged = (
        bloom_build(a, "digest", k=K, m=M)
        .unionByName(bloom_build(b, "digest", k=K, m=M))
        .distinct()
    )
    direct = bloom_build(a.unionByName(b), "digest", k=K, m=M)
    assert {r.pos for r in merged.collect()} == {r.pos for r in direct.collect()}
    # packed words carry exactly the same bits
    words = {r.word_idx: r.word for r in bloom_pack(direct, m=M).collect()}
    unpacked = {
        wi * 64 + bit for wi, w in words.items() for bit in range(64) if (w >> bit) & 1
    }
    assert unpacked == {r.pos for r in direct.collect()}


def test_bloom_probe_plan_broadcasts_filter(spark):
    corpus = _docs(spark, [(i, f"val-{i}") for i in range(50)])
    batch = _docs(spark, [(i, f"val-{i}") for i in range(50)])
    positions = bloom_build(corpus, "digest", k=K, m=M)
    plan = bloom_flag(
        batch, positions, "digest", "doc_id", k=K, m=M
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the corpus-side never shuffles


def _py_key(doc_id: int, weight: float) -> float:
    h = int(hashlib.md5(f"ws:{doc_id}".encode()).hexdigest()[:12], 16)
    return math.log((h + 1.0) / ((1 << 48) + 1.0)) / max(weight, 1.0)


def test_weighted_sample_matches_reference_topk(spark):
    rows = [(i, (i * 37) % 100 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [r.doc_id for r in weighted_sample_topk(df, 20, "w").collect()]
    want = sorted(rows, key=lambda r: (-_py_key(r[0], r[1]), r[0]))[:20]
    assert got == [d for d, _ in want]


def test_weighted_sample_partition_invariant_and_clamped(spark):
    rows = [(i, 0 if i % 3 == 0 else i) for i in range(300)]
    df1 = spark.createDataFrame(rows, "doc_id long, w long")
    df7 = df1.repartition(7)
    a = weighted_sample_topk(df1, 25, "w").collect()
    b = weighted_sample_topk(df7, 25, "w").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    # zero weights clamp to 1 (no NaN/inf keys, weight column reports 1)
    zero = weighted_sample_topk(
        spark.createDataFrame([(1, 0)], "doc_id long, w long"), 1, "w"
    ).collect()[0]
    assert zero.weight == 1 and math.isfinite(zero.sample_key)


def test_weighted_sample_biases_toward_heavy_rows(spark):
    # two strata, weight 100 vs 1: the heavy stratum should dominate a
    # 50-of-1000 sample overwhelmingly (deterministic draw, fixed data)
    rows = [(i, 100 if i < 500 else 1) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample_topk(df, 50, "w").collect()
    heavy = sum(1 for r in got if r.doc_id < 500)
    assert heavy >= 45


def test_bloom_index_roundtrip_and_append_union(spark, tmp_path):
    """Persisted packed-words Bloom index: flags agree with the
    in-memory filter, and append-mode runs OR together (a probe
    against the appended index sees BOTH corpora) without
    read-modify-write."""
    from confidential_storm_spark.sources.writers import (
        bloom_flag_against_index,
        write_bloom_index,
    )

    path = str(tmp_path / "bloom_idx")
    corpus1 = spark.createDataFrame(
        [(i, f"text-a-{i}") for i in range(100)], "doc_id long, text string"
    )
    corpus2 = spark.createDataFrame(
        [(i, f"text-b-{i}") for i in range(100)], "doc_id long, text string"
    )
    write_bloom_index(corpus1, path, k=K, m=M)
    write_bloom_index(corpus2, path, k=K, m=M, mode="append")

    batch = spark.createDataFrame(
        [(1, "text-a-5"), (2, "text-b-99"), (3, "fresh-doc")],
        "doc_id long, text string",
    )
    flags = {
        r.doc_id: r.maybe_dup
        for r in bloom_flag_against_index(spark, batch, path, k=K, m=M).collect()
    }
    assert flags[1] and flags[2]  # members of either appended corpus
    # flag 3 must agree with the bit-exact python replica (FP or not)
    import hashlib

    want = set()
    for t in [f"text-a-{i}" for i in range(100)] + [f"text-b-{i}" for i in range(100)]:
        want |= _py_positions(hashlib.md5(t.encode()).hexdigest())
    probe = _py_positions(hashlib.md5(b"fresh-doc").hexdigest())
    assert flags[3] == (probe <= want)
