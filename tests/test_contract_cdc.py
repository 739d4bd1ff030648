"""Wave-5 pipeline primitives: the one-pass DQ constraint suite
(operators/quality_checks.py), the CDC snapshot diff
(operators/cdc.py), and the standing Hamming band index + probe
(sources/writers.write_hamming_band_index +
operators/dedup.hamming_banded_probe)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from confidential_storm_spark.operators.cdc import snapshot_diff
from confidential_storm_spark.operators.quality_checks import (
    Check,
    check_suite,
    completeness,
    conformity,
    referential_check,
    uniqueness,
)


# ---------------------------------------------------------------------------
# DQ constraint suite
# ---------------------------------------------------------------------------


def _toy(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10.0),
            (2, "a", 20.0),
            (3, None, 30.0),
            (3, "b", -5.0),
        ],
        "id long, tag string, v double",
    )


def test_check_suite_metrics_and_bounds(spark):
    comp, comp_sql = completeness("tag")
    uni, uni_sql = uniqueness("id")
    conf, conf_sql = conformity(lambda: F.col("v") >= 0, "v >= 0")
    rows = {
        r["constraint"]: r
        for r in check_suite(
            _toy(spark),
            [
                Check("complete_tag", comp, comp_sql, lo=1.0),
                Check("conform_v_nonneg", conf, conf_sql, lo=1.0),
                Check("size", lambda: F.count(F.lit(1)), "COUNT(*)", lo=1.0),
                Check("unique_id", uni, uni_sql, lo=1.0),
            ],
        ).collect()
    }
    assert rows["size"]["value"] == 4.0 and rows["size"]["passed"]
    assert rows["complete_tag"]["value"] == 0.75 and not rows["complete_tag"]["passed"]
    assert rows["unique_id"]["value"] == 0.75 and not rows["unique_id"]["passed"]
    assert rows["conform_v_nonneg"]["value"] == 0.75
    # report is ordered by constraint name
    names = [
        r["constraint"]
        for r in check_suite(
            _toy(spark), [Check("b", lambda: F.count(F.lit(1)), "COUNT(*)")]
            + [Check("a", lambda: F.count(F.lit(1)), "COUNT(*)")]
        ).collect()
    ]
    assert names == ["a", "b"]


def test_check_suite_empty_relation_vacuous(spark):
    comp, comp_sql = completeness("tag")
    rows = check_suite(
        _toy(spark).where(F.lit(False)),
        [Check("complete_tag", comp, comp_sql, lo=1.0)],
    ).collect()
    # ratio over zero rows is defined as 1.0: a vacuous contract holds
    assert rows[0]["value"] == 1.0 and rows[0]["passed"]


def test_check_suite_single_aggregate_in_plan(spark):
    comp, comp_sql = completeness("tag")
    conf, conf_sql = conformity(lambda: F.col("v") >= 0, "v >= 0")
    df = check_suite(
        _toy(spark),
        [
            Check("a", comp, comp_sql),
            Check("b", conf, conf_sql),
            Check("c", lambda: F.min("v"), "MIN(v)"),
        ],
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    # one scan feeds one aggregate; adding checks must not add scans
    assert plan.count("Scan ExistingRDD") + plan.count("LocalTableScan") == 1


def test_referential_check_counts_orphans(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,), (9,)], "k long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "d long")
    assert referential_check(fact, "k", dim, "d").collect()[0]["value"] == 2.0


# ---------------------------------------------------------------------------
# CDC snapshot diff
# ---------------------------------------------------------------------------


def _snaps(spark):
    old = spark.createDataFrame(
        [(1, 10, None), (2, 20, 5), (3, 30, 7), (4, None, 1)],
        "k long, a int, b int",
    )
    new = spark.createDataFrame(
        [(2, 20, 5), (3, 31, 7), (4, None, 2), (5, 50, 0)],
        "k long, a int, b int",
    )
    return old, new


def test_snapshot_diff_classifies(spark):
    old, new = _snaps(spark)
    rows = {
        r["k"]: r
        for r in snapshot_diff(old, new, ["k"], ["a", "b"]).collect()
    }
    # k=2 unchanged -> suppressed; k=1 delete; k=5 insert; k=3,4 update
    assert set(rows) == {1, 3, 4, 5}
    assert rows[1]["change"] == "delete" and rows[1]["new_a"] is None
    assert rows[5]["change"] == "insert" and rows[5]["old_a"] is None
    assert rows[3]["change"] == "update" and (rows[3]["old_a"], rows[3]["new_a"]) == (30, 31)
    # NULL -> NULL in a compared column is equal (null-safe); NULL -> 2 is not
    assert rows[4]["change"] == "update" and (rows[4]["old_b"], rows[4]["new_b"]) == (1, 2)


def test_snapshot_diff_null_safe_unchanged(spark):
    old = spark.createDataFrame([(1, None)], "k long, a int")
    new = spark.createDataFrame([(1, None)], "k long, a int")
    assert snapshot_diff(old, new, ["k"], ["a"]).count() == 0


def test_snapshot_diff_composite_key(spark):
    old = spark.createDataFrame([(1, "x", 5), (1, "y", 6)], "k long, s string, a int")
    new = spark.createDataFrame([(1, "x", 5), (1, "y", 7)], "k long, s string, a int")
    rows = snapshot_diff(old, new, ["k", "s"], ["a"]).collect()
    assert len(rows) == 1 and rows[0]["s"] == "y" and rows[0]["change"] == "update"


# ---------------------------------------------------------------------------
# standing Hamming band index + probe
# ---------------------------------------------------------------------------


def test_hamming_probe_matches_bruteforce(spark, tmp_path):
    from confidential_storm_spark.operators.dedup import hamming_banded_probe
    from confidential_storm_spark.sources.writers import write_hamming_band_index

    # corpus of spread-out sigs + batch items at known distances
    corpus = spark.createDataFrame(
        [(i, (i * 0x9E3779B97F4A7C15) % (1 << 63)) for i in range(50)],
        "_id long, sig long",
    )
    path = str(tmp_path / "hband")
    write_hamming_band_index(corpus, path, bands=8)

    ref = {r["_id"]: r["sig"] for r in corpus.collect()}
    batch = spark.createDataFrame(
        [
            (1000, ref[7]),          # exact dup of corpus 7
            (1001, ref[11] ^ 0b1011),  # hamming 3 from corpus 11
            (1002, ref[13] ^ ((1 << 60) - 1) ^ 7),  # far from everything
        ],
        "_id long, sig long",
    )
    got = {
        (r["new_id"], r["corpus_id"]): r["hamming"]
        for r in hamming_banded_probe(spark, batch, path, max_hamming=7, bands=8).collect()
    }
    import collections

    exp = {}
    for bid, bsig in ((1000, ref[7]), (1001, ref[11] ^ 0b1011), (1002, ref[13] ^ ((1 << 60) - 1) ^ 7)):
        for cid, csig in ref.items():
            h = bin((bsig ^ csig) & ((1 << 64) - 1)).count("1")
            if h <= 7:
                exp[(bid, cid)] = h
    assert got == exp
    assert got[(1000, 7)] == 0 and got[(1001, 11)] == 3


def test_hamming_probe_param_mismatch_raises(spark, tmp_path):
    from confidential_storm_spark.operators.dedup import hamming_banded_probe
    from confidential_storm_spark.sources.writers import write_hamming_band_index

    corpus = spark.createDataFrame([(1, 42)], "_id long, sig long")
    path = str(tmp_path / "hband4")
    write_hamming_band_index(corpus, path, bands=4)
    with pytest.raises(ValueError, match="bands"):
        hamming_banded_probe(spark, corpus, path, max_hamming=3, bands=8).collect()
    with pytest.raises(ValueError, match="pigeonhole"):
        hamming_banded_probe(spark, corpus, path, max_hamming=7, bands=4).collect()


def test_hamming_index_write_cap_drops_hot_bucket(spark, tmp_path):
    from confidential_storm_spark.sources.writers import write_hamming_band_index

    # 20 identical sigs (12345 = 0x3039) make all 8 of their buckets
    # hot; cap 5 drops every one of their rows.  Outlier -1 shares no
    # bucket (all bands 0xFF) and keeps 8 rows; outlier 1<<40 collides
    # with the hot zero-valued bands 2,3,4,6,7 and keeps only bands
    # 0, 1, 5 — the per-BUCKET (not per-item) semantics of the cap.
    corpus = spark.createDataFrame(
        [(i, 12345) for i in range(20)] + [(100, -1), (101, 1 << 40)],
        "_id long, sig long",
    )
    path = str(tmp_path / "hcap")
    write_hamming_band_index(corpus, path, bands=8, max_bucket_size=5)
    bands_df = spark.read.parquet(f"{path}/bands")
    rows = bands_df.collect()
    assert set(r["_id"] for r in rows) == {100, 101}
    assert sum(r["_id"] == 100 for r in rows) == 8
    assert sorted(r["band"] for r in rows if r["_id"] == 101) == [0, 1, 5]
    params = {r["name"]: r["value"] for r in spark.read.parquet(f"{path}/params").collect()}
    assert params == {"bands": 8, "max_bucket_size": 5}
