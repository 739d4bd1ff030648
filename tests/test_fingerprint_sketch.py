"""Wave-6 primitives: dataset content digest
(operators/fingerprint_ds.py), CMS join-size estimate
(operators/sketches.cms_join_size), and the grouped DQ suite."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from confidential_storm_spark.operators.fingerprint_ds import (
    DIGEST_MOD,
    dataset_digest,
)
from confidential_storm_spark.operators.sketches import cms_join_size


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, txt string")


def _py_digest(rows):
    tot = 0
    for rid, txt in rows:
        canon = f"{rid}|{txt if txt is not None else '␀'}"
        tot += int(hashlib.md5(canon.encode()).hexdigest()[:15], 16)
    return len(rows), tot % DIGEST_MOD


def test_digest_matches_reference_and_ignores_layout(spark):
    rows = [(i, f"doc {i}") for i in range(100)]
    df = _docs(spark, rows)
    n, d = _py_digest(rows)
    got = dataset_digest(df, ["id", "txt"]).collect()[0]
    assert (got["n_rows"], got["digest"]) == (n, d)
    # partition layout and row order are invisible
    for layout in (df.repartition(7), df.orderBy(F.desc("id")).coalesce(1)):
        r = dataset_digest(layout, ["id", "txt"]).collect()[0]
        assert (r["n_rows"], r["digest"]) == (n, d)


def test_digest_duplicate_sensitive(spark):
    rows = [(1, "a"), (2, "b")]
    base = dataset_digest(_docs(spark, rows), ["id", "txt"]).collect()[0]
    dup = dataset_digest(
        _docs(spark, rows + [(1, "a"), (1, "a")]), ["id", "txt"]
    ).collect()[0]
    # XOR would cancel the pair of extra copies; the modular sum must not
    assert dup["n_rows"] == 4 and dup["digest"] != base["digest"]


def test_digest_null_distinct_from_empty(spark):
    a = dataset_digest(_docs(spark, [(1, None)]), ["id", "txt"]).collect()[0]
    b = dataset_digest(_docs(spark, [(1, "")]), ["id", "txt"]).collect()[0]
    assert a["digest"] != b["digest"]


def test_digest_grouped(spark):
    df = spark.createDataFrame(
        [(1, "a", "s1"), (2, "b", "s1"), (3, "c", "s2")],
        "id long, txt string, src string",
    )
    rows = {r["src"]: r for r in dataset_digest(df, ["id", "txt"], by=["src"]).collect()}
    assert rows["s1"]["n_rows"] == 2 and rows["s2"]["n_rows"] == 1
    n1, d1 = _py_digest([(1, "a"), (2, "b")])
    assert rows["s1"]["digest"] == d1


def test_cms_join_size_bounds_and_exact(spark):
    a = spark.createDataFrame([(k,) for k in [1, 1, 1, 2, 3]], "k long")
    b = spark.createDataFrame([(k,) for k in [1, 2, 2, 4]], "k long")
    row = cms_join_size(a, "k", b, "k").collect()[0]
    # exact: 3*1 (k=1) + 1*2 (k=2) = 5
    assert row["exact_join_size"] == 5
    # CMS inner product upper-bounds the true join size (collisions
    # only add cross terms); tiny domain -> no collisions -> equality
    assert row["est_join_size"] == 5


def test_cms_join_size_overestimates_never_under(spark):
    a = spark.createDataFrame([(i,) for i in range(3000)], "k long")
    b = spark.createDataFrame([(i,) for i in range(0, 6000, 2)], "k long")
    row = cms_join_size(a, "k", b, "k").collect()[0]
    assert row["exact_join_size"] == 1500
    assert row["est_join_size"] >= row["exact_join_size"]


def test_check_suite_grouped_reports_per_group(spark):
    from confidential_storm_spark.operators.quality_checks import (
        Check,
        check_suite,
        conformity,
    )

    df = spark.createDataFrame(
        [(0, 5.0), (0, 700.0), (1, 3.0), (1, 4.0)], "epoch long, v double"
    )
    conf, conf_sql = conformity(lambda: F.col("v") >= 0, "v >= 0")
    rep = check_suite(
        df,
        [
            Check("v_cap", lambda: F.max("v"), "MAX(v)", hi=400.0),
            Check("v_nonneg", conf, conf_sql, lo=1.0),
        ],
        by=["epoch"],
    ).collect()
    got = {(r["epoch"], r["constraint"]): r["passed"] for r in rep}
    assert got == {
        (0, "v_cap"): False,
        (0, "v_nonneg"): True,
        (1, "v_cap"): True,
        (1, "v_nonneg"): True,
    }
    # ordered by (group, constraint)
    assert [(r["epoch"], r["constraint"]) for r in rep] == sorted(
        (r["epoch"], r["constraint"]) for r in rep
    )


def test_cms_join_hotkeys_ranks_and_bounds(spark):
    from confidential_storm_spark.operators.sketches import cms_join_hotkeys

    a = spark.createDataFrame(
        [(k,) for k in [7] * 50 + [3] * 20 + [5] * 5 + [9]], "k long"
    )
    b = spark.createDataFrame([(k,) for k in [7] * 4 + [3] * 2 + [11]], "k long")
    rows = cms_join_hotkeys(a, "k", b, "k", k=3).collect()
    assert [r["key"] for r in rows] == ["7", "3", "5"]  # cnt desc, key tiebreak
    by = {r["key"]: r for r in rows}
    assert by["7"]["exact_contrib"] == 200 and by["3"]["exact_contrib"] == 40
    assert by["5"]["exact_contrib"] == 0  # absent on side B
    for r in rows:  # CMS never underestimates
        assert r["est_contrib"] >= r["exact_contrib"]
    # tiny domain -> no collisions -> estimates exact
    assert by["7"]["est_contrib"] == 200 and by["5"]["est_contrib"] == 0
