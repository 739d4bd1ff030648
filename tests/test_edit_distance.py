"""Edit-distance near-dup: blocking exactness, threshold semantics,
cap behavior, and the brute-force differential.

The length-bucket blocking claims ZERO recall loss (|len diff| <= d
implies same-or-adjacent buckets of width max(d,1)); the differential
against an unblocked brute-force Levenshtein is the proof on corpora
engineered to straddle bucket boundaries.
"""

import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.operators.dedup import (
    edit_distance_pairs,
    edit_distance_pairs_segments,
)


def _brute(spark_rows, max_dist):
    # python-side reference: full O(n^2) Levenshtein
    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    out = set()
    for i, (ia, ta) in enumerate(spark_rows):
        for ib, tb in spark_rows[i + 1 :]:
            d = lev(ta, tb)
            if d <= max_dist:
                out.add((min(ia, ib), max(ia, ib), d))
    return out


# strings engineered so length differences straddle bucket boundaries
# for every small width: lengths 1..24 with typo families
_ROWS = (
    [(i, "abcdefghij"[: (i % 10) + 1] + "x" * (i // 10)) for i in range(24)]
    + [(100, "the quick brown fox"), (101, "the quick brown fax"),
       (102, "the quick brown foxes"), (103, "a"), (104, ""), (105, "ab")]
)


@pytest.mark.parametrize("max_dist", [0, 1, 3, 7])
@pytest.mark.parametrize("form", ["length", "segment"])
def test_blocking_is_lossless_vs_brute_force(spark, max_dist, form):
    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    fn = (
        (lambda d: edit_distance_pairs(d, max_dist=max_dist, prefix_len=None))
        if form == "length"
        else (
            lambda d: edit_distance_pairs_segments(
                d, max_dist=max_dist, prefix_len=None, max_seg_df=None
            )
        )
    )
    got = {(r.id_a, r.id_b, r.dist) for r in fn(df).collect()}
    assert got == _brute(_ROWS, max_dist)


def test_prefix_len_restricts_the_compared_field(spark):
    # identical 8-char prefixes, wildly different tails: prefix_len=8
    # pairs them at dist 0, full-field does not pair them at all
    rows = [(1, "prefix00" + "a" * 50), (2, "prefix00" + "b" * 50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pref = edit_distance_pairs(df, max_dist=2, prefix_len=8).collect()
    assert [(r.id_a, r.id_b, r.dist) for r in pref] == [(1, 2, 0)]
    assert edit_distance_pairs(df, max_dist=2, prefix_len=None).count() == 0


def test_bucket_cap_drops_hot_buckets_only(spark):
    # 30 same-length strings (one hot bucket) + one isolated typo pair
    # in a different length class
    rows = [(i, f"aaaa{i:02d}") for i in range(30)]
    rows += [(200, "zzzzzzzzzzzzzzzz"), (201, "zzzzzzzzzzzzzzzy")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r.id_a, r.id_b)
        for r in edit_distance_pairs(df, max_dist=2, prefix_len=None).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in edit_distance_pairs(
            df, max_dist=2, prefix_len=None, max_bucket_size=10
        ).collect()
    }
    assert (200, 201) in capped  # the legit pair's bucket is cold
    assert capped <= uncapped
    assert all(a >= 200 for a, _ in capped)  # hot bucket fully dropped


def test_max_dist_zero_is_exact_equality(spark):
    rows = [(1, "same"), (2, "same"), (3, "diff")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r.id_a, r.id_b, r.dist) for r in edit_distance_pairs(df, max_dist=0, prefix_len=None).collect()]
    assert got == [(1, 2, 0)]


def test_plan_has_no_cartesian_and_no_python_stage(spark):
    df = spark.createDataFrame(_ROWS, "doc_id long, text string")
    explained = edit_distance_pairs(df, max_dist=3, prefix_len=None)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in explained
    assert "BatchEvalPython" not in explained and "ArrowEvalPython" not in explained


def test_segment_cap_keeps_pairs_reachable_via_cold_segments(spark):
    # 40 strings sharing a hot PREFIX segment but unique tails: the
    # cap drops the hot key; the one true near-dup pair (distinct
    # tails differing by one char) survives via its cold segments
    rows = [(i, "commonprefixx" + f"tail{i:04d}xxxx") for i in range(40)]
    rows += [(100, "zzdistinctaa" + "uniquetailZZZ"), (101, "zzdistinctaa" + "uniquetailZZY")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {
        (r.id_a, r.id_b)
        for r in edit_distance_pairs_segments(
            df, max_dist=2, prefix_len=None, max_seg_df=10
        ).collect()
    }
    uncapped = {
        (r.id_a, r.id_b)
        for r in edit_distance_pairs_segments(
            df, max_dist=2, prefix_len=None, max_seg_df=None
        ).collect()
    }
    assert (100, 101) in capped
    assert capped <= uncapped
