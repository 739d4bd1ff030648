"""Robust per-key stats: hand-computed fixtures (odd/even n, ties,
outliers), python-reference differential, layout invariance, and the
partition-keyed-window plan pin.
"""

import statistics

import pytest

from confidential_storm_spark.operators.robust import robust_stats


def _mk(spark, rows):
    return spark.createDataFrame(rows, "event_type string, value double")


def test_odd_n_median_and_mad(spark):
    # k: values 1..5, outlier-free; median 3, MAD = median(|x-3|) = 1
    rows = [("k", float(v)) for v in (1, 2, 3, 4, 5)]
    r = robust_stats(_mk(spark, rows)).collect()[0]
    assert (r["n"], r["median"], r["mad"]) == (5, 3.0, 1.0)
    # trim floor(5*0.1)=0 rows -> plain mean
    assert r["trimmed_mean"] == 3.0
    # quartile positions floor((5+3)/4)=2, floor((16)/4)=4 -> values 2, 4
    assert (r["q1"], r["q3"]) == (2.0, 4.0)


def test_even_n_median_averages_middles(spark):
    rows = [("k", float(v)) for v in (1, 2, 3, 10)]
    r = robust_stats(_mk(spark, rows)).collect()[0]
    assert r["median"] == 2.5
    # deviations |x-2.5| = 1.5, 0.5, 0.5, 7.5 -> sorted 0.5 0.5 1.5 7.5
    # median = (0.5+1.5)/2 = 1.0
    assert r["mad"] == 1.0


def test_outlier_resistance_vs_mean(spark):
    rows = [("k", float(v)) for v in range(1, 21)] + [("k", 1e6)]
    r = robust_stats(_mk(spark, rows)).collect()[0]
    assert r["median"] == 11.0  # the outlier moved the median one step
    # 10% trim (floor(21*0.1)=2 from each end) drops the outlier
    vals = sorted(list(range(1, 21)) + [10**6])[2:-2]
    assert r["trimmed_mean"] == round(sum(vals) / len(vals), 6)


def test_duplicate_values_are_tie_stable(spark):
    rows = [("k", 2.0)] * 7 + [("k", 5.0)] * 3
    r = robust_stats(_mk(spark, rows)).collect()[0]
    assert r["median"] == 2.0 and r["mad"] == 0.0


def test_matches_python_reference_per_key(spark):
    import random

    rng = random.Random(7)
    rows = [
        (f"k{i % 3}", round(rng.uniform(-50, 50), 2)) for i in range(301)
    ]
    got = {r["event_type"]: r for r in robust_stats(_mk(spark, rows)).collect()}
    for k in ("k0", "k1", "k2"):
        vs = sorted(v for key, v in rows if key == k)
        n = len(vs)
        med = statistics.median(vs)
        assert got[k]["median"] == pytest.approx(med, abs=1e-9)
        t = int(n * 0.1)
        tv = vs[t : n - t]
        assert got[k]["trimmed_mean"] == pytest.approx(
            round(sum(tv) / len(tv), 6), abs=1e-6
        )
        devs = sorted(round(abs(v - med), 3) for v in vs)
        assert got[k]["mad"] == pytest.approx(statistics.median(devs), abs=1e-9)
        assert got[k]["q1"] == vs[(n + 3) // 4 - 1]
        assert got[k]["q3"] == vs[(3 * n + 1) // 4 - 1]


def test_layout_invariance(spark):
    rows = [(f"k{i % 5}", round((i * 37 % 193) / 7, 2)) for i in range(500)]
    df = _mk(spark, rows)
    a = sorted(map(tuple, robust_stats(df.repartition(1)).collect()))
    b = sorted(map(tuple, robust_stats(df.repartition(11)).collect()))
    assert a == b


def test_windows_are_partition_keyed(spark):
    df = _mk(spark, [("k", 1.0), ("j", 2.0)])
    plan = robust_stats(df)._jdf.queryExecution().executedPlan().toString()
    # no global (empty-partition) window: every Window node partitions
    import re

    for frag in re.findall(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert frag.strip(), f"global window found in plan:\n{plan}"
