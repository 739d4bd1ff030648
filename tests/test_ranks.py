"""operators/ranks.py: the distributed prefix scan and chunked
log-rank sums must match a straightforward numpy oracle, including
chunk boundaries (class sizes around the 64k chunk) and tie classes.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from confidential_storm_spark.operators.ranks import (
    attach_rank_ranges,
    log_rank_power_sums,
)


def _spectrum(spark, pairs):
    return spark.createDataFrame(pairs, "_c bigint, _m bigint")


def test_rank_ranges_match_sorted_cumsum(spark):
    rng = np.random.default_rng(11)
    counts = rng.choice(10_000, size=500, replace=False) + 1
    sizes = rng.integers(1, 50, size=500)
    got = {
        r["_c"]: (r["_m"], r["_start"])
        for r in attach_rank_ranges(
            _spectrum(spark, [(int(c), int(m)) for c, m in zip(counts, sizes)])
        ).collect()
    }
    order = np.argsort(-counts)
    start = 0
    for i in order:
        assert got[int(counts[i])] == (int(sizes[i]), start)
        start += int(sizes[i])


def test_rank_ranges_single_partition_input(spark):
    # fewer rows than cores: the scan must not lose or double-count
    ranged = attach_rank_ranges(_spectrum(spark, [(5, 2), (9, 3), (1, 4)]))
    got = {r["_c"]: r["_start"] for r in ranged.collect()}
    assert got == {9: 0, 5: 3, 1: 5}


@pytest.mark.parametrize("m", [1, 7, 1 << 16, (1 << 16) + 1, 200_000])
def test_log_rank_sums_cross_chunk_boundaries(spark, m):
    start = 12_345
    ranged = spark.createDataFrame([(3, m, start)], "_c bigint, _m bigint, _start bigint")
    rows = log_rank_power_sums(ranged).collect()
    r = np.arange(start + 1, start + m + 1, dtype=np.float64)
    ln = np.log(r)
    assert sum(x["_chunk_m"] for x in rows) == m
    assert sum(x["_sum_ln"] for x in rows) == pytest.approx(ln.sum(), rel=1e-12)
    assert sum(x["_sum_ln2"] for x in rows) == pytest.approx((ln * ln).sum(), rel=1e-12)


def test_spectrum_regression_equals_rowwise_fit(spark):
    """End-to-end: the spectrum-form sums reproduce the naive
    rank-every-word regression exactly (same (rank, count) multiset)."""
    rng = np.random.default_rng(3)
    counts = np.sort(rng.zipf(1.5, size=2_000).astype(np.int64))[::-1]
    spec = {}
    for c in counts:
        spec[int(c)] = spec.get(int(c), 0) + 1
    ranged = attach_rank_ranges(_spectrum(spark, sorted(spec.items())))
    rows = log_rank_power_sums(ranged).collect()
    sx = sum(x["_sum_ln"] for x in rows)
    sxx = sum(x["_sum_ln2"] for x in rows)
    sy = sum(x["_chunk_m"] * math.log(x["_c"]) for x in rows)
    sxy = sum(x["_sum_ln"] * math.log(x["_c"]) for x in rows)
    n = sum(x["_chunk_m"] for x in rows)

    r = np.arange(1, len(counts) + 1, dtype=np.float64)
    X, Y = np.log(r), np.log(counts.astype(np.float64))
    assert n == len(counts)
    assert sx == pytest.approx(X.sum(), rel=1e-12)
    assert sy == pytest.approx(Y.sum(), rel=1e-12)
    assert sxy == pytest.approx((X * Y).sum(), rel=1e-9)
    assert sxx == pytest.approx((X * X).sum(), rel=1e-12)
