"""Bit-sampling Hamming LSH (dedup.hamming_lsh_pairs): recall law,
exact verification, determinism, and the bucket-law contrast with the
banded join."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.operators.dedup import (
    hamming_banded_pairs,
    hamming_lsh_pairs,
)


def _sig_df(spark, sigs):
    return spark.createDataFrame(
        [(i, int(np.int64(np.uint64(s)))) for i, s in enumerate(sigs)],
        "_id long, sig long",
    )


def _planted_corpus(n=400, r=5, seed=7):
    """n random 64-bit sigs; the second half is the first half with
    exactly r bit flips — planted pairs (i, i + n//2)."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 1 << 63, size=n // 2, dtype=np.uint64)
    flipped = base.copy()
    for i in range(len(flipped)):
        for p in rng.choice(64, size=r, replace=False):
            flipped[i] ^= np.uint64(1) << np.uint64(p)
    return np.concatenate([base, flipped])


def test_lsh_finds_planted_pairs_at_recall_law(spark):
    n, r = 400, 5
    sigs = _planted_corpus(n, r)
    df = _sig_df(spark, sigs)
    got = hamming_lsh_pairs(df, max_hamming=7, bits_per_table=16, tables=28)
    pairs = {(row.id_a, row.id_b) for row in got.collect()}
    planted = {(i, i + n // 2) for i in range(n // 2)}
    found = len(planted & pairs)
    # theory: recall = 1 - (1 - ((64-5)/64)^16)^28 = 0.9938 at r=5;
    # allow slack for the random corpus
    assert found / len(planted) > 0.95
    # exact verification: every reported pair really is within 7 bits
    for row in got.collect():
        h = bin(int(sigs[row.id_a]) ^ int(sigs[row.id_b])).count("1")
        assert h <= 7 and h == row.hamming


def test_lsh_deterministic_across_runs(spark):
    sigs = _planted_corpus(200, 3)
    df = _sig_df(spark, sigs)
    a = sorted(map(tuple, hamming_lsh_pairs(df, max_hamming=7).collect()))
    b = sorted(map(tuple, hamming_lsh_pairs(df, max_hamming=7).collect()))
    assert a == b


def test_lsh_identical_sigs_always_pair(spark):
    # distance 0 collides in EVERY table: recall is exactly 1
    df = _sig_df(spark, [12345, 12345, 99999])
    got = {(r.id_a, r.id_b) for r in hamming_lsh_pairs(df, max_hamming=7).collect()}
    assert (0, 1) in got and len(got) == 1


def test_lsh_bucket_space_beats_banded(spark):
    # the design point: banded join key space is b * 2^(64/b) buckets
    # TOTAL (bands=8 -> 2048); LSH tables give L * 2^k.  On a corpus
    # of near-constant fingerprints the banded join candidates grow
    # ~quadratically while LSH's backstop cap bounds them
    rng = np.random.default_rng(0)
    base = rng.integers(0, 1 << 63, dtype=np.uint64)
    sigs = [int(base ^ np.uint64(1) << np.uint64(rng.integers(0, 64))) for _ in range(300)]
    df = _sig_df(spark, np.array(sigs, dtype=np.uint64))
    capped = hamming_lsh_pairs(
        df, max_hamming=64, bits_per_table=16, tables=4, max_bucket_size=16
    )
    # 4 tables x C(16,2) bounded candidates per bucket cluster; the
    # uncapped banded join on the same corpus yields ~C(300,2) pairs
    assert capped.count() < 4 * 16 * 16
    banded = hamming_banded_pairs(df, max_hamming=63, bands=8, approximate=True)
    assert banded.count() > 40_000  # ~all pairs collide: the quadratic shape


def test_lsh_key_width_respected(spark):
    # keys must fit bits_per_table bits whatever the sig sign bit does
    df = _sig_df(spark, np.array([np.uint64((1 << 64) - 1), np.uint64(0)], dtype=np.uint64))

    got = hamming_lsh_pairs(df, max_hamming=64, bits_per_table=8, tables=2)
    assert got.count() == 0  # distance 64: never within the radius


@pytest.mark.parametrize("r,expected", [(3, 1.0), (7, 0.9915), (10, 0.8521)])
def test_lsh_recall_law_reference_values(r, expected):
    # the closed form quoted in the docstring
    k, L = 16, 28
    p = (64 - r) / 64
    recall = 1 - (1 - p**k) ** L
    assert abs(recall - expected) < 5e-4


def test_lsh_positions_deterministic_layout():
    from confidential_storm_spark.operators.dedup import lsh_bit_positions

    a = lsh_bit_positions(16, 28, 42)
    b = lsh_bit_positions(16, 28, 42)
    assert a == b
    assert len(a) == 28
    for ps in a:
        assert ps == sorted(ps)
        assert len(set(ps)) == 16
        assert all(0 <= p < 64 for p in ps)
    assert lsh_bit_positions(16, 28, 7) != a


def test_lsh_pairs_match_mask_rule_reference(spark):
    # the oracle form: pair collides in table t iff XOR(sig_a, sig_b)
    # has no set bit among t's sampled positions; the Spark bucket
    # join must emit exactly the pairs passing (mask rule) AND
    # (hamming <= r)
    import random

    from confidential_storm_spark.operators.dedup import (
        hamming_lsh_pairs,
        lsh_bit_positions,
    )

    bits, tables, seed, r = 8, 6, 13, 7
    rng = random.Random(99)
    sigs = {}
    base = rng.getrandbits(64)
    for i in range(40):
        if i % 3 == 0:
            s, flips = base, rng.randrange(0, 12)
            for p in rng.sample(range(64), flips):
                s ^= 1 << p
            sigs[i] = s
        else:
            sigs[i] = rng.getrandbits(64)

    def signed(u):
        return u - (1 << 64) if u >= 1 << 63 else u

    positions = lsh_bit_positions(bits, tables, seed)
    masks = [sum(1 << p for p in ps) for ps in positions]
    expected = set()
    for a in sigs:
        for b in sigs:
            if a >= b:
                continue
            x = sigs[a] ^ sigs[b]
            if bin(x).count("1") <= r and any((x & m) == 0 for m in masks):
                expected.add((a, b))

    df = spark.createDataFrame(
        [(i, signed(s)) for i, s in sigs.items()], "_id long, sig long"
    )
    got = {
        (row.id_a, row.id_b)
        for row in hamming_lsh_pairs(
            df,
            max_hamming=r,
            bits_per_table=bits,
            tables=tables,
            seed=seed,
            max_bucket_size=None,
        ).collect()
    }
    assert got == expected


def test_lsh_bucket_cap_truncates_deterministically(spark):
    """With N identical sigs and max_bucket_size=B < N, every table's
    single bucket keeps exactly the first B ids (ROW_NUMBER order), so
    the output is exactly the C(B,2) pairs among ids 0..B-1 — the
    deterministic truncation the registry twin
    (dedup_simhash_lsh_capped) mirrors with the same window."""
    n, cap = 12, 5
    df = _sig_df(spark, [7] * n)
    got = {
        (r.id_a, r.id_b)
        for r in hamming_lsh_pairs(
            df, max_hamming=3, bits_per_table=4, tables=3, max_bucket_size=cap
        ).collect()
    }
    expected = {(a, b) for a in range(cap) for b in range(a + 1, cap)}
    assert got == expected


def test_lsh_capped_twin_matches_duckdb_when_cap_binds(spark):
    """End-to-end cap certification on a corpus where the cap BINDS:
    shrink the registry dial to max_bucket_size=3 over documents at
    sf0.001 (500 docs share many 16-bit buckets) and check the Spark
    plan against the registry's own DuckDB twin with the same dial —
    the sf0.01 gate row certifies the non-binding regime; this pins
    the binding one."""
    import duckdb

    import confidential_storm_spark.plans.queries as Q
    from confidential_storm_spark.operators.dedup import (
        hamming_lsh_pairs,
        simhash64,
    )
    from confidential_storm_spark.plans.queries import load_table

    cap_attr, orig = "_SIMHASH_LSH_CAP", Q._SIMHASH_LSH_CAP
    try:
        Q._SIMHASH_LSH_CAP = 3
        sql = Q._simhash_lsh_capped_sql()
    finally:
        setattr(Q, cap_attr, orig)

    sf_dir = "/root/testdata/sf0.001"
    sigs = (
        simhash64(load_table(spark, sf_dir, "documents"))
        .withColumnRenamed("doc_id", "_id")
        .withColumnRenamed("simhash", "sig")
    )
    got = sorted(
        map(
            tuple,
            hamming_lsh_pairs(
                sigs,
                max_hamming=Q.SIMHASH_LSH_MAX_HAMMING,
                bits_per_table=Q._SIMHASH_LSH_BITS,
                tables=Q._SIMHASH_LSH_TABLES,
                seed=Q._SIMHASH_LSH_SEED,
                max_bucket_size=3,
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    assert got == want and len(got) > 0


def test_scale_dials_rejects_out_of_range_hamming():
    """max_hamming outside [0, 64) must raise a clear ValueError, not
    a math-domain error from inside the dial law (ADVICE r10)."""
    from confidential_storm_spark.operators.dedup import lsh_scale_dials

    for bad in (-1, 64, 100):
        with pytest.raises(ValueError, match="max_hamming"):
            lsh_scale_dials(1000, max_hamming=bad)


def test_scale_dials_extreme_but_valid_hamming_no_crash():
    """max_hamming=63 makes p^k underflow past double epsilon; the
    log1p form must return the capped table count instead of dividing
    by log(1.0) == 0 (latent crash found alongside ADVICE r10)."""
    from confidential_storm_spark.operators.dedup import lsh_scale_dials

    k, tables = lsh_scale_dials(10**9, max_hamming=63)
    assert k >= 16 and tables == 64
    # and the certified small-SF operating point is unchanged
    assert lsh_scale_dials(55_000, max_hamming=7) == (16, 28)
