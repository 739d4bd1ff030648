"""Skew mitigation: salted joins and salted two-phase aggregation.

The hot-key problem at warehouse scale: a shuffle join or aggregation
hash-partitions on the key, so a key carrying 1% of 100 TB lands 1 TB
on ONE reducer while its 999 peers idle.  AQE's skew-join splitting
handles sort-merge joins after the fact; salting handles it *in the
plan*, works for aggregations too, and composes with AQE.

Both operators are RESULT-IDENTICAL to their naive forms — the salt
is invisible in the output, which is exactly what the DuckDB oracle
certifies (the twin SQL is the plain join / GROUP BY).

- ``salted_join``: the big side gets a deterministic per-row salt
  ``pmod(xxhash64(spread_col), n_salt)``; the small side is exploded
  n_salt ways (one copy per salt value) and the join key becomes
  (key, salt).  Each hot key's rows now spread over n_salt reducers;
  the small side grows n_salt x, which is the standard trade (its
  replication cost is bounded by n_salt * |small|, chosen so it still
  fits the shuffle or broadcast budget).
- ``salted_aggregate``: two-phase agg for algebraic aggregates
  (sum/count/min/max): phase 1 groups by (keys..., salt) — the hot
  key's rows spread over n_salt reducers and collapse to n_salt
  partial rows — phase 2 combines the n_salt partials per key.
  Spark's map-side partial aggregation already bounds the *map* side;
  salting additionally bounds the *reduce* side when a single key's
  partials exceed one task (relevant for sort-based fallback and for
  high-cardinality-input aggregates).

Reference: the reference engine routes on SHA-256 routing keys and
has no skew story (single-node); this module is the beyond-reference
scale path (SURVEY "beyond-ref").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SALT = "_salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    spread_col: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join ``big`` to ``small`` on ``big_key == small_key``
    with the big side spread over ``n_salt`` salt slots.

    ``spread_col`` must be a big-side column with per-row variation
    (an event id, a line number) — the salt is ``pmod(xxhash64(
    spread_col), n_salt)``, deterministic across retries (never
    ``rand()``, whose task-retry nondeterminism can duplicate or drop
    rows under shuffle replay).
    """
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    b = big.withColumn(_SALT, F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n_salt)))
    s = small.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("long"))
    joined = b.join(
        s,
        (F.col(big_key) == F.col(small_key)) & (b[_SALT] == s[_SALT]),
        how,
    )
    return joined.drop(_SALT)


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    sums: list[str],
    spread_col: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: per-key row count plus SUM of
    each column in ``sums``, result-identical to
    ``df.groupBy(keys).agg(count(*), sum(...))``.

    Output columns: ``keys..., n_rows, sum_<col>...``.
    """
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    salt = F.pmod(F.xxhash64(F.col(spread_col)), F.lit(n_salt)).alias(_SALT)
    partial = (
        df.select(*keys, salt, *sums)
        .groupBy(*keys, _SALT)
        .agg(
            F.count("*").alias("_n"),
            *[F.sum(c).alias(f"_s_{c}") for c in sums],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("_n").alias("n_rows"),
        *[F.sum(f"_s_{c}").alias(f"sum_{c}") for c in sums],
    )
