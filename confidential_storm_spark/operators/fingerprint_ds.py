"""Order-insensitive dataset content digest — the reproducibility /
integrity primitive of a recurring pipeline.

A pipeline that republishes derived tables needs a cheap answer to
"is this THE SAME data?" — across reruns, engine versions, partition
layouts, and replication sites.  Row order and file layout are
physical accidents, so the digest must be a commutative reduction of
per-row content: each row canonicalizes to a delimited string, hashes
to a 60-bit integer (md5 prefix), and the dataset digest is the SUM of
those integers modulo a Mersenne prime.  Addition is commutative and
associative, so the digest is independent of partitioning, task
scheduling, and merge order — one map-side-combinable aggregation pass
computes it, and two sites can compare digests without moving data.

Why sum-mod-prime and not XOR: XOR is also commutative but silently
cancels DUPLICATE rows in pairs (a table and the same table with two
extra copies of one row can XOR-collide); the modular sum is
duplicate-sensitive, which is the property a row-count-plus-digest
integrity check needs.  (Grubbs et al.'s incremental MAC literature
uses the same construction; this is the non-cryptographic variant —
an integrity checksum against accidental divergence, not an
adversarial MAC.)

Determinism contract: canonicalization must be engine-identical, so
callers restrict digest columns to types whose string form is exact
and identical in Spark and DuckDB (integers and strings here; floats
and timestamps would need an explicit canonical format first).  NULL
is encoded as a sentinel distinct from the empty string.

Reference parity: confidentialstorm's integrity story is per-tuple
envelope AAD (SURVEY §2.3); a relation-level content digest does not
exist there — beyond-reference training-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["row_hash60", "dataset_digest", "dataset_digest_sql", "DIGEST_MOD"]

DIGEST_MOD = (1 << 61) - 1  # Mersenne prime 2^61-1
_NULL = "␀"  # ␀ — NULL sentinel, distinct from ''


def row_hash60(cols: list[str]) -> Column:
    """60-bit content hash of one row: md5 of the '|'-joined
    NULL-sentineled string forms of ``cols``, first 15 hex chars as an
    integer (60 bits — always positive in an int64)."""
    canon = F.concat_ws(
        "|", *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
    )
    return F.conv(F.substring(F.md5(canon), 1, 15), 16, 10).cast("long")


def dataset_digest(
    df: DataFrame, cols: list[str], by: list[str] | None = None
) -> DataFrame:
    """(by..., n_rows, digest) — the partition-layout-independent
    content digest: sum of per-row 60-bit hashes mod 2^61-1, plus the
    exact row count.  One aggregation pass; the sum accumulates in
    DECIMAL(38,0) (exact — n_rows * 2^60 stays far below 10^38 for
    any real table), and the final mod is a single integer op, so the
    digest is bit-identical across engines and layouts."""
    by = by or []
    g = df.select(*by, row_hash60(cols).alias("_h"))
    agged = (
        g.groupBy(*by)
        if by
        else g.groupBy()
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(F.col("_h").cast("decimal(38,0)")) % F.lit(DIGEST_MOD))
        .cast("long")
        .alias("digest"),
    )
    return agged.orderBy(*by) if by else agged


def dataset_digest_sql(
    relation: str, cols: list[str], by: list[str] | None = None
) -> str:
    """DuckDB twin of :func:`dataset_digest` (HUGEINT sum, same md5
    prefix and mod)."""
    by = by or []
    canon = " || '|' || ".join(
        f"COALESCE(CAST({c} AS VARCHAR), '{_NULL}')" for c in cols
    )
    bysel = "".join(f"{b}, " for b in by)
    group = f"GROUP BY {', '.join(by)}" if by else ""
    order = f"ORDER BY {', '.join(by)}" if by else ""
    return f"""
WITH _h AS (
  SELECT {bysel}
         CAST('0x' || substr(md5({canon}), 1, 15) AS BIGINT) AS _h
  FROM {relation}
)
SELECT {bysel}COUNT(*) AS n_rows,
       CAST(SUM(CAST(_h AS HUGEINT)) % {DIGEST_MOD} AS BIGINT) AS digest
FROM _h {group} {order}
"""
