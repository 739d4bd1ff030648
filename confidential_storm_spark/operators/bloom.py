"""Bloom-filter membership pre-filter — the constant-memory front of
incremental dedup (reference parity: none — the reference has no dedup
at all; this extends the training-data family alongside
``operators/dedup.py::incremental_dedup``).

Why a warehouse wants it: the digest-index anti-join
(`incremental_dedup_against_index`) is exact but shuffles the new
batch against a corpus-sized index.  A Bloom filter answers "possibly
seen before?" from a bitmap whose size is FIXED by the chosen false-
positive rate, independent of corpus cardinality — at 100 TB the
filter for 10^10 digests at 1% FP is ~12 GB of bits total and, in the
sparse relational form used here, at most ``m`` position rows that
broadcast once.  The standard pipeline is bloom -> (only the
maybe-dup minority) -> exact anti-join; definite-new rows (the vast
majority of a crawl) skip the shuffle entirely.

Determinism: positions come from md5 slices, so build and probe are
reproducible across runs, partitionings, AND engines — the DuckDB
oracle recomputes the identical bitmap, so even the false positives
match bit-for-bit.  Merging two filters is a set union (or bitwise OR
in the packed form) — commutative and associative, hence
partition-layout invariant.

FP rate: (1 - e^(-k*n/m))^k for n inserted keys, k hashes, m bits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "bloom_positions",
    "bloom_build",
    "bloom_pack",
    "bloom_flag",
    "bloom_dedup_sql",
]


def _position(col: Column, j: int | str, m: int) -> Column:
    """Hash function j (an int index, or a string salt like "bucket"
    for the blocked-filter routing hash): first 8 md5 hex chars of
    ``j:value`` as a uniform 32-bit int, reduced mod m (the
    md5->BIGINT equivalence used by every oracle in this repo)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}:"), col)), 1, 8), 16, 10)
    return h.cast("long") % m


def bloom_positions(col: Column, k: int, m: int) -> Column:
    """Array of the k bit positions ``col`` sets/probes."""
    return F.array(*[_position(col, j, m) for j in range(k)])


def bloom_build(df: DataFrame, value_col: str, k: int = 4, m: int = 1 << 16) -> DataFrame:
    """Build the filter as its sparse relational form: one row per SET
    bit — ``(pos long)``, distinct, at most ``m`` rows no matter how
    large ``df`` is.  The build is one explode + distinct (map-side
    partial dedup applies); union of two filters is a plain
    ``unionByName(...).distinct()``."""
    return (
        df.select(F.explode(bloom_positions(F.col(value_col), k, m)).alias("pos"))
        .distinct()
    )


def bloom_pack(positions: DataFrame, m: int = 1 << 16) -> DataFrame:
    """Pack the sparse position rows into 64-bit words — the artifact
    form you persist/broadcast: ``(word_idx long, word long)`` with
    m/64 rows max.  Bitwise-OR aggregation is order-invariant, so the
    packed filter is identical under any partitioning; two packed
    filters merge with ``groupBy(word_idx).agg(bit_or(word))``."""
    return (
        positions.groupBy((F.col("pos") / 64).cast("long").alias("word_idx"))
        .agg(F.expr("bit_or(shiftleft(1L, CAST(pos % 64 AS INT)))").alias("word"))
    )


def bloom_flag(
    batch: DataFrame,
    positions: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 4,
    m: int = 1 << 16,
) -> DataFrame:
    """Probe: ``(id_col, maybe_dup boolean)`` for every batch row —
    maybe_dup iff ALL k probed bits are set (Bloom semantics: false
    positives possible at the configured rate, false negatives never).

    Plan shape: explode the k probe positions (narrow), broadcast-join
    against the bounded position set (<= m rows — broadcastable by
    construction), then an all-bits-set groupBy on the batch id.  No
    corpus-sized shuffle anywhere; the corpus appears only through the
    fixed-size filter.
    """
    probes = batch.select(
        F.col(id_col), F.explode(bloom_positions(F.col(value_col), k, m)).alias("pos")
    )
    hits = probes.join(
        F.broadcast(positions.withColumn("_hit", F.lit(True))), "pos", "left"
    )
    return hits.groupBy(id_col).agg(
        F.bool_and(F.col("_hit").isNotNull()).alias("maybe_dup")
    )


def bloom_dedup_sql(corpus_pred: str, batch_pred: str, k: int, m: int) -> str:
    """DuckDB twin of build+probe over the documents table split into a
    frozen corpus (``corpus_pred``) and an incoming batch
    (``batch_pred``), keyed on the content digest ``md5(text)`` —
    identical md5 position decisions, so even false positives agree."""
    js = ", ".join(f"({j})" for j in range(k))
    pos = (
        "(CAST('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || digest), 1, 8) "
        f"AS BIGINT) % {m})"
    )
    return f"""
WITH js(j) AS (VALUES {js}),
corpus AS (SELECT md5(text) AS digest FROM documents WHERE {corpus_pred}),
cpos AS (SELECT DISTINCT {pos} AS pos FROM corpus CROSS JOIN js),
batch AS (SELECT doc_id, md5(text) AS digest FROM documents WHERE {batch_pred}),
bpos AS (SELECT doc_id, {pos} AS pos FROM batch CROSS JOIN js)
SELECT doc_id, bool_and(pos IN (SELECT pos FROM cpos)) AS maybe_dup
FROM bpos GROUP BY doc_id ORDER BY doc_id
"""
