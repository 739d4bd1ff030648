"""Write-path operators: partitioned layouts, bucketed tables, and
standing dedup indexes.

The reference's sinks are files and CSV reports (SURVEY §2.2); a
warehouse-scale pipeline additionally owns its STORAGE LAYOUT — the
partitioning and bucketing decisions that make the next thousand
queries cheap.  Three Spark-first writers:

- :func:`write_partitioned` — hive-style ``partitionBy`` parquet with
  dynamic partition overwrite, so re-running one day / one split only
  rewrites that partition and readers get partition pruning for free.
- :func:`write_bucketed` — ``bucketBy`` managed table: joins and
  aggregations on the bucket key need NO shuffle on the big side
  (the canonical co-located-join setup; at 100 TB this converts every
  doc_id-keyed feature join from a shuffle into a local zip).
- :func:`write_digest_index` / :func:`incremental_dedup_against_index`
  — the standing exact-dedup digest index maintained between
  ingestion runs (the persisted twin of
  ``operators.dedup.incremental_dedup``): append today's new digests,
  anti-join tomorrow's batch against the lot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "write_partitioned",
    "write_bucketed",
    "write_digest_index",
    "incremental_dedup_against_index",
    "write_bloom_index",
    "bloom_flag_against_index",
    "zorder_value",
    "write_zordered",
    "merge_upsert",
    "compact_parquet",
    "compact_partitioned",
    "write_orc",
    "read_orc",
    "write_jsonl",
    "write_hamming_band_index",
    "write_bpe_vocab",
    "read_bpe_vocab",
]


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: tuple[str, ...] = ("lang",),
    mode: str = "overwrite",
) -> None:
    """Hive-style partitioned parquet.  With
    ``partitionOverwriteMode=dynamic`` an overwrite only replaces the
    partitions present in ``df`` — the idempotent re-run primitive for
    per-day / per-split outputs.  Readers filtering on the partition
    columns prune directories before any I/O.  The mode is scoped to
    THIS write via the writer option — the session conf (and other
    code's overwrite semantics) is left untouched."""
    (
        df.write.mode(mode)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str = "doc_id",
    num_buckets: int = 8,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed parquet table: rows are hash-clustered into
    ``num_buckets`` files by ``bucket_col`` (optionally sorted within
    each bucket).  Two tables bucketed the same way join on the bucket
    key with ZERO exchanges — Spark's planner sees the matching output
    partitioning and skips the shuffle on both sides (plan-asserted in
    tests).  The layout survives the session: any later reader of the
    table inherits it."""
    writer = df.write.format("parquet").mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def write_digest_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    mode: str = "overwrite",
) -> None:
    """Persist the distinct content-digest index of ``docs`` — the
    standing artifact an incremental dedup pipeline maintains.  Use
    ``mode="append"`` after each ingestion run to add the digests of
    newly kept docs (the index stays query-side distinct)."""
    (
        docs.select(F.md5(F.col(text_col)).alias("digest"))
        .distinct()
        .write.mode(mode)
        .parquet(path)
    )


def incremental_dedup_against_index(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Batch survivors against a persisted digest index (the
    read-side of :func:`write_digest_index`): drop batch docs whose
    digest is already indexed, keep the min-id exemplar per digest
    within the batch.  Same output contract as
    ``operators.dedup.incremental_dedup``."""
    index = spark.read.parquet(index_path).select("digest").distinct()
    fresh = (
        batch.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .join(index, "digest", "left_anti")
    )
    return fresh.groupBy("digest").agg(
        F.min(id_col).alias("survivor_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def write_minhash_band_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
    seed: int = 42,
    max_bucket_size: int | None = 1000,
    include_signatures: bool = False,
) -> None:
    """Persist the corpus's banded minhash-LSH relation — the standing
    near-dup index incremental ingest probes
    (``operators.dedup.incremental_minhash_against_index``).

    Layout: ``{path}/bands`` holds (doc_id, band, band_hash)
    partitioned by band (a probe shuffles on the same composite key;
    band partitioning keeps each band's buckets in their own files);
    ``{path}/params`` records the build dials so a probe with a
    different permutation family fails loudly instead of silently
    matching nothing.  ``include_signatures=True`` adds
    ``{path}/sigs`` (doc_id, K minhash longs) — the sidecar the
    STREAMING ingest path verifies against (signature-estimate
    Jaccard, no text fetch; K longs per doc, fixed-width forever).
    Hot buckets (> ``max_bucket_size`` docs) are
    dropped AT WRITE: a boilerplate band shared by millions of corpus
    docs would otherwise fan every future batch doc out against all
    of them — the same deterministic cap (and the same recall
    reasoning: a true pair still surfaces through its other bands)
    the self-join operator applies per run, amortized into the
    artifact."""
    from ..operators.dedup import _band_tuples, _shingled_sigs

    sigs = _shingled_sigs(docs, text_col, id_col, num_hashes, shingle_n, seed)
    if include_signatures:
        # _shingled_sigs is already checkpointed; both writes reuse it
        sigs.select(F.col("_id").alias("doc_id"), F.col("_sig").alias("sig")).write.mode(
            "overwrite"
        ).parquet(f"{path}/sigs")
    banded = _band_tuples(sigs, bands, num_hashes // bands)
    if max_bucket_size is not None:
        hot = (
            banded.groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket_size)
            .select("band", "band_hash")
        )
        banded = banded.join(F.broadcast(hot), ["band", "band_hash"], "left_anti")
    (
        banded.select(F.col("_id").alias("doc_id"), "band", "band_hash")
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(f"{path}/bands")
    )
    spark = docs.sparkSession
    params = [
        ("num_hashes", num_hashes),
        ("bands", bands),
        ("shingle_n", shingle_n),
        ("seed", seed),
        ("max_bucket_size", -1 if max_bucket_size is None else max_bucket_size),
    ]
    spark.createDataFrame(params, "name string, value long").write.mode(
        "overwrite"
    ).parquet(f"{path}/params")


def write_bloom_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    k: int = 4,
    m: int = 1 << 20,
    mode: str = "overwrite",
) -> None:
    """Persist the corpus Bloom filter in its packed-words form
    (``word_idx, word`` — at most m/64 rows): the FIXED-SIZE standing
    artifact the bloom pre-filter reads, ~m/8 bytes no matter how
    large the corpus grows (vs the digest index's one row per distinct
    doc).  ``mode="append"`` after each run appends the new docs'
    words; the reader re-ORs per word_idx, which is exactly a Bloom
    union (bitwise OR is order-invariant), so appends never need
    read-modify-write."""
    from ..operators.bloom import bloom_build, bloom_pack

    positions = bloom_build(docs.select(F.md5(F.col(text_col)).alias("digest")), "digest", k=k, m=m)
    bloom_pack(positions, m=m).write.mode(mode).parquet(path)


def bloom_flag_against_index(
    spark: SparkSession,
    batch: DataFrame,
    index_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 4,
    m: int = 1 << 20,
) -> DataFrame:
    """Probe a batch against a persisted packed Bloom index:
    ``(id_col, maybe_dup)``.  The index reads as <= m/64 rows, re-ORed
    per word (merging any appended runs) and unpacked to the position
    relation — still bounded by m, still broadcastable.  Route only
    the flagged minority into :func:`incremental_dedup_against_index`;
    definite-new rows skip the digest-index shuffle entirely."""
    from ..operators.bloom import bloom_flag

    words = (
        spark.read.parquet(index_path)
        .groupBy("word_idx")
        .agg(F.expr("bit_or(word)").alias("word"))
    )
    # SQL expression: the Python shiftright wrapper takes only literal
    # shift amounts, the SQL form accepts the lambda-bound column
    positions = words.select(
        F.explode(
            F.expr(
                "filter(transform(sequence(0, 63), "
                "b -> CASE WHEN shiftright(word, b) & 1 = 1 "
                "THEN word_idx * 64 + CAST(b AS BIGINT) END), "
                "p -> p IS NOT NULL)"
            )
        ).alias("pos")
    )
    probe = batch.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
    return bloom_flag(probe, positions, "digest", id_col, k=k, m=m)


def zorder_value(cols: list[str], bits: int = 21) -> "F.Column":
    """Morton (Z-order) key from non-negative integer columns: bit b
    of each column lands at position ``b * len(cols) + i``, so rows
    close in EVERY dimension are close in the one-dimensional sort
    order.  Pure SQL expression (shiftleft/shiftright with lambda-
    bound shift amounts), codegen, no UDF; values clamp into
    ``bits`` bits per column (21 bits x 3 cols fits a long)."""
    n = len(cols)
    if not 1 <= n * bits <= 63:
        raise ValueError("need 1..63 total interleaved bits")
    if any(c in ("_z_acc", "_z_bit") for c in cols):
        raise ValueError("column name collides with the lambda variables")
    # lambda vars deliberately obscure: a plain name like `b` would
    # SHADOW a data column of the same name inside the lambda body
    terms = " | ".join(
        f"shiftleft(shiftright(least(greatest(CAST({c} AS BIGINT), 0L), "
        f"{(1 << bits) - 1}L), _z_bit) & 1, _z_bit * {n} + {i})"
        for i, c in enumerate(cols)
    )
    return F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (_z_acc, _z_bit) -> _z_acc | {terms})"
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 21,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered on the Z-order of ``cols`` — the
    multi-dimensional layout play (Delta/Iceberg "OPTIMIZE ZORDER"):
    after range-partitioning and sorting by the interleaved key, each
    file's min/max footer stats span a small box in EVERY listed
    dimension, so a selective predicate on ANY of them skips most
    files/row-groups at scan time (ordinary sort-by-one-column only
    prunes that column).  The pruning itself is stock parquet
    min/max skipping — no reader-side cooperation needed; the test
    measures it from the footers."""
    z = zorder_value(cols, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def merge_upsert(
    target: DataFrame, updates: DataFrame, key: str = "doc_id"
) -> DataFrame:
    """SCD-1 upsert (the MERGE INTO pattern without a table format):
    rows present in ``updates`` replace the target row with the same
    key, unmatched update rows insert, unmatched target rows carry
    over.  One full-outer join on the key — broadcast when the
    update batch is small (the common case: today's changes vs the
    full table), shuffle-hash otherwise, AQE's choice.  Combine with
    :func:`write_partitioned` to rewrite only the partitions the
    update batch touches."""
    if target.columns != updates.columns:
        raise ValueError("merge_upsert: schemas must match")
    t, u = target.alias("_t"), updates.alias("_u")
    picked = [
        F.coalesce(F.col(f"_u.{c}"), F.col(f"_t.{c}")).alias(c)
        for c in target.columns
    ]
    return t.join(u, F.col(f"_t.{key}") == F.col(f"_u.{key}"), "full_outer").select(
        *picked
    )


def compact_parquet(
    spark: SparkSession, path: str, out_path: str, target_files: int
) -> int:
    """Small-file compaction — the maintenance job every streaming
    sink needs (each micro-batch appends a file; a year of 30 s
    batches is a million files whose open/footer costs dominate
    scans).  Rewrites ``path`` as ``target_files`` similarly-sized
    files at ``out_path`` and returns the input file count.  Plain
    repartition (round-robin): byte-balanced output regardless of
    input skew."""
    import glob

    n_in = len(glob.glob(f"{path}/*.parquet"))
    spark.read.parquet(path).repartition(target_files).write.mode(
        "overwrite"
    ).parquet(out_path)
    return n_in


def compact_partitioned(
    spark: SparkSession,
    path: str,
    out_path: str,
    partition_col: str,
    dedup_cols: tuple[str, ...] = (),
) -> int:
    """Small-file compaction that PRESERVES the partition layout — the
    maintenance job for append-maintained partitioned indexes (the
    standing IVF table gains >=1 file per cluster per ingest batch;
    partition pruning still works but footer/open costs grow without
    bound).  Rewrites to exactly ONE file per ``{partition_col}=``
    directory: repartition ON the partition column sends every row of
    a value to one task, so each task writes one directory and nothing
    fans out.  (That same hashing is why a finer split is impossible
    down this path — more output files per value would need a salt
    column; at that point the partition is big enough that compaction
    isn't its problem.)  Returns the input file count.  Query results
    are byte-identical before/after: same rows, same partition dirs,
    fewer files.  ``dedup_cols`` additionally drops duplicate rows on
    those columns (e.g. a vector id) — the repair step for the one
    at-least-once crash window in ``streaming.ingest_ann``.

    ``out_path`` must differ from ``path``: overwrite deletes the
    target before the lazy read executes, so compacting in place would
    destroy the input.  Swap via a rename after the write.  (The input
    file count uses a local-filesystem glob; on object stores it
    returns 0 — informational only.)"""
    import glob
    import os

    if os.path.abspath(out_path) == os.path.abspath(path):
        raise ValueError(
            "compact_partitioned: out_path must differ from path "
            "(mode('overwrite') deletes the target before the read runs); "
            "write to a sibling dir and rename"
        )
    n_in = len(glob.glob(f"{path}/*/*.parquet")) or len(glob.glob(f"{path}/*.parquet"))
    df = spark.read.parquet(path)
    if dedup_cols:
        df = df.dropDuplicates(list(dedup_cols))
    (
        df.repartition(df.select(partition_col).distinct().count(),
                       F.col(partition_col))
        .write.partitionBy(partition_col)
        .mode("overwrite")
        .parquet(out_path)
    )
    return n_in


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_cols: tuple[str, ...] = (),
) -> None:
    """ORC sink (the other columnar interchange format a warehouse
    must speak — Hive/Trino estates are ORC-first).  Same layout
    semantics as the parquet writers: optional hive-style partitions,
    zstd compression.  Spark's native ORC reader supports the same
    predicate pushdown / column pruning as parquet (pytest pins
    ``PushedFilters`` on the read-back scan), so a query plan is
    format-agnostic."""
    w = df.write.mode(mode).option("compression", "zstd")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = "gzip"
) -> None:
    """JSON-lines sink — the interchange format of the training-data
    world (one JSON object per line; gzip per part-file by default).
    The round-trip twin of :func:`ingest.read_documents_jsonl`:
    ingest's quarantine reader accepts exactly what this emits.
    Arrays/structs serialize natively; binary columns should be
    base64-encoded to a string column first (JSON has no bytes
    type)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def write_bpe_vocab(
    spark: SparkSession,
    path: str,
    merges: list[tuple[str, str]],
    segmentation: DataFrame | None = None,
) -> None:
    """Persist a trained BPE tokenizer as a standing artifact:
    ``{path}/merges`` (merge_rank, left, right — the model itself,
    rank order IS the apply order) and optionally
    ``{path}/segmentation`` (token -> syms for the training corpus's
    full vocabulary — the zero-recompute encode map for corpus text;
    unseen text applies the merges via ``operators.bpe.bpe_encode``).

    A tokenizer is trained once and read by every downstream job
    (token budgeting, packing, contamination checks), so it belongs
    next to the digest/band/bloom indexes as a persisted relation,
    not a driver-side pickle."""
    spark.createDataFrame(
        [(i + 1, l, r) for i, (l, r) in enumerate(merges)],
        "merge_rank int, left string, right string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/merges")
    if segmentation is not None:
        segmentation.write.mode("overwrite").parquet(f"{path}/segmentation")


def read_bpe_vocab(spark: SparkSession, path: str) -> list[tuple[str, str]]:
    """The merge list back in apply order."""
    rows = spark.read.parquet(f"{path}/merges").orderBy("merge_rank").collect()
    return [(r["left"], r["right"]) for r in rows]


def write_hamming_band_index(
    sigs: DataFrame,
    path: str,
    bands: int = 8,
    max_bucket_size: int | None = None,
) -> None:
    """Persist a 64-bit-fingerprint corpus's banded relation — the
    standing near-dup index media ingest probes
    (``operators.dedup.hamming_banded_probe``), sibling of
    ``write_minhash_band_index`` for the Hamming family (simhash,
    image block-mean, audio energy-contour, video frame hashes).

    Input ``sigs`` is any (_id long, sig long) relation.  Layout:
    ``{path}/bands`` holds (_id, sig, band, band_val) partitioned by
    band — the sig rides along (8 bytes x bands rows) so a probe
    verifies exact Hamming without a second corpus pass; ``{path}/
    params`` records the band count so a probe banding differently
    fails loudly.  Hot buckets (> ``max_bucket_size`` ids per
    (band, band_val)) are dropped AT WRITE, same cap + recall
    reasoning as the minhash index: with b bands a band value has
    only 2^(64/b) possibilities, so bucket population grows linearly
    with corpus and candidate fan-out per probe with it; a dropped
    low-information band still leaves the other bands vouching for
    true pairs within the pigeonhole guarantee."""
    if 64 % bands != 0:
        raise ValueError(
            f"bands={bands} must divide 64 evenly — a remainder would "
            "silently exclude the top bits from every bucket key"
        )
    bits_per_band = 64 // bands
    mask = (1 << bits_per_band) - 1
    banded = sigs.select(
        "_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", b * bits_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "sig", "bb.band", "bb.band_val")
    if max_bucket_size is not None:
        hot = (
            banded.groupBy("band", "band_val")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket_size)
            .select("band", "band_val")
        )
        banded = banded.join(F.broadcast(hot), ["band", "band_val"], "left_anti")
    banded.write.mode("overwrite").partitionBy("band").parquet(f"{path}/bands")
    params = [
        ("bands", bands),
        ("max_bucket_size", -1 if max_bucket_size is None else max_bucket_size),
    ]
    sigs.sparkSession.createDataFrame(
        params, "name string, value long"
    ).write.mode("overwrite").parquet(f"{path}/params")
