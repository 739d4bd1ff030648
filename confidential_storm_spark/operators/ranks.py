"""Distributed ranking primitives: a scan-structured prefix sum and
log-rank power sums over a frequency spectrum.

The classic scale trap for "rank the whole vocabulary" queries is a
global ``row_number()`` window — Spark moves every row to ONE
partition (``WindowExec: No Partition Defined``) and the sort runs on
a single core.  For rank statistics that only consume (rank, count)
pairs — Zipf fits, rank-frequency plots, head/tail mass — the rank
permutation inside a tie class is irrelevant, so the whole problem
collapses onto the **frequency-of-frequencies spectrum**: one row per
distinct count value with its class size.  The spectrum is tiny
relative to the vocabulary (k distinct counts over N total
occurrences satisfies k <= sqrt(2N)), and each class's ranks form the
contiguous range (start, start + m] where start = #words in strictly
larger count classes — a prefix sum over the spectrum.

Two building blocks, both shuffle-light and driver-bounded:

- :func:`attach_rank_ranges` — exclusive prefix sum over a
  descending-ordered spectrum via the textbook two-phase scan: range
  repartition + per-partition running sums (one sequential pandas
  pass per partition), collect ONE number per partition (<= #cores
  rows on the driver), broadcast the per-partition offsets back.  No
  window, no single-partition sort, O(P) driver state.

- :func:`log_rank_power_sums` — per class, sum of ln r and ln^2 r
  over the class's rank range, evaluated JVM-side with
  ``F.aggregate`` over chunked ``F.sequence`` ranges (no closed form
  exists for sum of ln^2; lgamma would cover only sum of ln).  Large
  classes (the count=1 class holds most of a corpus's vocabulary)
  split into fixed-size chunks that shuffle-spread across cores, so
  no single task walks a billion ranks.

Together they replace the reference's single-stream rank loop
(confidentialstorm is single-process; ranking is a for-loop there)
with a plan whose biggest materialized relation is the spectrum.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["attach_rank_ranges", "log_rank_power_sums"]

# ranks per F.aggregate call; 64k keeps each chunk's sequence array
# well under Spark's array limits while giving ~15k chunks per billion
# ranks to spread across the cluster
RANK_CHUNK = 1 << 16


def attach_rank_ranges(
    spectrum: DataFrame,
    count_col: str = "_c",
    size_col: str = "_m",
    start_col: str = "_start",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add ``start_col`` = number of items in strictly-greater count
    classes (exclusive prefix sum of ``size_col`` in descending
    ``count_col`` order).  Class ranks are ``start+1 .. start+size``.

    Two-phase scan: range-partition descending, running cumsum inside
    each partition (sequential pandas pass), then ONE collected row
    per partition yields the cross-partition offsets.  The
    intermediate is pinned with ``localCheckpoint`` so the offset
    collect and the returned relation see the SAME partitioning (a
    re-executed range exchange may re-sample boundaries).
    """
    spark = spectrum.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in spectrum.schema)

    def running(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        total = 0
        for pdf in batches:
            if len(pdf) == 0:
                continue
            cum = pdf[size_col].cumsum() + total
            total = int(cum.iloc[-1])
            out = pdf.copy()
            out["_cum"] = cum
            out["_pid"] = pid
            yield out

    scanned = (
        spectrum.repartitionByRange(n_part, F.col(count_col).desc())
        .sortWithinPartitions(F.col(count_col).desc())
        .mapInPandas(running, schema=f"{fields}, _cum bigint, _pid int")
        .localCheckpoint(eager=True)
    )
    totals = {
        r["_pid"]: r["_t"]
        for r in scanned.groupBy("_pid").agg(F.max("_cum").alias("_t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    entries = []
    for pid, off in offsets.items():
        entries += [F.lit(pid).cast("int"), F.lit(off).cast("bigint")]
    off_expr = (
        F.element_at(F.create_map(*entries), F.col("_pid"))
        if entries
        else F.lit(0).cast("bigint")
    )
    return scanned.withColumn(
        start_col, F.col("_cum") - F.col(size_col) + off_expr
    ).drop("_cum", "_pid")


def log_rank_power_sums(
    ranged: DataFrame,
    size_col: str = "_m",
    start_col: str = "_start",
    chunk: int = RANK_CHUNK,
) -> DataFrame:
    """Per input row, emit chunk rows carrying ``_sum_ln`` = sum of
    ln r and ``_sum_ln2`` = sum of ln^2 r over r in
    (start, start+size], plus ``_chunk_m`` (ranks covered by the
    chunk).  All other columns pass through, so downstream
    aggregations can pair the rank sums with per-class values.

    The inner sum runs entirely JVM-side (``aggregate`` over
    ``sequence``); chunking bounds each task's range walk and the
    explode's fan-out rows shuffle-spread before the heavy lambda.
    """
    n_chunks = F.ceil(F.col(size_col) / F.lit(chunk)).cast("int")
    lo = F.col(start_col) + F.col("_ci").cast("bigint") * chunk + 1
    hi = F.least(F.col(start_col) + F.col(size_col), lo + chunk - 1)
    sums = F.aggregate(
        F.sequence(F.col("_lo"), F.col("_hi")),
        F.struct(F.lit(0.0).alias("s1"), F.lit(0.0).alias("s2")),
        lambda acc, r: F.struct(
            (acc.s1 + F.log(r)).alias("s1"),
            (acc.s2 + F.log(r) * F.log(r)).alias("s2"),
        ),
    )
    spark = ranged.sparkSession
    return (
        ranged.withColumn("_ci", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn("_lo", lo)
        .withColumn("_hi", hi)
        # spread chunk rows before the O(chunk) lambda: the explode
        # leaves a huge class's chunks in one input split otherwise
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("_s", sums)
        .withColumn("_chunk_m", F.col("_hi") - F.col("_lo") + 1)
        .withColumn("_sum_ln", F.col("_s.s1"))
        .withColumn("_sum_ln2", F.col("_s.s2"))
        .drop("_ci", "_lo", "_hi", "_s")
    )
