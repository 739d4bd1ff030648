"""Streaming heavy hitters — bounded-memory frequent-item summaries
on a live stream via sharded, mergeable Misra-Gries.

Streaming top-k frequency is the other canonical unbounded-state trap
(next to COUNT(DISTINCT), see streaming/sketches.py): exact counts
need one state row per distinct value.  Misra-Gries caps it at
``capacity`` counters per shard whatever the cardinality, with the
classic deterministic guarantee: a value's stored count underestimates
its true shard count by at most the shard's accumulated error, and any
value whose true count exceeds that error is PRESENT in the summary.

Mechanism: values shard by ``crc32(value) % num_shards`` (a value's
whole history lands in exactly one shard, so the guarantee is
shard-exact, and shards run in parallel).  Each shard's state is its
current MG summary; per micro-batch the batch's exact counts (pandas
groupby, C speed) merge into it with the Agarwal et al. "Mergeable
Summaries" rule — sum counts, subtract the (capacity+1)-th largest,
drop non-positive — which is associative, so the result depends only
on the batch sequence, not on how the stream was chopped into batches
beyond that.  The same pure function (:func:`mg_merge`) drives the
operator and the differential tests.

Output (update mode): each micro-batch emits the shard's full current
summary ``(shard, value, count, err_bound)``; the latest rows per
shard ARE the summary, and ``count <= true <= count + err_bound``
row-wise within the shard.
"""

from __future__ import annotations

import pickle
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = ["mg_merge", "heavy_hitters_stream"]


def mg_merge(
    counts: dict[str, int], batch: "pd.Series", capacity: int
) -> tuple[dict[str, int], int]:
    """Merge exact ``batch`` counts (value -> n) into a Misra-Gries
    summary ``counts``, compressing to ``capacity`` counters.  Returns
    ``(summary, err_increment)`` where err_increment is the amount
    every surviving counter was decremented by (0 when no compression
    was needed) — the per-merge addition to the shard's error bound."""
    merged = dict(counts)
    for v, n in batch.items():
        merged[v] = merged.get(v, 0) + int(n)
    if len(merged) <= capacity:
        return merged, 0
    # (capacity+1)-th largest count is the decrement (Mergeable
    # Summaries, Agarwal et al. 2012): subtract it everywhere, drop <=0
    kth = sorted(merged.values(), reverse=True)[capacity]
    return {v: c - kth for v, c in merged.items() if c > kth}, kth


def heavy_hitters_stream(
    events: DataFrame,
    value_col: str,
    capacity: int = 64,
    num_shards: int = 8,
    shard_expr: "F.Column | None" = None,
) -> DataFrame:
    """Bounded-state frequent-value summaries over a stream:
    ``(shard, value, count, err_bound)`` per micro-batch (update mode),
    at most ``capacity`` rows per shard.  Take each shard's latest
    emission as its current summary; a batch `groupBy(value)` over the
    union of shard summaries is the global view (values never cross
    shards, so no cross-shard merge is needed).

    Nulls in ``value_col`` are dropped before sharding (crc32(NULL) is
    NULL, which would otherwise route them to a None shard key).
    ``shard_expr`` overrides the shard map (a Column over the
    stringified value column ``_v``) — e.g. an md5-based map when the
    summary must be re-derivable in an engine without crc32."""

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        shard = int(key[0])
        counts: dict[str, int]
        err: int
        counts, err = pickle.loads(state.get[0]) if state.exists else ({}, 0)
        # one merge per micro-batch (not per Arrow chunk): the merged
        # summary then depends only on the epoch partition of the
        # stream, never on how the runtime chopped a batch into chunks
        chunks = [pdf["_v"] for pdf in pdfs if len(pdf)]
        if chunks:
            vals = pd.concat(chunks, ignore_index=True)
            counts, inc = mg_merge(counts, vals.value_counts(), capacity)
            err += inc
        state.update((pickle.dumps((counts, err)),))
        yield pd.DataFrame(
            {
                "shard": shard,
                "value": list(counts.keys()),
                "count": [int(c) for c in counts.values()],
                "err_bound": err,
            }
        )

    if shard_expr is None:
        shard_expr = (F.crc32(F.col("_v")) % num_shards).cast("int")
    with_shard = (
        events.select(F.col(value_col).cast("string").alias("_v"))
        .where(F.col("_v").isNotNull())
        .withColumn("shard", shard_expr)
    )
    return with_shard.groupBy("shard").applyInPandasWithState(
        process,
        outputStructType="shard int, value string, count long, err_bound long",
        stateStructType="blob binary",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
