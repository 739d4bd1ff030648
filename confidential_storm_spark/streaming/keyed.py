"""PER-KEY streaming DP state — the 100 TB streaming path.

Round-2 verdict: :func:`~.stateful.dp_histogram_stream` pickles the
whole per-bucket ``StreamingDPMechanism`` as ONE state blob, rewritten
every micro-batch (reference parity — the reference holds the same
state per enclave replica, StreamingDPMechanism.java:34-96 — but the
state-write cost is O(bucket state), not O(keys touched), and the
per-key ``_observed_users`` sets grow unbounded for never-released
keys, StreamingDPMechanism.java:66).

This module is the scale-safe replacement, SURVEY §1.3's own mapping
(per-key value state).  Three chained stages (Spark allows only ONE
``applyInPandasWithState`` per query, and the epoch id must ride the
data, so the stages hand off through one-file-per-epoch parquet —
the same micro-batch==epoch file handoff the reference's ZK epoch
barrier provides):

1. :func:`stamp_epoch_stream` — ``foreachBatch`` stamps
   ``epoch = batch_id`` and writes ONE parquet file per batch
   (processing-time mode, reference T3 parity); OR
   :func:`stamp_event_time_epoch_stream` — epochs derived from the
   DATA via tumbling event-time windows with a watermark late-drop,
   matching the batch path's day-since-origin epochs (the §7
   semantic upgrade; differential-tested against ``dp_batch``).
2. :func:`prev_epoch_counts_stream` — state keyed by **(key, user)**,
   one ``last_epoch`` int per pair: emits each pair's window total
   plus the user's PREVIOUS contribution epoch for that key and drops
   the user id.  State writes are O(pairs touched this batch); each
   state row is O(1) bytes (this is the streaming twin of the batch
   path's ``add_window_prev_counts`` window scan,
   dp/mechanism.py:121).
3. :func:`dp_histogram_stream_keyed` — state keyed by **key**: the two
   aggregation trees as raw float64 bytes plus round scalars.  NO user
   ids anywhere in state; state size per key is O(T) regardless of how
   many users touch the key (one key with 10^6 users costs the same as
   10 — test-proven).  State writes are O(keys touched this batch).

Epoch semantics: a key's group function only runs when the key has
rows, so stage 3 CATCHES UP silent epochs deterministically (zero-data
``snapshot()`` calls) before applying a window — predicted empty-key
releases (Algorithm 3) land on exactly the leaf the per-bucket
mechanism would use.  The one semantic difference from the per-bucket
operator: a predicted release for a key that NEVER reappears is
emitted on the key's next invocation (late) rather than at the
predicted epoch; the cumulative sums are identical.  The per-bucket
operator remains available for exact tick-parity (T4 heartbeats).

``transformWithStateInPandas`` (Spark 4's per-key state API) would
collapse stage 3's packing boilerplate, but it cannot run in this
container — root cause isolated (re-verified on Spark **4.1.2**,
2026-08-17: ``import google.protobuf`` still raises
``ModuleNotFoundError``): the API's state-server protocol is
protobuf-based, and
the driver-side worker dies at
``pyspark/sql/streaming/proto/StateMessage_pb2.py`` with
``ImportError: cannot import name 'descriptor' from
'google.protobuf'`` — the ``protobuf`` Python package is simply not
installed here (and installs are prohibited), so the JVM surfaces it
as "TransformWithStateInPySpark driver worker exited unexpectedly
(crashed)".  Purely environmental: the code path needs no change on
a cluster with protobuf present.  The per-key grouping runs on
``applyInPandasWithState`` instead — the state layout and
write-volume properties are the same, and that API's socket protocol
has no protobuf dependency.
"""

from __future__ import annotations

import math
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..dp.mechanism import StreamingDPMechanism
from ..dp.tree import BinaryAggregationTree
from ..operators.dp_batch import DPParams

__all__ = [
    "stamp_epoch_stream",
    "stamp_event_time_epoch_stream",
    "read_epoch_stream",
    "prev_epoch_counts_stream",
    "dp_histogram_stream_keyed",
    "run_keyed_dp_available_now",
]

PREV_COUNTS_SCHEMA = "key string, epoch int, total double, prev_epoch int"


# ---------------------------------------------------------------------------
# stage 1: epoch stamping (micro-batch id -> data column)
# ---------------------------------------------------------------------------


def stamp_epoch_stream(events: DataFrame, path: str, checkpoint: str):
    """Stamp each micro-batch with ``epoch = batch_id`` and write ONE
    parquet file per batch (``coalesce(1)`` keeps batch == epoch for
    the downstream ``maxFilesPerTrigger=1`` file source).  Returns the
    (started) StreamingQuery."""

    def write(df: DataFrame, batch_id: int) -> None:
        df.withColumn("epoch", F.lit(batch_id).cast("int")).coalesce(1).write.mode(
            "append"
        ).parquet(path)

    return (
        events.writeStream.foreachBatch(write)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_epoch_stream(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """File-source reader for a stage-1 output dir: one file per
    trigger, so one stamped epoch per micro-batch."""
    return (
        spark.readStream.schema(f"{schema}, epoch int")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# stage 1 (event-time mode): epochs from the DATA, watermark late-drop
# ---------------------------------------------------------------------------

EVENT_STAMPED_SCHEMA = "key string, user_id string, value double, epoch int"

_WINDOW_UNITS_US = {
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def _window_micros(window: str) -> int:
    n, unit = window.strip().split()
    return int(n) * _WINDOW_UNITS_US[unit.rstrip("s")]


def stamp_event_time_epoch_stream(
    events: DataFrame,
    path: str,
    checkpoint: str,
    ts_col: str = "event_time",
    key_col: str = "key",
    user_col: str = "user_id",
    value_col: str = "value",
    window: str = "1 day",
    delay: str = "1 day",
    origin: str = "2024-01-01",
):
    """Stage 1, EVENT-TIME mode: epochs derive from the data
    (``epoch = floor((window_start - origin) / window)``), matching
    the batch path's day-since-origin derivation
    (sources/tables.py::contributions_view) instead of the
    processing-time ``epoch = batch_id`` stamp — streaming and batch
    agree on data-derived epochs (SURVEY §7's intentional semantic
    upgrade over the reference's wall-clock tick, T3).

    The tumbling ``window`` aggregation pre-sums each (key, user,
    epoch)'s contributions, and the ``delay`` watermark gives the
    REAL late-data contract: a window emits once the watermark passes
    its end (append mode — exactly-once per window), and rows later
    than the watermark are dropped by the engine, not folded into a
    wrong epoch.  Because windows close in event-time order, epochs
    arrive at stage 2/3 monotonically — the property the DP
    mechanism's round structure needs.

    Bounded-input caveat (tests, availableNow drains): the watermark
    trails the max seen event time by ``delay``, so the LAST windows
    stay pending until later input — or a T4-style heartbeat tick
    past ``window_end + delay`` — advances it.  A continuous
    production stream does this for free.

    Writes one parquet file per emitted micro-batch
    (``EVENT_STAMPED_SCHEMA``); returns the started query."""
    import datetime as dt

    win_us = _window_micros(window)
    origin_us = int(
        dt.datetime.strptime(origin, "%Y-%m-%d")
        .replace(tzinfo=dt.timezone.utc)
        .timestamp()
        * 1_000_000
    )
    stamped = (
        events.withWatermark(ts_col, delay)
        .groupBy(F.window(F.col(ts_col), window), F.col(key_col), F.col(user_col))
        .agg(F.sum(value_col).alias("_total"))
        .select(
            F.col(key_col).cast("string").alias("key"),
            F.col(user_col).cast("string").alias("user_id"),
            F.col("_total").cast("double").alias("value"),
            ((F.unix_micros(F.col("window.start")) - F.lit(origin_us)) / F.lit(win_us))
            .cast("int")
            .alias("epoch"),
        )
    )

    def write(df: DataFrame, batch_id: int) -> None:
        # repartition(1): one file per batch; the narrow coalesce would
        # single-task the upstream stateful aggregation
        df.repartition(1).write.mode("append").parquet(path)

    return (
        stamped.writeStream.foreachBatch(write)
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# stage 2: per-(key, user) previous-epoch tracking
# ---------------------------------------------------------------------------


def prev_epoch_counts_stream(
    stamped: DataFrame,
    key_col: str = "key",
    user_col: str = "user_id",
    value_col: str = "value",
    epoch_col: str = "epoch",
) -> DataFrame:
    """Stage 2: for every (key, user) pair contributing in an epoch,
    emit ``(key, epoch, total, prev_epoch)`` where ``prev_epoch`` is
    the user's previous contribution epoch for that key (``-1`` for
    first-ever) — then FORGET the user id: downstream state never sees
    it.  State per (key, user) group is a single int; writes per batch
    are O(pairs touched)."""

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        last = int(state.get[0]) if state.exists else -1
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        totals = pdf.groupby(epoch_col, sort=True)[value_col].sum()
        rows = []
        for epoch, total in totals.items():
            rows.append((key[0], int(epoch), float(total), last))
            last = int(epoch)
        state.update((last,))
        yield pd.DataFrame(rows, columns=["key", "epoch", "total", "prev_epoch"])

    return (
        stamped.filter(F.col(key_col).isNotNull())
        .select(
            F.col(key_col).cast("string").alias("_k"),
            F.col(user_col).cast("string").alias("_u"),
            F.col(value_col).cast("double").alias(value_col),
            F.col(epoch_col).cast("int").alias(epoch_col),
        )
        .groupBy("_k", "_u")
        .applyInPandasWithState(
            process,
            outputStructType=PREV_COUNTS_SCHEMA,
            stateStructType="last_epoch int",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# ---------------------------------------------------------------------------
# stage 3: per-key DP mechanism state
# ---------------------------------------------------------------------------

_KEYED_STATE_SCHEMA = (
    "ks_tree binary, hist_tree binary, time_step int, round_start int, "
    "unreleased double, current_sum double, predicted int"
)


def _tree_to_bytes(tree: BinaryAggregationTree | None) -> bytes:
    return b"" if tree is None else tree.tree.tobytes()


def _tree_from_bytes(buf: bytes, sigma: float) -> BinaryAggregationTree:
    arr = np.frombuffer(buf, dtype=np.float64).copy()
    t = BinaryAggregationTree.__new__(BinaryAggregationTree)
    t.num_leaves = (len(arr) + 1) // 2
    t.height = int(math.log2(t.num_leaves))
    t.sigma = float(sigma)
    t.tree = arr
    t._variances = BinaryAggregationTree._shared_variances(t.num_leaves, t.height, t.sigma)
    t._weights = BinaryAggregationTree._shared_weights(t.num_leaves, t.height)
    return t


def _pack_state(mech: StreamingDPMechanism, key: str) -> tuple:
    """Mechanism -> one fixed-layout state row: trees as raw float64
    bytes + round scalars.  NO user ids, NO pickled objects."""
    return (
        _tree_to_bytes(mech._key_selection_forest.get(key)),
        _tree_to_bytes(mech._histogram_forest.get(key)),
        int(mech.time_step),
        int(mech._round_start.get(key, 0)),
        float(mech._unreleased_buffer.get(key, 0.0)),
        float(mech._current_sums.get(key, 0.0)),
        int(mech._predicted_release_times.get(key, -1)),
    )


def _unpack_state(row: tuple, p: DPParams, key: str, rng) -> StreamingDPMechanism:
    ks_b, hist_b, time_step, round_start, unreleased, current_sum, predicted = row
    mech = StreamingDPMechanism(
        p.sigma_key,
        p.sigma_hist,
        p.threshold_quantile,
        p.max_time_steps,
        p.mu,
        p.max_contributions_per_user,
        rng=rng,
    )
    mech.time_step = int(time_step)
    mech._round_start[key] = int(round_start)
    if unreleased:
        mech._unreleased_buffer[key] = float(unreleased)
    if ks_b is not None and len(ks_b):
        mech._key_selection_forest[key] = _tree_from_bytes(bytes(ks_b), p.sigma_key)
    if hist_b is not None and len(hist_b):
        mech._histogram_forest[key] = _tree_from_bytes(bytes(hist_b), p.sigma_hist)
        mech._current_sums[key] = float(current_sum)
    if predicted >= 0:
        mech._predicted_release_times[key] = int(predicted)
    return mech


def dp_histogram_stream_keyed(
    prev_counts: DataFrame,
    params: DPParams,
) -> DataFrame:
    """Stage 3: the DP-SQLP mechanism with PER-KEY state rows over the
    stage-2 ``(key, epoch, total, prev_epoch)`` stream.

    Per key and epoch: catch up silent epochs (due Algorithm-3
    predictions fire on their exact leaf), count new users from the
    prev-epoch counters (a user is new iff ``prev_epoch <
    round_start`` — dp/mechanism.py:121, NO user ids needed), run the
    key-selection gate, emit ``(key, count, epoch)`` when released.

    State per key = two O(T) trees + 5 scalars, independent of user
    cardinality; state writes per batch = keys touched, not keys held
    (both test-proven via the state-store metrics)."""
    p = params

    def process(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        k = key[0]
        # Fresh-noise rng per invocation; with a seed it is derived from
        # (seed, key, first-epoch-of-batch) so a checkpoint replay of
        # the same batch draws the same noise.
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        first_epoch = int(pdf["epoch"].min())
        rng = (
            np.random.default_rng((p.seed, zlib.crc32(k.encode()), first_epoch))
            if p.seed is not None
            else np.random.default_rng()
        )
        if state.exists:
            mech = _unpack_state(state.get, p, k, rng)
        else:
            mech = StreamingDPMechanism(
                p.sigma_key,
                p.sigma_hist,
                p.threshold_quantile,
                p.max_time_steps,
                p.mu,
                p.max_contributions_per_user,
                rng=rng,
            )
        out: list[tuple] = []
        for epoch, sub in pdf.groupby("epoch", sort=True):
            epoch = int(epoch)
            # deterministic catch-up of silent epochs: no window data,
            # only due predicted releases fire (their leaf == their
            # predicted step, exactly as the per-bucket mechanism)
            while mech.time_step < epoch and mech.time_step < p.max_time_steps:
                mech.snapshot()
            total = float(sub["total"].sum())
            prev_counts_pairs = list(
                sub.groupby("prev_epoch", sort=True).size().items()
            )
            mech.add_window_prev_counts(k, total, prev_counts_pairs)
            hist = mech.snapshot()
            if k in hist:
                # emit the step that actually processed the window:
                # normally == epoch, but LATE rows (epoch already
                # passed for this key) fold into the current step
                # (T5/T6 late-partial semantics) and must not be
                # labeled with the stale epoch
                out.append((k, int(hist[k]), mech.time_step - 1))
        state.update(_pack_state(mech, k))
        if out:
            yield pd.DataFrame(out, columns=["key", "count", "epoch"])

    return prev_counts.groupBy("key").applyInPandasWithState(
        process,
        outputStructType="key string, count long, epoch int",
        stateStructType=_KEYED_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# orchestration (availableNow drains, checkpointed — restartable)
# ---------------------------------------------------------------------------


def run_keyed_dp_available_now(
    spark: SparkSession,
    events: DataFrame,
    params: DPParams,
    workdir: str,
    schema: str,
    key_col: str = "key",
    user_col: str = "user_id",
    value_col: str = "value",
    epoch_mode: str = "processing",
    ts_col: str = "event_time",
    window: str = "1 day",
    delay: str = "1 day",
    origin: str = "2024-01-01",
) -> dict:
    """Drain the 3-stage keyed DP pipeline over all available input
    (one ``availableNow`` pass per stage, in order — in production the
    three checkpointed queries run concurrently).  All checkpoints and
    handoffs live under ``workdir``, so calling this again after new
    input files arrive RESUMES from state (recovery-tested).

    ``epoch_mode='processing'`` stamps ``epoch = batch_id`` (reference
    T3 parity: wall-clock ticks); ``epoch_mode='event_time'`` derives
    epochs from ``ts_col`` tumbling windows with a ``delay`` watermark
    (late rows DROPPED by the engine), so streaming output epochs
    match the batch path's data-derived epochs.

    Returns ``{"batches": [(batch_id, rows)], "progress": {stage:
    [stateOperators dicts]}}`` — the progress metrics expose
    ``numRowsUpdated`` / ``numRowsTotal`` per stage for the
    state-write-volume tests."""
    stamped_path = f"{workdir}/stamped"
    prev_path = f"{workdir}/prev_counts"
    progress: dict[str, list] = {}

    if epoch_mode == "event_time":
        q1 = stamp_event_time_epoch_stream(
            events,
            stamped_path,
            f"{workdir}/ckpt_stamp",
            ts_col,
            key_col,
            user_col,
            value_col,
            window,
            delay,
            origin,
        )
        q1.awaitTermination(300)
        stamped = (
            spark.readStream.schema(EVENT_STAMPED_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(stamped_path)
        )
        prev = prev_epoch_counts_stream(stamped)
    elif epoch_mode == "processing":
        q1 = stamp_epoch_stream(events, stamped_path, f"{workdir}/ckpt_stamp")
        q1.awaitTermination(300)
        stamped = read_epoch_stream(spark, stamped_path, schema)
        prev = prev_epoch_counts_stream(stamped, key_col, user_col, value_col)
    else:
        raise ValueError(f"unknown epoch_mode {epoch_mode!r}")

    def write_prev(df: DataFrame, batch_id: int) -> None:
        # repartition(1), NOT coalesce(1): coalesce's narrow dependency
        # would collapse the 32-way stateful stage into a single task;
        # the shuffle keeps state processing parallel and only the
        # small per-pair output funnels through one writer (one file
        # per batch keeps the downstream batch == epoch mapping)
        df.repartition(1).write.mode("append").parquet(prev_path)

    q2 = (
        prev.writeStream.foreachBatch(write_prev)
        .outputMode("update")
        .option("checkpointLocation", f"{workdir}/ckpt_prev")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(300)
    progress["prev_counts"] = [
        pr["stateOperators"][0] for pr in q2.recentProgress if pr["stateOperators"]
    ]

    prev_stream = (
        spark.readStream.schema(PREV_COUNTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(prev_path)
    )
    out: list = []
    q3 = (
        dp_histogram_stream_keyed(prev_stream, params)
        .writeStream.outputMode("update")
        .foreachBatch(lambda df, bid: out.append((bid, df.collect())))
        .option("checkpointLocation", f"{workdir}/ckpt_dp")
        .trigger(availableNow=True)
        .start()
    )
    q3.awaitTermination(300)
    progress["dp"] = [
        pr["stateOperators"][0] for pr in q3.recentProgress if pr["stateOperators"]
    ]
    return {"batches": out, "progress": progress}
