"""Streaming embedding ingest into a standing IVF index.

The ANN counterpart of :mod:`streaming.ingest_dedup`: each micro-batch
of newly-embedded rows is appended to the standing IVF (or IVF-PQ)
index with :func:`operators.similarity.ivf_append` /
:func:`operators.pq.ivfpq_append` — nearest-centroid assignment only,
no re-cluster, per-batch cost ∝ the batch.  Queries against the index
(:func:`ivf_topk_indexed` / :func:`ivfpq_topk`) see every vector
ingested so far: the partitioned parquet table IS the serving index,
there is no separate "refresh" step.

At 100 TB this is the only maintenance model that works: the coarse
quantizer is trained once on a representative sample, and the
embedding feed (new documents arriving continuously) lands directly in
its partition.  Drift is a measurable quantity — re-train and rebuild
when the appended fraction dominates, exactly like re-clustering any
secondary index — and the full-probe path stays exact through any
amount of drift, so correctness never depends on the re-train cadence.

foreachBatch gives at-least-once semantics (same as ingest_dedup): a
replayed batch appends duplicate rows, which full probe surfaces as
duplicate ids.  Exactly-once needs an idempotent sink (MERGE on id);
with plain parquet, dedup on read (row_number over id) or rely on the
checkpoint making replays rare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ann_ingest_stream"]


def ann_ingest_stream(
    embeddings: DataFrame,
    index_path: str,
    checkpoint_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    compressed: bool = False,
    trigger_available_now: bool = True,
):
    """Append every micro-batch of ``embeddings`` (a streaming
    DataFrame) to the standing index at ``index_path`` (built
    beforehand with ``ivf_write_index`` / ``ivfpq_write_index``).
    ``compressed=True`` routes through :func:`pq.ivfpq_append` (codes
    from the existing codebooks); otherwise :func:`ivf_append`.
    Returns the started StreamingQuery."""
    from ..operators.pq import ivfpq_append
    from ..operators.similarity import ivf_append

    def _process(batch: DataFrame, epoch_id: int) -> None:
        if compressed:
            ivfpq_append(batch, index_path, vec_col=vec_col, id_col=id_col)
        else:
            ivf_append(batch, index_path, vec_col=vec_col, id_col=id_col)

    writer = embeddings.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
