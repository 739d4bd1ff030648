"""Multimodal column operators for training-data pipelines.

Images / audio / video are opaque ``binary`` columns plus a typed
metadata struct; the heavy decode / feature-extract steps run as
Arrow-batched ``mapInPandas`` stages.  The media codec libraries
(Pillow, torchaudio, ffmpeg, ...) are NOT in this container, so the
decode kernels are gated behind import-tries: with the library absent
each operator either raises ``NotImplementedError`` (strict mode) or
produces a clearly-marked deterministic fake (plumbing mode) so the
Spark-side schema / partitioning / batch shape stay real and testable.

Scale: binary payloads ride the normal columnar path; feature columns
are fixed-width arrays; mapInPandas streams record batches so a task
never holds more than ``spark.sql.execution.arrow.maxRecordsPerBatch``
payloads in memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_image_features",
    "sample_video_frames",
]

# canonical media metadata struct
MEDIA_SCHEMA = (
    "media_type string, mime string, width int, height int, "
    "duration_ms long, n_bytes long"
)


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload", media_type: str = "image"
) -> DataFrame:
    """Attach the typed metadata struct for an opaque binary column.
    Sizes come from the payload itself; format-specific fields are
    filled by the decode stage."""
    return df.withColumn(
        "media",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        ),
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decoded features': seeded by the payload
    digest, so tests are reproducible and content-sensitive."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = 16,
    strict: bool = False,
) -> DataFrame:
    """Decode images and emit a feature vector per payload.

    With Pillow present this would decode + resize + embed; in this
    container the decode kernel is STUBBED: ``strict=True`` raises
    ``NotImplementedError``, otherwise a deterministic fake feature
    vector (payload-digest-seeded) flows through the *real* Spark
    plumbing (mapInPandas, Arrow batches, fixed-width output schema).
    """
    try:
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    if strict and not have_pil:
        raise NotImplementedError(
            "image decode requires Pillow (not in container); "
            "run with strict=False for the deterministic-fake plumbing path"
        )

    out_schema = f"{id_col} long, features array<float>, decode_ok boolean"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_features(p, dim) if p is not None else np.zeros(dim, np.float32)
                for p in pdf[payload_col]
            ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "features": feats,
                    "decode_ok": [p is not None for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(decode, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_frames: int = 4,
    strict: bool = False,
) -> DataFrame:
    """Sample N frames per video payload (one output row per frame).

    Real implementation needs ffmpeg/av (absent) — STUBBED: frame
    payloads are deterministic digests of (payload, frame_idx); the
    explode/one-row-per-frame shape, schema, and batch streaming are
    real.
    """
    if strict:
        raise NotImplementedError(
            "video frame sampling requires ffmpeg/av (not in container)"
        )

    out_schema = f"{id_col} long, frame_idx int, frame binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                for i in range(n_frames):
                    ids.append(mid)
                    idxs.append(i)
                    frames.append(hashlib.md5(bytes(p) + i.to_bytes(4, "big")).digest())
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame": frames})

    return df.select(id_col, payload_col).mapInPandas(sample, schema=out_schema)
