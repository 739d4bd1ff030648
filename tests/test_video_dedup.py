"""Video near-dup by frame voting: re-encoded copies match on every
sampled frame, clips sharing only one incidental frame do NOT fire,
and distinct content stays apart.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.operators.multimodal import video_neardup_pairs


def _y4m(frames_y, fps=25):
    h, w = frames_y[0].shape
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode()
    out = [header]
    uv = np.full((h // 2, w // 2), 128, np.uint8)
    for y in frames_y:
        out.append(b"FRAME\n" + y.tobytes() + uv.tobytes() + uv.tobytes())
    return b"".join(out)


def _scene(seed, n=8, w=48, h=32):
    rng = np.random.default_rng(seed)
    base = rng.integers(30, 220, size=(h, w))
    return [
        np.clip(base + i * 3 + rng.normal(0, 2, size=(h, w)), 0, 255).astype(np.uint8)
        for i in range(n)
    ]


def test_reencoded_copy_matches_all_frames(spark):
    scene = _scene(seed=5)
    noisy = [
        np.clip(f.astype(np.int32) + np.random.default_rng(i).normal(0, 2, f.shape), 0, 255).astype(np.uint8)
        for i, f in enumerate(scene)
    ]
    other = _scene(seed=77)
    rows = [
        (1, bytearray(_y4m(scene))),
        (2, bytearray(_y4m(noisy))),   # mildly-corrupted copy
        (3, bytearray(_y4m(other))),   # unrelated clip
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        (r.id_a, r.id_b): r.n_matching
        for r in video_neardup_pairs(df, n_frames=4).collect()
    }
    assert got.get((1, 2), 0) >= 2       # the copy fires the vote
    assert (1, 3) not in got and (2, 3) not in got


def test_single_shared_frame_does_not_fire(spark):
    a = _scene(seed=1)
    b = _scene(seed=2)
    # splice ONE of a's sampled frames (index 0) into b: a title-card
    # style incidental overlap
    b[0] = a[0].copy()
    rows = [(1, bytearray(_y4m(a))), (2, bytearray(_y4m(b)))]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = video_neardup_pairs(df, n_frames=4, min_matching_frames=2).collect()
    assert out == []
    # ...but a single-frame matcher (min_matching_frames=1) sees it
    one = video_neardup_pairs(df, n_frames=4, min_matching_frames=1).collect()
    assert [(r.id_a, r.id_b, r.n_matching) for r in one] == [(1, 2, 1)]
