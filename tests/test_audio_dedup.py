"""Audio fingerprint dedup: exact volume invariance, noise stability,
tonal separation, banded join vs brute force, and decoder-shared
payload coverage (PCM + G.711 mu-law).
"""

import io
import struct
import wave

import numpy as np
import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.operators.multimodal import (
    audio_fingerprint,
    audio_neardup_pairs,
    audio_phash64,
)


def _tone(freqs, sr=8000, seconds=1.0, amp=0.5, noise=0.0, seed=0, floor_seed=1):
    # harmonic content over a BROADBAND bed (part of the content, not
    # the perturbation): pure stationary tones leave most bands at
    # ~zero energy, where comparison bits are noise-decided ties —
    # real audio is broadband, and the fixture should be too
    t = np.arange(int(sr * seconds)) / sr
    x = sum(np.sin(2 * np.pi * f * t) / (i + 1) for i, f in enumerate(freqs))
    x = x / np.max(np.abs(x))
    x = x + 0.08 * np.random.default_rng(floor_seed).normal(0, 1, len(x))
    x = amp * x / np.max(np.abs(x))
    if noise:
        x = x + np.random.default_rng(seed).normal(0, noise, len(x))
    return np.clip(x, -1, 1)


def _wav(x, sr=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes((x * 32767).astype(np.int16).tobytes())
    return buf.getvalue()


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_volume_invariance_is_exact():
    x = _tone([440, 880, 1320])
    assert audio_phash64(8000, x) == audio_phash64(8000, 0.25 * x)


def test_noise_stability_and_tonal_separation():
    base = audio_phash64(8000, _tone([440, 880, 1320]))
    noisy = audio_phash64(8000, _tone([440, 880, 1320], noise=0.01, seed=3))
    other = audio_phash64(8000, _tone([523, 1567], seconds=1.0, floor_seed=2))
    assert _ham(base, noisy) <= 6
    assert _ham(base, other) > 8


def test_pairs_match_brute_force_and_cover_g711(spark):
    from confidential_storm_spark.operators.multimodal import _MULAW_LUT

    clips = {
        1: _tone([440, 880, 1320]),
        2: _tone([440, 880, 1320], amp=0.2),   # volume-only variant
        3: _tone([523, 1567], floor_seed=2),
        4: _tone([330, 660], seconds=0.8, floor_seed=3),
    }
    rows = [(i, bytearray(_wav(x))) for i, x in clips.items()]
    # a mu-law clip of the same content as 1 (decoder-shared path);
    # compand via nearest-LUT inverse for a faithful-enough variant
    pcm = (clips[1] * 32767).astype(np.int16)
    codes = np.argmin(
        np.abs(_MULAW_LUT[None, :].astype(np.int32) - pcm[:, None].astype(np.int32)),
        axis=1,
    ).astype(np.uint8)
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    g711 = (
        b"RIFF" + struct.pack("<I", 36 + len(codes)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(codes)) + codes.tobytes()
    )
    rows.append((5, bytearray(g711)))
    rows.append((6, bytearray(b"RIFFbroken")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    fps = {r.doc_id: r.aphash for r in audio_fingerprint(df).filter(F.col("decode_ok")).collect()}
    assert 6 not in fps and 5 in fps
    ids = sorted(fps)
    expect = {
        (a, b, _ham(fps[a], fps[b]))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _ham(fps[a], fps[b]) <= 6
    }
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in audio_neardup_pairs(df, max_hamming=6, bands=8).collect()
    }
    assert got == expect
    assert (1, 2, 0) in got          # volume variant: exact signature match
    assert any(a == 1 and b == 5 for a, b, _ in got)  # mu-law copy caught
