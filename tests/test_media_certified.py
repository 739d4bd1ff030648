"""Driver-certifiable perceptual media dedup (operators/mediahash.py):
integer-exact fingerprints, real codec roundtrips, DuckDB oracle twins."""

from __future__ import annotations

import itertools

import duckdb
import numpy as np
import pytest

from confidential_storm_spark.operators import mediahash as mh


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & (2**64 - 1)).count("1")


def _media_rows(n=6):
    for d in range(n):
        yield d, str(d), False
        if d % mh.PERT_EVERY == 0:
            yield d + mh.PERT_OFFSET, str(d), True


# ---------------------------------------------------------------------------
# fingerprint properties
# ---------------------------------------------------------------------------


def test_blockmean_perturbation_close_unrelated_far():
    sigs = {}
    for d in range(20):
        sigs[d] = mh.blockmean_hash64(mh.synth_image_pixels(str(d), False))
        sigs[d + mh.PERT_OFFSET] = mh.blockmean_hash64(mh.synth_image_pixels(str(d), True))
    for d in range(20):
        assert _hamming(sigs[d], sigs[d + mh.PERT_OFFSET]) <= 7
    far = [_hamming(sigs[a], sigs[b]) for a, b in itertools.combinations(range(20), 2)]
    assert min(far) > 7  # unrelated content lands far apart


def test_audio_perturbation_close_unrelated_far():
    sigs = {}
    for d in range(20):
        sigs[d] = mh.audio_energy_hash64(mh.synth_audio_samples(str(d), False).astype(np.int64))
        sigs[d + mh.PERT_OFFSET] = mh.audio_energy_hash64(
            mh.synth_audio_samples(str(d), True).astype(np.int64)
        )
    for d in range(20):
        assert _hamming(sigs[d], sigs[d + mh.PERT_OFFSET]) <= 7
    far = [_hamming(sigs[a], sigs[b]) for a, b in itertools.combinations(range(20), 2)]
    assert min(far) > 7


def test_blockmean_resizes_arbitrary_images():
    rng = np.random.default_rng(0)
    big = rng.integers(0, 256, size=(128, 96, 3), dtype=np.uint8)
    h = mh.blockmean_hash64(big)
    assert isinstance(h, int) and -(2**63) <= h < 2**63
    # nearest-resize determinism: same input -> same hash
    assert h == mh.blockmean_hash64(big)


def test_audio_too_short_raises():
    with pytest.raises(ValueError):
        mh.audio_energy_hash64(np.zeros(10, np.int64))


# ---------------------------------------------------------------------------
# real codec roundtrips are lossless for the synthetic corpus
# ---------------------------------------------------------------------------


def test_image_payload_roundtrip_exact():
    from confidential_storm_spark.operators.multimodal import decode_image

    for _mid, tok, pert in _media_rows():
        px = mh.synth_image_pixels(tok, pert)
        img = decode_image(mh.synth_image_payload(int(tok.split(":")[0]), pert))
        assert img is not None and np.array_equal(img[..., 0], px)


def test_audio_payload_roundtrip_exact():
    from confidential_storm_spark.operators.multimodal import _wav_mono

    for _mid, tok, pert in _media_rows():
        want = mh.synth_audio_samples(tok, pert).astype(np.int64)
        sr, x = _wav_mono(mh.synth_audio_payload(int(tok), pert))
        assert sr == 8000
        got = np.rint(x * 32768.0).astype(np.int64)
        assert np.array_equal(got, want)


def test_video_payload_frames_roundtrip_exact():
    from confidential_storm_spark.operators.multimodal import _y4m_frames

    for _mid, tok, pert in _media_rows(3):
        frames = list(_y4m_frames(mh.synth_video_payload(int(tok), pert)))
        assert len(frames) == mh.VID_FRAMES
        for f, plane in enumerate(frames):
            assert np.array_equal(plane, mh.synth_image_pixels(f"{tok}:f{f}", pert))


# ---------------------------------------------------------------------------
# DuckDB oracle twins are bit-exact vs the Python fingerprints
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute("CREATE VIEW documents AS SELECT unnest(range(0, 6)) AS doc_id")
    return c


def _brute_pairs(sig: dict, maxh=7):
    return sorted(
        (a, b, _hamming(sig[a], sig[b]))
        for a, b in itertools.combinations(sorted(sig), 2)
        if _hamming(sig[a], sig[b]) <= maxh
    )


def test_oracle_image_matches_python(con):
    sig = {m: mh.blockmean_hash64(mh.synth_image_pixels(t, p)) for m, t, p in _media_rows()}
    got = sorted(tuple(r) for r in con.execute(mh.image_blockmean_pairs_sql()).fetchall())
    assert got == _brute_pairs(sig)


def test_oracle_audio_matches_python(con):
    sig = {
        m: mh.audio_energy_hash64(mh.synth_audio_samples(t, p).astype(np.int64))
        for m, t, p in _media_rows()
    }
    got = sorted(tuple(r) for r in con.execute(mh.audio_energy_pairs_sql()).fetchall())
    assert got == _brute_pairs(sig)


def test_oracle_video_matches_python(con):
    sig = {
        (m, f): mh.blockmean_hash64(mh.synth_image_pixels(f"{t}:f{f}", p))
        for m, t, p in _media_rows()
        for f in range(mh.VID_FRAMES)
    }
    ids = sorted({m for m, _ in sig})
    want = sorted(
        (a, b, n)
        for a, b in itertools.combinations(ids, 2)
        for n in [
            sum(1 for f in range(mh.VID_FRAMES) if _hamming(sig[(a, f)], sig[(b, f)]) <= 7)
        ]
        if n >= 2
    )
    got = sorted(tuple(r) for r in con.execute(mh.video_frames_pairs_sql()).fetchall())
    assert got == want


# ---------------------------------------------------------------------------
# Spark end-to-end: pairs via the real decode path equal the oracle
# ---------------------------------------------------------------------------


def test_spark_image_pairs_match_oracle(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    got = sorted(
        map(tuple, mh.image_blockmean_neardup(mh.media_corpus(docs, "image")).collect())
    )
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    sig = {}
    for d in ids:
        sig[d] = mh.blockmean_hash64(mh.synth_image_pixels(str(d), False))
        if d % mh.PERT_EVERY == 0:
            sig[d + mh.PERT_OFFSET] = mh.blockmean_hash64(mh.synth_image_pixels(str(d), True))
    assert got == _brute_pairs(sig)


def test_spark_video_vote_semantics(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    got = sorted(
        map(tuple, mh.video_blockmean_neardup(mh.media_corpus(docs, "video")).collect())
    )
    # every 5th doc has a perturbed clip; frame voting should match it
    ids = [r.doc_id for r in docs.select("doc_id").collect()]
    expect_pairs = {(d, d + mh.PERT_OFFSET) for d in ids if d % mh.PERT_EVERY == 0}
    assert {(a, b) for a, b, _n in got} == expect_pairs
    assert all(n >= 2 for _a, _b, n in got)


def test_video_neardup_lsh_matches_banded_small_corpus(spark):
    """The frame-keyed LSH path (scale-dial floor) votes the same
    near-dup pairs as the banded join at small N."""
    from confidential_storm_spark.operators import mediahash as mh

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = mh.media_corpus(docs, "video")
    banded = {
        (r.id_a, r.id_b, r.n_matching)
        for r in mh.video_blockmean_neardup(media, method="banded").collect()
    }
    lsh = {
        (r.id_a, r.id_b, r.n_matching)
        for r in mh.video_blockmean_neardup(media, method="lsh").collect()
    }
    assert lsh == banded and len(banded) > 0


def test_video_bucket_cap_bounds_degenerate_frames(spark):
    """Constant frames shared across many videos collide at the same
    (frame, key) bucket; the ROW_NUMBER cap must bound the candidate
    join on BOTH strategies (ADVICE r10: the LSH path had no backstop).
    cap=1 keeps one row per bucket, so no candidate pair survives."""
    from confidential_storm_spark.operators import mediahash as mh

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = mh.media_corpus(docs, "video")
    for method in ("banded", "lsh"):
        uncapped = mh.video_blockmean_neardup(media, method=method).count()
        capped = mh.video_blockmean_neardup(
            media, method=method, max_bucket_size=1
        ).count()
        assert uncapped > 0 and capped == 0, (method, uncapped, capped)
