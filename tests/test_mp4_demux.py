"""MP4 (ISO BMFF) container demux: box tree, sample tables, coded
access-unit extraction, and the Spark demux operator.

Reference parity: the reference treats video as opaque payloads with
typed metadata (SURVEY §2.10); the container layer here is what a
training-data pipeline needs before any codec — certified against
streams the in-repo muxer assembles (build_mp4 is the structural
inverse of the parser) plus a malformed-byte fuzz contract."""

import numpy as np
import pytest

from confidential_storm_spark.operators.mp4 import (
    build_mp4,
    extract_mp4_samples,
    mp4_sample_table,
    parse_mp4,
)


def _video_fixture(rng, n=17, spc=5):
    samples = [
        bytes(rng.integers(0, 256, int(rng.integers(10, 40)), dtype=np.uint8))
        for _ in range(n)
    ]
    mp4 = build_mp4(
        [
            dict(
                samples=samples, handler="vide", codec="avc1", timescale=30000,
                deltas=[1001] * n, width=320, height=180, sync=[1, 8, 15],
                samples_per_chunk=spc,
            )
        ]
    )
    return mp4, samples


def test_parse_metadata_video_and_audio():
    rng = np.random.default_rng(0)
    vsam = [bytes(rng.integers(0, 256, 20, dtype=np.uint8)) for _ in range(12)]
    asam = [bytes(rng.integers(0, 256, 12, dtype=np.uint8)) for _ in range(9)]
    mp4 = build_mp4(
        [
            dict(samples=vsam, handler="vide", codec="avc1", timescale=30000,
                 deltas=[1001] * 12, width=640, height=360, sync=[1, 7]),
            dict(samples=asam, handler="soun", codec="mp4a", timescale=44100,
                 deltas=[1024] * 9, channels=2, sample_rate=44100),
        ]
    )
    info = parse_mp4(mp4)
    assert info["brand"] == "isom"
    vid, aud = info["tracks"]
    assert (vid["handler"], vid["codec"]) == ("vide", "avc1")
    assert (vid["width"], vid["height"]) == (640, 360)
    assert vid["fps"] == pytest.approx(29.97, abs=0.01)
    assert vid["n_samples"] == 12
    assert (aud["handler"], aud["codec"]) == ("soun", "mp4a")
    assert (aud["channels"], aud["sample_rate"]) == (2, 44100)
    # durations: 12 * 1001 / 30000 s and 9 * 1024 / 44100 s
    assert vid["duration_ms"] == int(12 * 1001 * 1000 / 30000)
    assert aud["duration_ms"] == int(9 * 1024 * 1000 / 44100)


def test_sample_table_timestamps_offsets_keyframes():
    rng = np.random.default_rng(1)
    mp4, samples = _video_fixture(rng)
    t = mp4_sample_table(mp4)
    assert len(t["sizes"]) == 17
    # DTS: cumulative 1001-tick deltas on a 30000 timescale
    expect_dts = [i * 1001 * 1000 // 30000 for i in range(17)]
    assert t["dts_ms"].tolist() == expect_dts
    # stss 1-based [1, 8, 15] -> 0-based {0, 7, 14}
    assert np.flatnonzero(t["keyframe"]).tolist() == [0, 7, 14]
    # offsets slice out the exact original bytes (multi-chunk stco)
    for i, s in enumerate(samples):
        off, size = int(t["offsets"][i]), int(t["sizes"][i])
        assert mp4[off : off + size] == s


def test_extract_samples_byte_exact_and_track_select():
    rng = np.random.default_rng(2)
    vsam = [bytes(rng.integers(0, 256, 25, dtype=np.uint8)) for _ in range(8)]
    asam = [bytes(rng.integers(0, 256, 11, dtype=np.uint8)) for _ in range(5)]
    mp4 = build_mp4(
        [
            dict(samples=vsam, handler="vide", codec="hvc1", timescale=25,
                 deltas=[1] * 8, width=100, height=80),
            dict(samples=asam, handler="soun", codec="mp4a", timescale=48000,
                 deltas=[1024] * 5, channels=1, sample_rate=48000),
        ]
    )
    # default = first VIDEO track, even though both exist
    got = extract_mp4_samples(mp4, [0, 3, 7])
    assert [b for _, _, _, b in got] == [vsam[0], vsam[3], vsam[7]]
    # stss absent -> every sample is a sync sample (ISO 14496-12 §8.6.2)
    assert all(key for _, _, key, _ in got)
    # audio by track id
    gota = extract_mp4_samples(mp4, range(5), track_id=2)
    assert [b for _, _, _, b in gota] == asam
    with pytest.raises(ValueError):
        extract_mp4_samples(mp4, [99])
    with pytest.raises(ValueError):
        extract_mp4_samples(mp4, [0], track_id=7)


def test_malformed_and_unsupported_contract():
    rng = np.random.default_rng(3)
    mp4, _ = _video_fixture(rng)
    # documented exceptions only, however corrupt the bytes
    import random

    r = random.Random(99)
    for _ in range(400):
        base = bytearray(mp4)
        for _ in range(r.randint(1, 6)):
            base[r.randrange(len(base))] = r.randrange(256)
        try:
            parse_mp4(bytes(base))
            mp4_sample_table(bytes(base))
        except (ValueError, NotImplementedError):
            pass
    for trunc in (0, 7, 20, len(mp4) // 2):
        with pytest.raises((ValueError, NotImplementedError)):
            mp4_sample_table(mp4[:trunc])
    # a dangling empty moof is tolerated (no samples added), not fatal
    frag = mp4 + b"\x00\x00\x00\x08moof"
    assert parse_mp4(frag)["tracks"][0]["n_samples"] == 17


def test_sniff_media_reports_mp4_metadata():
    from confidential_storm_spark.operators.multimodal import sniff_media

    rng = np.random.default_rng(4)
    mp4, _ = _video_fixture(rng)
    media_type, mime, w, h, dur = sniff_media(mp4)
    assert (media_type, mime) == ("video", "video/mp4")
    assert (w, h) == (320, 180)
    assert dur == int(17 * 1001 * 1000 / 30000)
    # audio-only container sniffs as audio/mp4
    a = build_mp4(
        [dict(samples=[b"x" * 10] * 4, handler="soun", codec="mp4a",
              timescale=48000, deltas=[1024] * 4, channels=1,
              sample_rate=48000)]
    )
    media_type, mime, _, _, dur = sniff_media(a)
    assert (media_type, mime) == ("audio", "audio/mp4")
    assert dur == int(4 * 1024 * 1000 / 48000)


def test_demux_video_samples_operator(spark):
    from confidential_storm_spark.operators.multimodal import demux_video_samples

    rng = np.random.default_rng(5)
    mp4, samples = _video_fixture(rng)
    df = spark.createDataFrame(
        [(1, bytearray(mp4)), (2, bytearray(b"not a video"))],
        "media_id long, payload binary",
    )
    out = demux_video_samples(df, n_samples=4).toPandas()
    good = out[out["media_id"] == 1]
    assert good["demux_ok"].all() and len(good) == 4
    assert set(good["codec"]) == {"avc1"}
    # uniformly spaced over 17 samples: {0, 5, 11, 16}
    assert sorted(good["sample_idx"]) == [0, 5, 11, 16]
    for _, row in good.iterrows():
        assert bytes(row["sample"]) == samples[row["sample_idx"]]
    bad = out[out["media_id"] == 2]
    assert len(bad) == 1 and not bad["demux_ok"].iloc[0]
    # keyframes_only restricts the pool to the stss set
    kf = demux_video_samples(df.filter("media_id = 1"), n_samples=2,
                             keyframes_only=True).toPandas()
    assert sorted(kf["sample_idx"]) == [0, 14] and kf["keyframe"].all()
    # strict mode: unsupported container raises inside the task
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception):
        demux_video_samples(
            df.filter("media_id = 2"), strict=True
        ).collect()


def test_demux_y4m_payloads(spark):
    from confidential_storm_spark.operators.multimodal import demux_video_samples

    # y4m: uncompressed frames demux as their own keyframe samples
    w, h, n = 8, 6, 5
    header = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()
    frame = b"FRAME\n" + bytes(w * h) + bytes((w // 2) * (h // 2)) * 2
    y4m = header + frame * n
    df = spark.createDataFrame([(1, bytearray(y4m))], "media_id long, payload binary")
    out = demux_video_samples(df, n_samples=3).toPandas()
    assert out["demux_ok"].all() and len(out) == 3
    assert out["keyframe"].all()
    assert sorted(out["sample_idx"]) == [0, 2, 4]
    assert out[out["sample_idx"] == 2]["dts_ms"].iloc[0] == 80  # 2/25 s


# ---------------------------------------------------------------------------
# property-based: mux -> demux is the identity on sample content
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@st.composite
def _track_specs(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    sizes = draw(st.lists(st.integers(1, 64), min_size=n, max_size=n))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    samples = [bytes(rng.integers(0, 256, s, dtype=np.uint8)) for s in sizes]
    deltas = draw(st.lists(st.integers(1, 5000), min_size=n, max_size=n))
    spc = draw(st.integers(1, n))
    timescale = draw(st.integers(1, 90000))
    sync = draw(
        st.one_of(
            st.none(),
            st.lists(st.integers(1, n), min_size=0, max_size=n, unique=True),
        )
    )
    return dict(
        samples=samples, handler="vide", codec="avc1", timescale=timescale,
        deltas=deltas, width=draw(st.integers(1, 4096)),
        height=draw(st.integers(1, 4096)), sync=sync, samples_per_chunk=spc,
    )


@settings(max_examples=60, deadline=None)
@given(_track_specs())
def test_mux_demux_identity_property(spec):
    """For ANY track spec (sizes, deltas, chunking, sync set,
    timescale), demuxing the muxed stream returns byte-exact samples,
    the cumulative-delta DTS sequence, and exactly the sync set."""
    mp4 = build_mp4([spec])
    t = mp4_sample_table(mp4)
    n = len(spec["samples"])
    assert len(t["sizes"]) == n
    got = extract_mp4_samples(mp4, range(n))
    assert [b for _, _, _, b in got] == spec["samples"]
    dts = 0
    for i, d in enumerate(spec["deltas"]):
        assert int(t["dts_ms"][i]) == dts * 1000 // spec["timescale"]
        dts += d
    if spec["sync"] is None:
        assert t["keyframe"].all()
    else:
        assert set(np.flatnonzero(t["keyframe"]) + 1) == set(spec["sync"])


# ---------------------------------------------------------------------------
# fragmented MP4 (moof/mdat): §8.8 demux certified by the inverse muxer
# ---------------------------------------------------------------------------

from confidential_storm_spark.operators.mp4 import build_mp4_fragmented  # noqa: E402


def _frag_samples(rng, sizes):
    return [bytes(rng.integers(0, 256, s, dtype=np.uint8)) for s in sizes]


def test_fragmented_roundtrip_moof_mode():
    """Two tracks, three fragments, trex defaults + tfhd overrides +
    per-sample trun fields, tfdt anchoring on the middle fragment only
    (the others ride the cumulative-DTS path)."""
    rng = np.random.default_rng(10)
    v1 = _frag_samples(rng, [20, 30, 25, 40])     # varied sizes -> trun sizes
    v2 = _frag_samples(rng, [16] * 5)             # uniform -> tfhd override
    v3 = _frag_samples(rng, [8] * 3)              # == trex default -> pure trex
    a1 = _frag_samples(rng, [11] * 6)
    tracks = [
        dict(handler="vide", codec="avc1", timescale=30000, width=320,
             height=180, default_duration=1001, default_size=8),
        dict(handler="soun", codec="mp4a", timescale=48000, channels=2,
             sample_rate=48000, default_duration=1024),
    ]
    fragments = [
        [
            dict(track_id=1, samples=v1, deltas=[1001] * 4, sync=[0]),
            dict(track_id=2, samples=a1, deltas=[1024] * 6),
        ],
        # tfdt jumps ahead of the cumulative clock (edit/splice)
        [dict(track_id=1, samples=v2, deltas=[1001] * 5, sync=[0, 3],
              tfdt=30000)],
        [dict(track_id=1, samples=v3, deltas=[1001] * 3, sync=[])],
    ]
    mp4 = build_mp4_fragmented(tracks, fragments)

    info = parse_mp4(mp4)
    assert info["brand"] == "iso5"
    vid, aud = info["tracks"]
    assert vid["n_samples"] == 12 and aud["n_samples"] == 6
    assert vid["fps"] == pytest.approx(29.97, abs=0.01)
    assert aud["duration_ms"] == int(6 * 1024 * 1000 / 48000)
    assert info["duration_ms"] is not None  # mehd

    t = mp4_sample_table(mp4)  # default: the video track
    assert len(t["sizes"]) == 12
    allv = v1 + v2 + v3
    got = extract_mp4_samples(mp4, range(12))
    assert [b for _, _, _, b in got] == allv
    # DTS: frag1 cumulative from 0; frag2 anchored by tfdt=30000
    # (not 4*1001); frag3 cumulative from frag2's end
    expect_ticks = [i * 1001 for i in range(4)]
    expect_ticks += [30000 + i * 1001 for i in range(5)]
    expect_ticks += [30000 + 5 * 1001 + i * 1001 for i in range(3)]
    assert t["dts_ms"].tolist() == [tk * 1000 // 30000 for tk in expect_ticks]
    # keyframes: first-sample-flags, per-sample flags, trex default
    assert np.flatnonzero(t["keyframe"]).tolist() == [0, 4, 7]

    ta = mp4_sample_table(mp4, track_id=2)
    assert [
        b for _, _, _, b in extract_mp4_samples(mp4, range(6), track_id=2)
    ] == a1
    assert ta["keyframe"].all()  # audio spec defaults to all-sync


def test_fragmented_base_offset_mode_and_multi_trun():
    """Explicit 64-bit base-data-offset (first trun omits its offset)
    plus runs=3 multi-trun splitting with implicit offset chaining."""
    rng = np.random.default_rng(11)
    sizes = list(rng.integers(5, 50, 17))
    samples = _frag_samples(rng, sizes)
    deltas = [int(d) for d in rng.integers(1, 2000, 17)]
    tracks = [dict(handler="vide", codec="hvc1", timescale=90000,
                   width=640, height=360)]
    fragments = [
        [dict(track_id=1, samples=samples[:9], deltas=deltas[:9],
              sync=[0, 4], runs=3)],
        [dict(track_id=1, samples=samples[9:], deltas=deltas[9:],
              sync=[2], runs=2, tfdt=sum(deltas[:9]) )],
    ]
    for mode in ("base", "moof"):
        mp4 = build_mp4_fragmented(tracks, fragments, offset_mode=mode)
        t = mp4_sample_table(mp4)
        assert len(t["sizes"]) == 17
        got = extract_mp4_samples(mp4, range(17))
        assert [b for _, _, _, b in got] == samples
        dts = np.concatenate([[0], np.cumsum(deltas[:-1])])
        assert t["dts_ms"].tolist() == [int(d) * 1000 // 90000 for d in dts]
        assert np.flatnonzero(t["keyframe"]).tolist() == [0, 4, 11]


def test_fragmented_appended_to_progressive():
    """§8.8: moov-resident samples precede fragment samples.  A
    moof/mdat tail (moof-relative offsets, so position-independent)
    appended to a progressive file extends the same track."""
    from confidential_storm_spark.operators import mp4 as m

    rng = np.random.default_rng(12)
    head = _frag_samples(rng, [20, 22, 24])
    tail = _frag_samples(rng, [31, 33, 35, 37])
    prog = build_mp4(
        [dict(samples=head, handler="vide", codec="avc1", timescale=1000,
              deltas=[40] * 3, width=64, height=48, sync=[1])]
    )
    frag_only = build_mp4_fragmented(
        [dict(handler="vide", codec="avc1", timescale=1000, width=64, height=48)],
        [[dict(track_id=1, samples=tail, deltas=[40] * 4, sync=[0, 2],
               tfdt=120)]],
    )
    # cut the moof/mdat tail off the fragmented build and graft it on
    pieces = []
    pos = 0
    for fc, s, e in m._boxes(frag_only, 0, len(frag_only)):
        if fc in (b"moof", b"mdat"):
            pieces.append(frag_only[s - 8 : e])
    mixed = prog + b"".join(pieces)

    info = parse_mp4(mixed)
    assert info["tracks"][0]["n_samples"] == 7
    t = mp4_sample_table(mixed)
    got = extract_mp4_samples(mixed, range(7))
    assert [b for _, _, _, b in got] == head + tail
    assert t["dts_ms"].tolist() == [0, 40, 80, 120, 160, 200, 240]
    assert np.flatnonzero(t["keyframe"]).tolist() == [0, 3, 5]


def test_fragmented_malformed_contract():
    """Mutation fuzz over a fragmented stream: only the documented
    exceptions escape, truncation raises, oversize runs are caught."""
    import random

    rng = np.random.default_rng(13)
    samples = _frag_samples(rng, [15] * 8)
    tracks = [dict(handler="vide", codec="avc1", timescale=600,
                   width=32, height=32, default_duration=25)]
    mp4 = build_mp4_fragmented(
        tracks,
        [[dict(track_id=1, samples=samples[:4], deltas=[25] * 4)],
         [dict(track_id=1, samples=samples[4:], deltas=[25] * 4)]],
    )
    r = random.Random(7)
    for _ in range(400):
        base = bytearray(mp4)
        for _ in range(r.randint(1, 6)):
            base[r.randrange(len(base))] = r.randrange(256)
        try:
            parse_mp4(bytes(base))
            mp4_sample_table(bytes(base))
        except (ValueError, NotImplementedError):
            pass
    # truncating mdat leaves trun samples pointing past EOF
    with pytest.raises(ValueError):
        mp4_sample_table(mp4[:-20])
