"""REAL multimodal codec tests: PPM/PGM/BMP images, PCM WAV audio and
YUV4MPEG2 video are decoded natively (pure numpy/stdlib) — payloads are
synthesized bit-exactly in the test, no media libraries involved."""

import io
import struct
import wave

import numpy as np
import pytest

from confidential_storm_spark.operators.multimodal import (
    decode_audio_features,
    decode_image,
    decode_image_features,
    encode_ppm,
    resize_images,
    resize_nearest,
    attach_media_metadata,
    sample_video_frames,
    sniff_media,
)


def make_ppm(w, h, seed=0):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    return encode_ppm(img), img


def make_bmp(w, h, seed=0):
    img = np.random.default_rng(seed).integers(0, 256, (h, w, 3), dtype=np.uint8)
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = img[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # bottom-up BGR
    header = b"BM" + struct.pack("<IHHI", 54 + rows.size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, rows.size, 2835, 2835, 0, 0)
    return header + info + rows.tobytes(), img


def make_wav(sr=8000, freq=440.0, seconds=0.5):
    t = np.arange(int(sr * seconds)) / sr
    x = (np.sin(2 * np.pi * freq * t) * 0.5 * 32767).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(sr)
        wf.writeframes(x.tobytes())
    return buf.getvalue(), x


def make_y4m(w, h, n_frames, fps=25):
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420jpeg\n".encode()
    frames = []
    out = [header]
    for i in range(n_frames):
        y = np.full((h, w), i * 10, np.uint8)
        frames.append(y)
        uv = np.full((h // 2, w // 2), 128, np.uint8)
        out.append(b"FRAME\n" + y.tobytes() + uv.tobytes() + uv.tobytes())
    return b"".join(out), frames


def test_pnm_bmp_roundtrip_exact():
    ppm, img = make_ppm(13, 7, seed=1)
    assert np.array_equal(decode_image(ppm), img)
    bmp, img2 = make_bmp(10, 6, seed=2)  # non-multiple-of-4 row width
    assert np.array_equal(decode_image(bmp), img2)
    assert decode_image(b"\x89PNG\r\n....") is None  # compressed: no codec


def test_resize_nearest_semantics():
    img = np.arange(16, dtype=np.uint8).reshape(4, 4, 1)
    up = resize_nearest(img, 8, 8)
    assert up.shape == (8, 8, 1)
    assert np.array_equal(up[::2, ::2], img)  # every source pixel kept
    down = resize_nearest(img, 2, 2)
    assert np.array_equal(down[:, :, 0], [[0, 2], [8, 10]])


def test_sniff_media_real_headers():
    ppm, _ = make_ppm(20, 10)
    assert sniff_media(ppm)[:4] == ("image", "image/x-portable-pixmap", 20, 10)
    wavb, _ = make_wav(sr=8000, seconds=0.25)
    mt, mime, _, _, dur = sniff_media(wavb)
    assert (mt, mime, dur) == ("audio", "audio/wav", 250)
    y4m, _ = make_y4m(16, 8, 5, fps=25)
    mt, mime, w, h, dur = sniff_media(y4m)
    assert (mt, w, h, dur) == ("video", 16, 8, 200)


def test_image_features_real_decode(spark):
    ppm, img = make_ppm(24, 16, seed=3)
    bmp, img2 = make_bmp(9, 5, seed=4)
    media = spark.createDataFrame(
        [(1, ppm), (2, bmp), (3, b"\xff\xd8\xff\xe0 fake jpeg")],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_image_features(media).collect()}
    f1 = rows[1]["features"]
    assert rows[1]["decode_ok"] and rows[2]["decode_ok"] and not rows[3]["decode_ok"]
    assert f1[0] == 24.0 and f1[1] == 16.0 and f1[2] == 3.0
    assert f1[3] == pytest.approx(float(img.astype(np.float32).mean()), rel=1e-6)
    f2 = rows[2]["features"]
    assert f2[3] == pytest.approx(float(img2.astype(np.float32).mean()), rel=1e-6)
    # metadata sniff sees the real dimensions
    metas = {r["media_id"]: r["media"] for r in attach_media_metadata(media).collect()}
    assert (metas[1]["width"], metas[1]["height"]) == (24, 16)
    assert (metas[2]["width"], metas[2]["height"]) == (9, 5)


def test_resize_images_operator(spark):
    ppm, img = make_ppm(32, 20, seed=5)
    media = spark.createDataFrame(
        [(1, ppm), (2, b"not an image")], "media_id long, payload binary"
    )
    rows = {r["media_id"]: r for r in resize_images(media, 8, 8).collect()}
    assert rows[1]["resized_ok"] and not rows[2]["resized_ok"]
    out = decode_image(bytes(rows[1]["payload"]))
    assert out.shape == (8, 8, 3)
    assert np.array_equal(out, resize_nearest(img, 8, 8))


def test_audio_features_real_wav(spark):
    wavb, x = make_wav(sr=8000, freq=440.0, seconds=0.5)
    media = spark.createDataFrame(
        [(1, wavb), (2, b"OggS not wav")], "media_id long, payload binary"
    )
    rows = {r["media_id"]: r for r in decode_audio_features(media).collect()}
    r = rows[1]
    assert r["decode_ok"] and r["sample_rate"] == 8000 and r["duration_ms"] == 500
    expected_rms = float(np.sqrt(np.mean((x / 32768.0) ** 2)))
    assert r["rms"] == pytest.approx(expected_rms, rel=1e-6)
    # a 440 Hz tone crosses zero ~2*440 times/s -> rate ~ 880/8000
    assert r["zero_cross_rate"] == pytest.approx(2 * 440 / 8000, rel=0.05)
    assert not rows[2]["decode_ok"]
    # worker-side NotImplementedError arrives wrapped in PythonException
    with pytest.raises(Exception, match="external codec"):
        decode_audio_features(media, strict=True).collect()


def test_video_frame_sampling_real_y4m(spark):
    y4m, frames = make_y4m(16, 8, 10, fps=25)
    media = spark.createDataFrame([(1, y4m)], "media_id long, payload binary")
    rows = sample_video_frames(media, n_frames=4).collect()
    assert [r["frame_idx"] for r in rows] == [0, 3, 6, 9]  # uniform picks
    assert all(r["decoded_ok"] for r in rows)
    first = decode_image(bytes(rows[0]["frame"]))
    assert first.shape == (8, 16, 1)
    assert np.array_equal(first[:, :, 0], frames[0])
    last = decode_image(bytes(rows[-1]["frame"]))
    assert np.array_equal(last[:, :, 0], frames[9])


def make_y4m_chroma(w, h, n_frames, chroma, fps=25):
    """y4m stream with an explicit chroma tag (422/444/mono)."""
    header = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C{chroma}\n".encode()
    plane = {
        "mono": 0,
        "422": 2 * ((w + 1) // 2) * h,
        "444": 2 * w * h,
    }[chroma]
    frames, out = [], [header]
    for i in range(n_frames):
        y = np.full((h, w), 40 + i * 7, np.uint8)
        frames.append(y)
        out.append(b"FRAME\n" + y.tobytes() + bytes([128]) * plane)
    return b"".join(out), frames


@pytest.mark.parametrize("chroma", ["mono", "422", "444"])
def test_y4m_non420_chroma_parsed_correctly(chroma):
    """ADVICE: C422/C444 streams used to misparse after frame 0 (stride
    assumed 4:2:0); the chroma tag now sets the true frame stride."""
    y4m, frames = make_y4m_chroma(10, 6, 4, chroma)
    mt, _, w, h, dur = sniff_media(y4m)
    assert (mt, w, h, dur) == ("video", 10, 6, 160)  # 4 frames @ 25fps
    from confidential_storm_spark.operators.multimodal import _y4m_frames

    decoded = list(_y4m_frames(y4m))
    assert len(decoded) == 4
    for got, want in zip(decoded, frames):
        assert np.array_equal(got, want)


def test_y4m_unsupported_chroma_raises():
    y4m, _ = make_y4m_chroma(10, 6, 1, "444")
    bad = y4m.replace(b"C444", b"C411", 1)
    from confidential_storm_spark.operators.multimodal import _y4m_frames

    with pytest.raises(ValueError, match="unsupported"):
        list(_y4m_frames(bad))
    # sniff never raises on dirty data — unknown fallback
    assert sniff_media(bad)[0] == "unknown"


def test_y4m_frame_count_ignores_FRAME_in_pixels():
    """A literal b'FRAME' inside pixel data must not inflate duration."""
    w, h = 10, 6
    header = f"YUV4MPEG2 W{w} H{h} F25:1 Cmono\n".encode()
    y = bytearray(np.full((h, w), 7, np.uint8).tobytes())
    y[5:10] = b"FRAME"  # adversarial pixels
    data = header + b"FRAME\n" + bytes(y) + b"FRAME\n" + bytes(y)
    mt, _, _, _, dur = sniff_media(data)
    assert (mt, dur) == ("video", 80)  # exactly 2 frames @ 25fps


def test_sniff_media_malformed_payloads_fall_back_unknown():
    """ADVICE (medium): payloads that LOOK like a known magic but are
    malformed must sniff as unknown, not crash the task."""
    cases = [
        b"P6",                          # truncated PNM header
        b"P6\n10 10\n65535\n" + b"\x00" * 600,  # 16-bit PNM
        b"P5\n4 -1\n255\n",             # nonsense dims
        b"RIFF\x10\x00\x00\x00WAVEjunk",  # truncated WAV chunks
        b"YUV4MPEG2 F25:1\nFRAME\n",    # y4m missing W/H
        b"BM" + b"\x00" * 5,            # truncated BMP header
    ]
    for payload in cases:
        assert sniff_media(payload)[0] == "unknown", payload[:16]


def test_decode_image_features_dirty_data_nonstrict(spark):
    """strict=False contract: dirty payloads flow through decode_ok=false."""
    ppm, _ = make_ppm(8, 8)
    media = spark.createDataFrame(
        [(1, ppm), (2, b"P6\n10 10\n65535\n" + b"\x00" * 600), (3, b"P5")],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in decode_image_features(media).collect()}
    assert rows[1]["decode_ok"]
    assert not rows[2]["decode_ok"] and not rows[3]["decode_ok"]
    metas = {r["media_id"]: r["media"] for r in attach_media_metadata(media).collect()}
    assert metas[2]["media_type"] == "unknown"


def test_audio_spectral_features_sine_tone(spark):
    """A pure 1 kHz sine concentrates spectral mass at 1 kHz: centroid
    lands on the tone, its band dominates, rolloff is just above it."""
    from confidential_storm_spark.operators.multimodal import audio_spectral_features

    wav, _ = make_wav(sr=8000, freq=1000.0, seconds=0.5)
    df = spark.createDataFrame([(1, bytearray(wav)), (2, bytearray(b"junk"))],
                               "media_id long, payload binary")
    rows = {r["media_id"]: r for r in audio_spectral_features(df, n_bands=8).collect()}
    good = rows[1]
    assert good["decode_ok"]
    assert abs(good["spectral_centroid_hz"] - 1000.0) < 25.0
    # band 2 covers [1000, 1500) Hz of the 8 x 500 Hz bands
    assert good["band_energy"][2] > 0.9
    assert 975.0 <= good["rolloff_hz"] <= 1100.0
    assert rows[2]["decode_ok"] is False


def test_resample_pcm_halves_rate_and_preserves_tone(spark):
    """Resampling 8 kHz -> 4 kHz keeps duration and the 440 Hz tone
    (spectral check via the feature operator on the resampled bytes)."""
    import io as _io
    import wave as _wave

    from confidential_storm_spark.operators.multimodal import (
        audio_spectral_features,
        resample_pcm,
    )

    wav, x = make_wav(sr=8000, freq=440.0, seconds=0.5)
    df = spark.createDataFrame([(1, bytearray(wav))], "media_id long, payload binary")
    out = resample_pcm(df, target_sr=4000).collect()[0]
    assert out["decode_ok"] and out["sample_rate"] == 4000
    with _wave.open(_io.BytesIO(bytes(out["payload"]))) as wf:
        assert wf.getframerate() == 4000
        assert abs(wf.getnframes() - len(x) // 2) <= 1
    rdf = spark.createDataFrame(
        [(1, bytearray(bytes(out["payload"])))], "media_id long, payload binary"
    )
    feats = audio_spectral_features(rdf).collect()[0]
    assert abs(feats["spectral_centroid_hz"] - 440.0) < 25.0


def make_jpeg(w=24, h=16, quality=95):
    from confidential_storm_spark.operators.jpeg import encode_baseline_jpeg

    rng = np.random.default_rng(5)
    img = np.clip(
        np.add.outer(np.arange(h) * 4, np.arange(w) * 3)[..., None]
        + np.array([0, 40, 80]) + rng.integers(0, 6, (h, w, 3)),
        0, 255,
    ).astype(np.uint8)
    return encode_baseline_jpeg(img, quality), img


def test_jpeg_flat_blocks_decode_exactly():
    """DC-only blocks are hand-computable through quantization: a flat
    image survives encode->decode EXACTLY at any quality."""
    from confidential_storm_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    # 76 and 128 quantize exactly (DC lands off the rounding
    # boundary); 77 at q50 sits ON a half-boundary where float ulps
    # decide — as in any JPEG codec — so it is not asserted exact
    for v in (76, 128):
        grey = np.full((16, 24), v, np.uint8)
        assert np.array_equal(decode_baseline_jpeg(encode_baseline_jpeg(grey, 50)), grey)
    rgb = np.zeros((8, 16, 3), np.uint8)
    rgb[...] = (200, 100, 50)
    assert np.abs(
        decode_baseline_jpeg(encode_baseline_jpeg(rgb, 90)).astype(int) - rgb.astype(int)
    ).max() <= 1


def test_jpeg_gradient_roundtrip_within_quant_error():
    from confidential_storm_spark.operators.jpeg import decode_baseline_jpeg

    data, img = make_jpeg(quality=95)
    out = decode_baseline_jpeg(data)
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 12 and float(np.sqrt((err ** 2).mean())) < 4.0


def test_jpeg_odd_dimensions_and_truncation():
    from confidential_storm_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    img = np.clip(np.add.outer(np.arange(13) * 9, np.arange(19) * 5), 0, 255).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(img, 92))
    assert out.shape == (13, 19)
    with pytest.raises(Exception):
        decode_baseline_jpeg(encode_baseline_jpeg(img, 92)[:40])


def test_jpeg_flows_through_multimodal_operators(spark):
    """The multimodal pipeline decodes baseline JPEG natively now:
    sniff + features + resize all see real pixels."""
    from confidential_storm_spark.operators.multimodal import (
        attach_media_metadata,
        decode_image_features,
        resize_images,
    )

    data, img = make_jpeg()
    df = spark.createDataFrame(
        [(1, bytearray(data)), (2, bytearray(b"\xff\xd8broken"))],
        "media_id long, payload binary",
    )
    meta = {r["media_id"]: r["media"] for r in attach_media_metadata(df).collect()}
    assert meta[1]["media_type"] == "image" and meta[1]["mime"] == "image/jpeg"
    assert meta[1]["width"] == img.shape[1] and meta[1]["height"] == img.shape[0]
    assert meta[2]["media_type"] == "unknown"

    feats = {r["media_id"]: r for r in decode_image_features(df).collect()}
    # features[3] is the decoded mean pixel value (see _image_features)
    assert feats[1]["decode_ok"] and abs(feats[1]["features"][3] - img.mean()) < 8.0
    assert feats[2]["decode_ok"] is False

    rs = {r["media_id"]: r for r in resize_images(df, 8, 8).collect()}
    assert rs[1]["resized_ok"] and rs[2]["resized_ok"] is False


def test_png_lossless_roundtrip_all_shapes():
    from confidential_storm_spark.operators.png import decode_png, encode_png

    rng = np.random.default_rng(11)
    for shape in ((13, 17), (9, 21, 3), (6, 10, 4)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img)), img), shape


def test_png_decodes_all_five_filters():
    """Hand-built stream exercising filters none/sub/up/average/Paeth
    against a plain-python reference unfilter."""
    import struct
    import zlib

    from confidential_storm_spark.operators.png import _SIG, _chunk, decode_png

    w, h, planes = 5, 5, 3
    rng = np.random.default_rng(3)
    rows = rng.integers(0, 256, (h, w * planes), dtype=np.uint8)

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    # reference: FILTER each row i with type i (encoder side math),
    # so the decoder must invert every filter type
    raw = bytearray()
    prev = np.zeros(w * planes, dtype=np.int64)
    for y in range(h):
        ftype = y % 5
        cur = rows[y].astype(np.int64)
        enc = np.zeros(w * planes, dtype=np.int64)
        for i in range(w * planes):
            left = cur[i - planes] if i >= planes else 0
            ul = prev[i - planes] if i >= planes else 0
            if ftype == 0:
                enc[i] = cur[i]
            elif ftype == 1:
                enc[i] = cur[i] - left
            elif ftype == 2:
                enc[i] = cur[i] - prev[i]
            elif ftype == 3:
                enc[i] = cur[i] - (left + prev[i]) // 2
            else:
                enc[i] = cur[i] - paeth(int(left), int(prev[i]), int(ul))
        raw.append(ftype)
        raw += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    data = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")
    assert np.array_equal(decode_png(data), rows.reshape(h, w, planes))


def test_png_rejects_malformed_and_unsupported():
    import struct

    import pytest as _pytest

    from confidential_storm_spark.operators.png import _SIG, _chunk, decode_png, encode_png

    img = np.zeros((4, 4), np.uint8)
    good = encode_png(img)
    with _pytest.raises(ValueError):
        decode_png(b"nope" + good)
    # corrupt a CRC byte
    bad = bytearray(good)
    bad[20] ^= 0xFF
    with _pytest.raises(ValueError):
        decode_png(bytes(bad))
    # garbage IDAT bytes surface as ValueError, not a zlib crash
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    junk = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", b"x") + _chunk(b"IEND", b"")
    with _pytest.raises(ValueError):
        decode_png(junk)
    # illegal colour type / illegal depth for the type
    for d, ct in ((8, 5), (16, 3), (2, 2)):
        ihdr = struct.pack(">IIBBBBB", 4, 4, d, ct, 0, 0, 0)
        bad_hdr = _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", b"x") + _chunk(b"IEND", b"")
        with _pytest.raises(ValueError):
            decode_png(bad_hdr)


def test_png_roundtrip_extended_grid():
    """Round-5 coverage: grey+alpha, 16-bit, sub-byte depths, palette
    (with and without tRNS), Adam7 — all lossless round-trips."""
    from confidential_storm_spark.operators.png import decode_png, encode_png

    rng = np.random.default_rng(21)
    # grey+alpha (type 4)
    ga = rng.integers(0, 256, (9, 13, 2), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(ga)), ga)
    # 16-bit grey and 16-bit RGB (big-endian samples)
    for shape in ((7, 11), (5, 9, 3)):
        img16 = rng.integers(0, 1 << 16, shape, dtype=np.uint16)
        out = decode_png(encode_png(img16))
        assert out.dtype == np.uint16 and np.array_equal(out, img16), shape
    # sub-byte greyscale: raw sample values at depths 1/2/4
    for d in (1, 2, 4):
        img = rng.integers(0, 1 << d, (6, 11), dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img, depth=d)), img), d
    # palette -> RGB through PLTE, at index depths 8 and 4
    plte = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, (8, 10), dtype=np.uint8)
    for d in (8, 4):
        out = decode_png(encode_png(idx, palette=plte, depth=d))
        assert np.array_equal(out, plte[idx]), d
    # palette + tRNS -> RGBA
    from confidential_storm_spark.operators.png import _SIG, _chunk

    data = encode_png(idx, palette=plte)
    # splice a tRNS chunk right after PLTE (8 alpha entries, rest 255)
    trns = bytes(range(100, 108))
    plte_end = data.index(b"PLTE") + 4 + 48 + 4
    spliced = data[:plte_end] + _chunk(b"tRNS", trns) + data[plte_end:]
    rgba = decode_png(spliced)
    alpha = np.full(16, 255, np.uint8)
    alpha[:8] = np.frombuffer(trns, np.uint8)
    assert np.array_equal(rgba, np.dstack([plte[idx], alpha[idx]]))
    # Adam7 interlace across colour types and odd sizes
    for shape in ((13, 17), (9, 21, 3), (6, 10, 4), (3, 5)):
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_png(encode_png(img, interlace=True)), img), shape
    # interlaced 16-bit and interlaced palette
    img16 = rng.integers(0, 1 << 16, (10, 6), dtype=np.uint16)
    assert np.array_equal(decode_png(encode_png(img16, interlace=True)), img16)
    out = decode_png(encode_png(idx, palette=plte, interlace=True))
    assert np.array_equal(out, plte[idx])


def test_png_16bit_flows_through_multimodal(spark):
    """16-bit PNG payloads now decode (high byte) instead of faking."""
    from confidential_storm_spark.operators.multimodal import decode_image_features
    from confidential_storm_spark.operators.png import encode_png

    rng = np.random.default_rng(33)
    img16 = rng.integers(0, 1 << 16, (12, 8, 3), dtype=np.uint16)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(img16)))], "media_id long, payload binary"
    )
    row = decode_image_features(df).collect()[0]
    assert row["decode_ok"]
    assert abs(row["features"][3] - (img16 >> 8).mean()) < 1e-3


def test_png_flows_through_multimodal_operators(spark):
    from confidential_storm_spark.operators.multimodal import (
        attach_media_metadata,
        decode_image_features,
    )
    from confidential_storm_spark.operators.png import encode_png

    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(img)))], "media_id long, payload binary"
    )
    meta = attach_media_metadata(df).collect()[0]["media"]
    assert meta["mime"] == "image/png" and (meta["width"], meta["height"]) == (7, 11)
    feats = decode_image_features(df).collect()[0]
    # PNG is lossless: decoded mean is the true mean exactly
    assert feats["decode_ok"] and abs(feats["features"][3] - img.mean()) < 1e-3


def test_jpeg_fill_bytes_before_markers_decode():
    """ITU T.81 B.1.1.2: any marker may be preceded by 0xFF fill
    bytes; third-party baseline streams use them for alignment.  Pad
    every marker in an encoder-produced stream and require an
    identical decode."""
    import numpy as np

    from confidential_storm_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    img = (np.indices((16, 16)).sum(axis=0) * 8 % 256).astype(np.uint8)
    data = encode_baseline_jpeg(img, 85)
    # re-emit the header segments with fill padding: walk markers up to
    # SOS and insert an extra 0xFF before each
    out = bytearray(data[:2])  # SOI
    pos = 2
    while True:
        assert data[pos] == 0xFF
        marker = data[pos + 1]
        out += b"\xff\xff" + bytes([marker])
        if marker == 0xDA:  # SOS: copy the rest verbatim
            out += data[pos + 2 :]
            break
        import struct

        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        out += data[pos + 2 : pos + 2 + seglen]
        pos += 2 + seglen
    assert np.array_equal(decode_baseline_jpeg(bytes(out)), decode_baseline_jpeg(data))


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn: restarted streams decode identically to the
    unrestarted encoding of the same image (the restart only resets
    entropy state, never pixel math), across interval sizes that do
    and don't divide the MCU count, for grey and RGB."""
    from confidential_storm_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    rng = np.random.default_rng(7)
    grey = np.clip(
        np.add.outer(np.arange(24) * 7, np.arange(40) * 3)
        + rng.integers(0, 30, (24, 40)),
        0,
        255,
    ).astype(np.uint8)
    base = decode_baseline_jpeg(encode_baseline_jpeg(grey, 90))
    # 24x40 -> 3x5 = 15 MCUs; try dividing and non-dividing intervals,
    # incl. 1 (marker after every MCU) and >8 wraps of the RSTn cycle
    for ri in (1, 2, 3, 5, 7, 15):
        data = encode_baseline_jpeg(grey, 90, restart_interval=ri)
        assert b"\xff\xdd" in data
        if ri < 15:  # ri == n_mcus -> no boundary, hence no marker
            assert b"\xff\xd0" in data
        assert np.array_equal(decode_baseline_jpeg(data), base), ri
    rgb = rng.integers(0, 256, (17, 25, 3), dtype=np.uint8)
    base3 = decode_baseline_jpeg(encode_baseline_jpeg(rgb, 85))
    for ri in (1, 4):
        out = decode_baseline_jpeg(encode_baseline_jpeg(rgb, 85, restart_interval=ri))
        assert np.array_equal(out, base3), ri


def test_jpeg_restart_marker_mismatch_rejected():
    """A wrong RSTn index is a corrupt stream (ValueError), not a
    silent desync."""
    from confidential_storm_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    img = np.clip(np.add.outer(np.arange(16) * 11, np.arange(32) * 5), 0, 255).astype(
        np.uint8
    )
    data = bytearray(encode_baseline_jpeg(img, 90, restart_interval=2))
    i = data.index(b"\xff\xd0")  # first restart marker -> wrong index
    data[i + 1] = 0xD5
    with pytest.raises(ValueError):
        decode_baseline_jpeg(bytes(data))


def test_jpeg_restart_flows_through_multimodal(spark):
    from confidential_storm_spark.operators.jpeg import encode_baseline_jpeg
    from confidential_storm_spark.operators.multimodal import decode_image_features

    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (19, 23, 3), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_baseline_jpeg(img, 90, restart_interval=3)))],
        "media_id long, payload binary",
    )
    row = decode_image_features(df).collect()[0]
    assert row["decode_ok"]


def test_progressive_jpeg_bit_identical_to_baseline():
    """Progressive coding (SOF2, spectral selection + successive
    approximation) is a lossless reordering of the same quantized
    coefficients: decoding the progressive stream must produce
    BIT-IDENTICAL pixels to decoding the baseline stream of the same
    image at the same quality — greyscale and RGB, flat / gradient /
    noise / sparse content (EOB-run-, ZRL-, and correction-bit-heavy
    paths all exercised)."""
    from confidential_storm_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
        encode_progressive_jpeg,
    )

    rng = np.random.default_rng(7)
    sparse = np.full((33, 41, 3), 128, np.uint8)
    for _ in range(6):
        sparse[rng.integers(0, 33), rng.integers(0, 41)] = rng.integers(0, 256, 3)
    cases = [
        np.full((16, 16), 130, np.uint8),
        np.tile((np.arange(24) * 10 % 250).astype(np.uint8), (17, 1)),
        rng.integers(0, 256, (23, 19), dtype=np.uint8),
        rng.integers(0, 256, (21, 14, 3), dtype=np.uint8),
        (np.indices((40, 40)).sum(0) % 17 + 100).astype(np.uint8),
        sparse,
    ]
    for img in cases:
        for q in (35, 90):
            base = decode_baseline_jpeg(encode_baseline_jpeg(img, quality=q))
            prog = decode_baseline_jpeg(encode_progressive_jpeg(img, quality=q))
            assert np.array_equal(base, prog), (img.shape, q)


def test_progressive_jpeg_flows_through_multimodal(spark):
    """decode_image (and thus the mapInPandas feature stage) handles
    progressive payloads transparently — same pixels as baseline."""
    from confidential_storm_spark.operators.jpeg import encode_progressive_jpeg
    from confidential_storm_spark.operators.multimodal import (
        decode_image,
        decode_image_features,
    )

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (24, 16, 3), dtype=np.uint8)
    payload = encode_progressive_jpeg(img, quality=85)
    arr = decode_image(payload)
    assert arr is not None and arr.shape == (24, 16, 3)
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    row = decode_image_features(df).collect()[0]
    # features = [w, h, c, mean, std, min, max, 8-bin hist, aspect]
    assert row["decode_ok"]
    assert row["features"][0] == 16.0 and row["features"][1] == 24.0


def test_jpeg_chroma_subsampling_roundtrip():
    """4:2:0 / 4:2:2 encode+decode (round 6): dims exact at odd
    sizes, luma near-lossless on smooth content, chroma within
    box-downsample + nearest-upsample error.  Greyscale ignores the
    subsampling argument (single component has no chroma)."""
    from confidential_storm_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    yy, xx = np.mgrid[0:37, 0:53]
    img = np.stack(
        [(xx * 4 + yy * 2) % 256, (xx * 3 + 40) % 256, (yy * 5 + 90) % 256], -1
    ).astype(np.uint8)

    def psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 10 * np.log10(255**2 / mse)

    for sub, floor in (("444", 40.0), ("422", 30.0), ("420", 30.0)):
        for ri in (0, 3):
            dec = decode_baseline_jpeg(
                encode_baseline_jpeg(img, 90, restart_interval=ri, subsampling=sub)
            )
            assert dec.shape == img.shape, (sub, ri)
            assert psnr(img, dec) > floor, (sub, ri)
    g = (xx * 7 % 256).astype(np.uint8)
    assert np.array_equal(
        decode_baseline_jpeg(encode_baseline_jpeg(g, 90, subsampling="420")),
        decode_baseline_jpeg(encode_baseline_jpeg(g, 90)),
    )
    with pytest.raises(ValueError):
        encode_baseline_jpeg(img, 90, subsampling="411")


def test_jpeg_subsampled_progressive_bit_identical():
    """Progressive == baseline pixel-for-pixel at every subsampling:
    the scan layout reorders the same quantized coefficients, so
    SOF2 + 4:2:0 (the dominant crawl-JPEG shape) must decode
    bit-identically to SOF0 + 4:2:0."""
    from confidential_storm_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
        encode_progressive_jpeg,
    )

    rng = np.random.default_rng(11)
    for (h, w) in [(37, 53), (16, 16), (23, 9), (40, 48)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for sub in ("444", "422", "420"):
            base = decode_baseline_jpeg(
                encode_baseline_jpeg(img, 85, subsampling=sub)
            )
            prog = decode_baseline_jpeg(
                encode_progressive_jpeg(img, 85, subsampling=sub)
            )
            assert np.array_equal(base, prog), (h, w, sub)


def test_jpeg_noninterleaved_scans_bit_identical():
    """Baseline one-scan-per-component (T.81 A.2.2, ns=1 scans) is a
    pure re-layout of the interleaved scan: same quantized
    coefficients, bit-identical decode — with and without restart
    intervals (which count data units, not MCUs, in non-interleaved
    scans) and at every subsampling."""
    from confidential_storm_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    rng = np.random.default_rng(13)
    for trial in range(6):
        h, w = int(rng.integers(8, 60)), int(rng.integers(8, 60))
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        sub = ("444", "422", "420")[trial % 3]
        ri = (0, 5)[trial % 2]
        inter = decode_baseline_jpeg(
            encode_baseline_jpeg(img, 85, restart_interval=ri, subsampling=sub)
        )
        multi = decode_baseline_jpeg(
            encode_baseline_jpeg(
                img, 85, restart_interval=ri, subsampling=sub, interleave=False
            )
        )
        assert np.array_equal(inter, multi), (h, w, sub, ri)


def test_jpeg_subsampled_flows_through_multimodal(spark):
    """decode_image handles 4:2:0 payloads (progressive and baseline)
    transparently in the mapInPandas feature stage."""
    from confidential_storm_spark.operators.jpeg import encode_progressive_jpeg
    from confidential_storm_spark.operators.multimodal import (
        decode_image,
        decode_image_features,
    )

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 18, 3), dtype=np.uint8)
    payload = encode_progressive_jpeg(img, quality=85, subsampling="420")
    arr = decode_image(payload)
    assert arr is not None and arr.shape == (24, 18, 3)
    df = spark.createDataFrame([(1, payload)], "media_id long, payload binary")
    row = decode_image_features(df).collect()[0]
    assert row["decode_ok"]
    assert row["features"][0] == 18.0 and row["features"][1] == 24.0


def test_codec_fuzz_only_documented_exceptions():
    """Fuzz contract: mutated valid streams and random blobs behind
    valid magics raise ValueError/NotImplementedError ONLY — decoders
    never leak IndexError/KeyError/struct.error into the mapInPandas
    stages (which degrade decode failures to decode_ok=false)."""
    import random

    from confidential_storm_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )
    from confidential_storm_spark.operators.png import _SIG, decode_png, encode_png

    from confidential_storm_spark.operators.jpeg import encode_progressive_jpeg

    rng = random.Random(42)
    img = np.zeros((8, 8), np.uint8)
    rgb = np.arange(8 * 12 * 3, dtype=np.uint8).reshape(8, 12, 3)
    seeds = [
        encode_png(img),
        encode_baseline_jpeg(img),
        encode_progressive_jpeg(img),
        encode_baseline_jpeg(rgb, subsampling="420"),
        encode_baseline_jpeg(rgb, subsampling="422", interleave=False),
        encode_progressive_jpeg(rgb, subsampling="420"),
    ]
    for trial in range(1500):
        base = bytearray(seeds[trial % len(seeds)])
        for _ in range(rng.randint(1, 8)):
            base[rng.randrange(len(base))] = rng.randrange(256)
        data = bytes(base)
        for dec in (decode_png, decode_baseline_jpeg):
            try:
                dec(data)
            except (ValueError, NotImplementedError):
                pass
    for trial in range(800):
        blob = bytes(rng.randrange(256) for _ in range(rng.randint(0, 200)))
        for prefix, dec in ((_SIG, decode_png), (b"\xff\xd8", decode_baseline_jpeg)):
            try:
                dec(prefix + blob)
            except (ValueError, NotImplementedError):
                pass


def _g711_ref_decode(b: int, law: str) -> int:
    """Transliteration of the canonical CCITT g711.c expanders — the
    independent oracle for the vectorized LUTs."""
    if law == "ulaw":
        u = ~b & 0xFF
        t = (((u & 0x0F) << 3) + 0x84) << ((u & 0x70) >> 4)
        return (0x84 - t) if (u & 0x80) else (t - 0x84)
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def _g711_wav(frames: bytes, code: int, sr: int = 8000, nch: int = 1) -> bytes:
    """Hand-rolled RIFF container with a G.711 fmt chunk (format 7 =
    mu-law, 6 = A-law) — stdlib wave refuses to write these."""
    import struct as st

    fmt = st.pack("<HHIIHH", code, nch, sr, sr * nch, nch, 8)
    body = (
        b"WAVE"
        + b"fmt " + st.pack("<I", len(fmt)) + fmt
        + b"data" + st.pack("<I", len(frames)) + frames
    )
    return b"RIFF" + st.pack("<I", len(body)) + body


def test_g711_luts_match_reference_decoder():
    from confidential_storm_spark.operators.multimodal import _ALAW_LUT, _MULAW_LUT

    for b in range(256):
        assert int(_MULAW_LUT[b]) == _g711_ref_decode(b, "ulaw"), ("ulaw", b)
        assert int(_ALAW_LUT[b]) == _g711_ref_decode(b, "alaw"), ("alaw", b)


def test_g711_wav_decodes_natively():
    """mu-law / A-law WAVs (telephony format codes 7 / 6) expand
    through _wav_mono instead of dying in stdlib wave: a companded
    sine comes back as the same sine within companding error, and
    sniff_media reports the real duration."""
    from confidential_storm_spark.operators.multimodal import (
        _MULAW_LUT,
        _ALAW_LUT,
        _wav_mono,
        sniff_media,
    )

    sr = 8000
    t = np.arange(sr // 2) / sr
    x16 = (np.sin(2 * np.pi * 440.0 * t) * 0.5 * 32767).astype(np.int16)
    for code, lut in ((7, _MULAW_LUT), (6, _ALAW_LUT)):
        # nearest-LUT companding as the test-side encoder
        enc = np.abs(x16.astype(np.int64)[:, None] - lut[None, :]).argmin(1)
        wavb = _g711_wav(enc.astype(np.uint8).tobytes(), code, sr)
        got_sr, y = _wav_mono(wavb)
        assert got_sr == sr and len(y) == len(x16)
        err = np.abs(y - x16 / 32768.0)
        assert float(err.max()) < 0.04, code  # companding quantization only
        media_type, mime, _, _, dur = sniff_media(wavb)
        assert (media_type, mime, dur) == ("audio", "audio/wav", 500)


def test_g711_wav_flows_through_spectral_features(spark):
    from confidential_storm_spark.operators.multimodal import (
        _MULAW_LUT,
        audio_spectral_features,
    )

    sr = 8000
    t = np.arange(sr // 2) / sr
    x16 = (np.sin(2 * np.pi * 1000.0 * t) * 0.5 * 32767).astype(np.int16)
    enc = np.abs(x16.astype(np.int64)[:, None] - _MULAW_LUT[None, :]).argmin(1)
    wavb = _g711_wav(enc.astype(np.uint8).tobytes(), 7, sr)
    df = spark.createDataFrame([(1, bytearray(wavb))], "media_id long, payload binary")
    row = audio_spectral_features(df, strict=True).collect()[0]
    assert row["decode_ok"]
    # 1 kHz tone: centroid lands near the tone within companding noise
    assert 800 < row["spectral_centroid_hz"] < 1400


def _ima_ref_decode_block(block: bytes, nch: int):
    """Scalar transliteration of the IMA ADPCM reference decoder
    (IMA Digital Audio Compatibility Project algorithm) — the
    independent oracle for _ima_adpcm_decode."""
    from confidential_storm_spark.operators.multimodal import _IMA_INDEX, _IMA_STEPS

    chans = []
    for c in range(nch):
        pred = int.from_bytes(block[4 * c : 4 * c + 2], "little", signed=True)
        idx = min(max(block[4 * c + 2], 0), 88)
        chans.append({"pred": pred, "idx": idx, "out": [pred]})
    body = block[4 * nch :]
    # 4-byte groups rotate across channels
    for g in range(len(body) // 4):
        ch = chans[g % nch]
        for byte in body[g * 4 : g * 4 + 4]:
            for n in (byte & 0x0F, byte >> 4):
                step = int(_IMA_STEPS[ch["idx"]])
                delta = step >> 3
                if n & 1:
                    delta += step >> 2
                if n & 2:
                    delta += step >> 1
                if n & 4:
                    delta += step
                p = ch["pred"] - delta if n & 8 else ch["pred"] + delta
                ch["pred"] = max(-32768, min(32767, p))
                ch["idx"] = max(0, min(88, ch["idx"] + int(_IMA_INDEX[n & 7])))
                ch["out"].append(ch["pred"])
    n_samp = min(len(c["out"]) for c in chans)
    out = np.empty(n_samp * nch, dtype=np.int16)
    for c in range(nch):
        out[c::nch] = np.asarray(chans[c]["out"][:n_samp], dtype=np.int16)
    return out


def _adpcm_wav(blocks: bytes, nch: int, sr: int, block_align: int) -> bytes:
    import struct as st

    spb = (block_align - 4 * nch) * 2 // nch + 1
    fmt = st.pack("<HHIIHH", 0x11, nch, sr, sr * block_align // spb, block_align, 4)
    fmt += st.pack("<HH", 2, spb)  # cbSize + samples_per_block
    body = (
        b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
        + b"data" + st.pack("<I", len(blocks)) + blocks
    )
    return b"RIFF" + st.pack("<I", len(body)) + body


@pytest.mark.parametrize("nch", [1, 2])
def test_ima_adpcm_matches_reference_decoder(nch):
    from confidential_storm_spark.operators.multimodal import _ima_adpcm_decode

    rng = np.random.default_rng(17)
    block_align = 4 * nch + 8 * nch * 3  # 3 interleave groups/channel
    blocks = b""
    want = []
    for _ in range(4):
        block = bytearray(rng.integers(0, 256, block_align, dtype=np.uint8).tobytes())
        for c in range(nch):
            block[4 * c + 2] = rng.integers(0, 89)  # valid step index
            block[4 * c + 3] = 0
        blocks += bytes(block)
        want.append(_ima_ref_decode_block(bytes(block), nch))
    got = _ima_adpcm_decode(blocks, nch, block_align)
    assert np.array_equal(got, np.concatenate(want))


def _ima_encode_mono(x16: np.ndarray, block_align: int) -> bytes:
    """Test-side IMA ADPCM encoder (mono): same step machinery run
    forward, nibble chosen by the standard quantizer."""
    from confidential_storm_spark.operators.multimodal import _IMA_INDEX, _IMA_STEPS

    spb = (block_align - 4) * 2 + 1
    out = b""
    pos = 0
    idx = 0  # carried across blocks like real encoders
    while pos < len(x16):
        chunk = x16[pos : pos + spb]
        pos += spb
        pred = int(chunk[0])
        block = int(pred).to_bytes(2, "little", signed=True) + bytes([idx, 0])
        nibbles = []
        for s in chunk[1:]:
            step = int(_IMA_STEPS[idx])
            diff = int(s) - pred
            n = 8 if diff < 0 else 0
            diff = abs(diff)
            if diff >= step:
                n |= 4
                diff -= step
            if diff >= step >> 1:
                n |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                n |= 1
            # decoder-mirror update
            delta = step >> 3
            if n & 1:
                delta += step >> 2
            if n & 2:
                delta += step >> 1
            if n & 4:
                delta += step
            pred = pred - delta if n & 8 else pred + delta
            pred = max(-32768, min(32767, pred))
            idx = max(0, min(88, idx + int(_IMA_INDEX[n & 7])))
            nibbles.append(n)
        while len(nibbles) < spb - 1:
            nibbles.append(0)
        packed = bytes(
            (nibbles[i] & 0x0F) | (nibbles[i + 1] << 4)
            for i in range(0, len(nibbles), 2)
        )
        out += block + packed
    return out


def test_ima_adpcm_wav_end_to_end():
    """An ADPCM-companded sine decodes back to the same sine within
    ADPCM tracking error; sniff_media reports the true duration from
    the block math."""
    from confidential_storm_spark.operators.multimodal import _wav_mono, sniff_media

    sr = 8000
    t = np.arange(4096) / sr
    x16 = (np.sin(2 * np.pi * 440.0 * t) * 0.4 * 32767).astype(np.int16)
    block_align = 4 + 512  # 1025 samples/block
    spb = (block_align - 4) * 2 + 1
    n_blocks = -(-len(x16) // spb)
    enc = _ima_encode_mono(x16, block_align)
    wavb = _adpcm_wav(enc, 1, sr, block_align)
    got_sr, y = _wav_mono(wavb)
    assert got_sr == sr
    n = min(len(y), len(x16))
    err = np.abs(y[:n] - x16[:n] / 32768.0)
    # skip the first-block step-ramp transient (idx starts at 0 with
    # step 7 against a full-slope sine); converged error is tiny
    assert float(err[64:].max()) < 0.03
    mt, mime, _, _, dur = sniff_media(wavb)
    assert (mt, mime) == ("audio", "audio/wav")
    assert dur == int(n_blocks * spb * 1000 / sr)
