"""Multimodal column operators for training-data pipelines.

Images / audio / video are opaque ``binary`` columns plus a typed
metadata struct; the heavy decode / feature-extract steps run as
Arrow-batched ``mapInPandas`` stages.

Codec coverage is honest about the container:

- UNCOMPRESSED formats are decoded FOR REAL in pure numpy/stdlib —
  PPM (P6) / PGM (P5) and 24/32-bit BMP images, PCM WAV audio, and
  YUV4MPEG2 (y4m) video.  Dimensions, durations, pixel statistics,
  resizes and frame samples on these formats are exact.
- Baseline JPEG is decoded FOR REAL too (pure-numpy T.81 codec,
  ``operators/jpeg.py`` — Huffman + zigzag + dequant + IDCT +
  YCbCr), and so is PNG (stdlib-zlib codec, ``operators/png.py`` —
  chunk CRCs + all five scanline filters, lossless round-trip;
  every colour type incl. palette and grey+alpha, depths 1-16,
  Adam7 interlace).
- Round 6 added PROGRESSIVE JPEG (SOF2, spectral selection +
  successive approximation) and CHROMA SUBSAMPLING (4:2:0 / 4:2:2 /
  any T.81 sampling factors, interleaved or one-scan-per-component)
  to the native codec — both directions, bit-identical across scan
  layouts on the same quantized coefficients.  The common crawl
  JPEG shapes (progressive AND/OR 4:2:0) all decode natively now.
- MP4/MOV containers DEMUX natively (``operators/mp4.py``, ISO
  14496-12 box + sample-table parsing): typed metadata, durations,
  codec fourccs, and byte-exact coded access units with timestamps
  and keyframe flags — everything a pipeline does before pixel
  decode.  Only the codec bitstream decode itself (H.264/AV1/AAC)
  still needs ffmpeg.
- Remaining COMPRESSED formats (arithmetic-coded JPEG, WebP, codec
  bitstreams inside MP4)
  need Pillow / ffmpeg, which are NOT in this container; those payloads
  either raise ``NotImplementedError`` (``strict=True``) or flow
  through as a clearly-marked deterministic fake
  (payload-digest-seeded) so the Spark-side schema / partitioning /
  batch shape stay real.

Scale: binary payloads ride the normal columnar path; feature columns
are fixed-width arrays; mapInPandas streams record batches so a task
never holds more than ``spark.sql.execution.arrow.maxRecordsPerBatch``
payloads in memory.
"""

from __future__ import annotations

import hashlib
import io
import struct
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "MEDIA_SCHEMA",
    "sniff_media",
    "decode_image",
    "encode_ppm",
    "resize_nearest",
    "attach_media_metadata",
    "decode_image_features",
    "resize_images",
    "decode_audio_features",
    "sample_video_frames",
    "phash64",
    "image_phash",
    "image_neardup_pairs",
    "audio_phash64",
    "audio_fingerprint",
    "audio_neardup_pairs",
    "video_neardup_pairs",
    "demux_video_samples",
]

# canonical media metadata struct
MEDIA_SCHEMA = (
    "media_type string, mime string, width int, height int, "
    "duration_ms long, n_bytes long"
)

IMAGE_FEATURE_DIM = 16  # [w, h, c, mean, std, min, max, 8-bin luma hist, aspect]


# ---------------------------------------------------------------------------
# pure-numpy codecs (uncompressed formats only — see module docstring)
# ---------------------------------------------------------------------------


def _parse_pnm(data: bytes):
    """PPM (P6, RGB) / PGM (P5, gray) binary decode."""
    magic = data[:2]
    channels = 3 if magic == b"P6" else 1
    # header: magic, width, height, maxval — whitespace/comment separated
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to EOL
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise ValueError("16-bit PNM unsupported")
    if w <= 0 or h <= 0 or maxval <= 0:
        raise ValueError(f"PNM invalid dimensions {w}x{h} maxval={maxval}")
    if len(data) - pos < w * h * channels:
        raise ValueError("PNM truncated pixel data")
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * channels, offset=pos)
    return px.reshape(h, w, channels)


def _parse_bmp(data: bytes):
    """Uncompressed 24/32-bit BMP decode (BITMAPINFOHEADER)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    px_offset = struct.unpack_from("<I", data, 10)[0]
    header_size = struct.unpack_from("<I", data, 14)[0]
    if header_size < 40:
        raise ValueError("BMP core header unsupported")
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    compression = struct.unpack_from("<I", data, 30)[0]
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"BMP bpp={bpp} compression={compression} unsupported")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3  # rows padded to 4 bytes
    flipped = h > 0
    h = abs(h)
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=px_offset)
    rows = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if flipped:
        rows = rows[::-1]
    # BGR(A) -> RGB
    return rows[:, :, [2, 1, 0]].copy()


def decode_image(data: bytes):
    """Decode an image payload to an (h, w[, c]) uint8 array, or
    return None if the format needs an external codec or the payload
    is malformed (truncated header, 16-bit PNM, ...).  Baseline AND
    progressive JPEG at any sampling factors (operators/jpeg.py)
    plus full PNG (operators/png.py) decode natively; WebP /
    arithmetic-coded JPEG remain gated."""
    if data[:2] in (b"P6", b"P5"):
        try:
            return _parse_pnm(data)
        except (ValueError, IndexError):
            return None
    if data[:2] == b"BM":
        try:
            return _parse_bmp(data)
        except (ValueError, struct.error):
            return None
    if data[:3] == b"\xff\xd8\xff" or data[:2] == b"\xff\xd8":
        from .jpeg import decode_baseline_jpeg

        try:
            img = decode_baseline_jpeg(data)
        except Exception:
            return None
        # normalize greyscale to (h, w, 1) like the PNM path
        return img[..., None] if img.ndim == 2 else img
    if data[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png

        try:
            img = decode_png(data)
        except Exception:
            return None
        if img.dtype == np.uint16:
            # 16-bit channels: keep the high byte so downstream
            # feature/resize code sees the uniform 0..255 range
            img = (img >> 8).astype(np.uint8)
        return img[..., None] if img.ndim == 2 else img
    return None


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode (h, w, 1|3) uint8 back to binary PGM/PPM."""
    h, w, c = img.shape
    magic = b"P6" if c == 3 else b"P5"
    return magic + f"\n{w} {h}\n255\n".encode() + img.tobytes()


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize via index sampling (pure numpy)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


def sniff_media(data: bytes) -> tuple[str, str, int | None, int | None, int | None]:
    """(media_type, mime, width, height, duration_ms) from the payload
    header — real values for the supported uncompressed formats."""
    unknown = ("unknown", "application/octet-stream", None, None, None)
    if data is None:
        return unknown
    # Malformed payloads that merely LOOK like a known magic must fall
    # through to "unknown", never crash the whole mapInPandas task.
    try:
        if data[:2] in (b"P6", b"P5"):
            img = decode_image(data)
            if img is None:
                return unknown
            mime = "image/x-portable-pixmap" if data[:2] == b"P6" else "image/x-portable-graymap"
            return ("image", mime, img.shape[1], img.shape[0], None)
        if data[:2] == b"BM":
            img = decode_image(data)
            if img is not None:
                return ("image", "image/bmp", img.shape[1], img.shape[0], None)
        if data[:2] == b"\xff\xd8":
            img = decode_image(data)
            if img is not None:
                return ("image", "image/jpeg", img.shape[1], img.shape[0], None)
            return unknown
        if data[:8] == b"\x89PNG\r\n\x1a\n":
            img = decode_image(data)
            if img is not None:
                return ("image", "image/png", img.shape[1], img.shape[0], None)
            return unknown
        if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
            try:
                with wave.open(io.BytesIO(data)) as wf:
                    dur = int(wf.getnframes() * 1000 / wf.getframerate())
            except wave.Error:
                # stdlib wave only takes PCM; G.711 mu-law/A-law
                # (1 byte/sample) and IMA ADPCM (blocked nibbles) fall
                # back to the chunk walk
                parsed = _wav_fmt_chunks(data)
                if not parsed or parsed[0] not in (6, 7, 0x11):
                    raise
                code, nch, sr, _bits, ba, frames = parsed
                if code == 0x11:
                    spb = (ba - 4 * nch) * 2 // max(nch, 1) + 1
                    n = (len(frames) // ba) * spb
                else:
                    n = len(frames) // max(nch, 1)
                dur = int(n * 1000 / sr)
            return ("audio", "audio/wav", None, None, dur)
        if data[:9] == b"YUV4MPEG2":
            w, h, fps, pos, chroma = _y4m_header(data)
            n = _y4m_frame_count(data)
            dur = int(n * 1000 / fps) if fps else None
            return ("video", "video/x-yuv4mpeg", w, h, dur)
        if data[4:8] == b"ftyp":  # ISO BMFF (MP4/MOV) — container demux
            from .mp4 import parse_mp4

            info = parse_mp4(data)
            vid = next(
                (t for t in info["tracks"] if t["handler"] == "vide"), None
            )
            if vid is not None:
                return ("video", "video/mp4", vid["width"], vid["height"],
                        vid["duration_ms"] or info["duration_ms"])
            aud = next(
                (t for t in info["tracks"] if t["handler"] == "soun"), None
            )
            if aud is not None:
                return ("audio", "audio/mp4", None, None,
                        aud["duration_ms"] or info["duration_ms"])
            return ("video", "video/mp4", None, None, info["duration_ms"])
    except Exception:
        return unknown
    return unknown


def _y4m_header(data: bytes):
    """Parse a YUV4MPEG2 stream header -> (w, h, fps, header_end, chroma)."""
    eol = data.index(b"\n")
    w = h = None
    fps = 0.0
    chroma = b"420"  # y4m default when no C tag is present
    for tok in data[9:eol].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            num, den = tok[1:].split(b":")
            fps = int(num) / int(den)
        elif tok[:1] == b"C":
            chroma = tok[1:]
    if w is None or h is None:
        raise ValueError("y4m missing W/H")
    return w, h, fps, eol + 1, chroma


def _y4m_frame_bytes(w: int, h: int, chroma: bytes) -> int:
    """Pixel bytes per frame for an explicit chroma tag; raises on
    subsamplings this decoder doesn't implement."""
    if chroma == b"mono":
        return w * h
    if chroma.startswith(b"420"):  # C420, C420jpeg, C420mpeg2, C420paldv
        return w * h + 2 * (((w + 1) // 2) * ((h + 1) // 2))
    if chroma == b"422":
        return w * h + 2 * (((w + 1) // 2) * h)
    if chroma == b"444":
        return 3 * w * h
    raise ValueError(f"y4m chroma subsampling {chroma!r} unsupported")


def _y4m_frames(data: bytes):
    """Yield Y planes ((h, w) uint8) of a y4m stream; chroma planes are
    skipped via the header-declared subsampling stride."""
    w, h, _, pos, chroma = _y4m_header(data)
    y_size = w * h
    frame_size = _y4m_frame_bytes(w, h, chroma)
    while pos < len(data):
        if data[pos : pos + 5] != b"FRAME":
            break
        pos = data.index(b"\n", pos) + 1
        y = np.frombuffer(data, np.uint8, count=y_size, offset=pos).reshape(h, w)
        yield y
        pos += frame_size


def _y4m_frame_count(data: bytes) -> int:
    """Frame count by walking header-derived frame strides (a FRAME
    byte pattern inside pixel data never miscounts)."""
    w, h, _, pos, chroma = _y4m_header(data)
    frame_size = _y4m_frame_bytes(w, h, chroma)
    n = 0
    while pos < len(data) and data[pos : pos + 5] == b"FRAME":
        nl = data.find(b"\n", pos)
        if nl < 0:
            break
        pos = nl + 1 + frame_size
        n += 1
    return n


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------


def attach_media_metadata(
    df: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Attach the typed metadata struct for an opaque binary column —
    sniffed from the payload header (real width/height/duration for
    the supported uncompressed formats)."""
    out_schema = f"{id_col} long, media struct<{MEDIA_SCHEMA.replace(', ', ',')}>"

    def sniff(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for p in pdf[payload_col]:
                mt, mime, w, h, dur = sniff_media(bytes(p) if p is not None else None)
                metas.append(
                    {
                        "media_type": mt,
                        "mime": mime,
                        "width": w,
                        "height": h,
                        "duration_ms": dur,
                        "n_bytes": len(p) if p is not None else 0,
                    }
                )
            yield pd.DataFrame({id_col: pdf[id_col].to_numpy(), "media": metas})

    return df.select(id_col, payload_col).mapInPandas(sniff, schema=out_schema)


def _image_features(img: np.ndarray) -> np.ndarray:
    """Fixed-width real feature vector from a decoded image."""
    h, w, c = img.shape
    flat = img.astype(np.float32)
    luma = flat.mean(axis=2)
    hist, _ = np.histogram(luma, bins=8, range=(0, 256))
    hist = hist.astype(np.float32) / max(luma.size, 1)
    return np.concatenate(
        [
            np.array([w, h, c, flat.mean(), flat.std(), flat.min(), flat.max()], np.float32),
            hist,
            np.array([w / max(h, 1)], np.float32),
        ]
    )


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake for UNSUPPORTED (compressed) formats: seeded
    by the payload digest, reproducible and content-sensitive."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big")
    return np.random.default_rng(seed).standard_normal(dim).astype(np.float32)


def decode_image_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """Decode images and emit a 16-wide feature vector per payload:
    [w, h, c, mean, std, min, max, 8-bin luma histogram, aspect].

    REAL decode for PPM/PGM/BMP; compressed formats fall back to
    Pillow when present, else ``strict=True`` raises and
    ``strict=False`` emits the digest-seeded fake with
    ``decode_ok=false``."""
    try:
        from PIL import Image  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False

    out_schema = f"{id_col} long, features array<float>, decode_ok boolean"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for p in pdf[payload_col]:
                img = decode_image(bytes(p)) if p is not None else None
                if img is None and p is not None and have_pil:
                    from PIL import Image

                    try:
                        img = np.asarray(Image.open(io.BytesIO(bytes(p))).convert("RGB"))
                    except Exception:
                        img = None
                if img is not None:
                    if img.ndim == 2:
                        img = img[:, :, None]
                    feats.append(_image_features(img))
                    oks.append(True)
                elif strict:
                    raise NotImplementedError(
                        "image format needs Pillow (not in container); decoded "
                        "natively: JPEG (baseline/progressive, any sampling), "
                        "PNG, PPM/PGM/BMP"
                    )
                else:
                    feats.append(
                        _fake_features(bytes(p), IMAGE_FEATURE_DIM)
                        if p is not None
                        else np.zeros(IMAGE_FEATURE_DIM, np.float32)
                    )
                    oks.append(False)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "features": feats, "decode_ok": oks}
            )

    return df.select(id_col, payload_col).mapInPandas(decode, schema=out_schema)


def resize_images(
    df: DataFrame,
    out_w: int,
    out_h: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Nearest-neighbor resize of decodable payloads, re-encoded as
    PPM/PGM binaries; undecodable payloads pass through with
    ``resized_ok=false``."""
    out_schema = f"{id_col} long, payload binary, resized_ok boolean"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, oks = [], []
            for p in pdf[payload_col]:
                img = decode_image(bytes(p)) if p is not None else None
                if img is None:
                    outs.append(p)
                    oks.append(False)
                else:
                    outs.append(encode_ppm(resize_nearest(img, out_w, out_h)))
                    oks.append(True)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "payload": outs, "resized_ok": oks}
            )

    return df.select(id_col, payload_col).mapInPandas(resize, schema=out_schema)


def decode_audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """PCM WAV audio features (REAL, stdlib wave + numpy): sample rate,
    duration_ms, RMS, peak, zero-crossing rate.  Compressed audio
    (mp3/ogg/flac) would need an external codec — strict raises,
    otherwise decode_ok=false with zeros."""
    out_schema = (
        f"{id_col} long, sample_rate int, duration_ms long, "
        "rms double, peak double, zero_cross_rate double, decode_ok boolean"
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    data = bytes(p)
                    # PCM via stdlib wave; G.711 / IMA ADPCM via the
                    # chunk walk — all three land in mono float64
                    sr, x = _wav_mono(data)
                    nf = len(x)
                    zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
                    rows.append(
                        (mid, sr, int(nf * 1000 / sr), float(np.sqrt(np.mean(x**2))),
                         float(np.abs(x).max(initial=0.0)), zc, True)
                    )
                except Exception as exc:
                    if strict:
                        # p may be null / non-bytes (e.g. failed-decode
                        # rows fed back through); bytes(p) would raise a
                        # second TypeError INSIDE the handler and mask
                        # the diagnosis
                        header = bytes(p)[:4] if isinstance(p, (bytes, bytearray, memoryview)) else b""
                        if header == b"RIFF":
                            # a real WAV container with a real problem
                            # (truncated/silent/malformed PCM): surface
                            # the actual diagnosis, not a codec gap
                            raise
                        raise NotImplementedError(
                            "compressed audio needs an external codec; PCM WAV is "
                            "decoded natively"
                        ) from exc
                    rows.append((mid, 0, 0, 0.0, 0.0, 0.0, False))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "sample_rate", "duration_ms", "rms", "peak",
                         "zero_cross_rate", "decode_ok"],
            )

    return df.select(id_col, payload_col).mapInPandas(decode, schema=out_schema)


def sample_video_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_frames: int = 4,
    strict: bool = False,
) -> DataFrame:
    """Sample N uniformly-spaced frames per video payload (one output
    row per frame).  REAL for YUV4MPEG2 streams: the Y plane of each
    sampled frame is emitted as a PGM binary.  Other containers
    (mp4/webm) need ffmpeg — strict raises, otherwise the frame is a
    deterministic digest marked ``decoded_ok=false``."""
    out_schema = f"{id_col} long, frame_idx int, frame binary, decoded_ok boolean"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, oks = [], [], [], []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                data = bytes(p)
                if data[:9] == b"YUV4MPEG2":
                    try:
                        planes = list(_y4m_frames(data))
                    except (ValueError, IndexError):
                        planes = []
                    if not planes:
                        continue
                    picks = np.linspace(0, len(planes) - 1, min(n_frames, len(planes)))
                    for i in sorted({int(round(x)) for x in picks}):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(encode_ppm(planes[i][:, :, None]))
                        oks.append(True)
                elif strict:
                    raise NotImplementedError(
                        "pixel frames need ffmpeg for non-y4m video (not in "
                        "container); MP4 coded samples demux natively via "
                        "demux_video_samples"
                    )
                else:
                    for i in range(n_frames):
                        ids.append(mid)
                        idxs.append(i)
                        frames.append(hashlib.md5(data + i.to_bytes(4, "big")).digest())
                        oks.append(False)
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": idxs, "frame": frames, "decoded_ok": oks}
            )

    return df.select(id_col, payload_col).mapInPandas(sample, schema=out_schema)


def demux_video_samples(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_samples: int = 4,
    keyframes_only: bool = False,
    strict: bool = False,
) -> DataFrame:
    """Extract N uniformly-spaced CODED access units per video
    payload (one output row per sample) — the container-demux stage a
    training pipeline runs before any pixel decode.

    REAL for ISO BMFF (MP4/MOV): sample bytes, decode timestamps and
    keyframe flags come straight from the stts/stsz/stsc/stco/stss
    tables (``operators/mp4.py``), byte-exact for hashing / dedup /
    handing to an external decoder.  ``keyframes_only=True`` samples
    only sync samples — the frames a decoder can decode standalone.
    y4m payloads demux too (every uncompressed frame is its own
    keyframe sample).  Other containers: strict raises, otherwise a
    deterministic digest row marked ``demux_ok=false``.

    Scale: the sample-table parse touches only the moov box and the
    selected byte ranges; payloads stream through mapInPandas in
    Arrow batches, never materializing more than one batch per task.
    """
    out_schema = (
        f"{id_col} long, sample_idx int, dts_ms long, keyframe boolean, "
        "codec string, sample binary, demux_ok boolean"
    )

    def picks_of(n_avail: int) -> list[int]:
        if n_avail <= 0:
            return []
        xs = np.linspace(0, n_avail - 1, min(n_samples, n_avail))
        return sorted({int(round(x)) for x in xs})

    def demux(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .mp4 import extract_mp4_samples, mp4_sample_table

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                if p is None:
                    continue
                data = bytes(p)
                if data[4:8] == b"ftyp":
                    try:
                        table = mp4_sample_table(data)
                        idx_pool = (
                            np.flatnonzero(table["keyframe"])
                            if keyframes_only
                            else np.arange(len(table["sizes"]))
                        )
                        chosen = [int(idx_pool[i]) for i in picks_of(len(idx_pool))]
                        for i, dts, key, blob in extract_mp4_samples(data, chosen):
                            rows.append(
                                (mid, i, dts, key, table["codec"], blob, True)
                            )
                        continue
                    except NotImplementedError:
                        if strict:
                            raise
                    except ValueError:
                        pass  # malformed: fall through to the fake row
                elif data[:9] == b"YUV4MPEG2":
                    try:
                        _w, _h, fps, _pos, _chroma = _y4m_header(data)
                        planes = list(_y4m_frames(data))
                    except (ValueError, IndexError):
                        planes = []
                    if planes:
                        for i in picks_of(len(planes)):
                            dts = int(i * 1000 / fps) if fps else 0
                            rows.append(
                                (mid, i, dts, True, "y4m ",
                                 encode_ppm(planes[i][:, :, None]), True)
                            )
                        continue
                elif strict:
                    raise NotImplementedError(
                        "container demux supports ISO BMFF (MP4/MOV) and y4m; "
                        "this payload needs ffmpeg (not in container)"
                    )
                rows.append(
                    (mid, 0, 0, False, None,
                     hashlib.md5(data).digest(), False)
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "sample_idx", "dts_ms", "keyframe", "codec",
                         "sample", "demux_ok"],
            )

    return df.select(id_col, payload_col).mapInPandas(demux, schema=out_schema)


def _g711_luts() -> tuple[np.ndarray, np.ndarray]:
    """256-entry mu-law / A-law -> int16 expansion tables (ITU-T
    G.711) — telephony WAVs (format codes 7 / 6) decode natively."""
    b = np.arange(256, dtype=np.int64)
    # mu-law
    u = ~b & 0xFF
    exp = (u >> 4) & 7
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    mulaw = np.where(u & 0x80, -mag, mag)
    # A-law
    a = b ^ 0x55
    exp = (a >> 4) & 7
    mant = a & 0x0F
    mag = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    # A-law sign convention is inverted vs mu-law: bit 7 SET (after
    # the 0x55 toggle) marks a POSITIVE sample (CCITT G.711 Table 2)
    alaw = np.where(a & 0x80, mag, -mag)
    return mulaw.astype(np.int16), alaw.astype(np.int16)


_MULAW_LUT, _ALAW_LUT = _g711_luts()


_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int64)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_adpcm_decode(frames: bytes, nch: int, block_align: int) -> np.ndarray:
    """IMA/DVI ADPCM (WAV format 0x11) -> int16 samples, channels
    interleaved.  Blocks are independent (4-byte per-channel header:
    int16 predictor + step index; then 4-bit nibbles in 4-byte
    per-channel interleave groups), so a huge payload could decode
    blocks in parallel — here sequential per block, vectorized nibble
    unpack."""
    if block_align <= 4 * nch:
        raise ValueError("ADPCM block_align too small")
    out: list[np.ndarray] = []
    for bstart in range(0, len(frames) - (4 * nch) + 1, block_align):
        block = frames[bstart : bstart + block_align]
        preds = np.empty(nch, dtype=np.int64)
        idxs = np.empty(nch, dtype=np.int64)
        for c in range(nch):
            preds[c] = int.from_bytes(block[4 * c : 4 * c + 2], "little", signed=True)
            idxs[c] = min(max(block[4 * c + 2], 0), 88)
        chans: list[list[int]] = [[int(preds[c])] for c in range(nch)]
        body = block[4 * nch :]
        nib = np.frombuffer(body, dtype=np.uint8)
        nibbles = np.empty(nib.size * 2, dtype=np.uint8)
        nibbles[0::2] = nib & 0x0F          # low nibble first
        nibbles[1::2] = nib >> 4
        # per-channel nibble streams: 4-byte (8-nibble) groups rotate
        # across channels
        for c in range(nch):
            groups = nibbles.reshape(-1, 8)[c::nch] if nch > 1 else nibbles.reshape(1, -1)
            pred, idx = int(preds[c]), int(idxs[c])
            ch = chans[c]
            for n in groups.ravel():
                step = int(_IMA_STEPS[idx])
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
                ch.append(pred)
        n_samp = min(len(ch) for ch in chans)
        inter = np.empty(n_samp * nch, dtype=np.int16)
        for c in range(nch):
            inter[c::nch] = np.asarray(chans[c][:n_samp], dtype=np.int16)
        out.append(inter)
    if not out:
        raise ValueError("no ADPCM blocks")
    return np.concatenate(out)


def _wav_fmt_chunks(data: bytes):
    """(format_code, channels, sample_rate, bits, block_align,
    data_bytes) from a RIFF/WAVE chunk walk, or None if fmt/data
    chunks are missing — the fallback for formats the stdlib ``wave``
    module rejects."""
    pos, fmt, frames = 12, None, None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            code, nch, sr = struct.unpack("<HHI", body[:8])
            block_align = struct.unpack("<H", body[12:14])[0]
            bits = struct.unpack("<H", body[14:16])[0]
            fmt = (code, nch, sr, bits, block_align)
        elif cid == b"data":
            frames = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or frames is None:
        return None
    return (*fmt, frames)


def _wav_mono(data: bytes) -> tuple[int, np.ndarray]:
    """PCM / mu-law / A-law WAV -> (sample_rate, mono float64 in
    [-1, 1]); channels averaged.  G.711 companded streams (format
    codes 7 / 6 — the telephony corpus shapes) expand through the
    precomputed LUTs; everything else goes through stdlib ``wave``."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a PCM WAV")
    parsed = _wav_fmt_chunks(data)
    if parsed and parsed[0] in (6, 7):
        code, nch, sr, _bits, _ba, frames = parsed
        lut = _ALAW_LUT if code == 6 else _MULAW_LUT
        x = lut[np.frombuffer(frames, dtype=np.uint8)].astype(np.float64) / 32768.0
        if nch > 1:
            x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
        return sr, x
    if parsed and parsed[0] == 0x11:  # IMA/DVI ADPCM
        code, nch, sr, _bits, ba, frames = parsed
        x = _ima_adpcm_decode(frames, nch, ba).astype(np.float64) / 32768.0
        if nch > 1:
            x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
        return sr, x
    with wave.open(io.BytesIO(data)) as wf:
        sr, nf, sw, nch = (
            wf.getframerate(), wf.getnframes(), wf.getsampwidth(), wf.getnchannels()
        )
        raw = wf.readframes(nf)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[sw]
    x = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sw == 1:
        x -= 128.0
    x /= float(1 << (8 * sw - 1))
    if nch > 1:
        x = x[: (len(x) // nch) * nch].reshape(-1, nch).mean(axis=1)
    return sr, x


def audio_spectral_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_bands: int = 8,
    strict: bool = False,
) -> DataFrame:
    """Frequency-domain audio features (REAL, numpy rfft over the full
    mono signal): spectral centroid and 85% rolloff in Hz, plus
    ``n_bands`` relative band energies over [0, sr/2] — the compact
    spectral signature a pipeline uses for audio dedup/quality
    bucketing.  Deterministic (no windowing randomness); malformed or
    compressed payloads degrade to ``decode_ok=false`` (or raise with
    ``strict``), never task failures.

    Scale shape: Arrow-batched ``mapInPandas`` over (id, payload) —
    pruned scan, no shuffle, linear in total audio bytes."""
    out_schema = (
        f"{id_col} long, spectral_centroid_hz double, rolloff_hz double, "
        "band_energy array<double>, decode_ok boolean"
    )
    zeros = [0.0] * n_bands

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    sr, x = _wav_mono(bytes(p))
                    if len(x) < 2:
                        raise ValueError("too short")
                    mag = np.abs(np.fft.rfft(x))
                    freqs = np.fft.rfftfreq(len(x), d=1.0 / sr)
                    power = mag * mag
                    total = float(power.sum())
                    if total <= 0.0:
                        raise ValueError("silent")
                    centroid = float((freqs * power).sum() / total)
                    roll_idx = int(np.searchsorted(np.cumsum(power), 0.85 * total))
                    rolloff = float(freqs[min(roll_idx, len(freqs) - 1)])
                    edges = np.linspace(0.0, sr / 2.0, n_bands + 1)
                    idx = np.clip(np.searchsorted(edges, freqs, side="right") - 1, 0, n_bands - 1)
                    bands = np.zeros(n_bands)
                    np.add.at(bands, idx, power)
                    rows.append(
                        (mid, round(centroid, 6), round(rolloff, 6),
                         np.round(bands / total, 6), True)
                    )
                except Exception as exc:
                    if strict:
                        # p may be null / non-bytes (e.g. failed-decode
                        # rows fed back through); bytes(p) would raise a
                        # second TypeError INSIDE the handler and mask
                        # the diagnosis
                        header = bytes(p)[:4] if isinstance(p, (bytes, bytearray, memoryview)) else b""
                        if header == b"RIFF":
                            # a real WAV container with a real problem
                            # (truncated/silent/malformed PCM): surface
                            # the actual diagnosis, not a codec gap
                            raise
                        raise NotImplementedError(
                            "compressed audio needs an external codec; PCM WAV is "
                            "decoded natively"
                        ) from exc
                    rows.append((mid, 0.0, 0.0, np.array(zeros), False))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "spectral_centroid_hz", "rolloff_hz",
                         "band_energy", "decode_ok"],
            )

    return df.select(id_col, payload_col).mapInPandas(decode, schema=out_schema)


def resample_pcm(
    df: DataFrame,
    target_sr: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
    strict: bool = False,
) -> DataFrame:
    """PCM WAV resampling (linear interpolation) to ``target_sr`` —
    the canonical audio-preprocessing normalization before feature
    extraction or model input.  Output payloads are 16-bit mono WAV at
    the target rate; failures degrade to null payloads with
    ``decode_ok=false`` (or raise with ``strict``)."""
    out_schema = f"{id_col} long, payload binary, sample_rate int, decode_ok boolean"

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf[id_col], pdf[payload_col]):
                try:
                    sr, x = _wav_mono(bytes(p))
                    n_out = max(1, int(round(len(x) * target_sr / sr)))
                    t_out = np.arange(n_out) * (sr / target_sr)
                    y = np.interp(t_out, np.arange(len(x)), x)
                    pcm = np.clip(np.round(y * 32767.0), -32768, 32767).astype(np.int16)
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as wf:
                        wf.setnchannels(1)
                        wf.setsampwidth(2)
                        wf.setframerate(target_sr)
                        wf.writeframes(pcm.tobytes())
                    rows.append((mid, buf.getvalue(), target_sr, True))
                except Exception as exc:
                    if strict:
                        # p may be null / non-bytes (e.g. failed-decode
                        # rows fed back through); bytes(p) would raise a
                        # second TypeError INSIDE the handler and mask
                        # the diagnosis
                        header = bytes(p)[:4] if isinstance(p, (bytes, bytearray, memoryview)) else b""
                        if header == b"RIFF":
                            # a real WAV container with a real problem
                            # (truncated/silent/malformed PCM): surface
                            # the actual diagnosis, not a codec gap
                            raise
                        raise NotImplementedError(
                            "compressed audio needs an external codec; PCM WAV is "
                            "decoded natively"
                        ) from exc
                    rows.append((mid, None, 0, False))
            yield pd.DataFrame(
                rows, columns=[id_col, "payload", "sample_rate", "decode_ok"]
            )

    return df.select(id_col, payload_col).mapInPandas(work, schema=out_schema)


# ---------------------------------------------------------------------------
# Perceptual image hashing + near-duplicate pairs
# ---------------------------------------------------------------------------

_DCT32 = None


def _dct_matrix(n: int = 32) -> np.ndarray:
    global _DCT32
    if _DCT32 is None:
        k = np.arange(n)[:, None]
        m = np.arange(n)[None, :]
        c = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * m + 1) * k / (2 * n))
        c[0] /= np.sqrt(2.0)
        _DCT32 = c
    return _DCT32


def phash64(img: np.ndarray) -> int:
    """64-bit perceptual hash (DCT pHash): luma -> 64x64 nearest
    resize -> 2x2 mean pool to 32x32 (cheap smoothing) -> 2-D DCT-II
    -> the low-frequency 8x8 block thresholded at the median of its
    63 non-DC coefficients.  Deterministic float64 end-to-end;
    near-identical images (recompression, mild noise/brightness)
    land within a few bits (measured on the synthetic fixtures:
    JPEG q85 recompression <= 4, +10 brightness / sigma-3 noise <= 6,
    unrelated content > 10) — pair at bands=8 / max_hamming <= 7 for
    perturbation-robust matching, bands=4 / <= 3 for strict."""
    a = img.astype(np.float64)
    if a.ndim == 3 and a.shape[2] == 1:  # greyscale plane (PGM frames)
        a = a[..., 0]
    elif a.ndim == 3:
        a = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    small = resize_nearest(a[..., None], 128, 128)[..., 0]
    pooled = small.reshape(32, 4, 32, 4).mean(axis=(1, 3))
    d = _dct_matrix(32)
    freq = d @ pooled @ d.T
    block = freq[:8, :8]
    flat = block.ravel()
    med = float(np.median(flat[1:]))
    bits = flat > med
    h = 0
    for i, b in enumerate(bits):
        if b:
            h |= 1 << i
    return h - (1 << 64) if h >= 1 << 63 else h  # signed int64 for Spark LONG


def image_phash(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, phash, decode_ok): perceptual hashes over binary image
    payloads — Arrow-batched decode (the real PPM/PGM/BMP/PNG/JPEG
    codecs), malformed payloads degrade to decode_ok=false rows,
    never task failures."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _id, data in zip(pdf[id_col], pdf[payload_col]):
                try:
                    img = decode_image(bytes(data))
                    if img is None:  # unrecognized container
                        out.append((_id, None, False))
                    else:
                        out.append((_id, phash64(img), True))
                except (ValueError, NotImplementedError):
                    out.append((_id, None, False))
            yield pd.DataFrame(out, columns=[id_col, "phash", "decode_ok"])

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, phash long, decode_ok boolean"
    )


def image_neardup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Image near-duplicate pairs: pHash + the same banded-Hamming
    join (pigeonhole recall guarantee at max_hamming <= bands-1) the
    text simhash path uses — one dedup algebra across modalities.
    Returns (id_a, id_b, hamming)."""
    from .dedup import hamming_banded_pairs

    sigs = image_phash(df, payload_col, id_col).filter(F.col("decode_ok")).select(
        F.col(id_col).alias("_id"), F.col("phash").alias("sig")
    )
    return hamming_banded_pairs(sigs, max_hamming=max_hamming, bands=bands)


def audio_phash64(sr: int, x: np.ndarray, n_slices: int = 8, n_bands: int = 9) -> int:
    """64-bit audio fingerprint (Haitsma-Kalker-style energy-sign
    grid): the clip splits into ``n_slices`` equal time slices; each
    slice's rfft magnitude integrates into ``n_bands`` log-spaced
    bands between 2% and 45% of Nyquist; bit (t, b) = band b's energy
    exceeds band b+1's in slice t — 8 x 8 = 64 sign bits.

    Volume-invariant EXACTLY (every bit is a same-slice energy
    comparison, so global gain cancels); mild additive noise flips
    only near-tie bits (measured <= 6 on the test fixtures); distinct
    tonal content lands far apart.  Deterministic float64."""
    n = len(x)
    if n < n_slices * 16:
        raise ValueError("clip too short to fingerprint")
    edges = np.exp(
        np.linspace(np.log(0.02), np.log(0.45), n_bands + 1)
    )  # fractions of Nyquist
    h = 0
    step = n // n_slices
    for t in range(n_slices):
        seg = x[t * step : (t + 1) * step]
        mag = np.abs(np.fft.rfft(seg))
        freqs = np.linspace(0.0, 1.0, len(mag))  # fraction of Nyquist
        energy = np.empty(n_bands)
        for b in range(n_bands):
            m = (freqs >= edges[b]) & (freqs < edges[b + 1])
            energy[b] = float(np.sum(mag[m] ** 2))
        for b in range(n_bands - 1):
            if energy[b] > energy[b + 1]:
                h |= 1 << (t * (n_bands - 1) + b)
    return h - (1 << 64) if h >= 1 << 63 else h


def audio_fingerprint(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, aphash, decode_ok): audio fingerprints over WAV payloads
    (PCM / G.711 / IMA ADPCM via the shared decoder); malformed
    payloads degrade to decode_ok=false."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _id, data in zip(pdf[id_col], pdf[payload_col]):
                try:
                    sr, x = _wav_mono(bytes(data))
                    out.append((_id, audio_phash64(sr, x), True))
                except (ValueError, NotImplementedError, EOFError, wave.Error):
                    out.append((_id, None, False))
            yield pd.DataFrame(out, columns=[id_col, "aphash", "decode_ok"])

    return df.select(id_col, payload_col).mapInPandas(
        run, schema=f"{id_col} long, aphash long, decode_ok boolean"
    )


def audio_neardup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    bands: int = 8,
) -> DataFrame:
    """Audio near-duplicate pairs: the SAME banded-Hamming algebra as
    text simhash and image pHash, over the spectral sign grid."""
    from .dedup import hamming_banded_pairs

    sigs = audio_fingerprint(df, payload_col, id_col).filter(
        F.col("decode_ok")
    ).select(F.col(id_col).alias("_id"), F.col("aphash").alias("sig"))
    return hamming_banded_pairs(sigs, max_hamming=max_hamming, bands=bands)


def video_neardup_pairs(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_frames: int = 4,
    max_hamming: int = 6,
    bands: int = 8,
    min_matching_frames: int = 2,
) -> DataFrame:
    """Video near-duplicate pairs by FRAME VOTING: sample n uniformly
    spaced frames per clip (real pixels for y4m), pHash each, and
    call two clips near-dups when at least ``min_matching_frames``
    same-index frame pairs land within ``max_hamming`` — re-encoded
    or mildly-corrupted copies keep frame-wise alignment, while
    sharing one incidental frame (title cards, black frames) does
    not fire a single-frame matcher.

    Plan shape: per-frame hashes join on (frame_idx, band, band_val)
    — the Hamming banding keyed by frame position, so a frame only
    meets candidates at ITS index; the vote is a groupBy count over
    verified frame matches.  Returns (id_a, id_b, n_matching).
    """
    frames = sample_video_frames(
        df, payload_col=payload_col, id_col=id_col, n_frames=n_frames
    ).filter(F.col("decoded_ok"))

    def hash_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, idx, fr in zip(pdf[id_col], pdf["frame_idx"], pdf["frame"]):
                try:
                    img = decode_image(bytes(fr))
                    if img is not None:
                        out.append((mid, int(idx), phash64(img)))
                except (ValueError, NotImplementedError):
                    pass
            yield pd.DataFrame(out, columns=["_id", "_fi", "sig"])

    sigs = frames.mapInPandas(
        hash_frames, schema="_id long, _fi int, sig long"
    ).localCheckpoint(eager=False)

    bits_per_band = 64 // bands
    mask = (1 << bits_per_band) - 1
    banded = sigs.select(
        "_id",
        "_fi",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("sig", b * bits_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "_fi", "sig", "bb.band", "bb.band_val")
    cand = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l._fi") == F.col("r._fi"))
            & (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._fi").alias("_fi"),
            F.col("l.sig").alias("sig_a"),
            F.col("r.sig").alias("sig_b"),
        )
        .distinct()
    )
    frame_matches = cand.filter(
        F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b"))) <= max_hamming
    )
    return (
        frame_matches.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_matching"))
        .filter(F.col("n_matching") >= min_matching_frames)
    )
