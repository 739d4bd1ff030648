"""Pure-numpy/stdlib PNG codec (RFC 2083 / ISO 15948).

The other half of the compressed-image gate: PNG's compression is
zlib (in the Python stdlib), so a full, LOSSLESS decoder fits in a
page — chunk framing with CRC-32, IDAT inflate, and the five scanline
filters (none/sub/up/average/Paeth).  Supported: 8-bit greyscale
(colour type 0), truecolour (2), and truecolour+alpha (6),
non-interlaced.  Rejected cleanly: palette images, 16-bit channels,
Adam7 interlace.

Unlike JPEG this is exactly round-trippable, so the tests assert
bit-identical encode->decode on random images, and the decoder also
exercises all five filters via a hand-built multi-filter stream.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_png", "decode_png"]

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, level: int = 6) -> bytes:
    """Encode HxW (grey), HxWx3 (RGB) or HxWx4 (RGBA) uint8 to PNG
    (filter type 0 per scanline — simple, valid, lossless)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        ctype, planes = 0, 1
        rows = img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        ctype, planes = 2, 3
        rows = img
    elif img.ndim == 3 and img.shape[2] == 4:
        ctype, planes = 6, 4
        rows = img
    else:
        raise ValueError("expected HxW, HxWx3 or HxWx4 uint8")
    h, w = rows.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type 0 (None)
        raw += rows[y].tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), level))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, w: int, planes: int) -> np.ndarray:
    stride = w * planes
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int64)
        pos += 1 + stride
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub
            cur = row.copy()
            for i in range(planes, stride):
                cur[i] = (cur[i] + cur[i - planes]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                left = cur[i - planes] if i >= planes else 0
                cur[i] = (cur[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                left = cur[i - planes] if i >= planes else 0
                ul = prev[i - planes] if i >= planes else 0
                cur[i] = (cur[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to HxW (grey) / HxWx3 / HxWx4 uint8.  Raises
    ValueError on malformed streams and NotImplementedError on
    palette/16-bit/interlaced images."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError("only 8-bit channels")
    if interlace != 0:
        raise NotImplementedError("Adam7 interlace not supported")
    planes = {0: 1, 2: 3, 6: 4}.get(ctype_)
    if planes is None:
        raise NotImplementedError(f"colour type {ctype_} (palette?) not supported")
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (1 + w * planes):
        raise ValueError("IDAT size mismatch")
    out = _unfilter(raw, h, w, planes).reshape(h, w, planes)
    return out[:, :, 0] if planes == 1 else out
