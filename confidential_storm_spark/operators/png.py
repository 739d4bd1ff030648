"""Pure-numpy/stdlib PNG codec (RFC 2083 / ISO 15948).

The other half of the compressed-image gate: PNG's compression is
zlib (in the Python stdlib), so a full, LOSSLESS decoder fits in a
page — chunk framing with CRC-32, IDAT inflate, and the five scanline
filters (none/sub/up/average/Paeth).

Round-5 coverage (the round-4 ``NotImplementedError`` gates are now
real code paths):
- colour types 0 (grey), 2 (RGB), 3 (palette, incl. tRNS alpha),
  4 (grey+alpha), 6 (RGBA)
- bit depths 8 and 16 everywhere they're legal, plus the sub-byte
  depths 1/2/4 for greyscale and palette images
- Adam7 interlace (each pass is its own filtered sub-image)

Unlike JPEG this is exactly round-trippable, so the tests assert
bit-identical encode->decode on random images across the full
(colour type x depth x interlace) grid, and the decoder also
exercises all five filters via a hand-built multi-filter stream.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_png", "decode_png"]

_SIG = b"\x89PNG\r\n\x1a\n"

# samples per pixel for each colour type (palette = 1 index sample)
_PLANES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# Adam7 pass layout: (x_start, y_start, x_step, y_step)
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _pack_row(samples: np.ndarray, depth: int) -> bytes:
    """Pack one row of integer samples at ``depth`` bits into the PNG
    byte layout (big-endian within 16-bit, MSB-first within a byte)."""
    if depth == 8:
        return samples.astype(np.uint8).tobytes()
    if depth == 16:
        return samples.astype(">u2").tobytes()
    # sub-byte: spread each sample over `depth` bits, MSB first
    bits = (
        (samples[:, None] >> np.arange(depth - 1, -1, -1)[None, :]) & 1
    ).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def encode_png(
    img: np.ndarray,
    level: int = 6,
    palette: np.ndarray | None = None,
    interlace: bool = False,
    depth: int | None = None,
) -> bytes:
    """Encode to PNG (filter type 0 per scanline — simple, valid,
    lossless).  Accepted inputs:

    - HxW grey, HxWx2 grey+alpha, HxWx3 RGB, HxWx4 RGBA; uint8 (or
      uint16 / ``depth=16`` for 16-bit channels)
    - with ``palette`` (Px3 uint8): HxW palette INDICES (colour type
      3); ``depth`` of 1/2/4/8 chooses the index packing
    - ``depth`` of 1/2/4 with an HxW image encodes sub-byte greyscale
      (raw sample values, not scaled)
    - ``interlace=True`` writes Adam7 (seven independently filtered
      passes)
    """
    img = np.asarray(img)
    if depth is None:
        depth = 16 if img.dtype == np.uint16 else 8
    if palette is not None:
        if img.ndim != 2:
            raise ValueError("palette images take HxW index arrays")
        if depth not in (1, 2, 4, 8):
            raise ValueError("palette depth must be 1/2/4/8")
        ctype = 3
        rows = img[:, :, None]
    elif img.ndim == 2:
        ctype = 0
        rows = img[:, :, None]
        if depth not in (1, 2, 4, 8, 16):
            raise ValueError("greyscale depth must be 1/2/4/8/16")
    elif img.ndim == 3 and img.shape[2] in (2, 3, 4):
        ctype = {2: 4, 3: 2, 4: 6}[img.shape[2]]
        rows = img
        if depth not in (8, 16):
            raise ValueError("colour/alpha images need depth 8 or 16")
    else:
        raise ValueError("expected HxW[, xP] with P in {2,3,4}")
    h, w = rows.shape[:2]
    planes = rows.shape[2]
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 1 if interlace else 0)

    def _pass_bytes(sub: np.ndarray) -> bytearray:
        raw = bytearray()
        for y in range(sub.shape[0]):
            raw.append(0)  # filter type 0 (None)
            raw += _pack_row(sub[y].reshape(-1), depth)
        return raw

    if interlace:
        raw = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            sub = rows[y0::dy, x0::dx]
            if sub.shape[0] and sub.shape[1]:
                raw += _pass_bytes(sub)
    else:
        raw = _pass_bytes(rows)
    out = _SIG + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw), level)) + _chunk(b"IEND", b"")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, h: int, stride: int, bpp: int, pos: int = 0) -> tuple[np.ndarray, int]:
    """Undo per-scanline filtering: h scanlines of ``stride`` bytes,
    filters referencing the pixel ``bpp`` bytes to the left.  Returns
    (h x stride bytes, next read offset) so interlace passes can chain
    on one buffer."""
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        if pos >= len(raw):
            raise ValueError("IDAT truncated")
        ftype = raw[pos]
        row = np.frombuffer(raw, np.uint8, stride, pos + 1).astype(np.int64)
        pos += 1 + stride
        if ftype == 0:
            cur = row
        elif ftype == 1:  # Sub: per-byte-lane prefix sum mod 256
            cur = row.copy()
            lanes = cur.reshape(-1, bpp) if stride % bpp == 0 else None
            if lanes is not None:
                cur = (np.cumsum(lanes, axis=0, dtype=np.int64) & 0xFF).reshape(-1)
            else:  # ragged tail (never happens for legal strides)
                for i in range(bpp, stride):
                    cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise ValueError(f"unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur.astype(np.int64)
    return out, pos


def _unpack_rows(rows: np.ndarray, w: int, planes: int, depth: int) -> np.ndarray:
    """h x stride filtered bytes -> h x w x planes integer samples."""
    h = rows.shape[0]
    if depth == 8:
        return rows[:, : w * planes].reshape(h, w, planes)
    if depth == 16:
        flat = rows[:, : w * planes * 2].reshape(h, -1).astype(np.uint8)
        vals = flat.reshape(h, w * planes, 2)
        out = (vals[:, :, 0].astype(np.uint16) << 8) | vals[:, :, 1]
        return out.reshape(h, w, planes)
    # sub-byte (planes == 1 for types 0 and 3)
    bits = np.unpackbits(rows, axis=1)[:, : w * depth]
    weights = 1 << np.arange(depth - 1, -1, -1)
    vals = (bits.reshape(h, w, depth) * weights[None, None, :]).sum(axis=2)
    return vals.astype(np.uint8).reshape(h, w, 1)


def decode_png(data: bytes) -> np.ndarray:
    """Decode PNG bytes to an array: HxW for greyscale (uint8 or
    uint16; sub-byte depths yield raw sample values), HxWx2 for
    grey+alpha, HxWx3 for RGB (palette images resolve through PLTE),
    HxWx4 for RGBA (incl. palette+tRNS).  Raises ValueError on
    malformed streams — fuzz contract (pytest-pinned): no other
    exception type escapes, however corrupt the bytes."""
    try:
        return _decode_png(data)
    except (IndexError, KeyError, struct.error) as exc:
        raise ValueError(f"malformed PNG stream: {exc!r}") from exc


def _decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte = None
    trns = None
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
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, np.uint8)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if ihdr is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype_, comp, filt, interlace = ihdr
    planes = _PLANES.get(ctype_)
    if planes is None:
        raise ValueError(f"illegal colour type {ctype_}")
    legal = (1, 2, 4, 8) if ctype_ == 3 else (1, 2, 4, 8, 16) if ctype_ == 0 else (8, 16)
    if depth not in legal:
        raise ValueError(f"illegal depth {depth} for colour type {ctype_}")
    if interlace not in (0, 1):
        raise ValueError(f"illegal interlace {interlace}")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc
    bpp = max(1, planes * depth // 8)

    def _stride(width: int) -> int:
        return (width * planes * depth + 7) // 8

    if interlace == 0:
        rows, end = _unfilter(raw, h, _stride(w), bpp)
        if end != len(raw):
            raise ValueError("IDAT size mismatch")
        out = _unpack_rows(rows, w, planes, depth)
    else:  # Adam7: each pass is an independently filtered sub-image
        out = np.zeros(
            (h, w, planes), dtype=np.uint16 if depth == 16 else np.uint8
        )
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            rows, off = _unfilter(raw, ph, _stride(pw), bpp, off)
            out[y0::dy, x0::dx] = _unpack_rows(rows, pw, planes, depth)
        if off != len(raw):
            raise ValueError("IDAT size mismatch")
    if ctype_ == 3:
        if plte is None:
            raise ValueError("palette image without PLTE")
        idx = out[:, :, 0].astype(np.int64)
        if idx.max(initial=0) >= len(plte):
            raise ValueError("palette index out of range")
        rgb = plte[idx]
        if trns is not None:
            alpha = np.full(len(plte), 255, np.uint8)
            alpha[: len(trns)] = trns
            return np.dstack([rgb, alpha[idx]])
        return rgb
    return out[:, :, 0] if planes == 1 else out
