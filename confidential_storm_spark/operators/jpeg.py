"""Pure-numpy baseline JPEG codec (ITU-T T.81 / ISO 10918-1).

Round-2/3 honestly gated compressed image formats on Pillow (absent in
this container).  Baseline sequential JPEG is small enough to
implement from the public spec, which un-gates the dominant
compressed image format for the multimodal pipeline: SOI/DQT/SOF0/
DHT/SOS/EOI markers, canonical Huffman entropy coding with byte
stuffing, zigzag + uniform quantization, 2-D DCT-II as two 8x8
matmuls, YCbCr <-> RGB (BT.601 full range), edge-replicate padding to
8x8 blocks.  Supported: 8-bit greyscale (1 component) and 4:4:4
colour (3 components), with DRI/RSTn restart intervals (round 5:
byte-aligned restart markers, DC-prediction reset, both codec
directions), and — round 6 — PROGRESSIVE mode (T.81 Annex G: SOF2,
spectral selection + successive approximation, EOB-run coding,
AC-refinement correction bits; both codec directions, decode also
honoring DRI per scan).  Progressive coding reorders the same
quantized coefficients, so progressive and baseline streams of one
image decode to bit-identical pixels — the equivalence the tests
pin.  Round 6 also added chroma subsampling (4:2:2 / 4:2:0 MCU
interleave with box-downsampled chroma, both codec directions —
_prep_planes / _SUBSAMPLINGS below).  NOT supported (still honestly
gated at the call sites): arithmetic coding, hierarchical mode.

The encoder emits custom DHT tables (canonical fixed-length-9 codes
over the symbols actually used — valid prefix codes by construction,
never the all-ones pattern, no Annex K table dependency); the decoder
reads whatever DHT declares, so it also accepts other baseline
encoders' streams.

Verification without a reference codec in the container: flat-colour
images decode EXACTLY (DC-only blocks are hand-computable through
quantization), gradients round-trip within quantization error, and
truncated/corrupt payloads raise cleanly (degraded to
``decode_ok=false`` by the multimodal operators).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_baseline_jpeg", "encode_progressive_jpeg", "decode_baseline_jpeg"]


# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------

def _zigzag() -> np.ndarray:
    """Scan position -> (row, col) flat index, generated from the
    diagonal traversal definition (even diagonals run upward)."""
    order = []
    for d in range(15):
        rows = range(max(0, d - 7), min(d, 7) + 1)
        rows = reversed(list(rows)) if d % 2 == 0 else list(rows)
        order.extend(r * 8 + (d - r) for r in rows)
    return np.array(order, dtype=np.int64)


_ZZ = _zigzag()

# DCT-II basis: _C[u, x] = 0.5 * c(u) * cos((2x+1) u pi / 16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _C[_u, _x] = 0.5 * (1 / np.sqrt(2) if _u == 0 else 1.0) * np.cos(
            (2 * _x + 1) * _u * np.pi / 16
        )

# Standard quantization tables (T.81 Annex K.1), luminance / chrominance
_QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)
_QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)


def _quant_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG-style quality (1..100) -> scaled Annex K tables."""
    q = min(100, max(1, int(quality)))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    def s(t):
        return np.clip(np.floor((t * scale + 50) / 100), 1, 255)
    return s(_QL), s(_QC)


# ---------------------------------------------------------------------------
# bit I/O with 0xFF byte stuffing
# ---------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.bytes.append(b)
            if b == 0xFF:
                self.bytes.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        """Pad to a byte boundary with 1-bits (spec padding before a
        marker); stuffing in write() handles an all-ones pad byte."""
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)

    def emit_marker(self, marker: int) -> None:
        """Append a raw marker (0xFF xx, NOT byte-stuffed) — caller
        must align() first."""
        self.bytes += bytes([0xFF, marker])

    def flush(self) -> bytes:
        self.align()
        return bytes(self.bytes)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated after 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError("unexpected marker in entropy stream")
        self.acc = (self.acc << 8) | b
        self.n += 8

    def read_bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.read_bit()
        return v

    def sync_restart(self, expected: int) -> None:
        """Consume a restart marker RSTn (expected = n in 0..7):
        discard the partial padding byte, tolerate a full stuffed
        all-ones pad byte and 0xFF fill bytes, then require the
        expected marker and reset the bit accumulator (T.81 E.2.4 /
        B.1.1.2)."""
        self.acc = 0
        self.n = 0
        # a fully-padded byte arrives as stuffed 0xFF 0x00
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0x00
        ):
            self.pos += 2
        # optional 0xFF fill bytes before the marker byte
        while (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and self.data[self.pos + 1] == 0xFF
        ):
            self.pos += 1
        if self.pos + 1 >= len(self.data) or self.data[self.pos] != 0xFF:
            raise ValueError("expected restart marker")
        marker = self.data[self.pos + 1]
        if marker != 0xD0 + expected:
            raise ValueError(
                f"restart marker mismatch: got {marker:#x}, want {0xD0 + expected:#x}"
            )
        self.pos += 2


# ---------------------------------------------------------------------------
# canonical Huffman (DHT) helpers
# ---------------------------------------------------------------------------

def _fixed9_table(symbols: list[int]) -> tuple[list[int], list[int]]:
    """(bits, huffval) for a canonical code giving every symbol a
    9-bit code.  With <= 256 symbols the all-ones 9-bit pattern is
    never assigned (spec requirement)."""
    bits = [0] * 16
    bits[8] = len(symbols)  # index 8 == code length 9
    return bits, list(symbols)


def _build_decode_map(bits: list[int], huffval: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical code assignment."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = huffval[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


# ---------------------------------------------------------------------------
# per-block transforms
# ---------------------------------------------------------------------------

def _fdct_quant(block: np.ndarray, q: np.ndarray) -> np.ndarray:
    coef = _C @ (block - 128.0) @ _C.T
    return np.round(coef / q).astype(np.int32)


def _dequant_idct(coef: np.ndarray, q: np.ndarray) -> np.ndarray:
    spatial = _C.T @ (coef * q) @ _C + 128.0
    return np.clip(np.round(spatial), 0, 255)


def _blocks(plane: np.ndarray):
    h, w = plane.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            yield padded[by : by + 8, bx : bx + 8]


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0].astype(np.float64), img[..., 1].astype(np.float64), img[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)


def _mcu_sequences(planes, qs, samplings):
    """Quantized zigzag blocks per component: ``seqs`` flattened in
    MCU emission order (hi x vi data units of component i per MCU,
    T.81 A.2.3) plus the raw ``(bh, bw, 64)`` grids and the MCU grid
    dims.  Planes must already be padded so every block grid is an
    exact multiple of its sampling factors (true by construction for
    4:4:4, by MCU padding for subsampled layouts)."""
    mcux = mcuy = None
    seqs: list[list[np.ndarray]] = []
    grids: list[np.ndarray] = []
    for (hi, vi), plane, q in zip(samplings, planes, qs):
        bh, bw = (plane.shape[0] + 7) // 8, (plane.shape[1] + 7) // 8
        grid = np.stack(
            [_fdct_quant(b, q).flatten()[_ZZ] for b in _blocks(plane)]
        ).reshape(bh, bw, 64)
        grids.append(grid)
        cx, cy = bw // hi, bh // vi
        if mcux is None:
            mcux, mcuy = cx, cy
        elif (cx, cy) != (mcux, mcuy):
            raise ValueError("component grids disagree on MCU geometry")
        seq = []
        for m in range(mcux * mcuy):
            my, mx = m // mcux, m % mcux
            for v in range(vi):
                for hh in range(hi):
                    seq.append(grid[my * vi + v, mx * hi + hh])
        seqs.append(seq)
    return seqs, grids, mcux, mcuy


def _prep_planes(img: np.ndarray, subsampling: str):
    """Color transform + MCU padding + chroma box-downsample shared
    by the baseline and progressive encoders.  Returns (planes,
    samplings, h, w) — ``samplings`` is None for the 4:4:4 /
    greyscale layouts (one 1x1 block per MCU)."""
    if subsampling not in _SUBSAMPLINGS:
        raise ValueError(f"subsampling must be one of {sorted(_SUBSAMPLINGS)}")
    hs, vs = _SUBSAMPLINGS[subsampling]
    img = np.asarray(img)
    samplings = None
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        ycc = _rgb_to_ycbcr(img)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        if (hs, vs) != (1, 1):
            # pad to whole MCUs (edge-replicate, like _blocks), then
            # box-average chroma down by the luma sampling factors
            ih, iw = planes[0].shape
            ph = (ih + 8 * vs - 1) // (8 * vs) * (8 * vs)
            pw = (iw + 8 * hs - 1) // (8 * hs) * (8 * hs)
            padded = [
                np.pad(p, ((0, ph - ih), (0, pw - iw)), mode="edge") for p in planes
            ]
            planes = [padded[0]] + [
                p.reshape(ph // vs, vs, pw // hs, hs).mean(axis=(1, 3))
                for p in padded[1:]
            ]
            samplings = [(hs, vs), (1, 1), (1, 1)]
    else:
        raise ValueError("expected HxW or HxWx3 uint8")
    return planes, samplings, img.shape[0], img.shape[1]


def _collect_block_syms(zz, prev_dc: int, dc_set: set, ac_set: set) -> int:
    """Symbol-collection pass for one data unit; returns the new DC
    predictor."""
    size, _ = _magnitude(int(zz[0]) - prev_dc)
    dc_set.add(size)
    run = 0
    for v in zz[1:]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            ac_set.add(0xF0)
            run -= 16
        s, _ = _magnitude(int(v))
        ac_set.add((run << 4) | s)
        run = 0
    if run:
        ac_set.add(0x00)
    return int(zz[0])


def _emit_block(w: "_BitWriter", zz, prev_dc: int, dc_codes: dict, ac_codes: dict) -> int:
    """Emission pass for one data unit; returns the new DC predictor."""
    diff = int(zz[0]) - prev_dc
    size, bits = _magnitude(diff)
    lc, code = dc_codes[size]
    w.write(code, lc)
    if size:
        w.write(bits, size)
    run = 0
    for v in zz[1:]:
        if v == 0:
            run += 1
            continue
        while run > 15:
            lc, code = ac_codes[0xF0]
            w.write(code, lc)
            run -= 16
        s, bts = _magnitude(int(v))
        lc, code = ac_codes[(run << 4) | s]
        w.write(code, lc)
        w.write(bts, s)
        run = 0
    if run:
        lc, code = ac_codes[0x00]
        w.write(code, lc)
    return int(zz[0])


def _huff_tables_for(comp_seqs, comp_class, reset_everys, n_classes):
    """Build the shared per-class canonical tables + code maps from
    the symbol-collection pass over every component's block
    sequence (``reset_everys[ci]`` = DC-predictor reset period in
    blocks, 0 for none)."""
    dc_syms: dict[int, set] = {0: set(), 1: set()}
    ac_syms: dict[int, set] = {0: set(), 1: set()}
    for ci, blocks in enumerate(comp_seqs):
        cls = comp_class[ci]
        reset_every = reset_everys[ci]
        prev_dc = 0
        for m, zz in enumerate(blocks):
            if reset_every and m and m % reset_every == 0:
                prev_dc = 0  # mirror the encode-pass DC reset
            prev_dc = _collect_block_syms(zz, prev_dc, dc_syms[cls], ac_syms[cls])
    for cls in (0, 1):
        dc_syms[cls].add(0)       # always define EOB/zero-size
        ac_syms[cls].add(0x00)
    dc_tables = [_fixed9_table(sorted(dc_syms[c])) for c in range(n_classes)]
    ac_tables = [_fixed9_table(sorted(ac_syms[c])) for c in range(n_classes)]
    dc_codes = [
        {s: (lc, code) for (lc, code), s in ((k, v) for k, v in _build_decode_map(*t).items())}
        for t in dc_tables
    ]
    ac_codes = [
        {s: (lc, code) for (lc, code), s in ((k, v) for k, v in _build_decode_map(*t).items())}
        for t in ac_tables
    ]
    return dc_tables, ac_tables, dc_codes, ac_codes


def _entropy_encode(
    planes: list[np.ndarray],
    qs: list[np.ndarray],
    restart_interval: int = 0,
    samplings: list[tuple[int, int]] | None = None,
) -> tuple[bytes, list, list]:
    """Returns (entropy bytes, dc tables, ac tables) — one (bits,
    huffval) pair per table class, shared across components of the
    same class (0 = luma, 1 = chroma like the standard layout).
    ``samplings`` gives each component's (hi, vi); per T.81 A.2.3 an
    MCU carries hi x vi data units of component i (4:4:4 when all
    (1, 1)).  With ``restart_interval`` > 0, an aligned RSTn marker
    is emitted every that many MCUs and DC prediction resets
    (T.81 E.2.4)."""
    samplings = samplings or [(1, 1)] * len(planes)
    comp_class = [0] + [1] * (len(planes) - 1)
    seqs, _grids, mcux, mcuy = _mcu_sequences(planes, qs, samplings)
    n_classes = 1 if len(planes) == 1 else 2
    # restart resets mirror the emission pass: every restart_interval
    # MCUs = that many * hi*vi blocks of component i
    dc_tables, ac_tables, dc_codes, ac_codes = _huff_tables_for(
        seqs, comp_class, [restart_interval * hi * vi for hi, vi in samplings],
        n_classes,
    )

    # interleaved MCU order: hi x vi blocks of each component
    w = _BitWriter()
    prev_dc = [0] * len(planes)
    ptr = [0] * len(planes)
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            w.align()
            w.emit_marker(0xD0 + (m // restart_interval - 1) % 8)
            prev_dc = [0] * len(planes)
        for ci in range(len(planes)):
            cls = comp_class[ci] if n_classes == 2 else 0
            hi, vi = samplings[ci]
            for _ in range(hi * vi):
                zz = seqs[ci][ptr[ci]]
                ptr[ci] += 1
                prev_dc[ci] = _emit_block(w, zz, prev_dc[ci], dc_codes[cls], ac_codes[cls])
    return w.flush(), dc_tables, ac_tables


def _entropy_encode_noninterleaved(
    planes, qs, samplings, restart_interval, h, w
) -> tuple[list[bytes], list, list]:
    """One entropy stream per component (baseline one-scan-per-
    component layout, T.81 A.2.2): each scan covers the component's
    TRUE block grid (no MCU padding units), restart counts data
    units.  Tables are still shared per class across components."""
    ncomp = len(planes)
    comp_class = [0] + [1] * (ncomp - 1)
    geo = _comp_geometry(
        (h, w, ncomp),
        [(ci, hi, vi, 0) for ci, (hi, vi) in enumerate(samplings)],
    )[4]
    comp_blocks = []
    for ci, (plane, q) in enumerate(zip(planes, qs)):
        g = geo[ci]
        bh, bw = (plane.shape[0] + 7) // 8, (plane.shape[1] + 7) // 8
        grid = np.stack(
            [_fdct_quant(b, q).flatten()[_ZZ] for b in _blocks(plane)]
        ).reshape(bh, bw, 64)
        # true grid only — MCU padding data units exist solely in
        # interleaved scans; same quantized blocks as the interleaved
        # layout, so the decode is bit-identical
        comp_blocks.append(
            [grid[by, bx] for by in range(g["bhc"]) for bx in range(g["bwc"])]
        )
    n_classes = 1 if ncomp == 1 else 2
    dc_tables, ac_tables, dc_codes, ac_codes = _huff_tables_for(
        comp_blocks, comp_class, [restart_interval] * ncomp, n_classes,
    )
    streams = []
    for ci, blocks in enumerate(comp_blocks):
        cls = comp_class[ci] if n_classes == 2 else 0
        wtr = _BitWriter()
        prev = 0
        for m, zz in enumerate(blocks):
            if restart_interval and m and m % restart_interval == 0:
                wtr.align()
                wtr.emit_marker(0xD0 + (m // restart_interval - 1) % 8)
                prev = 0
            prev = _emit_block(wtr, zz, prev, dc_codes[cls], ac_codes[cls])
        streams.append(wtr.flush())
    return streams, dc_tables, ac_tables


_SUBSAMPLINGS = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}


def encode_baseline_jpeg(
    img: np.ndarray,
    quality: int = 90,
    restart_interval: int = 0,
    subsampling: str = "444",
    interleave: bool = True,
) -> bytes:
    """Encode HxW (greyscale) or HxWx3 (RGB) uint8 to baseline JPEG
    (custom canonical Huffman tables).  ``subsampling`` is "444"
    (default), "422", or "420" — chroma is box-averaged down by the
    luma sampling factors, the standard crawl-JPEG layout.
    ``interleave=False`` writes one scan per component (T.81 A.2.2's
    non-interleaved layout) instead of a single interleaved scan —
    same quantized coefficients, so the decode is bit-identical.
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers
    every that many MCUs (data units when non-interleaved) — the
    feature that lets a 100 TB image pipeline entropy-decode one
    image's scan in parallel slices."""
    planes, samplings, h, w = _prep_planes(img, subsampling)
    ql, qc = _quant_tables(quality)
    qs = [ql] + [qc] * (len(planes) - 1)
    ncomp = len(planes)
    samplings = samplings or [(1, 1)] * ncomp

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT
    for tq, q in enumerate(qs[: 2 if ncomp > 1 else 1]):
        payload = bytes([tq]) + bytes(int(q.flatten()[_ZZ][i]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        tq = 0 if ci == 0 else 1
        hi, vi = samplings[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, tq if ncomp > 1 else 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)  # DRI
    if interleave or ncomp == 1:
        entropy, dc_tables, ac_tables = _entropy_encode(
            planes, qs, restart_interval, samplings
        )
        scans = [(list(range(ncomp)), entropy)]
    else:
        streams, dc_tables, ac_tables = _entropy_encode_noninterleaved(
            planes, qs, samplings, restart_interval, h, w
        )
        scans = [([ci], stream) for ci, stream in enumerate(streams)]
    for cls, (bits, vals) in enumerate(dc_tables):
        payload = bytes([0x00 | cls]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    for cls, (bits, vals) in enumerate(ac_tables):
        payload = bytes([0x10 | cls]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
    for comp_ids, entropy in scans:
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            cls = 0 if ci == 0 or ncomp == 1 else 1
            sos += bytes([ci + 1, (cls << 4) | cls])
        sos += bytes([0, 63, 0])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (T.81 Annex G.1)
# ---------------------------------------------------------------------------

def _prog_dc_first_ops(seqs, comp_class, bpm, al):
    """Interleaved first DC scan: huffman-coded diffs of DC >> al
    (arithmetic shift, G.1.2.1) in MCU order — ``seqs`` are the
    MCU-ordered block sequences, ``bpm[ci]`` the hi*vi data units of
    component i per MCU.  Ops: ('s', cls, tc, sym) huffman symbol /
    ('b', value, nbits) raw bits."""
    ops, syms = [], {0: set(), 1: set()}
    prev = [0] * len(seqs)
    ptr = [0] * len(seqs)
    for _m in range(len(seqs[0]) // bpm[0]):
        for ci, blocks in enumerate(seqs):
            cls = comp_class[ci]
            for _ in range(bpm[ci]):
                v = int(blocks[ptr[ci]][0]) >> al
                ptr[ci] += 1
                size, bits = _magnitude(v - prev[ci])
                prev[ci] = v
                syms[cls].add(size)
                ops.append(("s", cls, 0, size))
                if size:
                    ops.append(("b", bits, size))
    return ops, syms


def _prog_dc_refine_ops(seqs, bpm, al):
    """DC refinement: one raw bit (bit ``al`` of the signed DC) per
    data unit in MCU order — no huffman coding at all (G.1.2.1)."""
    ops = []
    ptr = [0] * len(seqs)
    for _m in range(len(seqs[0]) // bpm[0]):
        for ci, blocks in enumerate(seqs):
            for _ in range(bpm[ci]):
                ops.append(("b", (int(blocks[ptr[ci]][0]) >> al) & 1, 1))
                ptr[ci] += 1
    return ops, {0: set(), 1: set()}


def _prog_ac_first_ops(blocks, cls, ss, se, al):
    """First AC scan for band [ss..se] at approximation ``al``
    (G.1.2.2): sign-magnitude point transform, run/size symbols,
    EOB-run coding across blocks."""
    ops, syms = [], set()
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nbits = eobrun.bit_length() - 1
            syms.add(nbits << 4)
            ops.append(("s", cls, 1, nbits << 4))
            if nbits:
                ops.append(("b", eobrun - (1 << nbits), nbits))
            eobrun = 0

    for zzb in blocks:
        r = 0
        for v in (int(x) for x in zzb[ss : se + 1]):
            t = (abs(v) >> al) * (1 if v > 0 else -1)
            if t == 0:
                r += 1
                continue
            flush_eob()
            while r > 15:
                syms.add(0xF0)
                ops.append(("s", cls, 1, 0xF0))
                r -= 16
            size, bits = _magnitude(t)
            sym = (r << 4) | size
            syms.add(sym)
            ops.append(("s", cls, 1, sym))
            ops.append(("b", bits, size))
            r = 0
        if r:  # band ends in zeros -> block joins the EOB run
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return ops, {cls: syms, 1 - cls: set()}


def _prog_ac_refine_ops(blocks, cls, ss, se, al):
    """AC refinement scan (G.1.2.3): newly-significant coefficients
    coded as run/1 + sign, already-significant ones as buffered
    correction bits appended after the next symbol; EOB runs carry
    their blocks' pending correction bits."""
    ops, syms = [], set()
    eobrun = 0
    pend: list[int] = []  # correction bits buffered across the EOB run

    def flush_eob():
        nonlocal eobrun, pend
        if eobrun:
            nbits = eobrun.bit_length() - 1
            sym = nbits << 4
            syms.add(sym)
            ops.append(("s", cls, 1, sym))
            if nbits:
                ops.append(("b", eobrun - (1 << nbits), nbits))
            ops.extend(("b", b, 1) for b in pend)
            eobrun = 0
            pend = []

    for zzb in blocks:
        band = [int(x) for x in zzb[ss : se + 1]]
        t = [abs(v) >> al for v in band]
        eob_idx = max((i for i, tv in enumerate(t) if tv == 1), default=-1)
        r = 0
        br: list[int] = []  # correction bits since the last symbol
        for i, tv in enumerate(t):
            if tv == 0:
                r += 1
                continue
            if i <= eob_idx:
                while r > 15:
                    flush_eob()
                    syms.add(0xF0)
                    ops.append(("s", cls, 1, 0xF0))
                    r -= 16
                    ops.extend(("b", b, 1) for b in br)
                    br = []
            if tv > 1:  # already significant: correction bit (bit al)
                br.append(tv & 1)
                continue
            # newly significant (tv == 1)
            flush_eob()
            sym = (r << 4) | 1
            syms.add(sym)
            ops.append(("s", cls, 1, sym))
            ops.append(("b", 1 if band[i] > 0 else 0, 1))
            ops.extend(("b", b, 1) for b in br)
            br = []
            r = 0
        if r > 0 or br:
            eobrun += 1
            pend.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    return ops, {cls: syms, 1 - cls: set()}


def encode_progressive_jpeg(
    img: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode HxW (greyscale) or HxWx3 (RGB) uint8 to PROGRESSIVE
    JPEG (SOF2; ``subsampling`` "444"/"422"/"420" like the baseline
    encoder): a spec-standard scan script exercising both progressive
    modes — DC first at Al=1 + DC refinement (interleaved over MCUs),
    then per component AC bands 1-5 and 6-63 first at Al=1 +
    refinements to Al=0 (non-interleaved over the component's own
    block grid, T.81 G.1.1.1.1).  Quantization and chroma
    downsampling are identical to ``encode_baseline_jpeg`` at the
    same quality, so decoding a progressive stream yields
    BIT-IDENTICAL pixels to decoding the baseline stream of the same
    image (progressive coding is a lossless reordering of the same
    quantized coefficients) — the round-trip equivalence pytest pins
    exactly that."""
    planes, samplings, h, w = _prep_planes(img, subsampling)
    ncomp = len(planes)
    samplings = samplings or [(1, 1)] * ncomp
    ql, qc = _quant_tables(quality)
    qs = [ql] + [qc] * (ncomp - 1)
    comp_class = [0] + [1] * (ncomp - 1)
    seqs, grids, _mcux, _mcuy = _mcu_sequences(planes, qs, samplings)
    bpm = [hi * vi for hi, vi in samplings]
    # non-interleaved AC scans cover only the component's TRUE block
    # grid (padding data units exist solely in interleaved scans)
    geo = _comp_geometry(
        (h, w, ncomp),
        [(ci, hi, vi, 0) for ci, (hi, vi) in enumerate(samplings)],
    )[4]
    zz_comps = []
    for ci, grid in enumerate(grids):
        g = geo[ci]
        zz_comps.append(
            [grid[by, bx] for by in range(g["bhc"]) for bx in range(g["bwc"])]
        )

    out = bytearray(b"\xff\xd8")  # SOI
    for tq, q in enumerate(qs[: 2 if ncomp > 1 else 1]):
        payload = bytes([tq]) + bytes(int(q.flatten()[_ZZ][i]) for i in range(64))
        out += b"\xff\xdb" + struct.pack(">H", 2 + len(payload)) + payload
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        hi, vi = samplings[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, (0 if ci == 0 else 1) if ncomp > 1 else 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof  # SOF2

    all_comps = list(range(ncomp))
    scans: list[tuple] = [("dc_first", all_comps, 0, 0, 0, 1)]
    for ci in range(ncomp):
        scans.append(("ac_first", [ci], 1, 5, 0, 1))
        scans.append(("ac_first", [ci], 6, 63, 0, 1))
    scans.append(("dc_refine", all_comps, 0, 0, 1, 0))
    for ci in range(ncomp):
        scans.append(("ac_refine", [ci], 1, 5, 1, 0))
        scans.append(("ac_refine", [ci], 6, 63, 1, 0))

    for kind, comp_ids, ss, se, ah, al in scans:
        if kind == "dc_first":
            ops, syms = _prog_dc_first_ops(seqs, comp_class, bpm, al)
            tc = 0
        elif kind == "dc_refine":
            ops, syms = _prog_dc_refine_ops(seqs, bpm, al)
            tc = 0
        else:
            ci = comp_ids[0]
            fn = _prog_ac_first_ops if kind == "ac_first" else _prog_ac_refine_ops
            ops, syms = fn(zz_comps[ci], comp_class[ci], ss, se, al)
            tc = 1
        # per-scan DHT for the classes this scan actually codes
        codes: dict[tuple[int, int], dict] = {}
        for cls in (0, 1):
            if not syms.get(cls):
                continue
            bits, vals = _fixed9_table(sorted(syms[cls]))
            payload = bytes([(tc << 4) | cls]) + bytes(bits) + bytes(vals)
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload
            codes[(tc, cls)] = {
                s: (lc, code)
                for (lc, code), s in _build_decode_map(bits, vals).items()
            }
        sos = bytes([len(comp_ids)])
        for ci in comp_ids:
            cls = comp_class[ci] if ncomp > 1 else 0
            sos += bytes([ci + 1, (cls << 4) if tc == 0 else cls])
        sos += bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        wtr = _BitWriter()
        for op in ops:
            if op[0] == "s":
                _, cls, tcl, sym = op
                lc, code = codes[(tcl, cls)][sym]
                wtr.write(code, lc)
            else:
                _, val, n = op
                wtr.write(val, n)
        out += wtr.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """Decode JPEG bytes to HxW (greyscale) or HxWx3 (RGB) uint8:
    baseline sequential (SOF0, honoring DRI restart intervals,
    interleaved or one-component-per-scan) and progressive (SOF2,
    spectral selection + successive approximation, T.81 Annex G) —
    both with arbitrary sampling factors (4:4:4 / 4:2:2 / 4:2:0 /
    anything T.81 A.1.1 allows, chroma upsampled nearest-neighbor).
    Raises ValueError on malformed streams and NotImplementedError on
    the remaining non-supported features (arithmetic coding,
    hierarchical).  Fuzz contract (pytest-pinned): NO other exception
    type escapes, however corrupt the bytes."""
    try:
        return _decode_baseline_jpeg(data)
    except (IndexError, KeyError, struct.error, OverflowError) as exc:
        # truncated segments / dangling table refs / corrupt huffman
        # tables driving coefficients past int64 surface as the
        # documented malformed-stream error, never a raw crash
        raise ValueError(f"malformed JPEG stream: {exc!r}") from exc


def _find_next_marker(data: bytes, pos: int) -> int:
    """Index of the 0xFF that starts the next true marker at/after
    ``pos``, skipping entropy-coded bytes, stuffed 0xFF00, RSTn, and
    0xFF fill runs (T.81 B.1.1.2)."""
    while pos < len(data) - 1:
        if data[pos] != 0xFF:
            pos += 1
            continue
        nxt = data[pos + 1]
        if nxt == 0x00 or 0xD0 <= nxt <= 0xD7:  # stuffing / restart
            pos += 2
            continue
        if nxt == 0xFF:  # fill byte: last 0xFF of the run is the prefix
            pos += 1
            continue
        return pos
    raise ValueError("truncated stream (no terminating marker)")


def _comp_geometry(frame, comps):
    """Per-component block geometry under T.81 A.1.1: the MCU grid
    comes from the max sampling factors; component i covers
    ceil(w*hi/hmax) x ceil(h*vi/vmax) samples.  Returns (hmax, vmax,
    mcux, mcuy, {cid: dict}) where each dict carries the sampling
    factors, the component's true sample dims (wc, hc), its coded
    block grid (bwc, bhc) for non-interleaved scans, and the padded
    interleaved grid (bw, bh) = MCU grid x sampling."""
    h, w, _ = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    geo = {}
    for cid, hi, vi, _tq in comps:
        wc = (w * hi + hmax - 1) // hmax
        hc = (h * vi + vmax - 1) // vmax
        geo[cid] = {
            "hi": hi, "vi": vi, "wc": wc, "hc": hc,
            "bwc": (wc + 7) // 8, "bhc": (hc + 7) // 8,
            "bw": mcux * hi, "bh": mcuy * vi,
        }
    return hmax, vmax, mcux, mcuy, geo


def _decode_baseline_jpeg(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    scanned = False
    restart_interval = 0
    comps: list[tuple[int, int, int, int]] = []  # (comp_id, hi, vi, quant id)
    coefs: dict[int, np.ndarray] | None = None  # cid -> (bh, bw, 64) zigzag
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("expected marker")
        # spec-legal 0xFF fill/padding bytes may precede any marker
        # (ITU T.81 B.1.1.2) — skip runs of 0xFF before the marker byte
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(data):  # stream truncated inside a fill run
            raise ValueError("truncated stream")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            if scanned and coefs is not None:
                return _reconstruct(frame, comps, coefs, qtables)
            raise ValueError("no scan data before EOI")
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly multiple tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables not baseline")
                vals = np.frombuffer(seg[p + 1 : p + 65], dtype=np.uint8).astype(np.float64)
                t = np.zeros(64)
                t[_ZZ] = vals
                qtables[tq] = t.reshape(8, 8)
                p += 65
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            precision, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if precision != 8:
                raise ValueError("only 8-bit precision")
            comps = []
            for ci in range(ncomp):
                cid, sampling, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = sampling >> 4, sampling & 0x0F
                if not (1 <= hi <= 4 and 1 <= vi <= 4):
                    raise ValueError("invalid sampling factors")
                comps.append((cid, hi, vi, tq))
            frame = (h, w, ncomp)
            progressive = marker == 0xC2
            _, _, _, _, geo = _comp_geometry(frame, comps)
            coefs = {
                cid: np.zeros((geo[cid]["bh"], geo[cid]["bw"], 64), dtype=np.int64)
                for cid, _, _, _ in comps
            }
        elif marker in (0xC1, 0xC3, 0xC9, 0xCA):
            raise NotImplementedError("non-baseline JPEG (arithmetic/hierarchical)")
        elif marker == 0xC4:  # DHT (possibly multiple tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                htables[(tc, th)] = _build_decode_map(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI (last one before SOS wins)
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for ci in range(ns):
                cid, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                if cid not in coefs:
                    raise ValueError("scan references unknown component")
                scan.append((cid, tt >> 4, tt & 0x0F))
            entropy_start = pos + seglen
            if not progressive:
                _decode_sequential_scan(
                    data, entropy_start, frame, comps, scan, htables, coefs,
                    restart_interval,
                )
            else:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                _decode_progressive_scan(
                    data, entropy_start, frame, comps, scan, htables, coefs,
                    ss, se, ahal >> 4, ahal & 0x0F, restart_interval,
                )
            scanned = True
            pos = _find_next_marker(data, entropy_start)
            continue
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("no SOS marker found")


def _decode_block(reader, dc_tab, ac_tab, prev_dc: int, zz: np.ndarray) -> int:
    """One sequential data unit (T.81 F.2.2) into ``zz`` (a zigzag
    int64 view); returns the new DC predictor."""
    size = _huff_decode(reader, dc_tab)
    if size > 15:  # T.81 F.1.2.1.1: DC magnitude category is 0..11
        raise ValueError("invalid DC size category")
    diff = _extend(reader.read_bits(size), size) if size else 0
    dc = prev_dc + diff
    zz[0] = dc
    k = 1
    while k < 64:
        sym = _huff_decode(reader, ac_tab)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            k += 16
            continue
        run, s = sym >> 4, sym & 0x0F
        k += run
        if k > 63:
            raise ValueError("AC run overflow")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    return dc


def _decode_sequential_scan(
    data, start, frame, comps, scan, htables, coefs, restart_interval=0
) -> None:
    """One baseline scan into the coefficient store: interleaved
    (ns > 1: MCU = hi x vi data units per component, T.81 A.2.3) or
    non-interleaved (ns == 1: the component's own block grid)."""
    _, _, mcux, mcuy, geo = _comp_geometry(frame, comps)
    reader = _BitReader(data[start:])
    if len(scan) == 1:
        cid, td, ta = scan[0]
        g = geo[cid]
        dc_tab, ac_tab = htables[(0, td)], htables[(1, ta)]
        store = coefs[cid]
        prev = 0
        bwc = g["bwc"]
        for m in range(bwc * g["bhc"]):
            if restart_interval and m and m % restart_interval == 0:
                reader.sync_restart((m // restart_interval - 1) % 8)
                prev = 0
            prev = _decode_block(reader, dc_tab, ac_tab, prev, store[m // bwc, m % bwc])
        return
    prev_dc = {cid: 0 for cid, _, _ in scan}
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            reader.sync_restart((m // restart_interval - 1) % 8)
            prev_dc = {cid: 0 for cid, _, _ in scan}
        my, mx = m // mcux, m % mcux
        for cid, td, ta in scan:
            g = geo[cid]
            dc_tab, ac_tab = htables[(0, td)], htables[(1, ta)]
            for v in range(g["vi"]):
                for hh in range(g["hi"]):
                    prev_dc[cid] = _decode_block(
                        reader, dc_tab, ac_tab, prev_dc[cid],
                        coefs[cid][my * g["vi"] + v, mx * g["hi"] + hh],
                    )


def _decode_progressive_scan(
    data, start, frame, comps, scan, htables, coefs, ss, se, ah, al,
    restart_interval=0,
) -> None:
    """One progressive scan (T.81 G.2) accumulated into ``coefs``:
    DC first/refine (interleaved over MCUs when ns > 1, else the
    component's own grid), AC first/refine (single-component per
    spec, over that component's block grid).  The successive-
    approximation refinement follows the spec's signed-coefficient
    bit semantics: stored values are always sign * (approximated
    magnitude), so ``value & (1 << al)`` tests bit ``al`` of the
    magnitude for every reachable state."""
    _, _, mcux, mcuy, geo = _comp_geometry(frame, comps)
    reader = _BitReader(data[start:])
    p1 = 1 << al

    if ss == 0:  # DC scan (se must be 0)
        if se != 0:
            raise ValueError("DC scan with Se != 0")

        def dc_unit(cid, td, by, bx):
            if ah == 0:  # first DC scan: huffman diffs of DC >> al
                size = _huff_decode(reader, htables[(0, td)])
                diff = _extend(reader.read_bits(size), size) if size else 0
                prev_dc[cid] += diff
                coefs[cid][by, bx, 0] = prev_dc[cid] << al
            else:  # refinement: one raw bit per block
                if reader.read_bit():
                    coefs[cid][by, bx, 0] |= p1

        prev_dc = {cid: 0 for cid, _, _ in scan}
        if len(scan) == 1:  # non-interleaved: the component's grid
            cid, td, _ta = scan[0]
            g = geo[cid]
            bwc = g["bwc"]
            for m in range(bwc * g["bhc"]):
                if restart_interval and m and m % restart_interval == 0:
                    reader.sync_restart((m // restart_interval - 1) % 8)
                    prev_dc = {cid: 0}
                dc_unit(cid, td, m // bwc, m % bwc)
            return
        for m in range(mcux * mcuy):  # interleaved MCU order
            if restart_interval and m and m % restart_interval == 0:
                reader.sync_restart((m // restart_interval - 1) % 8)
                prev_dc = {cid: 0 for cid, _, _ in scan}
            my, mx = m // mcux, m % mcux
            for cid, td, _ta in scan:
                g = geo[cid]
                for v in range(g["vi"]):
                    for hh in range(g["hi"]):
                        dc_unit(cid, td, my * g["vi"] + v, mx * g["hi"] + hh)
        return

    # AC scan: exactly one component (T.81 G.1.1.1.1)
    if len(scan) != 1:
        raise ValueError("progressive AC scan must be single-component")
    cid, _td, ta = scan[0]
    ac_tab = htables[(1, ta)]
    plane = coefs[cid]
    eobrun = 0
    g = geo[cid]
    bw = g["bwc"]
    n_blocks = bw * g["bhc"]
    for m in range(n_blocks):
        if restart_interval and m and m % restart_interval == 0:
            reader.sync_restart((m // restart_interval - 1) % 8)
            eobrun = 0
        by, bx = m // bw, m % bw
        blk = plane[by, bx]
        if ah == 0:  # first scan for this band
            if eobrun:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = _huff_decode(reader, ac_tab)
                r, s = sym >> 4, sym & 0x0F
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) + (reader.read_bits(r) if r else 0) - 1
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    raise ValueError("AC run overflow")
                blk[k] = _extend(reader.read_bits(s), s) << al
                k += 1
        else:  # refinement scan
            m1 = -p1
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = _huff_decode(reader, ac_tab)
                    r, s = sym >> 4, sym & 0x0F
                    newval = 0
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) + (reader.read_bits(r) if r else 0)
                            break  # rest of block corrected below
                        # r == 15: skip 16 zero-history coefficients
                    else:
                        if s != 1:
                            raise ValueError("invalid refinement symbol")
                        newval = p1 if reader.read_bit() else m1
                    while k <= se:
                        cur = int(blk[k])
                        if cur != 0:
                            if reader.read_bit() and (cur & p1) == 0:
                                blk[k] = cur + (p1 if cur >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if k > se:
                        if s:
                            raise ValueError("AC refinement overflow")
                        break
                    if s:
                        blk[k] = newval
                    k += 1  # past the placed / 16th-skipped position
            if eobrun > 0:
                # correction bits for the remaining coefficients of
                # this block, then count it against the run
                while k <= se:
                    cur = int(blk[k])
                    if cur != 0:
                        if reader.read_bit() and (cur & p1) == 0:
                            blk[k] = cur + (p1 if cur >= 0 else m1)
                    k += 1
                eobrun -= 1


def _reconstruct(frame, comps, coefs, qtables) -> np.ndarray:
    """Coefficient store -> image: per-component dequant + IDCT over
    the component's coded grid, crop to its true sample dims, then
    nearest-neighbor upsample to frame resolution (T.81 leaves the
    upsampling filter to the decoder; nearest is the deterministic
    choice a bit-reproducible pipeline wants)."""
    h, w, ncomp = frame
    hmax, vmax, _, _, geo = _comp_geometry(frame, comps)
    planes = []
    for cid, hi, vi, tq in comps:
        q = qtables[tq]
        g = geo[cid]
        store = coefs[cid]
        plane = np.zeros((g["bhc"] * 8, g["bwc"] * 8))
        for by in range(g["bhc"]):
            for bx in range(g["bwc"]):
                coef = np.zeros(64)
                coef[_ZZ] = store[by, bx]
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = _dequant_idct(
                    coef.reshape(8, 8), q
                )
        if hi == hmax and vi == vmax:
            plane = plane[:h, :w]
        else:
            rows = np.minimum((np.arange(h) * vi) // vmax, g["hc"] - 1)
            cols = np.minimum((np.arange(w) * hi) // hmax, g["wc"] - 1)
            plane = plane[rows][:, cols]
        planes.append(plane)
    if ncomp == 1:
        return planes[0].astype(np.uint8)
    return _ycbcr_to_rgb(planes[0], planes[1], planes[2])
