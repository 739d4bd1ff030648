"""Pure-Python ISO BMFF (MP4/MOV) container demuxer.

Closes the container half of the video gate (reference parity:
multimodal video columns, SURVEY §2.10): an MP4's *structure* —
box tree, track metadata, and the full sample tables — is plain
parsing (ISO/IEC 14496-12), no codec needed.  What a 100 TB curation
pipeline needs from video BEFORE any decode is exactly this layer:

- typed metadata (dims / duration / codec fourcc / fps) for filtering
  and stats — ``parse_mp4``;
- frame-accurate access-unit extraction (byte ranges + timestamps +
  keyframe flags from stts/stsz/stsc/stco/stss) so uniformly-spaced
  coded samples can be cut out and handed to an external decoder
  service — ``mp4_sample_table`` / ``extract_mp4_samples``.

The *pixel* decode (H.264/H.265/AV1 entropy + transform) genuinely
needs ffmpeg, which is not in this container; that single step stays
gated, with the demux output shaped so a decode UDF slots in front of
it unchanged.

Fragmented MP4 (moof/mdat movie fragments — the DASH/CMAF/HLS
delivery framing) demuxes natively since round 8: trex defaults
(§8.8.3), tfhd per-fragment overrides incl. base-data-offset /
default-base-is-moof (§8.8.7), tfdt decode-time anchoring (§8.8.12),
and multi-trun expansion with implicit offset chaining (§8.8.8) all
feed the same (offset, size, dts_ms, keyframe) table as the
progressive path; keyframes come from the sample_is_non_sync_sample
flag bit instead of stss.  ``build_mp4_fragmented`` is the
structural-inverse muxer certifying it.

Scale: parsing touches only the moov box (a few hundred KB even for
hour-long movies); sample extraction slices exact byte ranges from
the payload already in memory — no quadratic or full-scan behavior
anywhere.  All tables expand vectorized in numpy.

Error contract (mirrors jpeg.py/png.py, pytest-pinned): malformed
streams raise ValueError, unsupported features NotImplementedError —
no other exception escapes ``parse_mp4``/``extract_mp4_samples``.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "parse_mp4",
    "mp4_sample_table",
    "extract_mp4_samples",
    "build_mp4",
    "build_mp4_fragmented",
]


# ---------------------------------------------------------------------------
# box walking
# ---------------------------------------------------------------------------

def _boxes(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) for the box
    sequence in data[start:end] (ISO 14496-12 §4.2: 32-bit size,
    size==1 -> 64-bit largesize, size==0 -> extends to end)."""
    pos = start
    while pos + 8 <= end:
        (size,), fourcc = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError("malformed box size")
        yield fourcc, pos + hdr, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, fourcc: bytes):
    for fc, s, e in _boxes(data, start, end):
        if fc == fourcc:
            return s, e
    return None


def _fullbox(data: bytes, start: int) -> tuple[int, int]:
    """(version, flags) of a full box; payload begins at start+4."""
    if start + 4 > len(data):
        raise ValueError("truncated full-box header")
    v = data[start]
    flags = int.from_bytes(data[start + 1 : start + 4], "big")
    return v, flags


def _rd(data: bytes, pos: int, k: int, end: int) -> bytes:
    """Bounds-checked payload read: the k bytes at pos must sit inside
    the enclosing box (… end).  Fuzzed/truncated streams otherwise walk
    struct.unpack off the buffer (struct.error, not the documented
    ValueError) or silently read the next box's bytes."""
    if pos + k > end:
        raise ValueError("truncated box payload")
    return data[pos : pos + k]


# ---------------------------------------------------------------------------
# movie fragments (§8.8): trex defaults + moof/traf/trun expansion
# ---------------------------------------------------------------------------

def _trex_defaults(data: bytes, ms: int, me: int) -> dict[int, tuple[int, int, int, int]]:
    """mvex/trex records: track_id -> (sample_description_index,
    default_duration, default_size, default_flags)."""
    out: dict[int, tuple[int, int, int, int]] = {}
    mvex = _find(data, ms, me, b"mvex")
    if not mvex:
        return out
    for fc, s, e in _boxes(data, mvex[0], mvex[1]):
        if fc == b"trex":
            tid, sdi, dur, size, flags = struct.unpack(">IIIII", _rd(data, s + 4, 20, e))
            out[tid] = (sdi, dur, size, flags)
    return out


def _scan_fragments(data: bytes) -> dict[int, dict]:
    """Walk every moof in file order and expand its truns.  Returns
    per-track ``{"offsets", "sizes", "durations", "dts"}`` int64
    arrays plus ``"nonsync"`` bool — the fragment-run equivalent of
    the stbl tables.  DTS anchors on tfdt where present (§8.8.12),
    else continues cumulatively from the previous fragment."""
    top = list(_boxes(data, 0, len(data)))
    moov = next(((s, e) for fc, s, e in top if fc == b"moov"), None)
    trex = _trex_defaults(data, *moov) if moov else {}
    acc: dict[int, dict] = {}
    next_dts: dict[int, int] = {}

    # re-walk top level tracking BOX starts (default-base-is-moof
    # measures from the first byte of the moof box header, §8.8.7)
    pos = 0
    while pos + 8 <= len(data):
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        fourcc = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            (size,) = struct.unpack(">Q", _rd(data, pos + 8, 8, len(data)))
            hdr = 16
        elif size == 0:
            size = len(data) - pos
        if size < hdr or pos + size > len(data):
            raise ValueError("malformed box size")
        if fourcc == b"moof":
            _expand_moof(data, pos, pos + hdr, pos + size, trex, acc, next_dts)
        pos += size

    for tid, a in acc.items():
        for k in ("offsets", "sizes", "durations", "dts"):
            a[k] = (
                np.concatenate(a[k]).astype(np.int64)
                if a[k]
                else np.empty(0, np.int64)
            )
        a["nonsync"] = (
            np.concatenate(a["nonsync"]).astype(bool)
            if a["nonsync"]
            else np.empty(0, bool)
        )
    return acc


def _expand_moof(
    data: bytes,
    moof_start: int,
    ps: int,
    pe: int,
    trex: dict,
    acc: dict,
    next_dts: dict,
) -> None:
    implicit_base = moof_start  # chained to each traf's data end (§8.8.7)
    for fc, ts, te in _boxes(data, ps, pe):
        if fc != b"traf":
            continue
        th = _find(data, ts, te, b"tfhd")
        if not th:
            raise ValueError("traf without tfhd")
        _v, tf_flags = _fullbox(data, th[0])
        the = th[1]
        p = th[0] + 4
        (tid,) = struct.unpack(">I", _rd(data, p, 4, the))
        p += 4
        base_offset = None
        if tf_flags & 0x1:  # base-data-offset-present
            (base_offset,) = struct.unpack(">Q", _rd(data, p, 8, the))
            p += 8
        if tf_flags & 0x2:  # sample-description-index
            p += 4
        def_dur, def_size, def_flags = trex.get(tid, (0, 0, 0, 0))[1:4]
        if tf_flags & 0x8:
            (def_dur,) = struct.unpack(">I", _rd(data, p, 4, the))
            p += 4
        if tf_flags & 0x10:
            (def_size,) = struct.unpack(">I", _rd(data, p, 4, the))
            p += 4
        if tf_flags & 0x20:
            (def_flags,) = struct.unpack(">I", _rd(data, p, 4, the))
            p += 4
        if base_offset is None:
            base_offset = moof_start if tf_flags & 0x20000 else implicit_base
        if base_offset > len(data):
            raise ValueError("tfhd base-data-offset past end of file")

        a = acc.setdefault(
            tid, {"offsets": [], "sizes": [], "durations": [], "dts": [], "nonsync": []}
        )
        dts = next_dts.get(tid, 0)
        td = _find(data, ts, te, b"tfdt")
        if td:
            v, _ = _fullbox(data, td[0])
            dts = (
                struct.unpack(">Q", _rd(data, td[0] + 4, 8, td[1]))[0]
                if v == 1
                else struct.unpack(">I", _rd(data, td[0] + 4, 4, td[1]))[0]
            )
        # the tick→ms conversion computes dts * 1000 in int64, so the
        # guard must trip BELOW 2^63/1000 (a 2^53..2^62 tfdt would pass
        # a 2^62 guard yet silently wrap the multiply)
        if dts > (1 << 62) // 1000:
            raise ValueError("implausible tfdt decode time")

        run_pos = None  # implicit trun offset: end of previous run (§8.8.8)
        for rc, rs, re_ in _boxes(data, ts, te):
            if rc != b"trun":
                continue
            _rv, rflags = _fullbox(data, rs)
            q = rs + 4
            (n,) = struct.unpack(">I", _rd(data, q, 4, re_))
            q += 4
            if rflags & 0x1:
                (doff,) = struct.unpack(">i", _rd(data, q, 4, re_))
                q += 4
                run_pos = base_offset + doff
            elif run_pos is None:
                run_pos = base_offset
            if run_pos < 0:
                raise ValueError("negative trun data offset")
            first_flags = None
            if rflags & 0x4:
                (first_flags,) = struct.unpack(">I", _rd(data, q, 4, re_))
                q += 4

            # per-sample field matrix (§8.8.8 optional-field order);
            # vectorized: a trun in a long movie carries thousands of rows
            fields = [f for f in (0x100, 0x200, 0x400, 0x800) if rflags & f]
            if fields:
                if q + 4 * len(fields) * n > re_:
                    raise ValueError("trun sample array overruns its box")
                mat = np.frombuffer(
                    data, ">u4", count=n * len(fields), offset=q
                ).reshape(n, len(fields)).astype(np.int64)
            col = {f: i for i, f in enumerate(fields)}
            if n and not (rflags & 0x200) and def_size == 0:
                raise ValueError("trun sample without size or trex/tfhd default")
            if not (rflags & 0x200) and n * def_size > len(data):
                raise ValueError("implausible trun sample count")
            durs = mat[:, col[0x100]] if 0x100 in col else np.full(n, def_dur, np.int64)
            sizes = mat[:, col[0x200]] if 0x200 in col else np.full(n, def_size, np.int64)
            sfl = mat[:, col[0x400]] if 0x400 in col else np.full(n, def_flags, np.int64)
            if n and first_flags is not None:
                sfl = sfl.copy()
                sfl[0] = first_flags
            a["offsets"].append(run_pos + np.concatenate([[0], np.cumsum(sizes[:-1])]) if n else np.empty(0, np.int64))
            a["sizes"].append(sizes)
            a["durations"].append(durs)
            a["dts"].append(dts + np.concatenate([[0], np.cumsum(durs[:-1])]) if n else np.empty(0, np.int64))
            a["nonsync"].append((sfl >> 16) & 1)
            run_pos += int(sizes.sum())
            dts += int(durs.sum())
            implicit_base = max(implicit_base, run_pos)
        next_dts[tid] = dts


# ---------------------------------------------------------------------------
# parse
# ---------------------------------------------------------------------------

def parse_mp4(data: bytes) -> dict:
    """Container metadata + per-track sample-table summaries.

    Returns ``{"brand", "duration_ms", "tracks": [...]}`` where each
    track dict carries ``track_id, handler ('vide'/'soun'/...), codec
    (sample-entry fourcc), timescale, duration_ms, n_samples``, plus
    ``width/height`` (visual) or ``channels/sample_rate`` (audio) and
    ``fps`` (visual, from the stts average) when derivable."""
    try:
        return _parse_mp4(data)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed MP4 stream: {exc!r}") from exc


def _parse_mp4(data: bytes) -> dict:
    top = list(_boxes(data, 0, len(data)))
    fourccs = [fc for fc, _, _ in top]
    if b"ftyp" not in fourccs:
        raise ValueError("not an MP4 (no ftyp box)")
    fs, fe = next((s, e) for fc, s, e in top if fc == b"ftyp")
    brand = data[fs : fs + 4].decode("latin-1")
    moov = next(((s, e) for fc, s, e in top if fc == b"moov"), None)
    if moov is None:
        raise ValueError("no moov box")
    ms, me = moov

    duration_ms = None
    mv = _find(data, ms, me, b"mvhd")
    if mv:
        v, _ = _fullbox(data, mv[0])
        if v == 1:
            timescale, duration = struct.unpack(">IQ", data[mv[0] + 20 : mv[0] + 32])
        else:
            timescale, duration = struct.unpack(">II", data[mv[0] + 12 : mv[0] + 20])
        if timescale:
            duration_ms = int(duration * 1000 / timescale)

    tracks = []
    for fc, ts_, te_ in _boxes(data, ms, me):
        if fc != b"trak":
            continue
        tracks.append(_parse_trak(data, ts_, te_))

    if b"moof" in fourccs:
        # fragmented: stbl tables are empty; counts/fps/durations come
        # from the trun expansion, total duration from mehd if present
        frag = _scan_fragments(data)
        mvex = _find(data, ms, me, b"mvex")
        if (not duration_ms) and mvex:
            mh = _find(data, mvex[0], mvex[1], b"mehd")
            if mh and mv:
                v, _ = _fullbox(data, mh[0])
                fdur = (
                    struct.unpack(">Q", data[mh[0] + 4 : mh[0] + 12])[0]
                    if v == 1
                    else struct.unpack(">I", data[mh[0] + 4 : mh[0] + 8])[0]
                )
                if timescale:
                    duration_ms = int(fdur * 1000 / timescale)
        for t in tracks:
            a = frag.get(t["track_id"])
            if a is None:
                continue
            t["n_samples"] += len(a["sizes"])
            tsc = t["timescale"]
            total = int(a["durations"].sum())
            if tsc and total:
                if not t["duration_ms"]:
                    t["duration_ms"] = int(total * 1000 / tsc)
                if t["handler"] == "vide" and t["fps"] is None:
                    t["fps"] = round(len(a["sizes"]) * tsc / total, 3)
    return {"brand": brand, "duration_ms": duration_ms, "tracks": tracks}


def _parse_trak(data: bytes, ts: int, te: int) -> dict:
    out: dict = {
        "track_id": None, "handler": None, "codec": None,
        "timescale": None, "duration_ms": None, "n_samples": 0,
        "width": None, "height": None, "channels": None,
        "sample_rate": None, "fps": None,
    }
    tk = _find(data, ts, te, b"tkhd")
    if tk:
        v, _ = _fullbox(data, tk[0])
        off = tk[0] + 4
        out["track_id"] = struct.unpack(
            ">I", data[off + (16 if v == 1 else 8) : off + (20 if v == 1 else 12)]
        )[0]
        # width/height: 16.16 fixed, last 8 bytes of the box
        w_fx, h_fx = struct.unpack(">II", data[tk[1] - 8 : tk[1]])
        if w_fx and h_fx:
            out["width"], out["height"] = w_fx >> 16, h_fx >> 16

    mdia = _find(data, ts, te, b"mdia")
    if not mdia:
        return out
    md = _find(data, mdia[0], mdia[1], b"mdhd")
    if md:
        v, _ = _fullbox(data, md[0])
        if v == 1:
            timescale, duration = struct.unpack(">IQ", data[md[0] + 20 : md[0] + 32])
        else:
            timescale, duration = struct.unpack(">II", data[md[0] + 12 : md[0] + 20])
        out["timescale"] = timescale
        if timescale:
            out["duration_ms"] = int(duration * 1000 / timescale)
    hd = _find(data, mdia[0], mdia[1], b"hdlr")
    if hd:
        out["handler"] = data[hd[0] + 8 : hd[0] + 12].decode("latin-1")

    minf = _find(data, mdia[0], mdia[1], b"minf")
    stbl = minf and _find(data, minf[0], minf[1], b"stbl")
    if not stbl:
        return out
    sd = _find(data, stbl[0], stbl[1], b"stsd")
    if sd:
        # full box (4) + entry_count (4), then the first sample entry
        entry = sd[0] + 8
        out["codec"] = data[entry + 4 : entry + 8].decode("latin-1")
        body = entry + 8  # past size+fourcc
        if out["handler"] == "vide":
            # VisualSampleEntry: 6 reserved + 2 dri + 16 predefined,
            # then width(2) height(2)
            w, h = struct.unpack(">HH", data[body + 24 : body + 28])
            out["width"], out["height"] = w, h
        elif out["handler"] == "soun":
            # AudioSampleEntry: 6 reserved + 2 dri + 8 reserved, then
            # channelcount(2) samplesize(2) predef(2) reserved(2)
            # samplerate(4, 16.16)
            out["channels"] = struct.unpack(">H", data[body + 16 : body + 18])[0]
            out["sample_rate"] = struct.unpack(">I", data[body + 24 : body + 28])[0] >> 16
    sz = _find(data, stbl[0], stbl[1], b"stsz")
    if sz:
        out["n_samples"] = struct.unpack(">I", data[sz[0] + 8 : sz[0] + 12])[0]
    st = _find(data, stbl[0], stbl[1], b"stts")
    if st and out["timescale"] and out["handler"] == "vide":
        n_entries = struct.unpack(">I", data[st[0] + 4 : st[0] + 8])[0]
        raw = np.frombuffer(
            data[st[0] + 8 : st[0] + 8 + 8 * n_entries], dtype=">u4"
        ).reshape(-1, 2)
        total_delta = int((raw[:, 0].astype(np.int64) * raw[:, 1]).sum())
        n = int(raw[:, 0].sum())
        if total_delta:
            out["fps"] = round(n * out["timescale"] / total_delta, 3)
    return out


# ---------------------------------------------------------------------------
# sample tables
# ---------------------------------------------------------------------------

def mp4_sample_table(data: bytes, track_id: int | None = None) -> dict:
    """Per-sample (offset, size, dts_ms, keyframe) arrays for one
    track (default: the first video track, else the first track).

    Expands stts (+deltas -> cumulative DTS), stsz (sizes),
    stsc x stco/co64 (chunk layout -> absolute file offsets) and stss
    (sync samples; absent = every sample is a keyframe, §8.6.2) —
    all vectorized.  Returns ``{"track_id", "codec", "offsets",
    "sizes", "dts_ms", "keyframe"}`` (numpy arrays)."""
    try:
        return _sample_table(data, track_id)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"malformed MP4 stream: {exc!r}") from exc


def _pick_trak(data: bytes, track_id: int | None):
    top = list(_boxes(data, 0, len(data)))
    moov = next(((s, e) for fc, s, e in top if fc == b"moov"), None)
    if moov is None:
        raise ValueError("no moov box")
    chosen = None
    for fc, ts, te in _boxes(data, moov[0], moov[1]):
        if fc != b"trak":
            continue
        info = _parse_trak(data, ts, te)
        if track_id is not None:
            if info["track_id"] == track_id:
                return ts, te, info
        elif info["handler"] == "vide":
            return ts, te, info
        elif chosen is None:
            chosen = (ts, te, info)
    if track_id is not None:
        raise ValueError(f"no track with id {track_id}")
    if chosen is None:
        raise ValueError("no trak box")
    return chosen


def _sample_table(data: bytes, track_id: int | None) -> dict:
    ts, te, info = _pick_trak(data, track_id)
    frag = None
    if any(fc == b"moof" for fc, _, _ in _boxes(data, 0, len(data))):
        frag = _scan_fragments(data).get(info["track_id"])
    mdia = _find(data, ts, te, b"mdia")
    minf = mdia and _find(data, mdia[0], mdia[1], b"minf")
    stbl = minf and _find(data, minf[0], minf[1], b"stbl")
    if not stbl:
        raise ValueError("trak without stbl")
    if frag is not None:
        sz_box = _find(data, stbl[0], stbl[1], b"stsz")
        # stsz payload: version/flags(4) + uniform_size(4) + count(4)
        moov_count = (
            struct.unpack(">I", data[sz_box[0] + 8 : sz_box[0] + 12])[0] if sz_box else 0
        )
        timescale = info["timescale"] or 1
        frag_table = {
            "track_id": info["track_id"],
            "codec": info["codec"],
            "offsets": frag["offsets"],
            "sizes": frag["sizes"],
            "dts_ms": (frag["dts"] * 1000 // timescale).astype(np.int64),
            "keyframe": ~frag["nonsync"],
        }
        if len(frag_table["sizes"]) and int(
            (frag_table["offsets"] + frag_table["sizes"]).max()
        ) > len(data):
            raise ValueError("fragment sample extends past end of file")
        if moov_count == 0:
            return frag_table
        prog = _stbl_table(data, stbl, info)  # §8.8: moov samples precede fragments
        return {
            "track_id": info["track_id"],
            "codec": info["codec"],
            "offsets": np.concatenate([prog["offsets"], frag_table["offsets"]]),
            "sizes": np.concatenate([prog["sizes"], frag_table["sizes"]]),
            "dts_ms": np.concatenate([prog["dts_ms"], frag_table["dts_ms"]]),
            "keyframe": np.concatenate([prog["keyframe"], frag_table["keyframe"]]),
        }
    return _stbl_table(data, stbl, info)


def _stbl_table(data: bytes, stbl: tuple[int, int], info: dict) -> dict:

    def full(fourcc):
        box = _find(data, stbl[0], stbl[1], fourcc)
        return box and (box[0] + 4, box[1])  # past version/flags

    # sizes
    sz = full(b"stsz")
    if not sz:
        raise ValueError("no stsz box")
    uniform, count = struct.unpack(">II", data[sz[0] : sz[0] + 8])
    if uniform and count * uniform > len(data):
        # distinct byte ranges can't outsize the file; a corrupt count
        # would otherwise drive a multi-GB np.full below
        raise ValueError("stsz claims more sample bytes than the file holds")
    if uniform:
        sizes = np.full(count, uniform, dtype=np.int64)
    else:
        sizes = np.frombuffer(
            data[sz[0] + 8 : sz[0] + 8 + 4 * count], dtype=">u4"
        ).astype(np.int64)
    if len(sizes) != count:
        raise ValueError("truncated stsz")

    # decode timestamps
    st = full(b"stts")
    if not st:
        raise ValueError("no stts box")
    (n_entries,) = struct.unpack(">I", data[st[0] : st[0] + 4])
    raw = np.frombuffer(
        data[st[0] + 4 : st[0] + 4 + 8 * n_entries], dtype=">u4"
    ).reshape(-1, 2).astype(np.int64)
    if len(raw) != n_entries:
        raise ValueError("truncated stts")
    if int(raw[:, 0].sum()) > count:
        # §8.6.1.2: stts entry counts sum to the sample count; more is
        # malformed (and a corrupt count would blow up the repeat)
        raise ValueError("stts covers more samples than stsz")
    deltas = np.repeat(raw[:, 1], raw[:, 0])
    if len(deltas) < count:  # tolerate short stts by extending the last delta
        pad = np.full(count - len(deltas), deltas[-1] if len(deltas) else 0, np.int64)
        deltas = np.concatenate([deltas, pad])
    dts = np.concatenate([[0], np.cumsum(deltas[: count - 1])]) if count else deltas[:0]
    timescale = info["timescale"] or 1
    dts_ms = (dts * 1000 // timescale).astype(np.int64)

    # chunk layout -> absolute offsets
    co = full(b"stco")
    width = 4
    if not co:
        co = full(b"co64")
        width = 8
    if not co:
        raise ValueError("no stco/co64 box")
    (n_chunks,) = struct.unpack(">I", data[co[0] : co[0] + 4])
    chunk_offsets = np.frombuffer(
        data[co[0] + 4 : co[0] + 4 + width * n_chunks],
        dtype=">u4" if width == 4 else ">u8",
    ).astype(np.int64)
    if len(chunk_offsets) != n_chunks:
        raise ValueError("truncated stco")
    sc = full(b"stsc")
    if not sc:
        raise ValueError("no stsc box")
    (n_sc,) = struct.unpack(">I", data[sc[0] : sc[0] + 4])
    screc = np.frombuffer(
        data[sc[0] + 4 : sc[0] + 4 + 12 * n_sc], dtype=">u4"
    ).reshape(-1, 3).astype(np.int64)
    if len(screc) != n_sc:
        raise ValueError("truncated stsc")
    # expand samples-per-chunk across the chunk list
    spc = np.zeros(n_chunks, dtype=np.int64)
    for i, (first, per, _sdi) in enumerate(screc):
        last = screc[i + 1][0] - 1 if i + 1 < len(screc) else n_chunks
        spc[int(first) - 1 : int(last)] = per
    if int(spc.sum()) < count:
        raise ValueError("stsc/stco cover fewer samples than stsz")
    # per-sample chunk index and within-chunk position; searchsorted
    # over the cumulative starts rather than materializing a repeat —
    # the last stsc run legitimately over-covers (partial final chunk),
    # and a corrupt samples-per-chunk would make the repeat huge
    starts = np.concatenate([[0], np.cumsum(spc)])
    chunk_of = np.searchsorted(starts, np.arange(count), side="right") - 1
    first_in_chunk = starts[:-1]
    # offset of sample s = chunk base + sum of sizes of earlier
    # samples in the same chunk
    csum = np.concatenate([[0], np.cumsum(sizes)])
    offsets = (
        chunk_offsets[chunk_of]
        + csum[np.arange(count)]
        - csum[first_in_chunk[chunk_of]]
    )
    if count and int((offsets + sizes).max()) > len(data):
        raise ValueError("sample extends past end of file")

    # keyframes
    key = np.ones(count, dtype=bool)
    ss = full(b"stss")
    if ss:
        (n_sync,) = struct.unpack(">I", data[ss[0] : ss[0] + 4])
        sync = np.frombuffer(
            data[ss[0] + 4 : ss[0] + 4 + 4 * n_sync], dtype=">u4"
        ).astype(np.int64)
        key = np.zeros(count, dtype=bool)
        key[sync[(sync >= 1) & (sync <= count)] - 1] = True

    return {
        "track_id": info["track_id"], "codec": info["codec"],
        "offsets": offsets, "sizes": sizes, "dts_ms": dts_ms,
        "keyframe": key,
    }


def extract_mp4_samples(
    data: bytes, indices, track_id: int | None = None
) -> list[tuple[int, int, bool, bytes]]:
    """Cut the raw coded access units at ``indices`` out of the
    payload: list of (sample_idx, dts_ms, keyframe, sample_bytes).
    The bytes are the track's coded samples exactly as stored (e.g.
    AVCC-framed H.264 NAL units) — decode-ready for an external
    codec, byte-exact for hashing/dedup without one."""
    t = mp4_sample_table(data, track_id)
    out = []
    for i in indices:
        i = int(i)
        if not 0 <= i < len(t["sizes"]):
            raise ValueError(f"sample index {i} out of range")
        off, size = int(t["offsets"][i]), int(t["sizes"][i])
        out.append((i, int(t["dts_ms"][i]), bool(t["keyframe"][i]), data[off : off + size]))
    return out


# ---------------------------------------------------------------------------
# minimal muxer (test fixtures + writing demux-verifiable outputs)
# ---------------------------------------------------------------------------

def _box(fourcc: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + fourcc + payload


def _full(fourcc: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(fourcc, bytes([version]) + flags.to_bytes(3, "big") + payload)


def build_mp4(tracks: list[dict], brand: bytes = b"isom") -> bytes:
    """Assemble a minimal progressive MP4 from track specs — the
    exact inverse of the demuxer, used by the pytest fixtures so the
    parser is certified against streams it did not itself misparse.

    Each track dict: ``samples`` (list[bytes]), ``handler``
    ('vide'/'soun'), ``codec`` (4-char str), ``timescale``,
    ``deltas`` (per-sample durations), optional ``width/height``,
    ``channels/sample_rate``, ``sync`` (1-based keyframe numbers),
    ``samples_per_chunk`` (default: all samples in one chunk)."""
    ftyp = _box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    # mdat first so chunk offsets are known before moov is sized
    payload = b"".join(b"".join(t["samples"]) for t in tracks)
    mdat = _box(b"mdat", payload)
    base = len(ftyp) + 8  # offset of first sample in file
    track_boxes = []
    mv_timescale = 1000
    mv_dur = 0
    for tid, t in enumerate(tracks, start=1):
        samples, deltas = t["samples"], t["deltas"]
        timescale = t["timescale"]
        dur = sum(deltas)
        mv_dur = max(mv_dur, int(dur * mv_timescale / timescale))
        spc = t.get("samples_per_chunk", len(samples)) or len(samples)
        sizes = [len(s) for s in samples]
        # chunk bases
        chunk_offsets, pos = [], base
        for ci in range(0, len(samples), spc):
            chunk_offsets.append(pos)
            pos += sum(sizes[ci : ci + spc])
        base = pos  # next track's samples follow in mdat

        tkhd = _full(
            b"tkhd", 0, 7,
            struct.pack(">II", 0, 0) + struct.pack(">I", tid)
            + struct.pack(">I", 0) + struct.pack(">I", int(dur * mv_timescale / timescale))
            + b"\0" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", (t.get("width") or 0) << 16, (t.get("height") or 0) << 16),
        )
        mdhd = _full(
            b"mdhd", 0, 0,
            struct.pack(">IIII", 0, 0, timescale, dur) + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _full(
            b"hdlr", 0, 0,
            struct.pack(">I", 0) + t["handler"].encode() + b"\0" * 12 + b"\0",
        )
        codec = t["codec"].encode("latin-1")
        if t["handler"] == "vide":
            entry_body = (
                b"\0" * 6 + struct.pack(">H", 1)  # dri
                + b"\0" * 16
                + struct.pack(">HH", t.get("width") or 0, t.get("height") or 0)
                + struct.pack(">II", 0x480000, 0x480000) + struct.pack(">I", 0)
                + struct.pack(">H", 1) + b"\0" * 32 + struct.pack(">Hh", 0x18, -1)
            )
        else:
            entry_body = (
                b"\0" * 6 + struct.pack(">H", 1)
                + b"\0" * 8
                + struct.pack(">HHHH", t.get("channels") or 2, 16, 0, 0)
                + struct.pack(">I", (t.get("sample_rate") or 44100) << 16)
            )
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _box(codec, entry_body))
        # run-length stts
        stts_entries = []
        for d in deltas:
            if stts_entries and stts_entries[-1][1] == d:
                stts_entries[-1][0] += 1
            else:
                stts_entries.append([1, d])
        stts = _full(
            b"stts", 0, 0,
            struct.pack(">I", len(stts_entries))
            + b"".join(struct.pack(">II", c, d) for c, d in stts_entries),
        )
        n_chunks = len(chunk_offsets)
        stsc = _full(
            b"stsc", 0, 0,
            struct.pack(">I", 1) + struct.pack(">III", 1, spc, 1),
        )
        stsz = _full(
            b"stsz", 0, 0,
            struct.pack(">II", 0, len(samples))
            + b"".join(struct.pack(">I", s) for s in sizes),
        )
        stco = _full(
            b"stco", 0, 0,
            struct.pack(">I", n_chunks)
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )
        stbl_children = stsd + stts + stsc + stsz + stco
        if t.get("sync") is not None:
            stbl_children += _full(
                b"stss", 0, 0,
                struct.pack(">I", len(t["sync"]))
                + b"".join(struct.pack(">I", s) for s in t["sync"]),
            )
        stbl = _box(b"stbl", stbl_children)
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        track_boxes.append(_box(b"trak", tkhd + mdia))
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, mv_timescale, mv_dur)
        + struct.pack(">I", 0x10000) + struct.pack(">H", 0x100) + b"\0" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\0" * 24 + struct.pack(">I", len(tracks) + 1),
    )
    moov = _box(b"moov", mvhd + b"".join(track_boxes))
    return ftyp + mdat + moov


# ---------------------------------------------------------------------------
# fragmented muxer (§8.8 structural inverse: moov+mvex, moof/mdat runs)
# ---------------------------------------------------------------------------

_SYNC_FLAGS = 0x02000000     # sample_depends_on = 2 (I-frame)
_NONSYNC_FLAGS = 0x01010000  # depends-on-others + sample_is_non_sync_sample


def _sample_entry(t: dict) -> bytes:
    codec = t["codec"].encode("latin-1")
    if t["handler"] == "vide":
        body = (
            b"\0" * 6 + struct.pack(">H", 1)
            + b"\0" * 16
            + struct.pack(">HH", t.get("width") or 0, t.get("height") or 0)
            + struct.pack(">II", 0x480000, 0x480000) + struct.pack(">I", 0)
            + struct.pack(">H", 1) + b"\0" * 32 + struct.pack(">Hh", 0x18, -1)
        )
    else:
        body = (
            b"\0" * 6 + struct.pack(">H", 1)
            + b"\0" * 8
            + struct.pack(">HHHH", t.get("channels") or 2, 16, 0, 0)
            + struct.pack(">I", (t.get("sample_rate") or 44100) << 16)
        )
    return _box(codec, body)


def build_mp4_fragmented(
    tracks: list[dict],
    fragments: list[list[dict]],
    brand: bytes = b"iso5",
    offset_mode: str = "moof",
) -> bytes:
    """Assemble a fragmented (DASH/CMAF-shaped) MP4: ftyp + moov with
    EMPTY sample tables + mvex/trex defaults, then one moof/mdat pair
    per fragment — the structural inverse of the §8.8 demux path, used
    by the pytest fixtures to certify it.

    ``tracks``: per-track metadata like :func:`build_mp4` minus
    ``samples``/``deltas`` (``handler, codec, timescale`` plus visual/
    audio fields), with optional ``default_duration`` / ``default_size``
    hoisted into trex so truns can omit per-sample fields.

    ``fragments``: list of fragments; each fragment is a list of traf
    specs ``{"track_id", "samples": [bytes], "deltas": [int],
    "sync": iterable of 0-based keyframe indices (default: all),
    "tfdt": int | None (decode time anchor; omitted when None),
    "runs": int (split into N truns; trun 2..N omit their data
    offset to exercise implicit §8.8.8 chaining)}``.

    ``offset_mode``: ``"moof"`` → tfhd sets default-base-is-moof and
    every first trun carries a moof-relative data offset; ``"base"`` →
    tfhd carries an explicit 64-bit base-data-offset and the first
    trun omits its offset (base fallback path).
    """
    if offset_mode not in ("moof", "base"):
        raise ValueError("offset_mode must be 'moof' or 'base'")
    mv_timescale = 1000

    # ---- moov: tracks with empty stbl tables + mvex/trex
    trak_boxes = b""
    trex_boxes = b""
    total_mv = 0
    for tid, t in enumerate(tracks, start=1):
        timescale = t["timescale"]
        tot = sum(
            sum(spec["deltas"])
            for frag in fragments
            for spec in frag
            if spec["track_id"] == tid
        )
        if timescale:
            total_mv = max(total_mv, int(tot * mv_timescale / timescale))
        tkhd = _full(
            b"tkhd", 0, 7,
            struct.pack(">II", 0, 0) + struct.pack(">I", tid)
            + struct.pack(">I", 0) + struct.pack(">I", 0)
            + b"\0" * 8 + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", (t.get("width") or 0) << 16, (t.get("height") or 0) << 16),
        )
        mdhd = _full(
            b"mdhd", 0, 0,
            struct.pack(">IIII", 0, 0, timescale, 0) + struct.pack(">HH", 0x55C4, 0),
        )
        hdlr = _full(
            b"hdlr", 0, 0,
            struct.pack(">I", 0) + t["handler"].encode() + b"\0" * 12 + b"\0",
        )
        stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + _sample_entry(t))
        stbl = _box(
            b"stbl",
            stsd
            + _full(b"stts", 0, 0, struct.pack(">I", 0))
            + _full(b"stsc", 0, 0, struct.pack(">I", 0))
            + _full(b"stsz", 0, 0, struct.pack(">II", 0, 0))
            + _full(b"stco", 0, 0, struct.pack(">I", 0)),
        )
        minf = _box(b"minf", stbl)
        mdia = _box(b"mdia", mdhd + hdlr + minf)
        trak_boxes += _box(b"trak", tkhd + mdia)
        trex_boxes += _full(
            b"trex", 0, 0,
            struct.pack(
                ">IIIII", tid, 1,
                t.get("default_duration", 0), t.get("default_size", 0),
                _NONSYNC_FLAGS,
            ),
        )
    mehd = _full(b"mehd", 1, 0, struct.pack(">Q", total_mv))
    mvex = _box(b"mvex", mehd + trex_boxes)
    mvhd = _full(
        b"mvhd", 0, 0,
        struct.pack(">IIII", 0, 0, mv_timescale, 0)
        + struct.pack(">I", 0x10000) + struct.pack(">H", 0x100) + b"\0" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\0" * 24 + struct.pack(">I", len(tracks) + 1),
    )
    out = _box(b"ftyp", brand + struct.pack(">I", 0) + brand)
    out += _box(b"moov", mvhd + trak_boxes + mvex)

    # ---- moof/mdat pairs
    for seq, frag in enumerate(fragments, start=1):
        payload = b"".join(b"".join(spec["samples"]) for spec in frag)
        traf_starts = []  # byte offset of each traf's samples within mdat payload
        pos = 0
        for spec in frag:
            traf_starts.append(pos)
            pos += sum(len(s) for s in spec["samples"])

        def _make_moof(mdat_payload_abs: int | None) -> bytes:
            """mdat_payload_abs None -> sizing pass (zero offsets)."""
            body = _full(b"mfhd", 0, 0, struct.pack(">I", seq))
            for spec, tstart in zip(frag, traf_starts):
                t = tracks[spec["track_id"] - 1]
                sizes = [len(s) for s in spec["samples"]]
                deltas = list(spec["deltas"])
                n = len(sizes)
                if n != len(deltas):
                    raise ValueError("samples/deltas length mismatch")
                sync = set(spec.get("sync", range(n)))

                tf_flags = 0
                tfhd_payload = struct.pack(">I", spec["track_id"])
                if offset_mode == "base":
                    tf_flags |= 0x1
                    base_abs = (mdat_payload_abs or 0) + tstart
                    tfhd_payload += struct.pack(">Q", base_abs)
                else:
                    tf_flags |= 0x20000  # default-base-is-moof

                # hoist uniform durations/sizes into tfhd overrides when
                # they differ from the trex defaults
                uniform_dur = deltas and all(d == deltas[0] for d in deltas)
                use_trun_dur = not uniform_dur
                if uniform_dur and deltas[0] != t.get("default_duration", 0):
                    tf_flags |= 0x8
                    tfhd_payload += struct.pack(">I", deltas[0])
                uniform_size = sizes and all(s == sizes[0] for s in sizes)
                use_trun_size = not uniform_size
                if uniform_size and sizes[0] != t.get("default_size", 0):
                    tf_flags |= 0x10
                    tfhd_payload += struct.pack(">I", sizes[0])
                # sample flags: all-sync / first-sync-only compress,
                # mixed patterns go per-sample
                all_sync = sync >= set(range(n))
                first_only = sync == {0} and n > 1
                use_trun_flags = not (all_sync or first_only)
                if all_sync:
                    tf_flags |= 0x20
                    tfhd_payload += struct.pack(">I", _SYNC_FLAGS)
                traf = _full(b"tfhd", 0, tf_flags, tfhd_payload)
                if spec.get("tfdt") is not None:
                    traf += _full(b"tfdt", 1, 0, struct.pack(">Q", int(spec["tfdt"])))

                runs = max(1, int(spec.get("runs", 1)))
                bounds = [round(i * n / runs) for i in range(runs + 1)]
                run_start_off = 0
                for ri in range(runs):
                    lo, hi = bounds[ri], bounds[ri + 1]
                    if lo == hi:
                        continue
                    rflags = 0
                    rbody = b""
                    first_run = run_start_off == 0
                    if first_run and offset_mode == "moof":
                        rflags |= 0x1
                    if first_run and first_only:
                        rflags |= 0x4
                    if use_trun_dur:
                        rflags |= 0x100
                    if use_trun_size:
                        rflags |= 0x200
                    if use_trun_flags:
                        rflags |= 0x400
                    for i in range(lo, hi):
                        if use_trun_dur:
                            rbody += struct.pack(">I", deltas[i])
                        if use_trun_size:
                            rbody += struct.pack(">I", sizes[i])
                        if use_trun_flags:
                            rbody += struct.pack(
                                ">I", _SYNC_FLAGS if i in sync else _NONSYNC_FLAGS
                            )
                    head = struct.pack(">I", hi - lo)
                    if rflags & 0x1:
                        # moof-relative: moof size is only known on the
                        # final pass; sizing pass writes 0
                        doff = 0
                        if mdat_payload_abs is not None:
                            doff = (mdat_payload_abs - moof_abs) + tstart
                        head += struct.pack(">i", doff)
                    if rflags & 0x4:
                        head += struct.pack(">I", _SYNC_FLAGS)
                    traf += _full(b"trun", 0, rflags, head + rbody)
                    run_start_off += sum(sizes[lo:hi])
                body += _box(b"traf", traf)
            return _box(b"moof", body)

        moof_abs = len(out)
        moof_size = len(_make_moof(None))
        mdat_payload_abs = moof_abs + moof_size + 8
        moof = _make_moof(mdat_payload_abs)
        if len(moof) != moof_size:
            raise AssertionError("moof sizing pass diverged")
        out += moof + _box(b"mdat", payload)
    return out
