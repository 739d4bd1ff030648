"""Driver-certifiable perceptual media dedup: integer-exact
fingerprints over REAL codec roundtrips, with DuckDB oracle twins.

The float-DCT pHash family (multimodal.py: phash64 / audio_phash64 /
video_neardup_pairs) cannot get a sound cross-engine oracle — float64
summation order differs between numpy and a SQL engine, and the
median-threshold bits flip on ties.  This module adds the SAME dedup
pipeline shapes — synthesize media -> encode with a real container ->
decode with the real codec -> 64-bit perceptual fingerprint -> shared
banded-Hamming pair join (dedup.hamming_banded_pairs) — but with
fingerprints whose every bit is an INTEGER comparison, so a DuckDB
oracle reproduces them bit-for-bit from the same md5-derived pixel /
sample math (the simhash md5-twin pattern, dedup.py:simhash_cte_sql):

* image: block-mean hash (Yang et al.'s blockhash family): 32x32 grey,
  8x8 grid of 4x4 blocks, bit b = block-sum*64 > total-sum — exact in
  int64.
* audio: time-domain energy-contour grid (the Haitsma-Kalker sign-grid
  shape with spectral band energies replaced by sub-slice energies):
  8 slices x 9 sub-slices, bit (t,b) = E(t,b) > E(t,b+1), E = sum of
  int16 samples squared — exact in int64.
* video: per-frame block-mean hashes + frame voting (the
  video_neardup_pairs plan shape: banded-Hamming join keyed by frame
  index, vote >= min_matching_frames).

The media itself derives deterministically from the documents table
(md5 of "<prefix>:<doc_id>:..." strings), with a perturbed near-dup
copy (+-1 pixel/sample noise) for every 5th doc at media_id =
doc_id + PERT_OFFSET — so the pair output is non-degenerate and the
oracle can re-derive every byte without decoding anything.

What certification proves: the PPM/WAV/y4m encode->decode roundtrips
are lossless through the real parsers (multimodal.py: _parse_pnm,
_wav_mono, _y4m_frames, sample_video_frames), the fingerprint math is
cross-engine exact, and the banded join delivers its pigeonhole recall
guarantee (max_hamming <= bands-1).

Reference parity: confidentialstorm has no media dedup; this is part
of the beyond-reference training-data-pipeline family (brief:
multimodal columns as opaque binaries + Spark-side plumbing real).
"""

from __future__ import annotations

import hashlib
import io
import wave
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .multimodal import (
    _wav_mono,
    decode_image,
    encode_ppm,
    resize_nearest,
    sample_video_frames,
)

PERT_OFFSET = 1_000_000  # perturbed-copy media_id = doc_id + PERT_OFFSET
PERT_EVERY = 5  # every 5th doc gets a near-dup copy

IMG_W = 32  # image edge (pixels); 8x8 blocks of 4x4
AUD_SLICES = 8  # audio time slices (rows of the bit grid)
AUD_BANDS = 9  # sub-slices per slice; 8 adjacent comparisons -> 8 bits
AUD_SUB = 24  # samples per sub-slice
AUD_N = AUD_SLICES * AUD_BANDS * AUD_SUB  # 1728 samples per clip
VID_FRAMES = 4  # frames per synthetic y4m clip


def _md5_bytes(s: str) -> np.ndarray:
    """md5 digest of the utf-8 string as 16 uint8 lanes — lane k is
    hex pair k of the hexdigest, which is how the DuckDB twin reads
    it: CAST('0x' || substr(md5(s), 1 + 2*k, 2) AS INTEGER)."""
    return np.frombuffer(hashlib.md5(s.encode()).digest(), np.uint8)


# ---------------------------------------------------------------------------
# deterministic synthesis (the part the oracle re-derives analytically)
# ---------------------------------------------------------------------------


def synth_image_pixels(stok: str, pert: bool) -> np.ndarray:
    """(32, 32) uint8: per-4x4-block bias byte + per-pixel noise in
    [-16, 16]; the perturbed copy adds per-pixel delta in {-1, 0, 1}.
    Noise/delta bytes come 16 per md5 call (lane = pixel index % 16)."""
    bias = np.empty((8, 8), np.int64)
    for b in range(64):
        bias[b // 8, b % 8] = _md5_bytes(f"img:{stok}:b{b}")[0]
    n_groups = IMG_W * IMG_W // 16
    noise = np.concatenate(
        [_md5_bytes(f"img:{stok}:n{g}") for g in range(n_groups)]
    ).astype(np.int64)
    px = np.repeat(np.repeat(bias, 4, 0), 4, 1).reshape(-1) + (noise % 33 - 16)
    px = np.clip(px, 0, 255)
    if pert:
        delta = np.concatenate(
            [_md5_bytes(f"pimg:{stok}:n{g}") for g in range(n_groups)]
        ).astype(np.int64)
        px = np.clip(px + (delta % 3 - 1), 0, 255)
    return px.reshape(IMG_W, IMG_W).astype(np.uint8)


def synth_audio_samples(stok: str, pert: bool) -> np.ndarray:
    """(1728,) int16: sample i sits in slice t = i//216, sub-slice
    band = (i%216)//24; amplitude byte per (t, band), noise lane in
    [-64, 63] -> sample = noise * (amp+1), |x| <= 64*256 < 2^15."""
    i = np.arange(AUD_N)
    t = i // (AUD_BANDS * AUD_SUB)
    band = (i % (AUD_BANDS * AUD_SUB)) // AUD_SUB
    amp = np.empty(AUD_N, np.int64)
    for tt in range(AUD_SLICES):
        for bb in range(AUD_BANDS):
            amp[(t == tt) & (band == bb)] = _md5_bytes(f"aud:{stok}:a{tt}:{bb}")[0]
    n_groups = AUD_N // 16
    noise = np.concatenate(
        [_md5_bytes(f"aud:{stok}:n{g}") for g in range(n_groups)]
    ).astype(np.int64)
    x = (noise % 128 - 64) * (amp + 1)
    if pert:
        delta = np.concatenate(
            [_md5_bytes(f"paud:{stok}:n{g}") for g in range(n_groups)]
        ).astype(np.int64)
        x = np.clip(x + (delta % 3 - 1), -32768, 32767)
    return x.astype(np.int16)


def synth_image_payload(src: int, pert: bool) -> bytes:
    """Binary PGM (P5) container around the synthetic pixels."""
    return encode_ppm(synth_image_pixels(str(src), pert)[..., None])


def synth_audio_payload(src: int, pert: bool) -> bytes:
    """PCM16 mono WAV container around the synthetic samples."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(synth_audio_samples(str(src), pert).astype("<i2").tobytes())
    return buf.getvalue()


def synth_video_payload(src: int, pert: bool) -> bytes:
    """YUV4MPEG2 Cmono clip of VID_FRAMES 32x32 frames; frame f's
    pixels use the image formula with source token "<src>:f<f>"."""
    parts = [b"YUV4MPEG2 W32 H32 F25:1 Cmono\n"]
    for f in range(VID_FRAMES):
        parts.append(b"FRAME\n")
        parts.append(synth_image_pixels(f"{src}:f{f}", pert).tobytes())
    return b"".join(parts)


def media_corpus(docs: DataFrame, kind: str, id_col: str = "doc_id") -> DataFrame:
    """(media_id, payload) synthetic media table derived from the
    documents table: one base item per doc, plus a perturbed near-dup
    copy (media_id = doc_id + PERT_OFFSET) for every PERT_EVERY-th
    doc.  kind in {image, audio, video}.  Generation is mapInPandas
    over the doc ids — per-partition work, scales with the corpus.

    The id relation is spread to core count first (`_spread`): the
    testdata parquet is one row group, so the scan arrives as a single
    split and the whole synthesize->encode->decode->hash chain would
    otherwise run on ONE core (the knn_recall_eval trap, PLANS
    round-9 close); the id shuffle is a few bytes per row against
    codec work that dominates it by orders of magnitude."""
    from .dedup import _spread
    synth = {
        "image": synth_image_payload,
        "audio": synth_audio_payload,
        "video": synth_video_payload,
    }[kind]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, payloads = [], []
            for d in pdf[id_col]:
                d = int(d)
                ids.append(d)
                payloads.append(synth(d, False))
                if d % PERT_EVERY == 0:
                    ids.append(d + PERT_OFFSET)
                    payloads.append(synth(d, True))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    return _spread(docs.select(id_col), id_col, hint_from=docs).mapInPandas(
        gen, schema="media_id long, payload binary"
    )


# ---------------------------------------------------------------------------
# integer-exact fingerprints
# ---------------------------------------------------------------------------


def _fold_bits(bits: np.ndarray) -> int:
    """64 bools -> signed int64 (bit 63 is the sign bit), the same
    two's-complement fold as dedup.simhash64."""
    h = 0
    for i in range(64):
        if bits[i]:
            h |= 1 << i
    return h - (1 << 64) if h >= 1 << 63 else h


def blockmean_hash64(img: np.ndarray) -> int:
    """Block-mean perceptual hash: channel 0, nearest-resized to
    32x32 (identity for 32x32 inputs — integer-preserving), 8x8 grid
    of 4x4 blocks; bit b = block b's mean exceeds the global mean,
    compared exactly in integers (block_sum * 64 > total_sum)."""
    a = img if img.ndim == 2 else img[..., 0]
    if a.shape != (IMG_W, IMG_W):
        a = resize_nearest(a[..., None], IMG_W, IMG_W)[..., 0]
    a = a.astype(np.int64)
    bsum = a.reshape(8, 4, 8, 4).sum(axis=(1, 3))  # (block_y, block_x)
    total = int(a.sum())
    bits = (bsum.reshape(-1) * 64) > total  # bit b = block (b//8, b%8)
    return _fold_bits(bits)


def audio_energy_hash64(x: np.ndarray) -> int:
    """Energy-contour fingerprint over int64 samples: 8 slices x 9
    sub-slices; E(t,b) = sum of squares; bit t*8+b = E(t,b) >
    E(t,b+1).  All-integer, volume-structure invariant to small
    additive noise."""
    if len(x) < AUD_N:
        raise ValueError("clip too short to fingerprint")
    e = (
        x[:AUD_N].astype(np.int64) ** 2
    ).reshape(AUD_SLICES, AUD_BANDS, AUD_SUB).sum(axis=2)
    bits = (e[:, :-1] > e[:, 1:]).reshape(-1)  # (t, b) -> bit t*8+b
    return _fold_bits(bits)


# ---------------------------------------------------------------------------
# Spark operators (real decode in the loop)
# ---------------------------------------------------------------------------


def image_blockmean_hashes(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(_id, sig) via the REAL image decoder (PGM/PPM/BMP/PNG/JPEG)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf[id_col], pdf[payload_col]):
                img = decode_image(bytes(data))
                if img is not None:
                    out.append((mid, blockmean_hash64(img)))
            yield pd.DataFrame(out, columns=["_id", "sig"])

    return media.select(id_col, payload_col).mapInPandas(run, schema="_id long, sig long")


def audio_energy_hashes(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """(_id, sig) via the REAL WAV decoder; _wav_mono's float64
    normalization divides by 32768 (a power of two), so the int16
    samples round-trip exactly through rint(x * 32768)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, data in zip(pdf[id_col], pdf[payload_col]):
                try:
                    _sr, x = _wav_mono(bytes(data))
                except (ValueError, EOFError, wave.Error):
                    continue
                ints = np.rint(x * 32768.0).astype(np.int64)
                out.append((mid, audio_energy_hash64(ints)))
            yield pd.DataFrame(out, columns=["_id", "sig"])

    return media.select(id_col, payload_col).mapInPandas(run, schema="_id long, sig long")


# Above this corpus size the banded join's FIXED bucket space
# (bands * 2^(64/bands) buckets: 2048 at bands=8) goes quadratic —
# measured: 19 s at 55k items, heap-death at 550k (PLANS r7) — so
# "auto" switches to bit-sampling Hamming LSH, whose key width grows
# with log2(N) (dedup.lsh_scale_dials).  The threshold sits well
# under the measured wall.
BANDED_MAX_ITEMS = 100_000


def _cap_buckets(
    keyed: DataFrame, bucket_cols: tuple[str, ...], cap: int
) -> DataFrame:
    """ROW_NUMBER bucket cap (deterministic: ordered by _id) over an
    exploded key relation — the same degenerate-bucket backstop
    dedup.hamming_lsh_pairs applies, factored out for the frame-keyed
    video joins whose bucket key carries the frame index."""
    from pyspark.sql import Window

    w = Window.partitionBy(*bucket_cols).orderBy("_id")
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def _hamming_pairs_auto(
    sigs: DataFrame,
    method: str,
    max_hamming: int,
    bands: int,
    max_bucket_size: int | None,
    target_recall: float,
) -> DataFrame:
    """Shared scale-default dispatch for the flat (non-frame-keyed)
    media dedups: 'banded' = exact pigeonhole recall (the certified
    small-SF plan), 'lsh' = bit-sampling tables with
    :func:`dedup.lsh_scale_dials` picking (k, L) from the corpus
    count, 'auto' = banded up to BANDED_MAX_ITEMS, LSH beyond — so
    the DEFAULT survives 100 TB instead of hitting the banded bucket
    law.  The count that drives 'auto'/'lsh' materializes the sig
    localCheckpoint both join strategies reuse, so it adds no extra
    decode pass."""
    from .dedup import hamming_banded_pairs, hamming_lsh_pairs, lsh_scale_dials

    if method not in ("auto", "banded", "lsh"):
        raise ValueError(f"method must be auto|banded|lsh, got {method!r}")
    if method == "banded":
        return hamming_banded_pairs(
            sigs,
            max_bucket_size=max_bucket_size,
            max_hamming=max_hamming,
            bands=bands,
        )
    sigs = sigs.localCheckpoint(eager=False)
    n = sigs.count()
    if method == "auto" and n <= BANDED_MAX_ITEMS:
        return hamming_banded_pairs(
            sigs,
            max_bucket_size=max_bucket_size,
            max_hamming=max_hamming,
            bands=bands,
            checkpoint=False,  # materialized above
        )
    k, tables = lsh_scale_dials(n, max_hamming, target_recall)
    # an explicit caller cap passes through; None keeps the LSH join's
    # 4096 degenerate-bucket backstop (a healthy key layout never hits
    # it) rather than banded's uncapped semantics
    return hamming_lsh_pairs(
        sigs,
        max_hamming=max_hamming,
        bits_per_table=k,
        tables=tables,
        max_bucket_size=max_bucket_size if max_bucket_size is not None else 4096,
        checkpoint=False,
    )


def image_blockmean_neardup(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 7,
    bands: int = 8,
    max_bucket_size: int | None = None,
    method: str = "auto",
    target_recall: float = 0.99,
) -> DataFrame:
    """Image near-dup pairs (id_a, id_b, hamming) over block-mean
    hashes.  ``method='auto'`` (the default) uses the exact banded
    join up to BANDED_MAX_ITEMS and the scale-dialed bit-sampling LSH
    beyond — see :func:`_hamming_pairs_auto`."""
    return _hamming_pairs_auto(
        image_blockmean_hashes(media, payload_col, id_col),
        method,
        max_hamming,
        bands,
        max_bucket_size,
        target_recall,
    )


def audio_energy_neardup(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    max_hamming: int = 7,
    bands: int = 8,
    max_bucket_size: int | None = None,
    method: str = "auto",
    target_recall: float = 0.99,
) -> DataFrame:
    """Audio near-dup pairs (id_a, id_b, hamming) over energy-contour
    fingerprints, with the same banded->LSH scale default as the image
    dedup (:func:`_hamming_pairs_auto`)."""
    return _hamming_pairs_auto(
        audio_energy_hashes(media, payload_col, id_col),
        method,
        max_hamming,
        bands,
        max_bucket_size,
        target_recall,
    )


def video_blockmean_neardup(
    media: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
    n_frames: int = VID_FRAMES,
    max_hamming: int = 7,
    bands: int = 8,
    min_matching_frames: int = 2,
    method: str = "auto",
    target_recall: float = 0.99,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Video near-dup pairs by frame voting (the video_neardup_pairs
    plan shape, multimodal.py:1136) over INTEGER block-mean frame
    hashes: sample n frames (real y4m Y-planes -> PGM), hash each,
    join keyed by frame index so frames only meet candidates at their
    own index, verify exact Hamming, vote.  ``method`` follows the
    same banded->LSH scale default as the flat media dedups: 'banded'
    keys (frame_idx, band, band_val) with the pigeonhole guarantee;
    'lsh' keys (frame_idx, tbl, kv) with
    :func:`dedup.lsh_scale_dials` sizing (k, L) from the per-frame
    item count; 'auto' switches at BANDED_MAX_ITEMS.
    ``max_bucket_size`` follows the flat-media convention: an explicit
    cap applies to EITHER join strategy (ROW_NUMBER over the bucket
    key); None leaves the banded join uncapped but keeps the LSH
    join's 4096 degenerate-bucket backstop — without it, constant
    frames shared across many videos (black intros) collide at the
    same frame index and go quadratic on exactly the corpora the auto
    switch targets.  Returns (id_a, id_b, n_matching)."""
    from .dedup import lsh_keyed, lsh_scale_dials

    if method not in ("auto", "banded", "lsh"):
        raise ValueError(f"method must be auto|banded|lsh, got {method!r}")
    frames = sample_video_frames(
        media, payload_col=payload_col, id_col=id_col, n_frames=n_frames
    ).filter(F.col("decoded_ok"))

    def hash_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, idx, fr in zip(pdf[id_col], pdf["frame_idx"], pdf["frame"]):
                img = decode_image(bytes(fr))
                if img is not None:
                    out.append((mid, int(idx), blockmean_hash64(img)))
            yield pd.DataFrame(out, columns=["_id", "_fi", "sig"])

    sigs = frames.mapInPandas(
        hash_frames, schema="_id long, _fi int, sig long"
    ).localCheckpoint(eager=False)

    if method == "auto":
        # per-frame universe is what the frame-keyed join buckets
        method = (
            "banded"
            if sigs.count() <= BANDED_MAX_ITEMS * n_frames
            else "lsh"
        )
    if method == "lsh":
        k, tables = lsh_scale_dials(
            max(sigs.count() // max(n_frames, 1), 2), max_hamming, target_recall
        )
        keyed = lsh_keyed(sigs, k, tables, seed=42, extra_cols=("_fi", "sig"))
        keyed = _cap_buckets(
            keyed,
            ("_fi", "tbl", "kv"),
            max_bucket_size if max_bucket_size is not None else 4096,
        )
        # verify BEFORE distinct (the dedup.hamming_lsh_pairs plan):
        # the frame sig rides in the keyed relation, so the popcount
        # filter runs inside the join and the distinct shuffles only
        # matching (pair, frame) rows — no sig join-back
        verified = (
            keyed.alias("l")
            .join(
                keyed.alias("r"),
                (F.col("l._fi") == F.col("r._fi"))
                & (F.col("l.tbl") == F.col("r.tbl"))
                & (F.col("l.kv") == F.col("r.kv"))
                & (F.col("l._id") < F.col("r._id")),
            )
            .filter(
                F.bit_count(F.col("l.sig").bitwiseXOR(F.col("r.sig")))
                <= max_hamming
            )
            .select(
                F.col("l._id").alias("id_a"),
                F.col("r._id").alias("id_b"),
                F.col("l._fi").alias("_fi"),
            )
            .distinct()
        )
        return (
            verified.groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_matching"))
            .filter(F.col("n_matching") >= min_matching_frames)
        )

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
    if max_bucket_size is not None:
        banded = _cap_buckets(banded, ("_fi", "band", "band_val"), max_bucket_size)
    # filter before distinct: popcount inside the join output, dedup
    # shuffles matching (pair, frame) rows only
    verified = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l._fi") == F.col("r._fi"))
            & (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .filter(
            F.bit_count(F.col("l.sig").bitwiseXOR(F.col("r.sig"))) <= max_hamming
        )
        .select(
            F.col("l._id").alias("id_a"),
            F.col("r._id").alias("id_b"),
            F.col("l._fi").alias("_fi"),
        )
        .distinct()
    )
    return (
        verified.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_matching"))
        .filter(F.col("n_matching") >= min_matching_frames)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins (analytic re-derivation, no decoding)
# ---------------------------------------------------------------------------

_MEDIA_CTE = f"""_media AS (
  SELECT doc_id AS media_id, doc_id AS src, FALSE AS pert FROM documents
  UNION ALL
  SELECT doc_id + {PERT_OFFSET}, doc_id, TRUE FROM documents
  WHERE doc_id % {PERT_EVERY} = 0
)"""


def _byte_sql(key_expr: str, lane_expr: str) -> str:
    """Lane ``lane_expr`` (0..15) of md5(key_expr) as an integer —
    the SQL twin of _md5_bytes(key)[lane]."""
    return (
        f"CAST('0x' || substr(md5({key_expr}), 1 + 2 * ({lane_expr}), 2) AS INTEGER)"
    )


def _image_sig_cte(stok_sql: str, extra_cols: str = "", extra_group: str = "") -> str:
    """Signature CTE chain computing the block-mean hash analytically
    for every media row (and optional extra grouping columns, used by
    the video twin's frame index).  ``stok_sql`` is the source-token
    expression matching the Python f-string keys."""
    bias = _byte_sql(f"'img:' || {stok_sql} || ':b' || CAST((y // 4) * 8 + (x // 4) AS VARCHAR)", "0")
    noise = _byte_sql(f"'img:' || {stok_sql} || ':n' || CAST((y * 32 + x) // 16 AS VARCHAR)", "(y * 32 + x) % 16")
    delta = _byte_sql(f"'pimg:' || {stok_sql} || ':n' || CAST((y * 32 + x) // 16 AS VARCHAR)", "(y * 32 + x) % 16")
    return f"""_px AS (
  SELECT media_id{extra_cols}, (y // 4) * 8 + (x // 4) AS b,
         CASE WHEN pert
              THEN LEAST(255, GREATEST(0,
                     LEAST(255, GREATEST(0, {bias} + {noise} % 33 - 16))
                     + {delta} % 3 - 1))
              ELSE LEAST(255, GREATEST(0, {bias} + {noise} % 33 - 16))
         END AS px
  FROM _media
  CROSS JOIN (SELECT unnest(range(0, 32)) AS y) yy
  CROSS JOIN (SELECT unnest(range(0, 32)) AS x) xx
),
_bs AS (
  SELECT media_id{extra_group}, b, SUM(px) AS bsum
  FROM _px GROUP BY media_id{extra_group}, b
),
_tot AS (
  SELECT media_id{extra_group}, SUM(px) AS total
  FROM _px GROUP BY media_id{extra_group}
),
_sig AS (
  SELECT media_id{extra_group},
         CAST(SUM(CASE WHEN bsum * 64 > total AND b < 63
                       THEN CAST(1 AS BIGINT) << b ELSE 0 END)
            + SUM(CASE WHEN bsum * 64 > total AND b = 63
                       THEN -9223372036854775808 ELSE 0 END) AS BIGINT) AS sig
  FROM _bs JOIN _tot USING (media_id{extra_group})
  GROUP BY media_id{extra_group}
)"""


def image_blockmean_pairs_sql(max_hamming: int = 7) -> str:
    """DuckDB twin of media_corpus('image') -> image_blockmean_neardup:
    pixels re-derived from the md5 formulas, exact all-pairs Hamming
    join (sound because the banded join's pigeonhole guarantee makes
    the Spark side exhaustive at max_hamming <= bands-1)."""
    stok = "CAST(src AS VARCHAR)"
    return f"""WITH {_MEDIA_CTE},
{_image_sig_cte(stok)}
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM _sig a JOIN _sig b ON a.media_id < b.media_id
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
ORDER BY id_a, id_b"""


def image_probe_pairs_sql(max_hamming: int = 7) -> str:
    """DuckDB twin of the INCREMENTAL image path (standing index +
    batch probe, plans/queries.py ``dedup_media_probe``): batch = the
    perturbed copies (media_id >= PERT_OFFSET), index = the originals;
    exact batch x corpus Hamming join (sound because the banded probe
    is exhaustive at max_hamming <= bands-1 and the gate-SF index is
    written uncapped)."""
    stok = "CAST(src AS VARCHAR)"
    return f"""WITH {_MEDIA_CTE},
{_image_sig_cte(stok)}
SELECT a.media_id AS new_id, b.media_id AS corpus_id,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM _sig a JOIN _sig b
  ON a.media_id >= {PERT_OFFSET} AND b.media_id < {PERT_OFFSET}
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
ORDER BY new_id, corpus_id"""


def audio_energy_pairs_sql(max_hamming: int = 7) -> str:
    """DuckDB twin of media_corpus('audio') -> audio_energy_neardup."""
    stok = "CAST(src AS VARCHAR)"
    amp = _byte_sql(
        f"'aud:' || {stok} || ':a' || CAST(i // {AUD_BANDS * AUD_SUB} AS VARCHAR)"
        f" || ':' || CAST((i % {AUD_BANDS * AUD_SUB}) // {AUD_SUB} AS VARCHAR)",
        "0",
    )
    noise = _byte_sql(f"'aud:' || {stok} || ':n' || CAST(i // 16 AS VARCHAR)", "i % 16")
    delta = _byte_sql(f"'paud:' || {stok} || ':n' || CAST(i // 16 AS VARCHAR)", "i % 16")
    return f"""WITH {_MEDIA_CTE},
_smp AS (
  SELECT media_id,
         i // {AUD_BANDS * AUD_SUB} AS t,
         (i % {AUD_BANDS * AUD_SUB}) // {AUD_SUB} AS band,
         CASE WHEN pert
              THEN LEAST(32767, GREATEST(-32768,
                     ({noise} % 128 - 64) * ({amp} + 1) + {delta} % 3 - 1))
              ELSE ({noise} % 128 - 64) * ({amp} + 1)
         END AS s
  FROM _media CROSS JOIN (SELECT unnest(range(0, {AUD_N})) AS i) ii
),
_e AS (
  SELECT media_id, t, band, SUM(CAST(s AS BIGINT) * s) AS e
  FROM _smp GROUP BY media_id, t, band
),
_sig AS (
  SELECT a.media_id,
         CAST(SUM(CASE WHEN a.e > b.e AND a.t * 8 + a.band < 63
                       THEN CAST(1 AS BIGINT) << (a.t * 8 + a.band) ELSE 0 END)
            + SUM(CASE WHEN a.e > b.e AND a.t * 8 + a.band = 63
                       THEN -9223372036854775808 ELSE 0 END) AS BIGINT) AS sig
  FROM _e a JOIN _e b
    ON a.media_id = b.media_id AND a.t = b.t AND b.band = a.band + 1
  GROUP BY a.media_id
)
SELECT a.media_id AS id_a, b.media_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INTEGER) AS hamming
FROM _sig a JOIN _sig b ON a.media_id < b.media_id
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
ORDER BY id_a, id_b"""


def video_frames_pairs_sql(max_hamming: int = 7, min_matching: int = 2) -> str:
    """DuckDB twin of media_corpus('video') -> video_blockmean_neardup:
    per-frame signatures from the image formula with token
    "<src>:f<f>", same-index frame matches <= max_hamming, vote."""
    stok = "CAST(src AS VARCHAR) || ':f' || CAST(f AS VARCHAR)"
    sig_cte = _image_sig_cte(stok, extra_cols=", f", extra_group=", f")
    return f"""WITH _media AS (
  SELECT media_id, src, pert, f
  FROM (
    SELECT doc_id AS media_id, doc_id AS src, FALSE AS pert FROM documents
    UNION ALL
    SELECT doc_id + {PERT_OFFSET}, doc_id, TRUE FROM documents
    WHERE doc_id % {PERT_EVERY} = 0
  ) CROSS JOIN (SELECT unnest(range(0, {VID_FRAMES})) AS f) ff
),
{sig_cte}
SELECT a.media_id AS id_a, b.media_id AS id_b,
       COUNT(*) AS n_matching
FROM _sig a JOIN _sig b
  ON a.media_id < b.media_id AND a.f = b.f
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
GROUP BY a.media_id, b.media_id
HAVING COUNT(*) >= {min_matching}
ORDER BY id_a, id_b"""
