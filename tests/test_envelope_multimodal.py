"""Envelope (P7-P11, V1, V3) and multimodal-plumbing tests.

Mirrors SealedPayloadSerializationTest.java:25-178: round-trip per
scheme, AAD integrity binding, NONE passthrough, unicode payloads;
plus the confidential variant of the flagship pipeline.
"""

import pytest
from pyspark.sql import functions as F

from confidential_storm_spark.functions.envelope import (
    aad_json,
    chacha20_seal,
    open_none,
    open_sealed,
    seal,
    seal_none,
    try_open_sealed,
    verify_consistency,
)
from confidential_storm_spark.operators.multimodal import (
    attach_media_metadata,
    decode_image_features,
    sample_video_frames,
)

KEY = "0123456789abcdef0123456789abcdef"  # 32 bytes -> AES-256


@pytest.fixture()
def sealed_df(spark):
    df = spark.createDataFrame(
        [
            (1, "hello wörld ünïcode ✓", "spout", "split", "p0", 1, 0),
            (2, "second message", "spout", "split", "p0", 2, 0),
            (3, "third", "split", "bound", "p1", 1, 1),
        ],
        "id long, msg string, source string, destination string, producer_id string, seq long, epoch int",
    )
    aad = aad_json(
        F.col("source"), F.col("destination"), F.col("producer_id"), F.col("seq"), F.col("epoch")
    )
    return df.withColumn("env", seal(F.col("msg"), F.lit(KEY), aad))


def test_roundtrip_aes_gcm(sealed_df):
    out = sealed_df.withColumn("plain", open_sealed(F.col("env"), F.lit(KEY))).collect()
    assert [r["plain"] for r in out] == [r["msg"] for r in out]
    # envelope shape: 12-byte nonce, non-empty ciphertext (includes tag)
    for r in out:
        assert len(r["env"]["nonce"]) == 12
        assert len(r["env"]["ciphertext"]) >= 16


def test_aad_is_sorted_key_json(sealed_df):
    aad = sealed_df.head()["env"]["aad"]
    keys = [k.split('":')[0].strip('{"') for k in aad.split(',"')]
    assert keys == sorted(keys)
    assert '"source":"spout"' in aad and '"destination":"split"' in aad


def test_tampered_aad_rejected(sealed_df):
    # swap the AAD of row 1 into row 2's envelope -> tag check must fail
    tampered = sealed_df.withColumn(
        "env",
        F.struct(
            F.lit('{"destination":"evil","epoch":"0","producer_id":"p0","seq":"1","source":"spout"}').alias("aad"),
            F.col("env.nonce").alias("nonce"),
            F.col("env.ciphertext").alias("ciphertext"),
        ),
    )
    out = tampered.withColumn("plain", try_open_sealed(F.col("env"), F.lit(KEY))).collect()
    assert all(r["plain"] is None for r in out)


def test_wrong_key_rejected(sealed_df):
    wrong = "f" * 32
    out = sealed_df.withColumn("plain", try_open_sealed(F.col("env"), F.lit(wrong))).collect()
    assert all(r["plain"] is None for r in out)


def test_none_scheme_passthrough(spark):
    df = spark.createDataFrame([("payload",)], "msg string")
    env = df.withColumn("env", seal_none(F.col("msg"), F.lit("{}")))
    out = env.withColumn("plain", open_none(F.col("env"))).head()
    assert out["plain"] == "payload"
    assert out["env"]["nonce"] == bytearray(b"")


def test_typed_payloads_roundtrip(spark):
    df = spark.createDataFrame([(42, 3.5)], "a long, b double")
    aad = F.lit("{}")
    env = df.select(
        seal(F.col("a"), F.lit(KEY), aad).alias("ea"),
        seal(F.col("b"), F.lit(KEY), aad).alias("eb"),
    )
    out = env.select(
        open_sealed(F.col("ea"), F.lit(KEY), "long").alias("a"),
        open_sealed(F.col("eb"), F.lit(KEY), "double").alias("b"),
    ).head()
    assert out["a"] == 42 and out["b"] == 3.5


def test_cross_field_consistency(spark):
    rows = [
        (1, '{"producer_id":"p0","seq":"1"}', '{"producer_id":"p0","seq":"1"}'),
        (2, '{"producer_id":"p0","seq":"1"}', '{"producer_id":"p1","seq":"1"}'),
        (3, '{"producer_id":"p0","seq":"1"}', '{"producer_id":"p0","seq":"2"}'),
    ]
    df = spark.createDataFrame(rows, "id long, aad1 string, aad2 string").select(
        "id",
        F.struct(F.col("aad1").alias("aad")).alias("e1"),
        F.struct(F.col("aad2").alias("aad")).alias("e2"),
    )
    ok = verify_consistency(df, ["e1", "e2"]).collect()
    assert [r["id"] for r in ok] == [1]


def test_confidential_flagship_equals_plaintext(spark, sf_dir):
    """Envelope layer is semantics-transparent: seal -> open -> flagship
    histogram == plaintext flagship histogram (the reference's
    baseline-vs-confidential equivalence, SURVEY §3.2)."""
    from confidential_storm_spark.operators.bounding import bounded_clamped
    from confidential_storm_spark.operators.histogram import histogram_release
    from confidential_storm_spark.sources.tables import contributions_view

    contrib = contributions_view(spark, sf_dir)
    plain = histogram_release(bounded_clamped(contrib, 32, 1.0)).collect()

    aad = aad_json(
        F.lit("spout"), F.lit("bound"), F.col("producer_id"), F.col("seq"), F.col("epoch")
    )
    sealed = contrib.withColumn("env", seal(F.col("key"), F.lit(KEY), aad))
    opened = sealed.withColumn("key", open_sealed(F.col("env"), F.lit(KEY))).drop("env")
    conf = histogram_release(bounded_clamped(opened, 32, 1.0)).collect()
    assert sorted((r["key"], r["count"]) for r in conf) == sorted(
        (r["key"], r["count"]) for r in plain
    )


def test_chacha20_roundtrip_and_tamper(spark):
    from confidential_storm_spark.functions.envelope import chacha20_open

    key = b"k" * 32
    df = spark.createDataFrame(
        [("msg-one", "{}"), ("ünïcode ✓", '{"seq":"2"}')], "msg string, aad string"
    )
    env = df.withColumn("env", chacha20_seal(F.col("msg"), key, F.col("aad")))
    out = env.withColumn("plain", chacha20_open(F.col("env"), key)).collect()
    assert [r["plain"] for r in out] == [r["msg"] for r in out]
    for r in out:
        assert len(r["env"]["nonce"]) == 12
    # cross-scheme failure (SealedPayloadSerializationTest: AES envelope
    # must not open under ChaCha20) and wrong-key tamper -> NULL
    aes_env = df.withColumn("env", seal(F.col("msg"), F.lit(KEY), F.col("aad")))
    crossed = aes_env.withColumn("plain", chacha20_open(F.col("env"), key)).collect()
    assert all(r["plain"] is None for r in crossed)
    wrong = env.withColumn("plain", chacha20_open(F.col("env"), b"x" * 32)).collect()
    assert all(r["plain"] is None for r in wrong)
    with pytest.raises(ValueError, match="32-byte"):
        chacha20_seal(F.col("msg"), b"short", F.col("aad"))


def test_multimodal_plumbing(spark):
    """Unsupported (opaque) payloads: metadata sniff says unknown, the
    digest-fake keeps the schema/batch shape real, strict raises."""
    media = spark.createDataFrame(
        [(i, bytes([i]) * (100 + i)) for i in range(8)] + [(99, None)],
        "media_id long, payload binary",
    )
    with_meta = attach_media_metadata(media)
    metas = {r["media_id"]: r["media"] for r in with_meta.collect()}
    assert metas[3]["n_bytes"] == 103 and metas[3]["media_type"] == "unknown"

    feats = decode_image_features(media).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert len(by_id[0]["features"]) == 16
    assert by_id[99]["decode_ok"] is False
    # deterministic: same payload -> same fake features
    feats2 = {r["media_id"]: r["features"] for r in decode_image_features(media).collect()}
    assert feats2[5] == by_id[5]["features"]

    frames = sample_video_frames(media.filter("payload is not null"), n_frames=3).collect()
    assert len(frames) == 8 * 3
    assert {r["frame_idx"] for r in frames} == {0, 1, 2}
    assert all(len(r["frame"]) == 16 and not r["decoded_ok"] for r in frames)

    # worker-side NotImplementedError arrives wrapped in PythonException
    with pytest.raises(Exception, match="needs Pillow"):
        decode_image_features(media, strict=True).collect()
    with pytest.raises(Exception, match="need ffmpeg"):
        sample_video_frames(media, strict=True).collect()
