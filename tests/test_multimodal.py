"""Multimodal binary-column plumbing tests (decode stubbed, plumbing real)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from variant_load_pipeline_spark.multimodal import binary_ops as B


def _media(spark):
    rows = [
        (1, "image", bytes(range(200))),
        (2, "image", bytes(range(200))),   # exact dup of 1
        (3, "image", b"\x01\x02\x03" * 1000),
        (4, "image", b""),
    ]
    return spark.createDataFrame(rows, ["media_id", "media_type", "payload"])


def test_metadata_and_exact_dedup(spark):
    df = B.with_media_metadata(_media(spark))
    rows = {r["media_id"]: r for r in df.collect()}
    assert rows[1]["byte_len"] == 200
    assert rows[1]["content_hash"] == rows[2]["content_hash"]
    assert rows[1]["content_hash"] != rows[3]["content_hash"]

    groups = B.exact_media_dedup(df).collect()
    by_canon = {r["canonical_media_id"]: r["n_copies"] for r in groups}
    assert by_canon[1] == 2 and by_canon[3] == 1


def test_decode_images_fake_codec(spark):
    df = _media(spark)
    feats = {r["media_id"]: r for r in B.decode_images(df).collect()}
    assert len(feats) == 4
    assert feats[1]["width"] == 1 + (200 % 64)
    assert feats[1]["n_channels"] == 3
    assert feats[1]["mean_intensity"] == feats[2]["mean_intensity"]
    assert feats[4]["mean_intensity"] == 0.0


def test_real_codec_raises(spark):
    with pytest.raises(NotImplementedError):
        B.decode_images(_media(spark), codec="pillow")


def test_frame_sample_plan(spark):
    df = B.with_media_metadata(_media(spark))
    frames = B.frame_sample_plan(df, every_nth=1).collect()
    per_media = {}
    for r in frames:
        per_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    # media 3 has 3000 bytes -> 3 frames
    assert per_media[3] == [0, 1, 2]
    assert per_media[4] == [0]


def test_resize_images_batch_contract(spark):
    from variant_load_pipeline_spark.multimodal import binary_ops as B

    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, bytearray(b""))],
        "media_id long, payload binary",
    )
    out = {r["media_id"]: r for r in B.resize_images(df, 4, 4).collect()}
    assert len(out[1]["payload"]) == 4 * 4 * 3
    assert out[1]["width"] == 4 and out[1]["height"] == 4
    assert len(out[2]["payload"]) == 0 or len(out[2]["payload"]) == 4 * 4 * 3


def test_extract_features_feeds_similarity(spark):
    from pyspark.sql import functions as F

    from variant_load_pipeline_spark.multimodal import binary_ops as B
    from variant_load_pipeline_spark.operators.similarity import cosine

    df = spark.createDataFrame(
        [(1, bytearray(b"aaa")), (2, bytearray(b"aaa")), (3, bytearray(b"zzz"))],
        "media_id long, payload binary",
    )
    emb = B.extract_features(df)
    rows = {r["media_id"]: r["embedding"] for r in emb.collect()}
    assert len(rows[1]) == B.EMBED_DIM
    assert rows[1] == rows[2] != rows[3]  # deterministic, content-addressed
    # the embedding column plugs straight into the cosine operators
    a = emb.select(F.col("media_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("media_id").alias("ib"), F.col("embedding").alias("vb"))
    sims = a.crossJoin(b).filter(F.col("ia") < F.col("ib")).select(
        "ia", "ib", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim")
    ).collect()
    by_pair = {(r["ia"], r["ib"]): r["sim"] for r in sims}
    assert by_pair[(1, 2)] == 1.0
    assert by_pair[(1, 3)] < 1.0


def test_extract_features_real_codec_raises(spark):
    import pytest as _pytest

    from variant_load_pipeline_spark.multimodal import binary_ops as B

    df = spark.createDataFrame([(1, bytearray(b"x"))], "media_id long, payload binary")
    with _pytest.raises(NotImplementedError):
        B.extract_features(df, codec="onnx")
