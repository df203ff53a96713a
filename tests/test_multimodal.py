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
