"""Multimodal plumbing: schema/batch-shape/partitioning are real; the codec
step is a clearly-marked deterministic fake (no image libs in container)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from colymer_acquirers_spark.operators.multimodal import (
    extract_image_features,
    sample_frames,
    synth_media,
)


@pytest.fixture(scope="module")
def media(spark):
    return synth_media(spark, 300).persist()


def test_synth_media_deterministic(spark, media):
    again = synth_media(spark, 300)
    a = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    b = {r["media_id"]: bytes(r["payload"]) for r in again.collect()}
    assert a == b


def test_image_features_schema_and_values(media):
    feats = extract_image_features(media)
    rows = feats.collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(rows) == n_images and n_images > 50
    src = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    for r in rows[:20]:
        payload = src[r["media_id"]]
        assert r["n_bytes"] == len(payload)
        assert r["sha256"] == hashlib.sha256(payload).hexdigest()
        assert len(r["feature"]) == 16
        assert 0.0 <= r["mean_byte"] <= 255.0
        assert r["width"] >= 16 and r["height"] >= 16


def test_real_decode_is_explicit_stub(media):
    with pytest.raises(NotImplementedError):
        extract_image_features(media, decode="real")


def test_frame_sampling_shape(media):
    frames = sample_frames(media, every_ms=60_000, max_frames=4)
    rows = frames.collect()
    n_videos = media.filter(F.col("kind") == "video").count()
    assert len(rows) >= n_videos  # ≥1 frame per video
    by_id: dict[int, list[int]] = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r["frame_idx"])
        assert len(bytes(r["frame_payload"])) <= 16
    for idxs in by_id.values():
        assert sorted(idxs) == list(range(len(idxs)))
        assert len(idxs) <= 4


def test_media_from_attachments_bridge(spark):
    """attachments_new (crawl output) → media table → features/frames: the
    full multimodal dataflow over crawl-derived descriptors."""
    from colymer_acquirers_spark.operators.multimodal import (
        extract_image_features,
        media_from_attachments,
    )

    atts = spark.createDataFrame(
        [
            (0, "a" * 32, "https://h.com/m/x.jpg", "image/jpeg", "x.jpg"),
            (0, "b" * 32, "https://h.com/m/y.mp4", "video/mp4", "y.mp4"),
            (1, "c" * 32, "https://h.com/m/z.mp3", "audio/mpeg", "z.mp3"),
            (1, "d" * 32, "https://h.com/m/w.png", "image/png", "w.png"),
        ],
        ["round", "id", "original_url", "content_type", "filename"],
    )
    media = media_from_attachments(atts)
    rows = {r["kind"] for r in media.collect()}
    assert rows == {"image", "video", "audio"}
    # deterministic: same descriptors → identical payloads
    p1 = {r["media_id"]: bytes(r["payload"]) for r in media.collect()}
    p2 = {r["media_id"]: bytes(r["payload"]) for r in media_from_attachments(atts).collect()}
    assert p1 == p2
    feats = extract_image_features(media).collect()
    assert len(feats) == 2 and all(f["n_bytes"] == 256 for f in feats)
