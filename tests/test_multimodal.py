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


def test_bmp_roundtrip_exact():
    """encode_bmp → decode_bmp is the identity, including widths that
    force row padding (w*3 % 4 != 0)."""
    import numpy as np

    from colymer_acquirers_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.RandomState(7)
    for w, h in [(4, 4), (5, 3), (7, 2), (1, 1), (6, 9)]:
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all(), (w, h)


def test_bmp_decode_truth_hand_computed():
    """Pure-Python truth: a 2x2 image with known pixels decodes to exactly
    those pixels, and the feature math (mean, 16-bin histogram) matches
    hand-computed values."""
    import numpy as np

    from colymer_acquirers_spark.operators.multimodal import (
        _bmp_pixel_stats,
        encode_bmp,
    )

    px = np.array(
        [[[0, 16, 32], [255, 255, 255]], [[128, 128, 128], [0, 0, 0]]],
        dtype=np.uint8,
    )
    w, h, mean, hist = _bmp_pixel_stats(encode_bmp(px))
    assert (w, h) == (2, 2)
    assert mean == pytest.approx((0 + 16 + 32 + 255 * 3 + 128 * 3 + 0) / 12)
    # bins of width 16: four 0s in bin0, 16 in bin1, 32 in bin2, 128s in
    # bin8, 255s in bin15
    expect = [0.0] * 16
    expect[0] = 4 / 12
    expect[1] = 1 / 12
    expect[2] = 1 / 12
    expect[8] = 3 / 12
    expect[15] = 3 / 12
    assert hist == pytest.approx(expect)


def test_bmp_decode_32bit_and_topdown():
    """The decoder also accepts 32-bit BGRA payloads and top-down row
    order (negative biHeight) — both hand-packed here against the spec."""
    import struct

    import numpy as np

    from colymer_acquirers_spark.operators.multimodal import decode_bmp

    rgb = np.array([[[10, 20, 30], [40, 50, 60]]], dtype=np.uint8)  # 1x2
    # 32-bit top-down: BGRA rows in natural order, no padding needed
    bgra = np.concatenate([rgb[:, :, ::-1], np.full((1, 2, 1), 255, np.uint8)], axis=2)
    img = bgra.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(img), 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, 2, -1, 1, 32, 0, len(img), 0, 0, 0, 0)
    assert (decode_bmp(header + info + img) == rgb).all()


def test_real_decode_mixed_paths(spark, media):
    """decode='real' over a mixed table: BMP rows report DECODED pixel
    stats (verified against a pure-Python recomputation), non-BMP rows
    fall back byte-for-byte to the fake path."""
    import numpy as np
    from pyspark.sql import functions as F

    from colymer_acquirers_spark.operators.multimodal import (
        _bmp_pixel_stats,
        synth_media_bmp,
    )

    bmp = synth_media_bmp(spark, 40).withColumn(
        "media_id", F.col("media_id") + 1_000_000
    ).persist()
    mixed = bmp.unionByName(media)
    feats = {r["media_id"]: r for r in
             extract_image_features(mixed, decode="real").collect()}

    src = {r["media_id"]: bytes(r["payload"]) for r in bmp.collect()}
    assert len(src) == 40
    for mid, payload in src.items():
        r = feats[mid]
        w, h, mean, hist = _bmp_pixel_stats(payload)
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_byte"] == pytest.approx(mean)
        assert np.allclose(r["feature"], hist, atol=1e-6)
        assert r["n_bytes"] == len(payload)
        assert r["sha256"] == hashlib.sha256(payload).hexdigest()

    # non-BMP rows: identical to the fake path
    fake = {r["media_id"]: r for r in
            extract_image_features(media, decode="fake").collect()}
    for mid, fr in fake.items():
        rr = feats[mid]
        assert rr["mean_byte"] == fr["mean_byte"]
        assert rr["feature"] == fr["feature"]
        assert (rr["width"], rr["height"]) == (fr["width"], fr["height"])
    bmp.unpersist()


def test_decode_mode_validated(media):
    with pytest.raises(ValueError, match="decode must be"):
        extract_image_features(media, decode="bogus")


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


def test_real_decode_never_fails_on_bad_bmp(spark):
    """Review r4: a 'BM'-prefixed payload the decoder rejects (garbage,
    paletted/RLE variants, truncated) must fall back to the byte-stat fake
    row — one bad payload must never fail the mapInPandas task."""
    import struct

    import pandas as pd

    from colymer_acquirers_spark.operators.multimodal import (
        MEDIA,
        _fake_image_features,
        extract_image_features,
    )

    # 8-bit paletted header (unsupported bpp) + plain garbage after magic
    pal_hdr = (
        struct.pack("<2sIHHI", b"BM", 200, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 4, 4, 1, 8, 0, 16, 0, 0, 0, 0)
        + b"\x00" * 146
    )
    payloads = [b"BMgarbage-not-a-real-bmp", pal_hdr, b"BM"]
    pdf = pd.DataFrame(
        {
            "media_id": range(len(payloads)),
            "kind": ["image"] * len(payloads),
            "payload": payloads,
            "meta": [
                {"width": 9, "height": 7, "duration_ms": None,
                 "sample_rate": None, "format": "bmp"}
            ] * len(payloads),
        }
    )
    media = spark.createDataFrame(pdf, MEDIA)
    rows = {r["media_id"]: r
            for r in extract_image_features(media, decode="real").collect()}
    fake = _fake_image_features(pdf)
    assert len(rows) == len(payloads)
    for i in range(len(payloads)):  # byte-stat fallback, metadata dims
        assert rows[i]["mean_byte"] == pytest.approx(fake["mean_byte"][i])
        assert (rows[i]["width"], rows[i]["height"]) == (9, 7)


def test_bmp_roundtrip_property():
    """Property: encode→decode is the identity for EVERY (w, h, content),
    including the padded-row widths — hypothesis explores the space."""
    import numpy as np
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from colymer_acquirers_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    @given(
        w=st.integers(1, 37),
        h=st.integers(1, 37),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=60, deadline=None)
    def check(w, h, seed):
        px = np.random.RandomState(seed).randint(
            0, 256, size=(h, w, 3)
        ).astype(np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all()

    check()


def test_png_roundtrip_all_filters():
    """encode_png -> decode_png is the identity for every row-filter type
    (0-4) and mixed per-row filters, across shapes."""
    import numpy as np

    from colymer_acquirers_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    rng = np.random.RandomState(11)
    for w, h in [(1, 1), (4, 4), (5, 3), (7, 2), (6, 9), (31, 17)]:
        px = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
        for ft in range(5):
            assert (decode_png(encode_png(px, filters=ft)) == px).all()
        fl = [int(rng.randint(0, 5)) for _ in range(h)]
        assert (decode_png(encode_png(px, filters=fl)) == px).all()


def _png_pack(w, h, color_type, raw_rows: bytes) -> bytes:
    """Test-side independent PNG packer: signature + IHDR + IDAT + IEND
    built from the spec, NOT from the module's encoder."""
    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw_rows))
        + chunk(b"IEND", b"")
    )


def test_png_decode_truth_hand_filtered():
    """Spec truth, independent of encode_png: filtered bytes are computed
    BY HAND for a 2x2 RGB image using Sub then Paeth rows; a shared
    encoder/decoder bug cannot satisfy this."""
    import numpy as np

    from colymer_acquirers_spark.operators.multimodal import decode_png

    # target pixels: row0 = (10,20,30), (13,24,35); row1 = (9,19,31), (12,24,36)
    # row0 filter 1 (Sub): f = raw - left -> (10,20,30), (3,4,5)
    # row1 filter 4 (Paeth): x=0: pred=paeth(0, up=(10,20,30), 0)=up
    #   -> f = (9-10, 19-20, 31-30) mod 256 = (255, 255, 1)
    #   x=1: a=left=(9,19,31), b=up=(13,24,35), c=ul=(10,20,30)
    #   p = a+b-c = (12,23,36); |p-a|=(3,4,5) |p-b|=(1,1,1) |p-c|=(2,3,6)
    #   -> predictor = b per channel -> f = (12-13, 24-24, 36-35) = (255,0,1)
    raw = bytes(
        [1, 10, 20, 30, 3, 4, 5]
        + [4, 255, 255, 1, 255, 0, 1]
    )
    got = decode_png(_png_pack(2, 2, 2, raw))
    want = np.array(
        [[[10, 20, 30], [13, 24, 35]], [[9, 19, 31], [12, 24, 36]]],
        dtype=np.uint8,
    )
    assert (got == want).all()


def test_png_decode_rgba_drops_alpha():
    import numpy as np

    from colymer_acquirers_spark.operators.multimodal import decode_png

    # 1x2 RGBA, filter 0: (1,2,3,255), (4,5,6,128) -> alpha dropped
    raw = bytes([0, 1, 2, 3, 255, 4, 5, 6, 128])
    got = decode_png(_png_pack(2, 1, 6, raw))
    assert (got == np.array([[[1, 2, 3], [4, 5, 6]]], np.uint8)).all()


def test_png_decode_rejects_unsupported():
    import struct
    import zlib

    import pytest as _pytest

    from colymer_acquirers_spark.operators.multimodal import decode_png

    with _pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"GIF89a....")
    # palette color type (3) is unsupported -> ValueError (fake fallback)
    raw = bytes([0, 0])
    with _pytest.raises(ValueError, match="unsupported PNG variant"):
        decode_png(_png_pack(1, 1, 3, raw))
    # truncated mid-IDAT (cut reaches past IEND and the IDAT crc into the
    # chunk body; the chunk-length check must fire)
    ok = _png_pack(1, 1, 2, bytes([0, 1, 2, 3]))
    with _pytest.raises(ValueError):
        decode_png(ok[:-18])


def test_png_real_decode_mixed_paths(spark, media):
    """decode='real' over PNG fixture rows reports DECODED pixel stats
    (verified against the pure-Python stats recomputation); fake rows are
    untouched — the PNG twin of test_real_decode_mixed_paths."""
    import hashlib as _hashlib

    import numpy as np
    from pyspark.sql import functions as F

    from colymer_acquirers_spark.operators.multimodal import (
        _png_pixel_stats,
        extract_image_features,
        synth_media_png,
    )

    png = synth_media_png(spark, 40).withColumn(
        "media_id", F.col("media_id") + 2_000_000
    ).persist()
    mixed = png.unionByName(media)
    feats = {r["media_id"]: r for r in
             extract_image_features(mixed, decode="real").collect()}
    src = {r["media_id"]: bytes(r["payload"]) for r in png.collect()}
    assert len(src) == 40
    for mid, payload in src.items():
        r = feats[mid]
        w, h, mean, hist = _png_pixel_stats(payload)
        assert (r["width"], r["height"]) == (w, h)
        assert r["mean_byte"] == pytest.approx(mean)
        assert np.allclose(r["feature"], hist, atol=1e-6)
        assert r["sha256"] == _hashlib.sha256(payload).hexdigest()
    png.unpersist()
