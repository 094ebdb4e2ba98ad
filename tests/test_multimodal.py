"""Multimodal surface: media model schema, Arrow-batched feature extraction
determinism, one-to-many frame sampling, real stdlib image codec (header
probe + PNG decode/resize/encode), model-decode gating."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest
from pyspark.sql import Row, functions as F, types as T

from duckdb_nats_jetstream_spark.functions.imagecodec import (
    png_decode,
    png_encode,
    probe,
    resize_nearest,
)
from duckdb_nats_jetstream_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    as_media,
    extract_features,
    probe_media,
    resize_images,
    sample_frames,
)
from duckdb_nats_jetstream_spark.sources import message_scan


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    # payload bytes from the message log stand in for media blobs
    df = message_scan(spark, sf_dir).limit(100)
    return as_media(df, id_col="seq", bytes_col="payload", kind="image")


def _gradient_image(h: int, w: int, ch: int = 3) -> np.ndarray:
    """Deterministic test pixels: every (row, col, channel) value distinct mod 256."""
    return (
        (np.arange(h)[:, None, None] * 7 + np.arange(w)[None, :, None] * 3
         + np.arange(ch)[None, None, :] * 11) % 256
    ).astype(np.uint8)


@pytest.fixture(scope="module")
def png_media(spark):
    rows = [
        Row(media_id=i, png=png_encode(_gradient_image(16 + i, 24 + i)))
        for i in range(5)
    ]
    df = spark.createDataFrame(rows)
    return as_media(df, id_col="media_id", bytes_col="png", kind="image", fmt="png")


def test_media_model_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "data", "meta"]
    assert isinstance(media.schema["data"].dataType, T.BinaryType)
    row = media.limit(1).collect()[0]
    assert row.meta.n_bytes == len(row.data)


def test_extract_features_schema_and_determinism(spark, media):
    out = extract_features(media, dim=8)
    assert out.schema == FEATURE_SCHEMA
    a = {r.media_id: r.feature for r in out.collect()}
    b = {r.media_id: r.feature for r in extract_features(media, dim=8).collect()}
    assert a == b  # deterministic across runs
    assert all(len(v) == 8 and all(0 <= x < 1 for x in v) for v in a.values())


def test_real_decode_is_gated(media):
    with pytest.raises(NotImplementedError, match="not bundled"):
        extract_features(media, decode="real").collect()


# --- stdlib image codec -------------------------------------------------------


def test_png_roundtrip_bit_exact():
    for ch in (1, 2, 3, 4):
        arr = _gradient_image(13, 17, ch)
        assert np.array_equal(png_decode(png_encode(arr)), arr)


def test_png_decode_all_filter_types():
    """Decode a PNG whose rows use every filter type (0-4) — exercises the
    Sub/Up/Average/Paeth unfilter paths, not just the filter-0 encoder."""
    arr = _gradient_image(5, 8, 3)
    h, w, ch = arr.shape
    stride = w * ch
    body = arr.reshape(h, stride).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int64)
    for r, ftype in enumerate([0, 1, 2, 3, 4]):
        cur = body[r]
        left = np.concatenate([np.zeros(ch, dtype=np.int64), cur[:-ch]])
        pleft = np.concatenate([np.zeros(ch, dtype=np.int64), prev[:-ch]])
        if ftype == 0:
            enc = cur
        elif ftype == 1:
            enc = cur - left
        elif ftype == 2:
            enc = cur - prev
        elif ftype == 3:
            enc = cur - ((left + prev) >> 1)
        else:
            p = left + prev - pleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - pleft)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, pleft))
            enc = cur - pred
        raw.append(ftype)
        raw.extend((enc % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(t, p):
        return struct.pack(">I", len(p)) + t + p + struct.pack(
            ">I", zlib.crc32(t + p) & 0xFFFFFFFF
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(data), arr)


def test_probe_formats():
    png = png_encode(_gradient_image(7, 9))
    assert probe(png) == ("png", 9, 7)
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 20
    assert probe(gif) == ("gif", 320, 200)
    bmp = b"BM" + b"\x00" * 16 + struct.pack("<ii", 640, -480) + b"\x00" * 20
    assert probe(bmp) == ("bmp", 640, 480)
    # minimal JPEG: SOI, APP0 stub, SOF0 with 100x50
    jpeg = (
        b"\xff\xd8\xff\xe0" + struct.pack(">H", 4) + b"JF"
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 50, 100)
        + b"\x03" + b"\x00" * 6
    )
    assert probe(jpeg) == ("jpeg", 100, 50)
    ppm = b"P6\n# comment\n12 34\n255\n" + b"\x00" * 10
    assert probe(ppm) == ("ppm", 12, 34)
    assert probe(b'{"json": 1}paddingpadding') == (None, None, None)
    assert probe(None) == (None, None, None)
    assert probe(b"\x89PNG\r\n\x1a\n trunc") == (None, None, None)  # truncated


def test_resize_nearest_identity_and_downscale():
    arr = _gradient_image(16, 16)
    assert np.array_equal(resize_nearest(arr, 16, 16), arr)
    small = resize_nearest(arr, 4, 4)
    assert small.shape == (4, 4, 3)
    # pixel-center mapping picks source index floor((i+.5)*16/4) = 2,6,10,14
    assert np.array_equal(small, arr[[2, 6, 10, 14]][:, [2, 6, 10, 14]])


# --- Spark operators over real PNG bytes --------------------------------------


def test_probe_media_real_metadata(png_media):
    metas = {r.media_id: r.meta for r in probe_media(png_media).collect()}
    for i, m in metas.items():
        assert (m.format, m.width, m.height) == ("png", 24 + i, 16 + i)


def test_probe_media_unrecognized_keeps_declared_format(media):
    out = probe_media(media).limit(5).collect()
    assert all(r.meta.format == "raw" and r.meta.width is None for r in out)


def test_resize_images_real_pixels(png_media):
    out = {r.media_id: r for r in resize_images(png_media, 8, 6).collect()}
    for i, r in out.items():
        assert (r.meta.width, r.meta.height, r.meta.format) == (8, 6, "png")
        decoded = png_decode(bytes(r.data))
        src = _gradient_image(16 + i, 24 + i)
        assert np.array_equal(decoded, resize_nearest(src, 8, 6))


def test_resize_images_passthrough_non_image(media):
    """JSON payload bytes aren't images: bytes unchanged, NULL dims mark
    the row un-resized, no rows dropped."""
    before = media.limit(10).collect()
    after = {r.media_id: r for r in resize_images(media.limit(10), 8, 8).collect()}
    assert len(after) == len(before)
    for b in before:
        a = after[b.media_id]
        assert bytes(a.data) == bytes(b.data)
        assert a.meta.width is None and a.meta.height is None


def test_sample_frames_one_to_many(spark, media):
    out = sample_frames(media, every_n=1)
    rows = out.collect()
    assert len(rows) >= media.count()
    assert all(r.frame_no == 0 for r in rows if r.frame_no == 0)
    # features compose downstream on frames too
    refeat = extract_features(
        out.select(F.col("media_id"), F.lit("image").alias("kind"), F.col("frame").alias("data"))
    )
    assert refeat.count() == len(rows)


def test_dhash_identity_and_near_pairs(spark):
    """Identical pixels → identical hash; a small brightness shift → near
    hash (gradient invariance); unrelated noise → no near pair at the
    threshold. The banded join must return the exact-dup pair at 0."""
    import numpy as np

    from duckdb_nats_jetstream_spark.functions.imagecodec import png_encode
    from duckdb_nats_jetstream_spark.operators.multimodal import (
        dhash_near_pairs,
        image_dhash,
    )

    rng = np.random.RandomState(7)
    base = rng.randint(0, 255, (24, 24, 3)).astype(np.uint8)
    bright = np.clip(base.astype(int) + 3, 0, 255).astype(np.uint8)
    other = rng.randint(0, 255, (24, 24, 3)).astype(np.uint8)
    rows = [
        (1, bytearray(png_encode(base))),
        (2, bytearray(png_encode(base))),
        (3, bytearray(png_encode(bright))),
        (4, bytearray(png_encode(other))),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    h = image_dhash(df)
    hs = {r.media_id: r.dhash for r in h.collect()}
    assert hs[1] == hs[2]  # byte-identical input → identical hash
    assert hs[1] == hs[3]  # uniform brightness shift preserves gradients
    assert hs[1] != hs[4]
    pairs = {(r.id_a, r.id_b): r.hamming for r in dhash_near_pairs(h, max_hamming=8).collect()}
    assert pairs.get((1, 2)) == 0 and pairs.get((1, 3)) == 0
    assert not any(4 in p for p in pairs)


def test_dhash_grayscale_and_bad_rows_are_total(spark):
    """image_dhash must be a TOTAL stage (r09 review): a grayscale PNG
    (decodes (h, w, 1) — indexing channels 1/2 was an IndexError), a NULL
    media cell, and non-PNG bytes all yield rows — real hashes for the
    gray image, null hash for the undecodable ones — instead of failing
    the whole job."""
    import numpy as np

    from duckdb_nats_jetstream_spark.functions.imagecodec import png_encode
    from duckdb_nats_jetstream_spark.operators.multimodal import image_dhash

    rng = np.random.RandomState(11)
    gray = rng.randint(0, 255, (16, 16)).astype(np.uint8)
    rows = [
        (1, bytearray(png_encode(gray))),
        (2, None),
        (3, bytearray(b"not a png at all")),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    hs = {r.media_id: r.dhash for r in image_dhash(df).collect()}
    assert set(hs) == {1, 2, 3}
    assert hs[1] is not None and len(hs[1]) == 16
    assert hs[2] is None and hs[3] is None


def test_phash_query_runs(spark, sf_dir):
    from duckdb_nats_jetstream_spark.queries.pipeline5 import multimodal_phash

    rows = multimodal_phash(spark, sf_dir).collect()
    assert rows and all(len(r.dhash) == 16 for r in rows)
    assert all(r.n_same_hash >= 1 for r in rows)
