"""Multimodal plumbing: media model schema, Arrow-batched feature extraction
determinism, one-to-many frame sampling, stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from duckdb_nats_jetstream_spark.operators.multimodal import (
    FEATURE_SCHEMA,
    as_media,
    extract_features,
    resize_images,
    sample_frames,
)
from duckdb_nats_jetstream_spark.sources import message_scan


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    # payload bytes from the message log stand in for media blobs
    df = message_scan(spark, sf_dir).limit(100)
    return as_media(df, id_col="seq", bytes_col="payload", kind="image")


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


def test_resize_stamps_metadata(media):
    out = resize_images(media, 224, 224).limit(1).collect()[0]
    assert (out.meta.width, out.meta.height) == (224, 224)


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
