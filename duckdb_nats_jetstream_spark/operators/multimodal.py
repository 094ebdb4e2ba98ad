"""Multimodal column plumbing for training-data pipelines (north-star
surface): image/audio/video as opaque ``binary`` columns with typed metadata,
processed by Arrow-batched ``mapInPandas`` stages.

The actual media codecs are NOT available in this environment, so the decode
kernels are **STUBBED**: ``decode=fake`` (default) derives deterministic
pseudo-features from the bytes (md5-seeded), ``decode=real`` raises
``NotImplementedError`` unless the optional library (PIL etc.) imports. What
IS real — and tested — is everything Spark cares about: the declared output
schema, the Arrow batch iteration contract, partition-preserving execution,
and the binary+metadata column model.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_META = T.StructType(
    [
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("data", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def as_media(
    df: DataFrame, id_col: str, bytes_col: str, kind: str = "image", fmt: str = "raw"
) -> DataFrame:
    """Wrap an (id, binary) pair into the media model with derived metadata."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.col(bytes_col).cast("binary").alias("data"),
        F.struct(
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(F.col(bytes_col).cast("binary")).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def _fake_feature(data: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-embedding: md5-chained bytes → [0,1) floats."""
    out: list[float] = []
    seed = hashlib.md5(data or b"").digest()
    while len(out) < dim:
        for i in range(0, len(seed), 4):
            v = int.from_bytes(seed[i : i + 4], "big") / 2**32
            out.append(float(v))
            if len(out) == dim:
                break
        seed = hashlib.md5(seed).digest()
    return out


def extract_features(df: DataFrame, dim: int = 16, decode: str = "fake") -> DataFrame:
    """Arrow-batched feature extraction over media binaries.

    ``decode="real"`` is the hook for an actual model/codec — STUB: raises
    unless the decoder library is importable. ``decode="fake"`` exercises the
    identical Spark plumbing with deterministic features.
    """
    if decode == "real":  # pragma: no cover - library not bundled
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real media decoding requires an image/audio library not "
                "bundled in this environment; use decode='fake'"
            ) from e

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(b or b"") for b in pdf["data"]],
                    "feature": [_fake_feature(b, dim) for b in pdf["data"]],
                }
            )

    from duckdb_nats_jetstream_spark.session import spread

    return spread(df).mapInPandas(batches, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: real resize needs PIL; the fake keeps bytes and stamps the
    requested dimensions into metadata (plumbing-identical)."""
    try:
        import PIL  # noqa: F401

        raise NotImplementedError("real resize path not implemented yet")
    except ImportError:
        pass
    return df.withColumn(
        "meta",
        F.struct(
            F.col("meta.format").alias("format"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.n_bytes").alias("n_bytes"),
        ),
    )


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """STUB frame sampler: emits one 'frame' row per ``every_n`` KB of the
    binary as a stand-in for video frame extraction — exercises the
    one-to-many mapInPandas shape a real sampler needs."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = {"media_id": [], "frame_no": [], "frame": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                data = data or b""
                step = every_n * 1024
                for i, off in enumerate(range(0, max(len(data), 1), step)):
                    rows["media_id"].append(mid)
                    rows["frame_no"].append(i)
                    rows["frame"].append(data[off : off + step])
            yield pd.DataFrame(rows)

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_no", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )
    return df.mapInPandas(batches, schema)
