"""Multimodal columns for training-data pipelines (north-star surface):
image/audio/video as opaque ``binary`` columns with typed metadata, processed
by Arrow-batched ``mapInPandas`` stages.

Decode capability ladder (no media libraries are bundled here):

1. **Real, stdlib-only** (``functions.imagecodec``): container-header probing
   for PNG/JPEG/GIF/BMP/PPM metadata (:func:`probe_media`), and a full PNG
   decode → nearest-neighbor resample → PNG re-encode path
   (:func:`resize_images`) via ``zlib`` — genuinely decoding pixels, no PIL.
2. **Optional library** — if PIL imports, :func:`resize_images` uses it for
   the non-PNG compressed formats.
3. **Deterministic fake** — md5-seeded pseudo-features
   (:func:`extract_features` ``decode='fake'``) for model-embedding stand-ins;
   a real model hook stays behind ``decode='real'``.

Everything Spark cares about is real and tested at every rung: declared
output schemas, Arrow batch iteration, partition-preserving execution, and
the binary+metadata column model.
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
        # double, not float: each component is uint32/2^32, exactly
        # representable in a double (and recoverable: v*2^32 -> bigint),
        # which is what lets the registry query digest features into a
        # SQL-mirrorable hex string for the driver's hash gate
        T.StructField("feature", T.ArrayType(T.DoubleType())),
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


def probe_media(df: DataFrame) -> DataFrame:
    """REAL metadata extraction: sniff format/width/height from the binary's
    container header (``functions.imagecodec.probe`` — stdlib parsing of
    PNG/JPEG/GIF/BMP/PPM headers, O(header bytes) per row, no decompression)
    and fill ``meta`` with what the bytes actually are. Unrecognized bytes
    keep the declared format with NULL dimensions."""
    from duckdb_nats_jetstream_spark.functions.imagecodec import probe

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            fmts, ws, hs = [], [], []
            for data, declared in zip(pdf["data"], pdf["meta"]):
                fmt, w, h = probe(data)
                fmts.append(fmt if fmt is not None else declared["format"])
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "data": pdf["data"],
                    "meta": [
                        {"format": f, "width": w, "height": h,
                         "n_bytes": len(d or b"")}
                        for f, w, h, d in zip(fmts, ws, hs, pdf["data"])
                    ],
                }
            )

    return df.mapInPandas(batches, MEDIA_SCHEMA)


def _fake_feature(data: bytes, dim: int) -> list[float]:
    """Deterministic pseudo-embedding: md5 hex-string chain → [0,1) floats.

    The chain hashes lowercase HEX STRINGS, not raw digest bytes:
    ``seed0 = md5(hex(data))``, ``seed_{i+1} = md5(seed_i_hexdigest)``.
    DuckDB's ``md5()`` only accepts VARCHAR, so a hex-string chain is the
    shape both engines can compute — the registry oracle mirrors it as
    ``md5(lower(hex(payload::BLOB)))`` then ``md5(md5(...))``, making the
    mapInPandas plumbing hash-verifiable end-to-end instead of rows-only.
    Each 4-byte group of a digest becomes uint32/2^32.
    """
    out: list[float] = []
    seed_hex = hashlib.md5((data or b"").hex().encode()).hexdigest()
    while len(out) < dim:
        raw = bytes.fromhex(seed_hex)
        for i in range(0, len(raw), 4):
            v = int.from_bytes(raw[i : i + 4], "big") / 2**32
            out.append(float(v))
            if len(out) == dim:
                break
        seed_hex = hashlib.md5(seed_hex.encode()).hexdigest()
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

    from duckdb_nats_jetstream_spark.tables import spread

    return spread(df).mapInPandas(batches, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """REAL image resize, Arrow-batched.

    Per row: PNG bytes are decoded, nearest-neighbor resampled, and
    re-encoded with the stdlib codec (``functions.imagecodec`` — actual
    pixel work, deterministic output bytes). Non-PNG formats fall back to
    PIL when importable; otherwise the row passes through with its original
    bytes and a NULL width/height in ``meta`` marking it un-resized (rows
    are never dropped — a 100 TB pipeline stage must be total).
    """
    from duckdb_nats_jetstream_spark.functions.imagecodec import (
        png_decode,
        png_encode,
        probe,
        resize_nearest,
    )

    try:  # capability check once per worker import, not per row
        from PIL import Image as _PILImage  # noqa: N813
    except ImportError:
        _PILImage = None

    def _resize_one(data: bytes | None):
        """Return (new_bytes, fmt, w, h) — w/h NULL when un-resizable."""
        fmt, _w, _h = probe(data)
        if fmt == "png":
            try:
                arr = png_decode(data)
                return png_encode(resize_nearest(arr, width, height)), fmt, width, height
            except ValueError:
                return data, fmt, None, None  # exotic PNG (16-bit/palette)
        if fmt is not None and _PILImage is not None:  # pragma: no cover
            import io

            with _PILImage.open(io.BytesIO(data)) as im:
                out = io.BytesIO()
                im.resize((width, height)).save(out, format=im.format)
                return out.getvalue(), fmt, width, height
        return data, fmt, None, None

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            out_rows = {"media_id": [], "kind": [], "data": [], "meta": []}
            for mid, kind, data, meta in zip(
                pdf["media_id"], pdf["kind"], pdf["data"], pdf["meta"]
            ):
                new_bytes, fmt, w, h = _resize_one(data)
                out_rows["media_id"].append(mid)
                out_rows["kind"].append(kind)
                out_rows["data"].append(new_bytes)
                out_rows["meta"].append(
                    {
                        "format": fmt if fmt is not None else meta["format"],
                        "width": w,
                        "height": h,
                        "n_bytes": len(new_bytes or b""),
                    }
                )
            yield pd.DataFrame(out_rows)

    from duckdb_nats_jetstream_spark.tables import spread

    # decode+resample is the compute-heavy per-row stage — restore scan
    # parallelism first (same rationale as the shingle pipelines)
    return spread(df).mapInPandas(batches, MEDIA_SCHEMA)


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


def audio_waveform_stats(df: DataFrame, bytes_col: str = "data",
                         id_col: str = "media_id") -> DataFrame:
    """Audio-modality feature extraction: interpret a binary column as
    16-bit little-endian PCM and emit the standard waveform audit —
    sample count, peak amplitude, energy (Σx², exact integer), and
    zero-crossing count — plus RMS computed column-side so the one
    division + sqrt is the same IEEE sequence in any engine. The heavy
    work is an Arrow-batched ``mapInPandas`` over numpy ``frombuffer``
    (no per-row Python); all emitted signals are exact integers, so a SQL
    oracle can recompute them from the hex encoding byte-for-byte."""
    import pandas as pd

    from pyspark.sql import functions as F

    def batches(it: Iterator) -> Iterator:
        import numpy as np

        for pdf in it:
            out = {"media_id": [], "n_samples": [], "peak": [],
                   "sum_sq": [], "zero_crossings": []}
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                buf = bytes(data or b"")
                s = np.frombuffer(buf[: (len(buf) // 2) * 2], dtype="<i2")
                x = s.astype(np.int64)
                out["media_id"].append(mid)
                out["n_samples"].append(len(x))
                out["peak"].append(int(np.abs(x).max()) if len(x) else 0)
                out["sum_sq"].append(int((x * x).sum()))
                out["zero_crossings"].append(
                    int(((x[:-1] >= 0) != (x[1:] >= 0)).sum()) if len(x) > 1 else 0
                )
            yield pd.DataFrame(out)

    schema = (
        "media_id long, n_samples long, peak long, sum_sq long, "
        "zero_crossings long"
    )
    stats = df.mapInPandas(batches, schema)
    rms = F.when(
        F.col("n_samples") > 0,
        F.sqrt(F.col("sum_sq") / F.col("n_samples")),
    ).otherwise(F.lit(0.0))
    return stats.withColumn("rms", rms)


def image_dhash(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "media",
) -> DataFrame:
    """Perceptual dHash over REAL decoded pixels — the image near-dup key.

    Per image (Arrow-batched mapInPandas, stdlib codec — no media libs):
    PNG-decode → luma (integer BT.601 weights: (299·R + 587·G + 114·B)
    div 1000 — exact integer math, reproducible anywhere) → 9×8
    nearest-neighbor resample → 64-bit horizontal-gradient hash (bit =
    left pixel > right neighbor). Returns ``(id, dhash)`` with the hash as
    a 16-hex string.

    Near-duplicate images differ in a few bits; exact duplicates collide
    exactly. Pair search at scale: band the 64 bits into four 16-bit keys
    (:func:`dhash_near_pairs`) — the same OR-amplified LSH shape as
    MinHash bands, so the shuffle carries band keys, never image pairs.
    Non-SQL-expressible (pixel decode), so registry checks are rows-only —
    the codec itself is pinned by byte-exact pytest fixtures."""
    import numpy as np
    import pandas as pd

    from duckdb_nats_jetstream_spark.functions.imagecodec import (
        png_decode,
        resize_nearest,
    )

    def batches(it):
        for pdf in it:
            ids, hashes = [], []
            for mid, data in zip(pdf[id_col], pdf[bytes_col]):
                ids.append(mid)
                # TOTAL stage, like resize_images: one NULL/corrupt/
                # non-PNG row must yield a null hash, not fail the job
                # (r09 review; at 100 TB some rows are always bad)
                try:
                    arr = png_decode(bytes(data))
                except (TypeError, ValueError):
                    hashes.append(None)
                    continue
                if arr.ndim == 3 and arr.shape[2] >= 3:
                    r = arr[:, :, 0].astype(np.int64)
                    g = arr[:, :, 1].astype(np.int64)
                    b = arr[:, :, 2].astype(np.int64)
                    luma = (299 * r + 587 * g + 114 * b) // 1000
                elif arr.ndim == 3:
                    # grayscale / gray+alpha PNG decodes as (h, w, 1|2):
                    # channel 0 IS the luma (indexing channels 1/2 was an
                    # IndexError pre-r09)
                    luma = arr[:, :, 0].astype(np.int64)
                else:
                    luma = arr.astype(np.int64)
                small = resize_nearest(
                    luma.astype(np.uint8)[:, :, None], 9, 8
                )[:, :, 0].astype(np.int64)
                bits = (small[:, :-1] > small[:, 1:]).astype(np.uint64).ravel()
                val = 0
                for bit in bits:
                    val = (val << 1) | int(bit)
                hashes.append(format(val, "016x"))
            yield pd.DataFrame({id_col: ids, "dhash": hashes})

    return df.mapInPandas(batches, f"{id_col} long, dhash string")


def dhash_near_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    max_hamming: int = 8,
) -> DataFrame:
    """Near-duplicate image pairs from dHash codes: four 16-bit band keys
    (any pair within hamming ≤ 12 of each other shares at least one exact
    band with good probability; hamming ≤ 3 GUARANTEES a shared band by
    pigeonhole), one band-keyed self-join, exact hamming verify via
    bit_count on the 64-bit integers. Returns (id_a, id_b, hamming)."""
    # two 32-bit halves: a full 64-bit conv overflows signed int64 when the
    # top bit is set
    h = hashes.select(
        F.col(id_col),
        F.col("dhash"),
        F.conv(F.substring("dhash", 1, 8), 16, 10).cast("long").alias("__hi"),
        F.conv(F.substring("dhash", 9, 8), 16, 10).cast("long").alias("__lo"),
    )
    banded = h.select(
        id_col,
        "__hi",
        "__lo",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.substring("dhash", i * 4 + 1, 4).alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select(
        id_col, "__hi", "__lo",
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.__hi").alias("ha"),
            F.col("a.__lo").alias("la"),
            F.col("b.__hi").alias("hb"),
            F.col("b.__lo").alias("lb"),
        )
        .distinct()
    )
    ham = F.bit_count(F.expr("ha ^ hb")) + F.bit_count(F.expr("la ^ lb"))
    return (
        cand.select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
