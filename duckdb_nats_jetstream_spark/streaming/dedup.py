"""Streaming deduplication — the live twin of :mod:`operators.dedup`'s
exact dedup, for ingest pipelines where the same message can arrive twice
(NATS JetStream redelivery, at-least-once sources; the reference's Direct
Get scan can also refetch on retry, ref:src/nats_scan.cpp:715-723).

``dropDuplicatesWithinWatermark`` keeps state only for the watermark
horizon: a duplicate arriving within the delay is dropped, state for older
keys is evicted, so memory is bounded by (unique-key rate × watermark) —
the only dedup shape that runs forever. Plain ``dropDuplicates`` on a
stream would keep ALL keys in state and OOM eventually; don't use it
unbounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def dedup_messages(
    stream_df: DataFrame,
    keys: list[str] | None = None,
    ts_col: str = "ts_nats",
    watermark: str = "2 hours",
) -> DataFrame:
    """Drop redelivered messages by key (default: the sequence number)
    within the watermark horizon."""
    keys = keys or ["seq"]
    return stream_df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)


def dedup_content(
    stream_df: DataFrame,
    payload_col: str = "payload",
    ts_col: str = "ts_nats",
    watermark: str = "2 hours",
) -> DataFrame:
    """Content-level streaming dedup: fingerprint the payload (md5 of the
    normalized bytes, same normalization as the batch ``fingerprint``) and
    keep the first arrival per fingerprint within the watermark."""
    from duckdb_nats_jetstream_spark.functions.text import fingerprint

    return (
        stream_df.withColumn("__fp", fingerprint(F.col(payload_col).cast("string")))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
