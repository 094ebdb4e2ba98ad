"""Structured Streaming path: the streaming message scan must agree with the
batch scan on the same log; windowed rollups and checkpointed resume work."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.sources import message_scan
from duckdb_nats_jetstream_spark.streaming.stream_scan import (
    message_stream,
    parquet_sink,
    run_to_completion,
    windowed_message_counts,
)


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("stream_log")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_empty_log_dir_requires_explicit_ts_type(spark, tmp_path):
    """Tailing a not-yet-written directory must not GUESS the ts flavor
    (r09 review: the silent LongType guess made the first real micro-batch
    fail with a parquet conversion error on timestamp-flavored files) —
    it raises with the remedy, and the explicit ts_type override builds."""
    from pyspark.sql import types as T

    empty = tmp_path / "empty_log"
    empty.mkdir()
    with pytest.raises(ValueError, match="ts_type"):
        message_stream(spark, str(empty))
    df = message_stream(spark, str(empty), ts_type=T.TimestampNTZType())
    assert df.isStreaming and "ts_nats" in df.columns


def test_stream_matches_batch(spark, sf_dir, log_dir, tmp_path):
    stream = message_stream(spark, log_dir)
    got = run_to_completion(stream, str(tmp_path / "ckpt")).collect()
    want = message_scan(spark, sf_dir, payload_binary=False).collect()
    assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in want)


def test_windowed_counts_with_watermark(spark, sf_dir, log_dir, tmp_path):
    stream = message_stream(spark, log_dir)
    agg = windowed_message_counts(stream, window="6 hours", watermark="1 hour")
    got = run_to_completion(agg, str(tmp_path / "ckpt2")).collect()
    assert got, "windowed aggregation produced no rows"
    # cross-check one window's count against the batch engine
    batch = message_scan(spark, sf_dir, payload_binary=False)
    w0 = got[0]
    n = batch.filter(
        (F.col("ts_nats") >= w0.window_start)
        & (F.col("ts_nats") < w0.window_end)
        & (F.col("subject") == w0.subject)
    ).count()
    assert n == w0.n_msgs


def test_streaming_json_extract_and_subject_filter(spark, log_dir, tmp_path):
    stream = message_stream(spark, log_dir, subject="purchase", json_fields=["k"])
    got = run_to_completion(stream, str(tmp_path / "ckpt3")).collect()
    assert got
    assert all("purchase" in r.subject for r in got)
    assert all(r.k is None or r.k.isdigit() for r in got)


def test_streaming_typed_extract_matches_batch(spark, sf_dir, log_dir, tmp_path):
    """The JVM typed-extraction path composes unchanged on the stream:
    from_json struct + projection over readStream equals the batch plan."""
    from pyspark.sql import types as T

    from duckdb_nats_jetstream_spark.functions.typed_extract import (
        parse_json_payload,
        typed_extract,
    )

    schema = T.StructType([T.StructField("k", T.LongType())])
    stream = typed_extract(
        parse_json_payload(message_stream(spark, log_dir), schema), ["k"]
    ).select("seq", "k")
    got = run_to_completion(stream, str(tmp_path / "ckpt_te")).collect()
    want = typed_extract(
        parse_json_payload(
            message_scan(spark, sf_dir, payload_binary=False), schema
        ),
        ["k"],
    ).select("seq", "k").collect()
    assert sorted(tuple(r) for r in got) == sorted(tuple(r) for r in want)


def test_checkpoint_resume_no_duplicates(spark, sf_dir, log_dir, tmp_path):
    """Durable-consumer semantics: a second run over the same checkpoint
    re-reads nothing (ref roadmap: checkpoint management, GUIDE.md:461-465)."""
    ckpt = str(tmp_path / "ckpt4")
    out = str(tmp_path / "out")
    q = parquet_sink(message_stream(spark, log_dir), out, ckpt)
    q.awaitTermination()
    n1 = spark.read.parquet(out).count()
    q2 = parquet_sink(message_stream(spark, log_dir), out, ckpt)
    q2.awaitTermination()
    n2 = spark.read.parquet(out).count()
    assert n1 > 0 and n2 == n1  # nothing re-emitted on resume
