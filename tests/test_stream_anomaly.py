"""Streaming EWMA anomaly baseline: every CLOSED hour's smoothed value
must equal the batch prefix-EWMA over the same observed-hour series."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.sources.message_scan import message_scan
from duckdb_nats_jetstream_spark.streaming.anomaly import streaming_ewma_anomaly
from duckdb_nats_jetstream_spark.streaming.stream_scan import message_stream


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("ewma_log")
    shutil.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    return str(d)


def test_streaming_ewma_matches_batch_prefix(spark, sf_dir, log_dir, tmp_path):
    stream = message_stream(spark, log_dir)
    out = streaming_ewma_anomaly(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.subject, r.hour): (r.n_msgs, r.ewma)
        for r in spark.sql("SELECT * FROM ewma_out").collect()
    }
    assert got, "no closed hours emitted"

    hourly = (
        message_scan(spark, sf_dir)
        .groupBy("subject", F.expr("unix_micros(ts_nats) div 3600000000").alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    series: dict = {}
    for r in hourly:
        series.setdefault(r.subject, []).append((r.h, r.c))
    n_checked = 0
    for subject, pts in series.items():
        pts.sort()
        ewma = None
        for i, (h, c) in enumerate(pts):
            ewma = float(c) if ewma is None else 0.25 * c + 0.75 * ewma
            if i < len(pts) - 1:  # last hour per subject stays open
                assert got[(subject, h)] == (c, ewma), (subject, h)
                n_checked += 1
            else:
                assert (subject, h) not in got
    assert n_checked > 0 and len(got) == n_checked


def test_streaming_ewma_multibatch_chronological(spark, sf_dir, tmp_path):
    """State must carry across micro-batches: chronological split (the
    source contract — per-subject hours non-decreasing), one file per
    trigger; closed hours must still equal the batch prefix, including the
    boundary hour that spans both batches."""
    import glob
    import shutil

    d = tmp_path / "ewma_log2"
    d.mkdir()
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    mid = events.approxQuantile("event_id", [0.5], 0.0)[0]
    events.filter(F.col("event_id") <= mid).coalesce(1).write.parquet(str(d / "p0"))
    events.filter(F.col("event_id") > mid).coalesce(1).write.parquet(str(d / "p1"))
    import os
    import time

    for i, part in enumerate(sorted(glob.glob(f"{d}/p*/part-*.parquet"))):
        dst = d / f"{i}.parquet"
        shutil.copy(part, dst)
        # the file source orders batches by modification time, and a live
        # tail's files appear in time order — equal mtimes from the copies
        # would leave the order unspecified and can replay the halves
        # backwards (observed), violating the operator's ordering contract
        os.utime(dst, (time.time() - 100 + i, time.time() - 100 + i))
    shutil.rmtree(d / "p0")
    shutil.rmtree(d / "p1")

    stream = message_stream(spark, str(d), max_files_per_trigger=1)
    out = streaming_ewma_anomaly(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_mb_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.subject, r.hour): (r.n_msgs, r.ewma)
        for r in spark.sql("SELECT * FROM ewma_mb_out").collect()
    }
    assert got

    hourly = (
        message_scan(spark, sf_dir)
        .groupBy("subject", F.expr("unix_micros(ts_nats) div 3600000000").alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    series: dict = {}
    for r in hourly:
        series.setdefault(r.subject, []).append((r.h, r.c))
    for subject, pts in series.items():
        pts.sort()
        ewma = None
        for i, (h, c) in enumerate(pts):
            ewma = float(c) if ewma is None else 0.25 * c + 0.75 * ewma
            if i < len(pts) - 1:
                assert got[(subject, h)] == (c, ewma), (subject, h)


def test_streaming_ewma_null_timestamps_dropped(spark, tmp_path):
    """Null event times must be DROPPED, not kill the query with
    int(NaN) (the r09 funnel/sessionize crash class — this module was
    missed in that sweep, found by the r10 review)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "null_log"
    d.mkdir()
    base = 1704067200 * 10**6
    pq.write_table(
        pa.table(
            {
                "subject": ["s.a"] * 4,
                "ts_nats": pa.array(
                    [base, None, base + 3600 * 10**6, None],
                    pa.timestamp("us"),
                ),
            }
        ),
        str(d / "chunk.parquet"),
    )
    stream = (
        spark.readStream.schema("subject string, ts_nats timestamp")
        .parquet(str(d))
    )
    out = streaming_ewma_anomaly(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_null_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_null"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # would raise PythonException before the fix
    rows = spark.sql("SELECT * FROM ewma_null_out").collect()
    # hour 0 closed by the hour-1 event with exactly the ONE non-null
    # event counted; the two null-ts rows vanished instead of crashing
    assert len(rows) == 1 and rows[0].n_msgs == 1
