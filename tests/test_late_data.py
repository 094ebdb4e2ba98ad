"""Watermark late-data semantics: events older than the watermark horizon are
dropped from windowed aggregation once the watermark has advanced past them."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.streaming.stream_scan import (
    message_stream,
    windowed_message_counts,
)


def _write_events(path, rows):
    """rows: list of (event_id, ts_ns, user_id, event_type, value, props)"""
    cols = list(zip(*rows))
    t = pa.table(
        {
            "event_id": pa.array(cols[0], pa.int64()),
            "ts": pa.array(cols[1], pa.timestamp("ns")),
            "user_id": pa.array(cols[2], pa.int64()),
            "event_type": pa.array(cols[3], pa.string()),
            "value": pa.array(cols[4], pa.float64()),
            "props": pa.array(cols[5], pa.string()),
        }
    )
    pq.write_table(t, path)


HOUR_NS = 3600 * 10**9
BASE = 1704067200 * 10**9  # 2024-01-01


def test_late_rows_dropped_after_watermark(spark, tmp_path):
    log = tmp_path / "log"
    log.mkdir()
    # batch 1: events at hours 0..5 → watermark advances to ~5h - 1h delay
    _write_events(
        str(log / "a.parquet"),
        [(i, BASE + i * HOUR_NS, 1, "click", 1.0, '{"k": 1}') for i in range(6)],
    )
    out_dir = str(tmp_path / "out")
    agg = windowed_message_counts(
        message_stream(spark, str(log)), window="1 hour", watermark="1 hour"
    )

    def run_once():
        # parquet sink: append mode emits only watermark-finalized windows,
        # and (unlike the memory sink) supports checkpoint recovery
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()

    # batch 2: one LATE event at hour 0 (far below watermark) + one fresh
    _write_events(
        str(log / "b.parquet"),
        [
            (100, BASE + 0 * HOUR_NS + 1, 1, "click", 1.0, '{"k": 1}'),  # late
            (101, BASE + 6 * HOUR_NS, 1, "click", 1.0, '{"k": 1}'),      # fresh
        ],
    )
    run_once()

    rows = (
        spark.read.parquet(out_dir)
        .groupBy("window_start")
        .agg(F.sum("n_msgs").alias("n"))
        .collect()
    )
    per_window = {r.window_start.hour: r.n for r in rows}
    # hour-0 window must NOT have absorbed the late event (stays at 1)
    assert per_window.get(0, 0) <= 1
