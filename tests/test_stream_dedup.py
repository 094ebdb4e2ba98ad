"""Streaming dedup: redelivered messages dropped within the watermark."""

import pyarrow as pa
import pyarrow.parquet as pq

from duckdb_nats_jetstream_spark.streaming.dedup import dedup_content, dedup_messages
from duckdb_nats_jetstream_spark.streaming.stream_scan import (
    message_stream,
    run_to_completion,
)

HOUR_NS = 3600 * 10**9
BASE = 1704067200 * 10**9


def _write_events(path, rows):
    ids, ts, users, types, vals, props = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(ts, pa.timestamp("ns")),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(types, pa.string()),
                "value": pa.array(vals, pa.float64()),
                "props": pa.array(props, pa.string()),
            }
        ),
        path,
    )


def test_redelivered_seq_dropped(spark, tmp_path):
    log = tmp_path / "log"
    log.mkdir()
    # event_id 1 delivered twice (same seq), id 2 once
    _write_events(
        str(log / "a.parquet"),
        [
            (1, BASE, 1, "click", 1.0, "{}"),
            (1, BASE, 1, "click", 1.0, "{}"),
            (2, BASE + HOUR_NS, 1, "click", 2.0, "{}"),
        ],
    )
    out = run_to_completion(
        dedup_messages(message_stream(spark, str(log))), str(tmp_path / "ckpt")
    )
    assert sorted(r.seq for r in out.collect()) == [2, 3]


def test_content_dedup_keeps_first_per_payload(spark, tmp_path):
    log = tmp_path / "log"
    log.mkdir()
    _write_events(
        str(log / "a.parquet"),
        [
            (1, BASE, 1, "click", 1.0, '{"k": 1}'),
            (2, BASE, 2, "click", 1.0, '{"k": 1}'),  # same payload content
            (3, BASE, 3, "click", 1.0, '{"k": 9}'),
        ],
    )
    out = run_to_completion(
        dedup_content(message_stream(spark, str(log))), str(tmp_path / "ckpt")
    )
    got = sorted(r.payload for r in out.collect())
    assert got == ['{"k": 1}', '{"k": 9}']
