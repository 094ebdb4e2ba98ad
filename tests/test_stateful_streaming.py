"""applyInPandasWithState sessionization: streaming closed-sessions must be a
prefix-consistent subset of the batch sessionization on the same log."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.queries.stream import scan_sessionization
from duckdb_nats_jetstream_spark.streaming.stateful import streaming_sessionize
from duckdb_nats_jetstream_spark.streaming.stream_scan import message_stream


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("state_log")
    shutil.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    return str(d)


def test_streaming_sessions_match_batch(spark, sf_dir, log_dir, tmp_path):
    stream = message_stream(spark, log_dir)
    sessions = streaming_sessionize(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.user_id, r.session_no): (r.n_msgs, r.first_seq)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    assert got, "no closed sessions emitted"

    batch = {
        (r.user_id, r.session_no): (r.n_msgs, r.first_seq)
        for r in scan_sessionization(spark, sf_dir).collect()
    }
    # every CLOSED streaming session must equal its batch twin (the final,
    # still-open session per user is not emitted — by design)
    for key, val in got.items():
        assert batch[key] == val, f"session {key}: streaming {val} != batch {batch[key]}"
    # and most sessions should have closed (one open per user at most)
    n_users = len({u for u, _ in batch})
    assert len(got) >= len(batch) - n_users
