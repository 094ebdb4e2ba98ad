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


def test_null_ts_rows_are_dropped_not_fatal(spark, tmp_path):
    """A message with a null event time cannot be placed in a session —
    it must be DROPPED, not crash the worker (r09 review: NaT became the
    -2^63 sentinel → a bogus 1677 session boundary → OverflowError at
    emit, killing the streaming query)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1704067200 * 10**9
    d = tmp_path / "log"
    d.mkdir()
    # user 7: two timed events 60s apart plus one null-ts row; user 8's
    # much-later event pushes the final watermark past 7's session+gap so
    # the session actually closes under availableNow (8's own stays open)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([1, 2, 3, 4], pa.int64()),
                "ts": pa.array(
                    [base, None, base + 60 * 10**9, base + 7200 * 10**9],
                    pa.timestamp("ns"),
                ),
                "user_id": pa.array([7, 7, 7, 8], pa.int64()),
                "event_type": pa.array(["a", "a", "a", "a"], pa.string()),
                "value": pa.array([0.0, 0.0, 0.0, 0.0], pa.float64()),
                "props": pa.array(["{}", "{}", "{}", "{}"], pa.string()),
            }
        ),
        d / "a.parquet",
    )
    stream = message_stream(spark, str(d))
    sessions = streaming_sessionize(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("null_ts_sessions")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # would raise the worker failure pre-fix
    got = spark.sql("SELECT * FROM null_ts_sessions").collect()
    # both timestamped events land in ONE 30-min session of 2 messages;
    # the null-ts row contributes nothing
    assert [(r.user_id, r.n_msgs) for r in got] == [(7, 2)]


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


def test_session_numbering_survives_timeout_flush(spark, tmp_path):
    """A timeout-closed session must NOT reset the per-user counter: the
    next session is session_no 2, not a duplicate (user, 1) key (r10
    review — the flush used state.remove(), discarding the counter)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1704067200 * 10**9
    H = 3600 * 10**9
    d = tmp_path / "log"
    d.mkdir()

    def write(name, rows, mtime):
        eids, tss, uids = zip(*rows)
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(eids, pa.int64()),
                    "ts": pa.array(tss, pa.timestamp("ns")),
                    "user_id": pa.array(uids, pa.int64()),
                    "event_type": pa.array(["a"] * len(rows), pa.string()),
                    "value": pa.array([0.0] * len(rows), pa.float64()),
                    "props": pa.array(["{}"] * len(rows), pa.string()),
                }
            ),
            d / name,
        )
        os.utime(d / name, (mtime, mtime))

    # batch 1: user 7 session 1; batch 2: user 8 pushes the watermark past
    # 7's gap (timeout flush); batch 3: 7's SECOND session + user 8 far
    # ahead so session 2 also closes
    write("a.parquet", [(1, base, 7), (2, base + 60 * 10**9, 7), (3, base, 8)], 1_700_000_001)
    write("b.parquet", [(4, base + 3 * H, 8)], 1_700_000_002)
    write(
        "c.parquet",
        [(5, base + 4 * H, 7), (6, base + 4 * H + 60 * 10**9, 7), (7, base + 10 * H, 8)],
        1_700_000_003,
    )

    stream = message_stream(spark, str(d), max_files_per_trigger=1)
    sessions = streaming_sessionize(stream, gap_minutes=30)
    q = (
        sessions.writeStream.format("memory")
        .queryName("timeout_numbering")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r.user_id, r.session_no, r.n_msgs)
        for r in spark.sql("SELECT * FROM timeout_numbering").collect()
        if r.user_id == 7
    )
    assert got == [(7, 1, 2), (7, 2, 2)]
