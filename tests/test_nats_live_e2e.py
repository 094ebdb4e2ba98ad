"""End-to-end ``spark.read`` / ``spark.readStream`` over the LIVE NATS
transport against a deterministic fake nats-py, no broker needed.

The contract tests (test_nats_live.py) pin ``NatsLiveTransport``'s
methods in-process, but the live path had never been driven through the
full DataSource lifecycle: driver-side ``stream_info`` planning in
``partitions()`` / ``latestOffset()``, then worker-side ``fetch`` in
``read()`` — and Python DataSource readers run in SEPARATE worker
processes, where a pytest monkeypatch does not exist. The fake module
here is therefore (a) stateless — every message derives from its
sequence number alone, so driver and every worker materialize identical
broker state — and (b) written TRANSIENTLY to the repo root, the one
directory importable in all three process kinds (driver, task workers,
and the streaming-source runner: ``addPyFile`` reaches task workers but
NOT the separate ``python_streaming_source_runner`` process that
executes ``latestOffset`` — found empirically; every Python child is
spawned with the JVM's cwd on ``sys.path``, so the repo root is).

Mirrors the reference's live suite surface (connection lifecycle +
Direct-Get scan, ref:test/run_all_tests.sh:156-182) minus the real
broker, which this sandbox cannot run.
"""

from __future__ import annotations

import datetime
import json
import sys

import pytest
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.sources.nats_source import register

FIRST, LAST = 2, 12
GAPS = {4, 9}
EXPECTED_SEQS = [s for s in range(FIRST, LAST + 1) if s not in GAPS]
BASE_EPOCH = int(
    datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp()
)

#: The fake nats-py. Messages are a pure function of the sequence number:
#: subject alternates region by parity, the payload is a small JSON order,
#: and the Nats-Time-Stamp header is RFC3339 with a full 9-digit fraction
#: whose ns value equals the sequence (exercising the exact-integer parse).
_FAKE_NATS = f'''
"""Deterministic fake of the nats-py client for e2e tests."""
import json
import os


class NotFoundError(Exception):
    code = 404


def _last_seq():
    """Publishing more messages = writing a higher value into the state
    file beside this module (read at CALL time, so long-lived worker
    processes that cached the import still see growth)."""
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "nats_fake_state.json")
    try:
        with open(p) as fh:
            return int(json.load(fh)["last_seq"])
    except OSError:
        return {LAST}


class _Info:
    def __init__(self):
        class _State:
            first_seq = {FIRST}
            last_seq = _last_seq()
        self.state = _State()


class _Msg:
    def __init__(self, seq):
        self.subject = "orders.%s.created" % ("eu" if seq % 2 else "us")
        self.data = json.dumps(
            {{"order_id": seq, "amount_cents": seq * 100}}
        ).encode()
        self.headers = {{
            "Nats-Time-Stamp": "2024-01-01T00:00:%02d.%09dZ" % (seq, seq)
        }}


class _JetStream:
    async def stream_info(self, stream):
        if stream != "orders":
            raise NotFoundError()
        return _Info()

    async def get_msg(self, stream, seq, direct=True):
        if stream != "orders" or seq in {sorted(GAPS)!r} or not (
            {FIRST} <= seq <= _last_seq()
        ):
            raise NotFoundError()
        return _Msg(seq)


class _Client:
    def jetstream(self):
        return _JetStream()

    async def close(self):
        pass


async def connect(url, connect_timeout=None):
    return _Client()
'''


@pytest.fixture(scope="module")
def fake_broker(spark):
    import pathlib
    import shutil

    repo = pathlib.Path(__file__).resolve().parent.parent
    p = repo / "nats.py"
    if p.exists():
        # a hard-killed earlier run leaves the fake behind (the finalizer
        # never ran); reclaim OUR file, but refuse to delete anything else
        assert "Deterministic fake of the nats-py client" in p.read_text(), (
            f"unexpected non-fixture file at {p} — remove it manually"
        )
        p.unlink()
    p.write_text(_FAKE_NATS)
    sys.modules.pop("nats", None)
    register(spark)
    try:
        yield
    finally:
        p.unlink(missing_ok=True)
        (repo / "nats_fake_state.json").unlink(missing_ok=True)
        shutil.rmtree(repo / "__pycache__", ignore_errors=True)
        sys.modules.pop("nats", None)


def _live(spark, **opts):
    r = spark.read.format("nats_jetstream").option("stream", "orders")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_full_stream(spark, fake_broker):
    """Full lifecycle: stream_info plans the partitions on the driver,
    workers Direct-Get their slices, NOT_FOUND gaps are skipped, and
    every column round-trips the closed-form message exactly."""
    rows = {r.seq: r for r in _live(spark).collect()}
    assert sorted(rows) == EXPECTED_SEQS
    for s, r in rows.items():
        assert r.stream == "orders"
        assert r.subject == f"orders.{'eu' if s % 2 else 'us'}.created"
        assert json.loads(bytes(r.payload)) == {
            "order_id": s,
            "amount_cents": s * 100,
        }
    micros = {
        r.seq: r.us
        for r in _live(spark)
        .select("seq", F.unix_micros("ts_nats").alias("us"))
        .collect()
    }
    # header ns value = seq, which truncates away at µs granularity
    assert micros == {s: (BASE_EPOCH + s) * 1_000_000 for s in EXPECTED_SEQS}


def test_batch_read_seq_range_and_subject(spark, fake_broker):
    got = sorted(
        r.seq for r in _live(spark, start_seq=5, end_seq=10).collect()
    )
    assert got == [5, 6, 7, 8, 10]
    eu = sorted(r.seq for r in _live(spark, subject="eu").collect())
    assert eu == [s for s in EXPECTED_SEQS if s % 2]


def test_streaming_tail_over_live_transport(spark, fake_broker, tmp_path):
    """readStream: latestOffset comes from the fake broker's stream_info
    on the driver; the catch-up micro-batch fans out to workers and
    drains the whole stream under availableNow."""
    stream = (
        spark.readStream.format("nats_jetstream")
        .option("stream", "orders")
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("nats_live_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql(
        "SELECT seq FROM nats_live_tail ORDER BY seq"
    ).collect()
    assert [r.seq for r in got] == EXPECTED_SEQS


def test_checkpoint_resume_picks_up_published_messages(
    spark, fake_broker, tmp_path
):
    """Durable-consumer semantics e2e: drain, publish more messages (bump
    the fake broker's last_seq via its state file), drain again with the
    SAME checkpoint — the second run must resume at the committed offset
    and read only the new tail, never re-reading or skipping."""
    import pathlib

    repo = pathlib.Path(__file__).resolve().parent.parent
    state = repo / "nats_fake_state.json"
    ck = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        # file sink, not memory: the memory sink refuses checkpoint
        # recovery, and recovery IS what this test exercises
        q = (
            spark.readStream.format("nats_jetstream")
            .option("stream", "orders")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(
            r.seq for r in spark.read.parquet(out).select("seq").collect()
        )

    try:
        state.write_text(json.dumps({"last_seq": 6}))
        assert drain() == [2, 3, 5, 6]
        state.write_text(json.dumps({"last_seq": LAST}))
        # cumulative sink contents = old tail + newly published tail,
        # each sequence exactly once (resumed at the committed offset)
        assert drain() == EXPECTED_SEQS
    finally:
        state.unlink(missing_ok=True)
