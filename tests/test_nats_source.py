"""The nats_jetstream Python DataSource: batch reads through format(), seq
range splits, option-driven schema, streaming tail with checkpointed offsets
— all against the parquet replay transport."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from duckdb_nats_jetstream_spark.errors import BindError
from duckdb_nats_jetstream_spark.sources import message_scan
from duckdb_nats_jetstream_spark.sources.nats_source import (
    NatsScanBatchReader,
    register,
)


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    register(spark)


def _events(sf_dir):
    return f"{sf_dir}/events.parquet"


def test_batch_read_matches_message_scan(spark, sf_dir):
    df = (
        spark.read.format("nats_jetstream")
        .option("stream", "events")
        .option("replay_path", _events(sf_dir))
        .load()
    )
    want = message_scan(spark, sf_dir).collect()
    got = df.collect()
    assert sorted((r.seq, r.subject, r.ts_nats, bytes(r.payload)) for r in got) == sorted(
        (r.seq, r.subject, r.ts_nats, bytes(r.payload)) for r in want
    )


def test_schema_modes(spark, sf_dir):
    plain = (
        spark.read.format("nats_jetstream")
        .option("stream", "events")
        .option("replay_path", _events(sf_dir))
        .load()
    )
    assert isinstance(plain.schema["payload"].dataType, T.BinaryType)
    js = (
        spark.read.format("nats_jetstream")
        .option("stream", "events")
        .option("replay_path", _events(sf_dir))
        .option("json_extract", "k")
        .load()
    )
    assert isinstance(js.schema["payload"].dataType, T.StringType)
    assert isinstance(js.schema["k"].dataType, T.StringType)
    row = js.filter(F.col("seq") == 1).collect()[0]
    assert row.k is not None and row.k.isdigit()


def test_seq_range_and_subject_options(spark, sf_dir):
    df = (
        spark.read.format("nats_jetstream")
        .option("stream", "events")
        .option("replay_path", _events(sf_dir))
        .option("start_seq", "10")
        .option("end_seq", "50")
        .option("subject", "purchase")
        .load()
    )
    rows = df.collect()
    assert all(10 <= r.seq <= 50 for r in rows)
    assert all("purchase" in r.subject for r in rows)


def test_partition_splits(spark, sf_dir):
    reader = NatsScanBatchReader(
        {"stream": "events", "replay_path": _events(sf_dir), "partitions": "4"}
    )
    parts = reader.partitions()
    assert len(parts) == 4
    spans = [(p.start_seq, p.end_seq) for p in parts]
    # contiguous, non-overlapping, covering [first, last]
    for (s1, e1), (s2, _e2) in zip(spans, spans[1:]):
        assert s2 == e1 + 1
    assert spans[0][0] == 1


def test_missing_stream_option_is_bind_error(spark, sf_dir):
    with pytest.raises(Exception, match="stream"):
        (
            spark.read.format("nats_jetstream")
            .option("replay_path", _events(sf_dir))
            .load()
            .collect()
        )


def test_mixed_range_options_bind_error(spark, sf_dir):
    with pytest.raises(Exception, match="[Cc]annot specify both"):
        (
            spark.read.format("nats_jetstream")
            .option("stream", "events")
            .option("replay_path", _events(sf_dir))
            .option("start_seq", "1")
            .option("end_time", "2024-01-05 00:00:00")
            .load()
            .collect()
        )


def test_live_transport_gated(spark):
    with pytest.raises(BindError, match="nats-py"):
        NatsScanBatchReader({"stream": "s"}).partitions()


def test_streaming_tail(spark, sf_dir, tmp_path):
    stream = (
        spark.readStream.format("nats_jetstream")
        .option("stream", "events")
        .option("replay_path", _events(sf_dir))
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("nats_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT count(*) AS n, max(seq) AS m FROM nats_tail").collect()[0]
    want = message_scan(spark, sf_dir).count()
    assert got.n == want and got.m == want


def test_streaming_partitions_fan_out(spark, sf_dir):
    """A catch-up micro-batch over a backlog splits into N sequence slices
    (the parallel-scan upgrade over the reference's single thread) that
    tile the offset range exactly."""
    from duckdb_nats_jetstream_spark.sources.nats_source import (
        NatsScanStreamReader,
    )

    r = NatsScanStreamReader(
        {"stream": "events", "replay_path": _events(sf_dir), "partitions": "8"}
    )
    parts = r.partitions({"seq": 1}, {"seq": 10001})
    assert len(parts) == 8
    assert parts[0].start_seq == 1 and parts[-1].end_seq == 10000
    for a, b in zip(parts, parts[1:]):
        assert b.start_seq == a.end_seq + 1
    # tiny batch never over-splits
    assert len(r.partitions({"seq": 5}, {"seq": 8})) <= 3


def test_proto_extract_options_end_to_end(spark, tmp_path):
    """The reference's proto_file/proto_message/proto_extract option
    surface on the connector: a binary-protobuf message log scans into
    natively-typed columns with payload staying BLOB."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_nats_jetstream_spark.functions.proto import (
        encode_message,
        parse_proto,
    )

    proto_text = """
syntax = "proto3";
message Inner { int64 k = 1; }
message Ev {
  int64 eseq = 1; string name = 2; double value = 3;
  repeated int64 vals = 4; Inner inner = 5;
}
"""
    proto_path = tmp_path / "ev.proto"
    proto_path.write_text(proto_text)
    messages, enums = parse_proto(proto_text)
    desc = messages["Ev"]

    payloads = []
    for i in range(20):
        payloads.append(
            encode_message(
                dict(
                    eseq=i + 1,
                    name=f"n{i}",
                    value=i * 1.5,
                    vals=[i, i * 2],
                    inner=dict(k=i * 10) if i % 2 == 0 else None,
                ),
                desc, messages, enums,
            )
        )
    log = tmp_path / "proto_events.parquet"
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(20), pa.int64()),
                "ts": pa.array([1704067200 * 10**9 + i for i in range(20)], pa.timestamp("ns")),
                "user_id": pa.array([i % 3 for i in range(20)], pa.int64()),
                "event_type": pa.array(["p"] * 20, pa.string()),
                "props": pa.array(payloads, pa.binary()),
            }
        ),
        log,
    )

    df = (
        spark.read.format("nats_jetstream")
        .option("stream", "ev")
        .option("replay_path", str(log))
        .option("proto_file", str(proto_path))
        .option("proto_message", "Ev")
        .option("proto_extract", "eseq,name,value,vals,inner.k")
        .load()
    )
    from pyspark.sql import types as T

    sch = {f.name: f.dataType for f in df.schema.fields}
    assert isinstance(sch["payload"], T.BinaryType)  # BLOB in proto mode
    assert isinstance(sch["value"], T.DoubleType)
    assert isinstance(sch["vals"], T.ArrayType)
    assert isinstance(sch["inner_k"], T.LongType)
    rows = {r.seq: r for r in df.collect()}
    assert len(rows) == 20
    assert all(r.eseq == s for s, r in rows.items())  # extracted == base seq
    assert rows[5].name == "n4" and rows[5].value == 4 * 1.5
    assert rows[5].vals == [4, 8]
    assert rows[5].inner_k == 40          # set nested message
    assert rows[6].inner_k is None        # unset nested message -> NULL
    assert rows[1].vals == [0, 0]         # packed zeros roundtrip


def test_proto_options_bind_matrix(spark, sf_dir, tmp_path):
    from duckdb_nats_jetstream_spark.sources.nats_source import _parse_options

    proto_path = tmp_path / "m.proto"
    proto_path.write_text('syntax = "proto3"; message M { int64 a = 1; }')
    base = {"stream": "events", "replay_path": "x"}
    with pytest.raises(BindError, match="proto_file parameter is required"):
        _parse_options({**base, "proto_extract": "a"})
    with pytest.raises(BindError, match="proto_message parameter is required"):
        _parse_options({**base, "proto_extract": "a", "proto_file": str(proto_path)})
    with pytest.raises(BindError, match="both json_extract and proto_extract"):
        _parse_options(
            {**base, "proto_extract": "a", "proto_file": str(proto_path),
             "proto_message": "M", "json_extract": "k"}
        )
    with pytest.raises(BindError, match="not found"):
        _parse_options(
            {**base, "proto_extract": "a", "proto_file": str(proto_path),
             "proto_message": "Nope"}
        )
    collide = tmp_path / "c.proto"
    collide.write_text('syntax = "proto3"; message M { int64 seq = 1; }')
    with pytest.raises(BindError, match="collide with the base message columns"):
        _parse_options(
            {**base, "proto_extract": "seq", "proto_file": str(collide),
             "proto_message": "M"}
        )


# --- r10 sweep-5 regressions ---------------------------------------------------


def test_stream_info_locates_event_id_by_name(spark, sf_dir, tmp_path):
    """A ts-first column layout must not be misread as sequence stats —
    stream_info resolves event_id via path_in_schema, not column 0."""
    import duckdb

    from duckdb_nats_jetstream_spark.sources.nats_source import (
        ParquetReplayTransport,
    )

    reordered = str(tmp_path / "events_tsfirst.parquet")
    duckdb.sql(
        f"COPY (SELECT ts, event_type, user_id, props, event_id "
        f"FROM '{_events(sf_dir)}') TO '{reordered}' (FORMAT PARQUET)"
    )
    a = ParquetReplayTransport(_events(sf_dir), "events").stream_info()
    b = ParquetReplayTransport(reordered, "events").stream_info()
    assert a == b
    assert b[1] < 10_000_000  # sequences, not nanosecond timestamps


def test_replay_cache_is_bounded():
    from duckdb_nats_jetstream_spark.sources import nats_source as NS

    NS._REPLAY_CACHE.clear()
    t = NS.ParquetReplayTransport("/root/testdata/sf0.001/events.parquet", "events")
    for i in range(1, 40):
        t._read(i, i + 1)
    assert len(NS._REPLAY_CACHE) <= NS._REPLAY_CACHE_CAP


def test_time_bounds_accept_z_suffix_and_match_naive(spark, sf_dir):
    rows = (
        spark.read.format("nats_jetstream")
        .option("stream", "events")
        .option("replay_path", _events(sf_dir))
        .option("start_time", "2024-01-01T00:00:00")
        .load()
        .count()
    )
    rows_z = (
        spark.read.format("nats_jetstream")
        .option("stream", "events")
        .option("replay_path", _events(sf_dir))
        .option("start_time", "2024-01-01T00:00:00Z")
        .load()
        .count()
    )
    assert rows == rows_z > 0


def test_time_resolution_binary_search_matches_full_filter(spark, sf_dir):
    """The superset sequence bounds from the binary search + read()'s exact
    filter must equal message_scan's time-range semantics."""
    ms = message_scan(
        spark, sf_dir, start_time="2024-01-04T00:00:00", end_time="2024-01-09T00:00:00"
    ).select("seq")
    src = (
        spark.read.format("nats_jetstream")
        .option("stream", "events")
        .option("replay_path", _events(sf_dir))
        .option("start_time", "2024-01-04T00:00:00")
        .option("end_time", "2024-01-09T00:00:00")
        .load()
        .select("seq")
    )
    assert sorted(r.seq for r in ms.collect()) == sorted(r.seq for r in src.collect())


def test_resolve_time_bounds_probe_count_is_logarithmic(sf_dir):
    """The driver-side resolution must probe O(log N) slices, never fetch
    the stream (one round-trip per message on the live transport)."""
    from duckdb_nats_jetstream_spark.sources.nats_source import (
        ParquetReplayTransport,
        _opt_ts_us,
        _resolve_time_bounds,
    )

    inner = ParquetReplayTransport(_events(sf_dir), "events")
    first, last = inner.stream_info()
    calls = []

    class Counting:
        def fetch(self, s, e):
            calls.append((s, e))
            return inner.fetch(s, e)

    lo = _opt_ts_us("2024-01-04T00:00:00")
    hi = _opt_ts_us("2024-01-09T00:00:00")
    s0, s1 = _resolve_time_bounds(Counting(), first, last, lo, hi)
    n = last - first + 1
    assert first <= s0 <= s1 <= last
    assert len(calls) <= 4 * (n.bit_length() + 1)  # 2 binary searches, small probes
    assert all(e - s < 1 << 17 for s, e in calls)  # never a full-stream fetch


def test_json_extract_base_column_collision_is_bind_error(spark, sf_dir):
    with pytest.raises(Exception, match="collide|duplicate"):
        (
            spark.read.format("nats_jetstream")
            .option("stream", "events")
            .option("replay_path", _events(sf_dir))
            .option("json_extract", "seq")
            .load()
            .collect()
        )


def _write_shuffled_log(path: str, n: int = 400, rows_per_group: int = 50):
    """An event-TIME log where ts is deliberately NOT monotone in event_id
    (a bit-reversal permutation — maximally disordered), multiple row
    groups so statistics-based resolution actually prunes."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base_ns = 1_704_067_200 * 10**9
    bits = (n - 1).bit_length()
    perm = [int(format(i, f"0{bits}b")[::-1], 2) % n for i in range(n)]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [base_ns + perm[i] * 60 * 10**9 for i in range(n)],
                    pa.timestamp("ns"),
                ),
                "user_id": pa.array([i % 7 for i in range(n)], pa.int64()),
                "event_type": pa.array(["click"] * n),
                "props": pa.array(["{}"] * n),
            }
        ),
        path,
        row_group_size=rows_per_group,
    )


def test_time_bounds_on_non_monotone_replay_log(spark, tmp_path):
    """r10 ADVICE (medium): the binary search assumes ts monotone in seq,
    which holds for live receive timestamps but NOT for replayed event-time
    logs — on out-of-order data it could return a non-superset range and
    read()'s exact filter then silently dropped in-range messages. The
    replay transport now resolves from row-group statistics (order-
    insensitive superset); this pins the end-to-end count against a
    brute-force expectation on a maximally disordered log."""
    import duckdb

    path = str(tmp_path / "shuffled.parquet")
    _write_shuffled_log(path)
    lo, hi = "2024-01-01T01:00:00", "2024-01-01T04:00:00"
    expected = duckdb.sql(
        f"SELECT count(*) FROM '{path}' "
        f"WHERE ts >= TIMESTAMP '{lo.replace('T', ' ')}' "
        f"AND ts <= TIMESTAMP '{hi.replace('T', ' ')}'"
    ).fetchone()[0]
    assert expected > 0
    got = (
        spark.read.format("nats_jetstream")
        .option("stream", "events")
        .option("replay_path", path)
        .option("start_time", lo)
        .option("end_time", hi)
        .load()
        .count()
    )
    assert got == expected


def test_replay_time_resolution_is_probe_free_and_prunes(tmp_path, sf_dir):
    """The replay transport's resolution must read ONLY the footer (the
    binary search's distinct-slice probes thrashed the FIFO decode cache —
    r10 ADVICE #4) and must prune row groups on a time-SORTED log."""
    from duckdb_nats_jetstream_spark.sources.nats_source import (
        ParquetReplayTransport,
        _opt_ts_us,
    )

    t = ParquetReplayTransport(_events(sf_dir), "events")
    first, last = t.stream_info()
    t.fetch = None  # any probe fetch would now raise; the footer path won't
    lo = _opt_ts_us("2024-01-04T00:00:00")
    hi = _opt_ts_us("2024-01-09T00:00:00")
    s0, s1 = t.resolve_time_bounds(first, last, lo, hi)
    assert first <= s0 <= s1 <= last

    # multi-row-group sorted log: bounds must exclude far-away groups
    import pyarrow as pa
    import pyarrow.parquet as pq

    n, base_ns = 1000, 1_704_067_200 * 10**9
    path = str(tmp_path / "sorted.parquet")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [base_ns + i * 60 * 10**9 for i in range(n)],
                    pa.timestamp("ns"),
                ),
                "user_id": pa.array([0] * n, pa.int64()),
                "event_type": pa.array(["click"] * n),
                "props": pa.array(["{}"] * n),
            }
        ),
        path,
        row_group_size=100,
    )
    ts = ParquetReplayTransport(path, "events")
    f2, l2 = ts.stream_info()
    # minutes 100..199 live entirely inside the second row group
    s0, s1 = ts.resolve_time_bounds(
        f2,
        l2,
        _opt_ts_us("2024-01-01T01:40:00"),
        _opt_ts_us("2024-01-01T03:19:00"),
    )
    assert s0 >= 101 and s1 <= 300  # pruned to the covering groups
    assert s0 <= 101 and s1 >= 200  # still a superset of the true range


def test_replay_time_resolution_includes_statless_groups(tmp_path):
    """A row group whose ts column is ALL NULL carries no min/max
    statistics — the resolver must include its event_id range
    conservatively (its rows are excluded later by read()'s exact filter),
    never prune it; and a file whose event_id stats are missing must widen
    to the full range rather than guess."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_nats_jetstream_spark.sources.nats_source import (
        ParquetReplayTransport,
        _opt_ts_us,
    )

    base_ns = 1_704_067_200 * 10**9
    n = 200
    path = str(tmp_path / "nullgroup.parquet")
    # rows 0..99: real ts; rows 100..199: all-NULL ts (second row group)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n), pa.int64()),
                "ts": pa.array(
                    [base_ns + i * 10**9 for i in range(100)] + [None] * 100,
                    pa.timestamp("ns"),
                ),
                "user_id": pa.array([0] * n, pa.int64()),
                "event_type": pa.array(["click"] * n),
                "props": pa.array(["{}"] * n),
            }
        ),
        path,
        row_group_size=100,
    )
    t = ParquetReplayTransport(path, "events")
    first, last = t.stream_info()
    s0, s1 = t.resolve_time_bounds(
        first, last, _opt_ts_us("2024-01-01T00:00:10"), _opt_ts_us("2024-01-01T00:00:20")
    )
    # superset must cover the qualifying rows AND the stats-less group
    assert s0 <= 11 and s1 == last
