"""message_scan semantics: base schema, range inclusivity, subject substring,
payload mode switching, bind-error matrix — the invariant-style tests from the
reference suites (test_sequence_ranges.sql, test_timestamp_queries.sql,
test_subject_filtering.sql, test_payload_blob.sql) as pytest asserts."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F, types as T

from duckdb_nats_jetstream_spark.errors import BindError
from duckdb_nats_jetstream_spark.sources import message_scan


def test_base_schema_binary_payload_default(spark, sf_dir):
    df = message_scan(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "stream", "subject", "seq", "ts_nats", "payload",
    ]
    # payload is BLOB when no extraction is specified (ref v0.1.1 semantics)
    assert isinstance(df.schema["payload"].dataType, T.BinaryType)
    assert isinstance(df.schema["seq"].dataType, T.LongType)
    # Canonical timestamp contract: whatever the parquet flavor (ns-as-long,
    # µs NTZ, µs UTC), message_scan emits exactly TimestampType — the type
    # schema.py BASE_FIELDS and the streaming source declare. Session tz is
    # UTC so values are identical either way.
    assert type(df.schema["ts_nats"].dataType) is T.TimestampType


def test_json_mode_payload_is_string(spark, sf_dir):
    df = message_scan(spark, sf_dir, json_fields=["k"])
    assert isinstance(df.schema["payload"].dataType, T.StringType)
    assert isinstance(df.schema["k"].dataType, T.StringType)


def test_seq_range_inclusive(spark, sf_dir):
    df = message_scan(spark, sf_dir, start_seq=10, end_seq=20)
    seqs = sorted(r.seq for r in df.select("seq").collect())
    assert seqs == list(range(10, 21))  # inclusive both ends


def test_seq_starts_at_one(spark, sf_dir):
    row = message_scan(spark, sf_dir).agg(F.min("seq").alias("m")).collect()[0]
    assert row.m == 1


def test_end_time_wart_compat_includes_one_past(spark, sf_dir):
    """end_time_compat replicates the reference's wart: the FIRST message
    at-or-after the end bound is included (ref:src/nats_scan.cpp:684-698),
    so compat mode returns exactly the clean rows plus that one message
    (when the bound falls between messages)."""
    kw = dict(start_time=dt.datetime(2024, 1, 5), end_time=dt.datetime(2024, 1, 12))
    clean = {r.seq for r in message_scan(spark, sf_dir, **kw).select("seq").collect()}
    compat = {
        r.seq
        for r in message_scan(spark, sf_dir, end_time_compat=True, **kw)
        .select("seq")
        .collect()
    }
    extra = compat - clean
    assert clean < compat and len(extra) == 1
    # the extra message is the first one at-or-after the bound
    all_after = message_scan(spark, sf_dir, start_time=dt.datetime(2024, 1, 12))
    first_after = all_after.agg(F.min("seq").alias("m")).collect()[0].m
    assert extra == {first_after}


def test_subject_wildcard_semantics(spark, sf_dir):
    from duckdb_nats_jetstream_spark.sources.message_scan import (
        nats_wildcard_regex,
    )

    # '*' = exactly one token; '>' = one-or-more tail tokens
    star = message_scan(spark, sf_dir, subject_pattern="events.*.u1")
    subs = {r.subject for r in star.select("subject").distinct().collect()}
    assert subs and all(
        s.startswith("events.") and s.endswith(".u1") and s.count(".") == 2
        for s in subs
    )
    tail = message_scan(spark, sf_dir, subject_pattern="events.>")
    assert tail.count() == message_scan(spark, sf_dir).count()
    # bind-time validation
    for bad in ["events.>.more", "ev*nts.a", "", "a..b"]:
        with pytest.raises(BindError):
            nats_wildcard_regex(bad)


def test_register_scan_view_sql_ux(spark, sf_dir):
    """SQL entry point: the registered view answers the reference's own
    GUIDE query shapes with plain SQL, and pushdown still applies (the
    view body is the lazy plan, not a materialization)."""
    from duckdb_nats_jetstream_spark.sources.message_scan import (
        register_scan_view,
    )

    register_scan_view(spark, sf_dir, "nats_scan_t", start_seq=10, end_seq=200)
    rows = spark.sql(
        "SELECT count(*) AS n, min(seq) AS lo, max(seq) AS hi FROM nats_scan_t"
    ).collect()[0]
    assert (rows.n, rows.lo, rows.hi) == (191, 10, 200)
    plan = spark.sql("SELECT seq FROM nats_scan_t WHERE seq > 150")._jdf.queryExecution().executedPlan().toString()
    assert "event_id" in plan  # seq-range filters reached the scan columns


def test_time_range_clean_end_semantics(spark, sf_dir):
    t0 = dt.datetime(2024, 1, 5)
    t1 = dt.datetime(2024, 1, 10)
    df = message_scan(spark, sf_dir, start_time=t0, end_time=t1)
    rows = df.agg(
        F.min("ts_nats").alias("lo"), F.max("ts_nats").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    assert rows.n > 0
    assert rows.lo >= t0
    assert rows.hi <= t1  # NOT the reference's one-past-the-end wart


def test_subject_substring_filter(spark, sf_dir):
    df = message_scan(spark, sf_dir, subject="purchase")
    subs = [r.subject for r in df.select("subject").distinct().collect()]
    assert subs and all("purchase" in s for s in subs)


def test_mixed_seq_and_time_is_bind_error(spark, sf_dir):
    with pytest.raises(BindError, match="Cannot specify both"):
        message_scan(spark, sf_dir, start_seq=1, end_time=dt.datetime(2024, 1, 2))


def test_missing_stream_is_bind_error(spark, sf_dir):
    with pytest.raises(BindError, match="stream"):
        message_scan(spark, sf_dir, stream="")


def test_ordering_invariant_lag(spark, sf_dir):
    # reference invariant: ts non-decreasing when ordered by seq
    # (test_timestamp_queries.sql:140-159)
    from pyspark.sql import Window as W

    df = message_scan(spark, sf_dir).withColumn(
        "prev_ts", F.lag("ts_nats").over(W.orderBy("seq"))
    )
    bad = df.filter(F.col("prev_ts") > F.col("ts_nats")).count()
    assert bad == 0


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    df = message_scan(spark, sf_dir, start_seq=100, end_seq=200)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "event_id" in plan


def test_time_range_accepts_aware_timestamps(spark, sf_dir):
    """'Z'-suffixed ISO bounds (aware datetimes) must match their naive-UTC
    twins instead of raising TypeError on aware-minus-naive (r10 sweep)."""
    naive = message_scan(spark, sf_dir, start_time="2024-01-04T00:00:00").count()
    aware = message_scan(spark, sf_dir, start_time="2024-01-04T00:00:00Z").count()
    offset = message_scan(
        spark, sf_dir, start_time="2024-01-04T01:00:00+01:00"
    ).count()
    assert naive == aware == offset > 0
