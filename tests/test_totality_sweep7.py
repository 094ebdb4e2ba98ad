"""Regression pins for the seventh r10 review sweep (query-wrapper +
streaming findings): oracle-side NULL totality, funnel TTL that cannot
slide, heavy-hitter NULL accounting, audit-counter coverage."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import Row, functions as F


def _write_events(path, rows):
    """rows: (event_id, ts_ns|None, user_id|None, event_type)"""
    import pyarrow as pa
    import pyarrow.parquet as pq

    eids, tss, uids, etypes = zip(*rows)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(eids, pa.int64()),
                "ts": pa.array(tss, pa.timestamp("ns")),
                "user_id": pa.array(uids, pa.int64()),
                "event_type": pa.array(etypes, pa.string()),
                "value": pa.array([0.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        ),
        path,
    )


BASE_NS = 1_704_067_200 * 10**9
HOUR_NS = 3600 * 10**9


def test_pack_sequences_oracle_matches_on_null_text(spark, tmp_path):
    """The recursive-CTE oracle must pack a NULL token count zero-width
    exactly like the operator (a4908ec) — one NULL used to NULL-poison the
    fill and freeze the whole chunk in bin 0 (r10 review)."""
    import duckdb

    from duckdb_nats_jetstream_spark.functions import text as TX
    from duckdb_nats_jetstream_spark.operators.packing import pack_sequences
    from duckdb_nats_jetstream_spark.queries.pipeline import PACK_SEQUENCES_SQL

    texts = [None, "a " * 200, "b " * 200, "c " * 100, None, "d " * 100]
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )
    sized = docs.select(
        "doc_id", TX.token_count(F.col("text")).alias("n_tokens")
    )
    got = sorted(
        (r.doc_id, r.seq_id)
        for r in pack_sequences(sized, budget=256, chunk_size=100).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", list(enumerate(texts)))
    want = sorted(
        (d, s) for d, _n, s in con.execute(PACK_SEQUENCES_SQL).fetchall()
    )
    assert got == want
    assert len({s for _, s in got}) > 1  # the chunk did NOT freeze in bin 0


def test_cohort_retention_ignores_null_users(spark, tmp_path):
    """A NULL user (unparseable subject) is not a cohort member: no phantom
    (cohort, offset, n_users=0) rows (r10 review — the oracle's USING join
    drops NULL keys; Spark's window used to keep the NULL partition)."""
    from duckdb_nats_jetstream_spark.queries.pipeline3 import (
        scan_cohort_retention,
    )

    d = tmp_path / "sf"
    d.mkdir()
    _write_events(
        str(d / "events.parquet"),
        [
            (0, BASE_NS, 1, "click"),
            (1, BASE_NS + HOUR_NS, 1, "click"),
            (2, BASE_NS, None, "click"),  # NULL user → NULL subject suffix
        ],
    )
    rows = scan_cohort_retention(spark, str(d)).collect()
    assert all(r.n_users > 0 for r in rows)
    assert sum(r.n_users for r in rows) == 1  # just user 1's cohort row


def test_funnel_ttl_does_not_slide_on_null_only_batches(spark, tmp_path):
    """A user sending only null-ts rows must still be evicted at
    last-valid-activity + TTL: the empty-events branch used to re-arm the
    deadline from the CURRENT WATERMARK every batch, sliding it forward
    forever (r10 review)."""
    from duckdb_nats_jetstream_spark.streaming.funnel import streaming_funnel

    d = tmp_path / "log"
    d.mkdir()
    # b1: user 1 converts stage 1 at T; user 2 active.
    _write_events(str(d / "a.parquet"), [(1, BASE_NS, 1, "view"), (2, BASE_NS, 2, "view")])
    # b2..b3: user 1 sends ONLY null-ts rows while user 2 advances the
    # watermark far past user 1's TTL
    _write_events(
        str(d / "b.parquet"),
        [(3, None, 1, "view"), (4, BASE_NS + 5 * HOUR_NS, 2, "click")],
    )
    _write_events(
        str(d / "c.parquet"),
        [(5, None, 1, "view"), (6, BASE_NS + 10 * HOUR_NS, 2, "purchase")],
    )
    for i, f in enumerate(["a.parquet", "b.parquet", "c.parquet"]):
        os.utime(d / f, (1_700_000_001 + i, 1_700_000_001 + i))

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(
            "event_id long, ts long, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
        .selectExpr(
            "user_id", "timestamp_micros(ts div 1000) AS ts", "event_type"
        )
    )
    out = streaming_funnel(
        stream,
        ["view", "click", "purchase"],
        idle_timeout="3 hours",
        watermark="0 seconds",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ttl_slide")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # user 1's state must have been evicted (deadline T+3h, watermark 10h)
    removed = sum(
        (p["stateOperators"][0].get("numRowsRemoved") or 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert removed >= 1, "TTL never fired for the null-only user"
    end_state = [
        p["stateOperators"][0].get("numRowsTotal")
        for p in q.recentProgress
        if p["stateOperators"]
    ][-1]
    assert end_state <= 1  # only user 2 may remain


def test_heavy_hitters_null_tokens_counted_not_candidates(spark, tmp_path):
    """NULL tokens count into n_seen (the guarantee bound's denominator)
    but never become reportable candidates (r10 review — value_counts'
    dropna default silently excluded them from both)."""
    from duckdb_nats_jetstream_spark.streaming.heavyhitters import (
        streaming_heavy_hitters,
    )
    from duckdb_nats_jetstream_spark.streaming.stream_scan import message_stream

    d = tmp_path / "log"
    d.mkdir()
    rows = [(i, BASE_NS + i * 10**9, 1, "click") for i in range(8)]
    rows += [(100 + i, BASE_NS + i * 10**9, 1, None) for i in range(4)]  # NULL subject
    _write_events(str(d / "a.parquet"), rows)
    stream = message_stream(spark, str(d))
    out = streaming_heavy_hitters(stream, token_col="subject", k=4, n_parts=1)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_nulls")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM hh_nulls").collect()
    assert got and all(r.token is not None for r in got)
    assert max(r.n_seen for r in got) == 12  # the 4 NULL-subject rows count


def test_audit_row_counts_every_python_node():
    from duckdb_nats_jetstream_spark.plans.audit import audit_row

    plan = (
        "PythonMapInArrow [x]\nFlatMapCoGroupsInPandas [y]\n"
        "WindowInPandas [z]\nAggregateInPandas [w]\nArrowEvalPythonUDTF [u]\n"
    )
    assert audit_row(plan)["py"] == 5
