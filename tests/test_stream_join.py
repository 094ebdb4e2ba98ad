"""Stream-stream interval join: results equal the batch interval join over
the same data, and the plan carries watermarks on both sides."""

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.sources.message_scan import message_scan
from duckdb_nats_jetstream_spark.streaming.joins import stream_interval_join
from duckdb_nats_jetstream_spark.streaming.stream_scan import (
    message_stream,
    run_to_completion,
)

HOUR_NS = 3600 * 10**9
BASE = 1704067200 * 10**9  # 2024-01-01


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


def test_stream_join_matches_batch_semantics(spark, tmp_path):
    log = tmp_path / "log"
    log.mkdir()
    rows = [
        # user 1: signup at h0; purchases at h0.5 (in) and h2 (out)
        (1, BASE, 1, "signup", 0.0, "{}"),
        (2, BASE + HOUR_NS // 2, 1, "purchase", 9.0, "{}"),
        (3, BASE + 2 * HOUR_NS, 1, "purchase", 7.0, "{}"),
        # user 2: purchase with no signup window
        (4, BASE + HOUR_NS, 2, "purchase", 5.0, "{}"),
        # user 3: signup, purchase exactly at the window bound (inclusive)
        (5, BASE, 3, "signup", 0.0, "{}"),
        (6, BASE + HOUR_NS, 3, "purchase", 3.0, "{}"),
    ]
    _write_events(str(log / "a.parquet"), rows)

    def side(ev_type):
        s = message_stream(spark, str(log))
        return s.filter(F.col("subject").contains(f".{ev_type}.")).select(
            F.regexp_extract("subject", r"\.u(\d+)$", 1).cast("long").alias("user_id"),
            "ts_nats",
            "seq",
        )

    joined = stream_interval_join(
        side("signup"), side("purchase"), on="user_id", within="1 hour"
    )
    out = run_to_completion(joined, str(tmp_path / "ckpt"))
    got = sorted((r.user_id, r.l_seq, r.r_seq) for r in out.collect())
    # signup seq = event_id+1; purchases within [signup, signup+1h] inclusive
    assert got == [(1, 2, 3), (3, 6, 7)]


def test_stream_join_reserved_column_collision_raises(spark, tmp_path):
    """A side carrying a column that prefixes into a reserved name
    (payload-extracted 'ts' → 'l_ts') must fail LOUD at definition time —
    the silent duplicate used to surface later as AMBIGUOUS_REFERENCE at
    watermark time (r09 review)."""
    import pytest

    log = tmp_path / "log"
    log.mkdir()
    _write_events(str(log / "a.parquet"), [(1, BASE, 1, "signup", 0.0, "{}")])
    s = message_stream(spark, str(log)).select(
        F.lit(1).alias("user_id"), "ts_nats", F.lit(0).alias("ts")
    )
    with pytest.raises(ValueError, match="reserved column"):
        stream_interval_join(s, s, on="user_id", within="1 hour")


def test_stream_join_plan_has_watermarks(spark, tmp_path):
    log = tmp_path / "log"
    log.mkdir()
    _write_events(str(log / "a.parquet"), [(1, BASE, 1, "signup", 0.0, "{}")])
    s = message_stream(spark, str(log)).select("ts_nats", F.lit(1).alias("user_id"))
    joined = stream_interval_join(s, s, on="user_id")
    plan = joined._jdf.queryExecution().analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2


def test_stream_static_enrich_broadcasts(spark, sf_dir, tmp_path):
    import shutil

    from duckdb_nats_jetstream_spark.streaming.joins import stream_static_enrich
    from duckdb_nats_jetstream_spark.streaming.stream_scan import message_stream

    d = tmp_path / "enrich_log"
    d.mkdir()
    shutil.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    stream = message_stream(spark, str(d))
    dim = (
        message_scan(spark, sf_dir)
        .groupBy("subject")
        .count()
        .withColumnRenamed("count", "subject_total")
    )
    out = stream_static_enrich(stream.select("subject", "seq"), dim, "subject")
    q = (
        out.writeStream.format("memory")
        .queryName("enrich_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM enrich_out").collect()
    batch = {r.subject: r.subject_total for r in dim.collect()}
    n = message_scan(spark, sf_dir).count()
    assert len(rows) == n  # left join keeps every stream row
    assert all(r.subject_total == batch[r.subject] for r in rows)


def test_stream_join_raw_reserved_names_are_joinable(spark, tmp_path):
    """An input column LITERALLY named 'l_ts' (or '__k') prefixes into
    'l_l_ts' — no collision is produced, so the guard must not reject it
    (r10 review: the guard unioned unprefixed names, a pure false
    positive)."""
    log = tmp_path / "log"
    log.mkdir()
    _write_events(str(log / "a.parquet"), [(1, BASE, 1, "signup", 0.0, "{}")])
    s = message_stream(spark, str(log)).select(
        F.lit(1).alias("user_id"),
        "ts_nats",
        F.lit(0).alias("l_ts"),
        F.lit(0).alias("__k"),
    )
    joined = stream_interval_join(s, s, on="user_id", within="1 hour")
    assert {"l_l_ts", "r_l_ts", "l___k", "r___k"} <= set(joined.columns)
