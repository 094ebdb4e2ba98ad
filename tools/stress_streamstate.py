"""Streaming-state stress batch (round 6, batch 9): measure, don't
assert, the "bounded state everywhere" claim of the streaming layer.

SCALING.md's streaming section claims watermarks bound every stateful
operator's memory and the funnel processor keeps two scalars per user.
At 100 TB/day those claims are the difference between a pipeline that
runs forever and one whose state store grows until the job dies — so
each gets a number from the state-store metrics Spark itself reports
per micro-batch (``StreamingQueryProgress.stateOperators``: rows total /
updated / REMOVED, memory used).

Scenarios (each drained with availableNow + ``maxFilesPerTrigger=1`` so
every chunk file is its own micro-batch; chunk k's event time sits in
hour k, so the watermark advances one hour per batch):

1. **dedup** — ``dedup_messages`` (dropDuplicatesWithinWatermark,
   1-hour watermark): every chunk carries 50% in-chunk redeliveries and
   fresh keys otherwise. Bounded iff rows-in-state plateaus at ~the
   per-hour key count (not the cumulative count) and eviction
   (numRowsRemoved) starts once the watermark passes a chunk.
2. **windowed HLL** — ``windowed_hll_registers`` (1h windows, 2h
   watermark): state must plateau at (open windows) x (<= m registers)
   regardless of input rows, then shed closed windows.
3. **stateful funnel** — ``streaming_funnel``: state rows must equal
   ACTIVE USERS exactly and be invariant to events-per-user (runs at
   10k users x 120 ev/user and 100k users x 12 ev/user — same 1.2M
   events, state must differ 10x, bytes/user roughly constant).

Run:  python tools/stress_streamstate.py
Data under ``.stress/streamstate/`` (gitignored, built atomically).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402 — needs REPO on sys.path

BASE_DIR = os.path.join(REPO, ".stress", "streamstate")
UI_PORT = 4084
BASE_US = 1704067200 * 10**6  # 2024-01-01 UTC, microseconds
HOUR_US = 3600 * 10**6
STAGES = ("view", "click", "purchase")


def _write_chunks(
    name: str,
    n_chunks: int,
    rows_per_chunk: int,
    n_users: int,
    dup_frac: float = 0.0,
    seed: int = 7,
) -> str:
    """Deterministic replay log: chunk k spans hour k; ``dup_frac`` of a
    chunk's rows repeat an earlier event_id FROM THE SAME CHUNK (the
    redelivery shape dedup must absorb)."""
    out = os.path.join(BASE_DIR, name)
    if os.path.exists(os.path.join(out, "_OK")):
        # re-pin on cached dirs too: data built by an older harness
        # version has same-second mtimes
        _sparkui.pin_chunk_mtimes(out)
        return out
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    rng = np.random.default_rng(seed)
    for k in range(n_chunks):
        n_fresh = int(rows_per_chunk * (1 - dup_frac))
        ids = np.arange(n_fresh, dtype=np.int64) + k * rows_per_chunk
        if n_fresh < rows_per_chunk:
            ids = np.concatenate(
                [ids, rng.choice(ids, rows_per_chunk - n_fresh)]
            )
        ts = BASE_US + k * HOUR_US + (ids % 3600) * 10**6
        users = ids % n_users
        types = np.array(STAGES)[ids % 3]
        pq.write_table(
            pa.table(
                {
                    "event_id": pa.array(ids),
                    "ts": pa.array(ts * 1000, pa.timestamp("ns")),
                    "user_id": pa.array(users),
                    "event_type": pa.array(types, pa.string()),
                    "value": pa.array((ids % 100).astype("float64")),
                    "props": pa.array(["{}"] * rows_per_chunk, pa.string()),
                }
            ),
            os.path.join(tmp, f"chunk_{k:03d}.parquet"),
        )
    _sparkui.pin_chunk_mtimes(tmp)
    open(os.path.join(tmp, "_OK"), "w").close()
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return out


def _drain_with_progress(stream_df, ckpt: str) -> list[dict]:
    """availableNow drain; returns per-batch state-operator metrics."""
    name = "sink_" + uuid.uuid4().hex[:8]
    q = (
        stream_df.writeStream.format("noop")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = []
    for p in q.recentProgress:
        ops = p["stateOperators"] if isinstance(p, dict) else p.stateOperators
        if not ops:
            continue
        o = ops[0]
        out.append(
            {
                "batch": p["batchId"] if isinstance(p, dict) else p.batchId,
                "rows_total": o["numRowsTotal"],
                "rows_updated": o["numRowsUpdated"],
                "rows_removed": o["numRowsRemoved"],
                "mem_bytes": o["memoryUsedBytes"],
                "ms": (p["batchDuration"] if isinstance(p, dict) else p.batchDuration),
            }
        )
    return out


def _fmt(rows: list[dict]) -> str:
    return " | ".join(
        f"b{r['batch']}: {r['rows_total']:,}t/{r['rows_removed']:,}rm"
        for r in rows
    )


def _raw_stream(spark, log: str):
    """maxFilesPerTrigger=1 stream over a chunk dir, ts normalized to
    timestamp (ns-parquet reads back as long under nanosAsLong)."""
    from pyspark.sql import functions as F, types as T

    raw = spark.read.parquet(log)
    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(log)
    )
    if isinstance(raw.schema["ts"].dataType, T.LongType):
        stream = stream.withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)")
        )
    return stream


def main() -> None:
    from pyspark.sql import functions as F

    spark = _sparkui.build_session("stress-streamstate", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")
    # state ops shuffle once per batch; 200 default partitions would
    # scatter tiny state files — match cores like the repo session does
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    from duckdb_nats_jetstream_spark.streaming.cardinality import (
        windowed_hll_registers,
    )
    from duckdb_nats_jetstream_spark.streaming.dedup import dedup_messages
    from duckdb_nats_jetstream_spark.streaming.funnel import streaming_funnel
    from duckdb_nats_jetstream_spark.streaming.stream_scan import (
        message_stream,
    )

    results: dict[str, list[dict]] = {}
    work = os.path.join(BASE_DIR, "work")
    shutil.rmtree(work, ignore_errors=True)

    # -- 1. dedup: fresh keys per hour + 50% in-chunk redelivery ---------
    log = _write_chunks("dedup", n_chunks=6, rows_per_chunk=100_000,
                        n_users=10_000, dup_frac=0.5)
    st = message_stream(spark, log, max_files_per_trigger=1)
    results["dedup_1h_watermark"] = _drain_with_progress(
        dedup_messages(st, watermark="1 hour"),
        os.path.join(work, "ckpt_dedup"),
    )

    # -- 2. windowed HLL: 1h windows, 2h watermark -----------------------
    st = message_stream(spark, log, max_files_per_trigger=1)
    results["hll_1h_window"] = _drain_with_progress(
        windowed_hll_registers(st, value_col="subject", window="1 hour",
                               watermark="2 hours"),
        os.path.join(work, "ckpt_hll"),
    )

    # -- 3. funnel: same events, 10x user-cardinality spread -------------
    for label, users in (("funnel_10k_users", 10_000),
                         ("funnel_100k_users", 100_000)):
        log = _write_chunks(label, n_chunks=6, rows_per_chunk=200_000,
                            n_users=users)
        results[label] = _drain_with_progress(
            streaming_funnel(_raw_stream(spark, log), list(STAGES)),
            os.path.join(work, f"ckpt_{label}"),
        )

    # -- 4. funnel + event-time TTL: OPEN-ENDED user space ---------------
    # every chunk brings 100k NEVER-SEEN users (users = ids); without a
    # TTL state = cumulative users (the one unbounded state batch 9 v1
    # found); with idle_timeout=90min the watermark evicts users idle
    # past 1.5 hours, so state must PLATEAU at ~2 chunks' users
    log = _write_chunks("funnel_ttl", n_chunks=6, rows_per_chunk=100_000,
                        n_users=600_000)
    results["funnel_ttl_90m"] = _drain_with_progress(
        streaming_funnel(_raw_stream(spark, log), list(STAGES),
                         idle_timeout="90 minutes", watermark="0 seconds"),
        os.path.join(work, "ckpt_funnel_ttl"),
    )

    # -- 5. checkpoint RESUME cost: stop after 3 chunks, restart ---------
    # the restarted query's FIRST batch must reload the full state store
    # from the checkpoint before processing — its duration vs the same
    # batch in an uninterrupted drain IS the resume tax. Same dedup
    # topology/state size as scenario 1.
    full_log = _write_chunks("dedup", n_chunks=6, rows_per_chunk=100_000,
                             n_users=10_000, dup_frac=0.5)
    part_log = os.path.join(BASE_DIR, "dedup_resume_active")
    shutil.rmtree(part_log, ignore_errors=True)
    os.makedirs(part_log)
    chunks = sorted(
        f for f in os.listdir(full_log) if f.endswith(".parquet")
    )
    for c in chunks[:3]:
        os.symlink(os.path.join(full_log, c), os.path.join(part_log, c))
    ckpt = os.path.join(work, "ckpt_resume")
    st = message_stream(spark, part_log, max_files_per_trigger=1)
    run1 = _drain_with_progress(dedup_messages(st, watermark="1 hour"), ckpt)
    for c in chunks[3:]:
        os.symlink(os.path.join(full_log, c), os.path.join(part_log, c))
    st = message_stream(spark, part_log, max_files_per_trigger=1)
    run2 = _drain_with_progress(dedup_messages(st, watermark="1 hour"), ckpt)
    results["dedup_resume"] = run1 + [dict(r, resumed=True) for r in run2]

    # -- 6. RocksDB state store: same dedup topology ---------------------
    # HDFSBackedStateStoreProvider keeps every state row on the EXECUTOR
    # HEAP (the 30 MB above scales to executor-OOM when per-partition
    # state outgrows memory); RocksDB spills to local disk — the
    # documented provider for 100 TB state. Same data: results must agree.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        st = message_stream(spark, full_log, max_files_per_trigger=1)
        results["dedup_rocksdb"] = _drain_with_progress(
            dedup_messages(st, watermark="1 hour"),
            os.path.join(work, "ckpt_rocksdb"),
        )
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")

    print()
    for name, rows in results.items():
        print(f"## {name}")
        print(_fmt(rows))
        last = rows[-1]
        per_row = last["mem_bytes"] / max(last["rows_total"], 1)
        print(
            f"final: {last['rows_total']:,} state rows, "
            f"{last['mem_bytes']/1e6:.1f} MB ({per_row:.0f} B/row), "
            f"total removed {sum(r['rows_removed'] for r in rows):,}"
        )
        print()
    print("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
