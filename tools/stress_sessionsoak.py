"""Sessionizer soak: exact numbering across timeout flushes, state plateau.

The r10 sweep changed what the sessionizer's timeout branch RETAINS: it
used to ``state.remove()`` (resetting session_no to 1 after every
timeout-closed session — duplicate keys), now it keeps a counter-only
state row. Two claims need measuring on the code that ships:

1. **Numbering stays batch-exact at soak length**: across 40 micro-batches
   of rotating cohorts (every user's sessions repeatedly close BY TIMEOUT
   while other users' batches advance the watermark), every closed
   streaming session must equal the batch sessionization of the same log
   key-for-key — including session_no 5, 6, 7 for users whose sessions
   closed via timeout four times before.
2. **The retention cost is what the fix says it is**: state rows plateau
   at DISTINCT USERS SEEN (one 4-long counter row per user, open or
   residual), not at cumulative sessions and not unbounded.

RESULT line: {"batches": N, "closed_sessions": N, "distinct_users": N,
"peak_state_rows": N, "end_state_rows": N, "max_session_no": N}

Run:  python tools/stress_sessionsoak.py   (~2 min)
Data under ``.stress/sessionsoak/`` (gitignored, rebuilt per run).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402

BASE = os.path.join(REPO, ".stress", "sessionsoak")
UI_PORT = 4099
N_BATCHES = 40
N_USERS = 120  # universe; each batch carries a rotating half of it
GAP_MINUTES = 30
BASE_NS = 1_704_067_200 * 10**9  # 2024-01-01
HOUR_NS = 3600 * 10**9


def build_chunks(d: str) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(d, exist_ok=True)
    eid = 0
    for b in range(N_BATCHES):
        # rotating cohort: user u appears in batch b iff (u + b) % 2 == 0 —
        # every user appears every OTHER batch (2 h apart ≫ the 30-min
        # gap), so each appearance is its own session and every session
        # closes BY TIMEOUT one batch later (the other cohort's events
        # advance the watermark past last + gap)
        users = [u for u in range(N_USERS) if (u + b) % 2 == 0]
        rows = []
        for u in users:
            t0 = BASE_NS + b * HOUR_NS + (u % 60) * 10**9
            rows.append((eid, t0, u))
            eid += 1
            rows.append((eid, t0 + 60 * 10**9, u))  # 2 msgs per session
            eid += 1
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
            os.path.join(d, f"chunk{b:03d}.parquet"),
        )
    _sparkui.pin_chunk_mtimes(d)


def batch_twin(spark, d: str):
    """Batch sessionization of the same log (the scan_sessionization shape
    inlined on message_stream's batch-read twin)."""
    from pyspark.sql import Window as W, functions as F

    from duckdb_nats_jetstream_spark.sources.message_scan import (
        message_projection,
    )

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.schema(
        "event_id long, ts long, user_id long, event_type string, "
        "value double, props string"
    ).parquet(d)
    msgs = raw.select(
        *message_projection(
            "events", F.timestamp_micros(F.expr("ts div 1000"))
        )
    ).selectExpr(
        "CAST(regexp_extract(subject, '\\\\.u(\\\\d+)$', 1) AS BIGINT) AS user_id",
        "seq",
        "ts_nats",
    )
    w = W.partitionBy("user_id").orderBy("ts_nats", "seq")
    gap = F.col("ts_nats").cast("long") - F.lag(F.col("ts_nats").cast("long")).over(w)
    s = msgs.withColumn(
        "new_s",
        F.when(gap.isNull() | (gap > GAP_MINUTES * 60), F.lit(1)).otherwise(F.lit(0)),
    ).withColumn("session_no", F.sum("new_s").over(w))
    return (
        s.groupBy("user_id", "session_no")
        .agg(
            F.count("*").alias("n_msgs"),
            F.min("seq").alias("first_seq"),
            F.max("ts_nats").alias("last_ts"),
        )
    )


def main() -> None:
    shutil.rmtree(BASE, ignore_errors=True)
    chunks = os.path.join(BASE, "chunks")
    build_chunks(chunks)

    spark = _sparkui.build_session("sessionsoak", UI_PORT)
    from duckdb_nats_jetstream_spark.streaming.stateful import (
        streaming_sessionize,
    )
    from duckdb_nats_jetstream_spark.streaming.stream_scan import message_stream

    stream = message_stream(spark, chunks, max_files_per_trigger=1)
    sessions = streaming_sessionize(stream, gap_minutes=GAP_MINUTES)
    work = os.path.join(BASE, f"run-{uuid.uuid4().hex[:8]}")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", os.path.join(work, "out"))
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    per_batch = []
    for p in q.recentProgress:
        so = p["stateOperators"][0] if p["stateOperators"] else {}
        per_batch.append(
            {"batch": p["batchId"], "state_rows": so.get("numRowsTotal") or 0}
        )
    peak_state = max(r["state_rows"] for r in per_batch)
    end_state = per_batch[-1]["state_rows"]

    got = {
        (r.user_id, r.session_no): (r.n_msgs, r.first_seq)
        for r in spark.read.parquet(os.path.join(work, "out")).collect()
    }
    batch = {
        (r.user_id, r.session_no): (r.n_msgs, r.first_seq)
        for r in batch_twin(spark, chunks).collect()
    }
    # every closed streaming session equals its batch twin KEY-FOR-KEY —
    # the numbering claim (duplicate keys would collide in `got` and
    # shrink it; a reset counter would mismatch batch's session_no)
    assert got, "no closed sessions"
    for key, val in got.items():
        assert batch[key] == val, f"{key}: streaming {val} != batch {batch[key]}"
    # at most one open (unemitted) session per user
    assert len(got) >= len(batch) - N_USERS
    max_no = max(no for _, no in got)
    assert max_no >= N_BATCHES // 2 - 1, (
        f"timeout-closed sessions did not keep numbering: max session_no {max_no}"
    )
    # state = one counter row per user seen, NOT cumulative sessions
    assert end_state <= N_USERS, f"state rows {end_state} > distinct users"

    print(
        "RESULT "
        + json.dumps(
            {
                "batches": len(per_batch),
                "closed_sessions": len(got),
                "distinct_users": N_USERS,
                "peak_state_rows": peak_state,
                "end_state_rows": end_state,
                "max_session_no": max_no,
            }
        )
    )


if __name__ == "__main__":
    main()
