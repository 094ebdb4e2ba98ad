"""Long streaming soak over the r09-rewritten paths (r09 verdict ask #6).

SCALING batch 11's 12-batch run predates the r09 rewrites of
``streaming/dedup.py`` (107 changed lines: short-doc verdicts, store
keys-cache release on error) and the funnel's TTL/null-ts fixes. This
soak drives BOTH fixed surfaces for ≥50 micro-batches each and records
per-batch wall plus state/memory ground truth, so "flat forever" is a
measured claim on the code that actually ships:

1. **near_dup_flagger, store_table backend, 55 batches** — every batch
   carries ~6% docs too short to shingle (the r09 verdict-fix path:
   they must verdict ``(0, false)``, not vanish) and ~10% near-dups of
   earlier batches. Reported per batch: foreachBatch wall, verdict
   rows (must equal batch docs exactly, every batch), block-manager
   residency via ``SparkEnv.blockManager`` (the REST executor metric
   is add-only — tools/stress_parquetstore.py) — flat residency means
   the r09 keys-cache try/finally holds across 55 iterations.

2. **streaming_funnel, TTL on, 55 batches** — event time advances one
   hour per chunk; each chunk is 70% returning users (hot cohort),
   30% one-shot users who then go idle past the 3-hour TTL, plus ~4%
   NULL-timestamp rows (the r09 ``int(NaN)`` crash fix: they must be
   dropped, not kill the query). Reported per batch: state rows
   (``stateOperators.numRowsTotal`` — must PLATEAU at ~the live cohort
   size, not grow with cumulative users) and rows removed (eviction
   actually firing).

Run:  python tools/stress_streamsoak.py   (~4-6 min)
Data under ``.stress/streamsoak/`` (gitignored, rebuilt per run).
"""

from __future__ import annotations

import os
import shutil
import sys
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402

BASE = os.path.join(REPO, ".stress", "streamsoak")
UI_PORT = 4085
N_BATCHES = 55
DOCS_PER_BATCH = 800
USERS_HOT = 500
USERS_COLD_PER_BATCH = 150
BASE_US = 1704067200 * 10**6  # 2024-01-01 UTC
HOUR_US = 3600 * 10**6


def _block_manager_mb(spark) -> tuple[float, int]:
    """(MB, blocks) actually resident — ground truth; the REST executor
    ``memoryUsed`` metric is add-only on this Spark version."""
    env = spark.sparkContext._jvm.org.apache.spark.SparkEnv.get()
    total, n = 0, 0
    for ss in env.blockManager().master().getStorageStatus():
        it = ss.blocks().iterator()
        while it.hasNext():
            kv = it.next()
            total += ss.getBlock(kv._1()).get().memSize()
            n += 1
    return total / 1e6, n


def _words(rng: np.random.Generator, n: int) -> str:
    return " ".join(f"w{int(x)}" for x in rng.integers(0, 50_000, n))


def build_doc_chunks() -> str:
    out = os.path.join(BASE, "docs")
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    rng = np.random.default_rng(29)
    prior_texts: list[str] = []
    for b in range(N_BATCHES):
        ids, texts = [], []
        for i in range(DOCS_PER_BATCH):
            doc_id = b * DOCS_PER_BATCH + i
            r = rng.random()
            if r < 0.06:
                # too short to shingle at n=3 — the r09 verdict-fix path
                text = _words(rng, int(rng.integers(1, 3)))
            elif r < 0.16 and prior_texts:
                # near-dup of an earlier batch's doc: shared shingles
                # survive a one-token suffix
                text = prior_texts[int(rng.integers(0, len(prior_texts)))] + f" nd{b}"
            else:
                text = _words(rng, 40)
                if len(prior_texts) < 2000:
                    prior_texts.append(text)
            ids.append(doc_id)
            texts.append(text)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}),
            os.path.join(out, f"chunk-{b:04d}.parquet"),
        )
    _sparkui.pin_chunk_mtimes(out)
    return out


def build_event_chunks() -> str:
    out = os.path.join(BASE, "events")
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    rng = np.random.default_rng(30)
    stages = ["view", "click", "purchase"]
    for b in range(N_BATCHES):
        rows_u, rows_t, rows_e = [], [], []
        t0 = BASE_US + b * HOUR_US

        def emit(u, dt_us, et):
            rows_u.append(u)
            rows_t.append(t0 + dt_us)
            rows_e.append(et)

        # hot cohort: active every hour, cycling through the funnel
        for u in range(USERS_HOT):
            for s, st in enumerate(stages):
                emit(u, s * 60_000_000 + u, st)
        # cold cohort: unique users this batch only → must be TTL-evicted
        for j in range(USERS_COLD_PER_BATCH):
            u = 10_000 + b * USERS_COLD_PER_BATCH + j
            emit(u, 120_000_000 + j, "view")
        # null-timestamp rows (the r09 int(NaN) crash fix)
        n_null = max(1, (USERS_HOT * 3) // 25)
        for j in range(n_null):
            rows_u.append(int(rng.integers(0, USERS_HOT)))
            rows_t.append(None)
            rows_e.append("click")
        pq.write_table(
            pa.table(
                {
                    "user_id": pa.array(rows_u, pa.int64()),
                    "ts": pa.array(rows_t, pa.timestamp("us")),
                    "event_type": rows_e,
                }
            ),
            os.path.join(out, f"chunk-{b:04d}.parquet"),
        )
    _sparkui.pin_chunk_mtimes(out)
    return out


def soak_flagger(spark, docs_dir: str) -> list[dict]:
    from duckdb_nats_jetstream_spark.streaming.dedup import near_dup_flagger

    work = os.path.join(BASE, f"flagger-{uuid.uuid4().hex[:8]}")
    table = f"soak_bands_{uuid.uuid4().hex[:8]}"
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(docs_dir)
    )
    t_start = time.perf_counter()
    q = near_dup_flagger(
        stream,
        store_dir=os.path.join(work, "store"),
        checkpoint_dir=os.path.join(work, "ckpt"),
        out_dir=os.path.join(work, "out"),
        store_table=table,
        n=3,
    )
    q.awaitTermination()
    total = time.perf_counter() - t_start
    rows = [
        {
            "batch": p["batchId"],
            "wall_ms": p["batchDuration"],
            "in_rows": p["numInputRows"],
        }
        for p in q.recentProgress
    ]
    mb, blocks = _block_manager_mb(spark)
    # correctness invariants on the fixed path: one verdict per doc,
    # short docs included, every batch
    out = spark.read.parquet(os.path.join(work, "out"))
    n_verdicts = out.count()
    n_docs = spark.read.parquet(docs_dir).count()
    n_dups = out.filter("is_near_dup").count()
    per_batch = out.groupBy("batch_id").count().agg(
        {"count": "min"}
    ).collect()[0][0]
    print(
        f"flagger: {len(rows)} batches drained in {total:.1f}s; verdicts "
        f"{n_verdicts}/{n_docs} docs (min batch {per_batch}), near-dups "
        f"{n_dups}; block-manager residual {mb:.1f} MB / {blocks} blocks",
        file=sys.stderr,
    )
    assert n_verdicts == n_docs, "a document lost its verdict row"
    assert per_batch == DOCS_PER_BATCH, "a batch verdicted fewer than its docs"
    assert n_dups > 0, "near-dup seeding produced no flags"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    return rows


def soak_funnel(spark, events_dir: str) -> list[dict]:
    from duckdb_nats_jetstream_spark.streaming.funnel import streaming_funnel

    work = os.path.join(BASE, f"funnel-{uuid.uuid4().hex[:8]}")
    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(events_dir)
    )
    out = streaming_funnel(
        stream,
        ["view", "click", "purchase"],
        idle_timeout="3 hours",
        watermark="0 seconds",
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", os.path.join(work, "out"))
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = []
    removed_total = 0
    for p in q.recentProgress:
        so = p["stateOperators"][0] if p["stateOperators"] else {}
        removed_total += so.get("numRowsRemoved", 0)
        rows.append(
            {
                "batch": p["batchId"],
                "wall_ms": p["batchDuration"],
                "in_rows": p["numInputRows"],
                "state_rows": so.get("numRowsTotal"),
                "removed": so.get("numRowsRemoved"),
            }
        )
    peak_state = max(r["state_rows"] or 0 for r in rows)
    end_state = rows[-1]["state_rows"]
    print(
        f"funnel: {len(rows)} batches; peak state {peak_state} rows, end "
        f"{end_state}, evicted {removed_total} total",
        file=sys.stderr,
    )
    # the cold cohort must be evicted: state plateaus near the hot cohort
    # + a few in-flight cold batches, nowhere near the cumulative
    # USERS_HOT + 55*USERS_COLD_PER_BATCH ≈ 8750
    assert removed_total > 0, "TTL eviction never fired"
    assert peak_state < USERS_HOT + 6 * USERS_COLD_PER_BATCH, (
        f"state did not plateau: peak {peak_state}"
    )
    return rows


def _table(rows: list[dict], every: int = 5) -> str:
    keys = [k for k in rows[0] if k != "batch"]
    lines = ["| batch | " + " | ".join(keys) + " |", "|---" * (len(keys) + 1) + "|"]
    for r in rows:
        if r["batch"] % every == 0 or r["batch"] == rows[-1]["batch"]:
            lines.append(
                f"| {r['batch']} | " + " | ".join(str(r[k]) for k in keys) + " |"
            )
    return "\n".join(lines)


def main() -> None:
    docs = build_doc_chunks()
    events = build_event_chunks()
    spark = _sparkui.build_session("stress-streamsoak", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")

    flag_rows = soak_flagger(spark, docs)
    fun_rows = soak_funnel(spark, events)

    print("\n### flagger (store_table backend)\n" + _table(flag_rows))
    print("\n### funnel (TTL on)\n" + _table(fun_rows))

    # flatness read: compare median wall of the first vs last 10 batches
    import statistics

    def med(rs, sl):
        return statistics.median(r["wall_ms"] for r in rs[sl])

    print(
        f"\nflagger wall first10 {med(flag_rows, slice(2, 12)):.0f} ms -> "
        f"last10 {med(flag_rows, slice(-10, None)):.0f} ms; "
        f"funnel first10 {med(fun_rows, slice(2, 12)):.0f} -> "
        f"last10 {med(fun_rows, slice(-10, None)):.0f} ms"
    )


if __name__ == "__main__":
    main()
