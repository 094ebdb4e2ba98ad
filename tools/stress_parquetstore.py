"""Parquet-store streaming state stress (round 7, batch 11).

Batch 9 measured the WATERMARK-bounded state stores. The other streaming
state class is the unbounded-look-back parquet store behind
``streaming.dedup.near_dup_flagger`` ("is this new document a near-dup of
ANYTHING ingested so far") — state on disk, not executor memory, and by
design it can never evict. The un-measured claims: executor memory stays
flat as the corpus accumulates, and the per-batch probe cost grows with
the STORE SCAN, not with resident state.

Method: replay 12 chunks of 5k synthetic documents (10% of each chunk is
a near-dup of an earlier chunk's doc) through the flagger with
``maxFilesPerTrigger=1``; per batch record wall clock, the store's
on-disk size, and the executors' peak JVM memory (UI REST). The verdicts
of the final run are sanity-checked (later copies flag, originals in
chunk 0 don't).

Run:  python tools/stress_parquetstore.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402

UI_PORT = 4086
BASE = os.path.join(REPO, ".stress", "parquetstore")
N_CHUNKS = 12
ROWS = 5_000
DUP_FRAC = 0.10


def _token_text(rng, n_tokens: int) -> str:
    return " ".join(
        f"tok{v}" for v in rng.integers(0, 50_000, size=n_tokens)
    )


def _write_chunks() -> str:
    out = os.path.join(BASE, "docs")
    if os.path.exists(os.path.join(out, "_OK")):
        _sparkui.pin_chunk_mtimes(out)
        return out
    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    rng = np.random.default_rng(11)
    originals: list[tuple[int, str]] = []
    for k in range(N_CHUNKS):
        ids, texts = [], []
        n_dup = int(ROWS * DUP_FRAC) if k else 0
        for i in range(ROWS - n_dup):
            doc_id = k * ROWS + i
            text = _token_text(rng, 120)
            ids.append(doc_id)
            texts.append(text)
            if rng.random() < 0.3:
                originals.append((doc_id, text))
        for i in range(n_dup):
            src_id, src_text = originals[rng.integers(0, len(originals))]
            toks = src_text.split()
            # near-dup: perturb ~2% of tokens
            for j in rng.integers(0, len(toks), size=max(1, len(toks) // 50)):
                toks[j] = f"tok{rng.integers(0, 50_000)}"
            ids.append(k * ROWS + (ROWS - n_dup) + i)
            texts.append(" ".join(toks))
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())}),
            os.path.join(tmp, f"chunk_{k:03d}.parquet"),
        )
    _sparkui.pin_chunk_mtimes(tmp)
    open(os.path.join(tmp, "_OK"), "w").close()
    shutil.rmtree(out, ignore_errors=True)
    os.replace(tmp, out)
    return out


def _dir_bytes(d: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(d):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def _peak_jvm_mb() -> float:
    """UI-reported executor storage memory. CAUTION: this REST counter
    only increments on block adds in this Spark version — it never comes
    back down when broadcast blocks are removed, so on a long foreachBatch
    loop it reads as a leak that is not there (proven by `_actual_mb`)."""
    try:
        execs = _sparkui.ui(
            UI_PORT, f"applications/{_sparkui.app_id(UI_PORT)}/executors"
        )
        return max(e.get("memoryUsed", 0) for e in execs) / 1e6
    except Exception:
        return -1.0


def _actual_mb(spark) -> tuple[float, int]:
    """(MB, n_blocks) actually resident in the block manager — the ground
    truth the REST metric diverges from."""
    env = spark.sparkContext._jvm.org.apache.spark.SparkEnv.get()
    total, n = 0, 0
    for ss in env.blockManager().master().getStorageStatus():
        it = ss.blocks().iterator()
        while it.hasNext():
            kv = it.next()
            total += kv._2().memSize()
            n += 1
    return round(total / 1e6, 1), n


def main() -> None:
    from pyspark.sql import types as T

    spark = _sparkui.build_session("stress-parquetstore", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    from duckdb_nats_jetstream_spark.streaming.dedup import near_dup_flagger

    docs = _write_chunks()
    work = os.path.join(BASE, "work")
    shutil.rmtree(work, ignore_errors=True)
    store, ckpt, out = (os.path.join(work, d) for d in ("store", "ckpt", "out"))

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()),
         T.StructField("text", T.StringType())]
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(docs)
    )
    q = near_dup_flagger(stream, store, ckpt, out)  # already started

    per_batch: list[dict] = []
    seen = -1
    while q.isActive:
        time.sleep(0.5)
        p = q.lastProgress
        if p and p["batchId"] != seen and p["numInputRows"]:
            seen = p["batchId"]
            actual, n_blocks = _actual_mb(spark)
            per_batch.append(
                {
                    "batch": p["batchId"],
                    "ms": p["batchDuration"],
                    "store_mb": round(_dir_bytes(store) / 1e6, 1)
                    if os.path.exists(store)
                    else 0.0,
                    "ui_mem_mb": round(_peak_jvm_mb(), 1),
                    "blocks_mb": actual,
                    "n_blocks": n_blocks,
                }
            )
    q.awaitTermination()
    # backfill batches the 0.5 s poll missed (e.g. the final batch landing
    # during the last sleep): metrics come from recentProgress; store_mb
    # can only be the final on-disk size for these (marked backfilled)
    have = {r["batch"] for r in per_batch}
    final_store = (
        round(_dir_bytes(store) / 1e6, 1) if os.path.exists(store) else 0.0
    )
    for p_ in q.recentProgress:
        if p_["batchId"] not in have and p_["numInputRows"]:
            per_batch.append(
                {
                    "batch": p_["batchId"],
                    "ms": p_["batchDuration"],
                    "store_mb": final_store,
                    "ui_mem_mb": round(_peak_jvm_mb(), 1),
                    "blocks_mb": _actual_mb(spark)[0],
                    "n_blocks": _actual_mb(spark)[1],
                    "backfilled": True,
                }
            )
    per_batch.sort(key=lambda r: r["batch"])

    flags = spark.read.parquet(out)
    n_flagged = flags.filter("is_near_dup").count()
    n_docs = flags.count()
    expect = int(ROWS * DUP_FRAC) * (N_CHUNKS - 1)

    # -- dir vs BUCKETED store: the probe join's shuffle bill ------------
    # broadcast disabled = the past-threshold regime; the dir store
    # reshuffles the whole accumulated store per batch, the bucketed
    # store reads pre-hashed (store-side exchange gone, plan-pinned in
    # tests) so only batch-sized data moves
    shuffle = {}
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS stress_band_store")
    shutil.rmtree(
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        + "/stress_band_store",
        ignore_errors=True,
    )
    try:
        for label, kwargs in (
            ("dir_store", {}),
            ("bucketed_store", dict(store_table="stress_band_store",
                                    store_buckets=32)),
        ):
            before = _sparkui.stage_ids(UI_PORT)
            t0 = time.time()
            stream = (
                spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", "1")
                .parquet(docs)
            )
            q2 = near_dup_flagger(
                stream,
                os.path.join(work, f"store_{label}"),
                os.path.join(work, f"ckpt_{label}"),
                os.path.join(work, f"out_{label}"),
                **kwargs,
            )
            q2.awaitTermination()
            shuffle[label] = {
                "wall_s": round(time.time() - t0, 1),
                "shuffle_write_mb": round(
                    _sparkui.shuffle_write_bytes(UI_PORT, before) / 1e6, 1
                ),
            }
            print(f"{label}: {shuffle[label]}", file=sys.stderr)
        a = spark.read.parquet(os.path.join(work, "out_dir_store"))
        b = spark.read.parquet(os.path.join(work, "out_bucketed_store"))
        assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS stress_band_store")
    for r in per_batch:
        print(f"b{r['batch']}: {r['ms']}ms store={r['store_mb']}MB "
              f"ui_mem={r['ui_mem_mb']}MB blocks={r['blocks_mb']}MB"
              f"({r['n_blocks']})", file=sys.stderr)
    print(f"flagged {n_flagged}/{n_docs} (planted {expect})", file=sys.stderr)
    print("RESULT " + json.dumps(
        {"per_batch": per_batch, "flagged": n_flagged, "docs": n_docs,
         "planted": expect, "store_backends": shuffle}
    ))


if __name__ == "__main__":
    main()
