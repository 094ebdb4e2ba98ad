"""Spill stress batch (round 6, batch 7): does the engine degrade to
disk, or die, when a shuffle partition no longer fits in memory?

The 100 TB sizing rule in SCALING.md ("size shuffle partitions so they
fit executor memory") has a failure mode this measures: when the rule is
violated — skew, under-provisioning, a fat row — Spark's sort and
hash-aggregate operators are spill-capable (UnsafeExternalSorter /
ObjectAggregationIterator), so the job should finish slower, not OOM.
That property is what makes partition-size tuning a performance knob
rather than a correctness cliff, and it deserves a measurement, not a
doc claim.

Workloads over the 100× events table (10M rows, built by
``stress_skew``): a full-row global ``orderBy`` (range partition + sort
— the heaviest memory consumer) and a high-cardinality hash aggregate.
Each runs in TWO fresh JVMs: 24g (comfortable — expect zero spill) and
a constrained heap (default 2g across 32 local threads → ~35 MB of
execution memory per task vs ~10× that in row data). Reported per run:
wall, rows out (correctness), and the stage-summed
memory/disk spill bytes from the REST API.

Run:  python tools/stress_spill.py          (orchestrates both JVMs)
      python tools/stress_spill.py worker 2g   (one measured JVM)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402 — needs REPO on sys.path

DATA = os.path.join(REPO, ".stress", "uniform100", "events.parquet")
UI_PORT = 4082


def _spill_totals() -> tuple[int, int]:
    return _sparkui.spill_totals(UI_PORT)


def worker(mem: str) -> None:
    from pyspark.sql import functions as F

    spark = _sparkui.build_session(
        f"stress-spill-{mem}", UI_PORT, driver_memory=mem
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = spark.read.parquet(DATA)

    results = {}
    for name, build in (
        # global sort: range-partition + per-partition UnsafeExternalSorter
        ("sort", lambda: ev.orderBy("user_id", "ts")),
        # high-cardinality hash agg: ~10M groups force agg-buffer pressure
        (
            "hashagg",
            lambda: ev.groupBy("event_id").agg(
                F.sum("value").alias("sv"), F.max("ts").alias("mt")
            ),
        ),
    ):
        m0, d0 = _spill_totals()
        t0 = time.perf_counter()
        build().write.mode("overwrite").format("noop").save()
        wall = time.perf_counter() - t0
        m1, d1 = _spill_totals()
        # untimed, outside the spill markers; count() elides the sort, so
        # for "sort" this is rows-in == rows-out, for "hashagg" the group
        # count — the correctness figure either way
        n = build().count()
        results[name] = {
            "wall_s": round(wall, 2),
            "rows": n,
            "spill_mem_mb": round((m1 - m0) / 1e6),
            "spill_disk_mb": round((d1 - d0) / 1e6),
        }
    print("RESULT " + json.dumps({"mem": mem, "runs": results}))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(sys.argv[2])
        return
    if not os.path.exists(DATA):
        print(
            "build the 100x table first: python tools/stress_skew.py",
            file=sys.stderr,
        )
        sys.exit(1)
    rows = []
    for mem in ("24g", os.environ.get("SPARK_GRAFT_SPILL_MEM", "2g")):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "worker", mem],
            capture_output=True,
            text=True,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT ")]
        if not line:
            print(proc.stdout[-2000:], proc.stderr[-2000:], file=sys.stderr)
            sys.exit(f"worker {mem} produced no result")
        rows.append(json.loads(line[0][len("RESULT "):]))
        print(f"{mem}: {rows[-1]['runs']}", file=sys.stderr)

    print("\n| workload | heap | wall | rows out | spilled (mem / disk) |")
    print("|---|---|---|---|---|")
    for r in rows:
        for wl, m in r["runs"].items():
            print(
                f"| {wl} | {r['mem']} | {m['wall_s']}s | {m['rows']:,} "
                f"| {m['spill_mem_mb']} MB / {m['spill_disk_mb']} MB |"
            )


if __name__ == "__main__":
    main()
