"""Many-small-files stress batch (round 6, batch 6): ingestion
fragmentation — the scan-side hazard the volume/skew batches can't show.

A streaming sink (or a 1000-producer ingestion job) that commits every
micro-batch leaves thousands of KB-sized parquet files per partition. At
100 TB that costs three ways: driver-side listing, a footer read + open
per file, and the collapse of columnar compression/row-group pruning on
tiny row groups. Spark's scan planner mitigates by bin-packing small
files into splits (``spark.sql.files.openCostInBytes`` — default 4 MB —
charges each file against ``maxPartitionBytes`` so a split never holds
thousands of opens), and the package owns the real remedy:
``sinks.compact_parquet`` (the OPTIMIZE pass).

This harness measures all three states on identical data (10× events,
~1M rows):

- ``frag2000``  — the same rows across 2000 ~30 KB files
- ``baseline``  — size-targeted files straight from one write
- ``compacted`` — ``compact_parquet(frag2000)`` output (plus the
  compaction cost itself, reported once)

per-state: cold wall (first touch: listing + footers), warm wall
(median of 3), and the scan stage's task count (REST API) — the direct
view of bin-packing.

Data lives under ``.stress/files/`` (gitignored, atomic build). Run:
``python tools/stress_files.py`` (~2 min).
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402 — needs REPO on sys.path

SRC = "/root/testdata/sf0.1/events.parquet"
BASE = os.path.join(REPO, ".stress", "files")
REPLICAS = 10
N_FRAG = 2000
UI_PORT = 4081


def _build() -> None:
    if os.path.exists(os.path.join(BASE, "_SUCCESS_BUILD")):
        return
    if os.path.isdir(BASE):
        shutil.rmtree(BASE)
    tmp = BASE + ".tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    import duckdb

    con = duckdb.connect()
    con.execute(f"SET threads TO {os.cpu_count()}")
    con.execute(
        f"""
        COPY (
          SELECT e.* FROM '{SRC}' e,
               (SELECT unnest(range({REPLICAS})) AS k) r
        ) TO '{tmp}/baseline' (FORMAT parquet, PER_THREAD_OUTPUT false)
        """
    )
    # fragment: 2000 files via duckdb's hive write on a synthetic shard col
    # would leak the shard column — use spark below instead for fidelity
    os.rename(tmp, BASE)


def _fragment(spark) -> None:
    frag = os.path.join(BASE, "frag2000")
    if os.path.isdir(frag):
        return
    df = spark.read.parquet(os.path.join(BASE, "baseline"))
    df.repartition(N_FRAG).write.mode("overwrite").parquet(frag + ".tmp")
    os.rename(frag + ".tmp", frag)
    open(os.path.join(BASE, "_SUCCESS_BUILD"), "w").close()


def _scan_stage_tasks(before_ids: set) -> int:
    """Task count of the SCAN stage among the job's new stages — tagged by
    max inputBytes (the reduce stage reads shuffle, not input), so the
    figure can't silently pick up the shuffle stage's partition count."""
    new = [
        st
        for st in _sparkui.completed_stages(UI_PORT)
        if (st["stageId"], st["attemptId"]) not in before_ids
    ]
    if not new:
        return 0
    scan = max(new, key=lambda st: st.get("inputBytes", 0))
    return scan["numCompleteTasks"] if scan.get("inputBytes", 0) > 0 else 0


def measure(spark, path: str, label: str) -> dict:
    from pyspark.sql import functions as F

    def job():
        return (
            spark.read.parquet(path)
            .groupBy("event_type")
            .agg(F.sum("value").alias("sv"), F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )

    before = _sparkui.stage_ids(UI_PORT)
    t0 = time.perf_counter()
    job()
    cold = time.perf_counter() - t0
    scan_tasks = _scan_stage_tasks(before)
    warm = []
    for _ in range(3):
        t0 = time.perf_counter()
        job()
        warm.append(time.perf_counter() - t0)
    out = {
        "cold_s": round(cold, 2),
        "warm_med_s": round(sorted(warm)[1], 2),
        "scan_tasks": scan_tasks,
        "n_files": (
            sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
            if os.path.isdir(path)
            else 1  # duckdb writes the baseline as a single parquet FILE
        ),
    }
    print(f"{label}: {out}", file=sys.stderr)
    return out


def main() -> None:
    spark = _sparkui.build_session("stress-files", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")

    _build()
    _fragment(spark)

    from duckdb_nats_jetstream_spark.sinks import compact_parquet

    compacted = os.path.join(BASE, "compacted")
    if os.path.isdir(compacted):
        shutil.rmtree(compacted)
    t0 = time.perf_counter()
    compact_parquet(spark, os.path.join(BASE, "frag2000"), compacted)
    compact_s = round(time.perf_counter() - t0, 2)

    rows = [
        ("baseline (size-targeted write)", measure(spark, os.path.join(BASE, "baseline"), "baseline")),
        (f"fragmented ({N_FRAG} files)", measure(spark, os.path.join(BASE, "frag2000"), "frag2000")),
        ("compacted (compact_parquet)", measure(spark, compacted, "compacted")),
    ]
    print(f"\ncompaction pass itself: {compact_s}s (one-off maintenance cost)")
    print("\n| layout | files | scan tasks | cold wall | warm wall (med of 3) |")
    print("|---|---|---|---|---|")
    for label, r in rows:
        print(
            f"| {label} | {r['n_files']} | {r['scan_tasks']} "
            f"| {r['cold_s']}s | {r['warm_med_s']}s |"
        )


if __name__ == "__main__":
    main()
