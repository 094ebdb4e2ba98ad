"""Shared Spark REST-API + session helpers for the stress harnesses.

One copy of the UI polling and the local[N] session builder so a fix
(e.g. selecting the right application if the UI port auto-increments on
conflict) lands in every harness at once.
"""

from __future__ import annotations

import json
import os
import urllib.request


def ui(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def app_id(port: int) -> str:
    return ui(port, "applications")[0]["id"]


def completed_stages(port: int) -> list[dict]:
    return ui(port, f"applications/{app_id(port)}/stages?status=complete")


def stage_ids(port: int) -> set[tuple[int, int]]:
    return {(s["stageId"], s["attemptId"]) for s in completed_stages(port)}


def task_skew(port: int, stage_id: int, attempt: int) -> tuple[float, float]:
    """(median_s, max_s) executor run time across the stage's tasks."""
    s = ui(
        port,
        f"applications/{app_id(port)}/stages/{stage_id}/{attempt}/taskSummary"
        "?quantiles=0.5,1.0",
    )
    med, mx = s["executorRunTime"]
    return med / 1000.0, mx / 1000.0


def spill_totals(port: int) -> tuple[int, int]:
    mem = disk = 0
    for st in completed_stages(port):
        mem += st.get("memoryBytesSpilled", 0)
        disk += st.get("diskBytesSpilled", 0)
    return mem, disk


def build_session(app_name: str, port: int, driver_memory: str = "24g"):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .appName(app_name)
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(port))
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", driver_memory)
        .getOrCreate()
    )


def pin_chunk_mtimes(d: str) -> None:
    """Give each *.parquet chunk in ``d`` a distinct, increasing mtime (in
    name order). Spark's file stream source orders files by modification
    time; same-second writes tie and can replay chunks out of order —
    an observed flake in every replay-log harness. A chunk may be a flat
    file OR a Spark-written ``*.parquet`` DIRECTORY; for directories the
    pin must land on the PART FILES inside (the source lists leaves, so
    utime on the directory itself is a silent no-op — and part files
    within one chunk share its mtime, which is why chunk writers should
    also coalesce(1))."""
    k = 0
    for f in sorted(os.listdir(d)):
        if not f.endswith(".parquet"):
            continue
        path = os.path.join(d, f)
        mt = (1_700_000_000 + k * 10,) * 2
        if os.path.isdir(path):
            for root, _dirs, files in os.walk(path):
                for leaf in files:
                    os.utime(os.path.join(root, leaf), mt)
        else:
            os.utime(path, mt)
        k += 1


def shuffle_write_bytes(port: int, exclude: set[tuple[int, int]]) -> int:
    """Total shuffle WRITE bytes across completed stages not in ``exclude``
    — the cross-stage data-movement bill for everything since a
    ``stage_ids()`` snapshot."""
    total = 0
    for s in completed_stages(port):
        if (s["stageId"], s["attemptId"]) not in exclude:
            total += s.get("shuffleWriteBytes", 0)
    return total


def input_records(port: int, exclude: set[tuple[int, int]]) -> int:
    """Total INPUT records decoded by file scans across completed stages
    not in ``exclude`` — the instrument for pushdown/pruning claims: a
    parquet row group skipped by min/max pruning decodes zero records.
    Records, not bytes, deliberately: the REST ``inputBytes`` counter
    under-reports on the local filesystem with the vectorized reader
    (measured 0.39 MB for a full scan of a 180 MB / 10M-row table whose
    inputRecords correctly read 10M), so byte fractions would be noise."""
    total = 0
    for s in completed_stages(port):
        if (s["stageId"], s["attemptId"]) not in exclude:
            total += s.get("inputRecords", 0)
    return total


def worst_task(port: int, exclude: set[tuple[int, int]]) -> tuple[float, float]:
    """(median_s, max_s) of the completed stage with the LARGEST max task
    time outside ``exclude`` — the straggler signal for everything since
    a ``stage_ids()`` snapshot."""
    worst = (0.0, 0.0)
    for s in completed_stages(port):
        key = (s["stageId"], s["attemptId"])
        if key in exclude:
            continue
        med, mx = task_skew(port, *key)
        if mx > worst[1]:
            worst = (med, mx)
    return worst
