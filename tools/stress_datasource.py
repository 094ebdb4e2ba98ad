"""Python-DataSource parallel-scan stress (round 7, batch 10).

SCALING.md claims the ``nats_jetstream`` connector "splits every batch
into N contiguous sequence slices; a catch-up over a billion-message
backlog fans out instead of serializing" — the distributed answer to the
reference's hard single-threaded scan (``MaxThreads()==1``,
ref:src/nats_scan.cpp:197-199). That was plan-argued; this measures it.

Method: full scan + aggregate (count, sum(len(payload)) — forces every
row through the Python worker and Arrow boundary) over the 1M-message
``.stress/sf1.0/events.parquet`` replay at ``partitions`` = 1, 4, 8, 32,
plus the pure-JVM ``message_scan`` on the same file as the floor. Each
point: 1 warm-up + 3 timed runs, report the median. Per-task runtimes
from the UI REST API show whether the fan-out is balanced.

Run:  python tools/stress_datasource.py  (builds sf1.0 via
``tools/stress_scale.py`` if missing)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402

UI_PORT = 4085
REPLICA = os.path.join(REPO, ".stress", "sf1.0")


def _timed(fn, runs: int = 3) -> tuple[float, list[float]]:
    fn()  # warm-up (fills the per-worker replay cache — steady state)
    times = []
    for _ in range(runs):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return statistics.median(times), times


def main() -> None:
    from pyspark.sql import functions as F

    if not os.path.exists(os.path.join(REPLICA, "events.parquet")):
        sys.exit("build .stress/sf1.0 first: python tools/stress_scale.py")

    spark = _sparkui.build_session("stress-datasource", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")

    from duckdb_nats_jetstream_spark.sources.nats_source import register

    register(spark)
    path = os.path.join(REPLICA, "events.parquet")

    results: dict[str, dict] = {}

    last = {}

    def scan(n_parts: int):
        df = (
            spark.read.format("nats_jetstream")
            .option("stream", "events")
            .option("replay_path", path)
            .option("partitions", str(n_parts))
            .load()
        )
        row = df.agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("bytes"),
        ).collect()[0]
        # record from inside the timed closure — a separate verification
        # scan would both waste a full pass and pollute the stage window
        last["n"], last["bytes"] = row.n, row["bytes"]
        return row.n, row["bytes"]

    n_rows = None
    for n_parts in (1, 4, 8, 32):
        before = _sparkui.stage_ids(UI_PORT)
        med, times = _timed(lambda: scan(n_parts))
        n = last["n"]
        n_rows = n
        # task balance of the scan stage (the new stages since `before`)
        new = sorted(_sparkui.stage_ids(UI_PORT) - before)
        skews = []
        for sid, att in new:
            try:
                m, x = _sparkui.task_skew(UI_PORT, sid, att)
                if x > 0.05:
                    skews.append((sid, m, x))
            except Exception:
                pass
        results[f"parts_{n_parts}"] = {
            "median_s": round(med, 3),
            "runs": [round(t, 3) for t in times],
            "rows": n,
            "rows_per_s": int(n / med),
            "task_med_max_s": [
                (sid, round(m, 2), round(x, 2)) for sid, m, x in skews[-2:]
            ],
        }
        print(f"partitions={n_parts}: median {med:.2f}s "
              f"({int(n/med):,} rows/s), runs {times}", file=sys.stderr)

    # JVM floor: the archived-log path the package steers bulk analytics to
    from duckdb_nats_jetstream_spark.sources import message_scan

    def jvm():
        df = message_scan(spark, REPLICA)
        df.agg(
            F.count("*").alias("n"), F.sum(F.length("payload")).alias("b")
        ).collect()

    med, times = _timed(jvm)
    results["jvm_message_scan"] = {
        "median_s": round(med, 3),
        "runs": [round(t, 3) for t in times],
        "rows": n_rows,
        "rows_per_s": int(n_rows / med),
    }
    print(f"jvm message_scan: median {med:.2f}s", file=sys.stderr)

    print("RESULT " + json.dumps(results))


if __name__ == "__main__":
    main()
