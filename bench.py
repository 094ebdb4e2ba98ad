#!/usr/bin/env python
"""Benchmark runner: executes every registered query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes fully (noop sink — JVM-side, no driver collect cost).
Warm SparkSession, cold per-query plan.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from duckdb_nats_jetstream_spark.queries import full_registry
    from duckdb_nats_jetstream_spark.session import get_spark

    spark = get_spark("bench")
    registry = full_registry()

    # Warm the harness once so timings measure query execution, not startup:
    # parquet footers for every table, the shuffle machinery, whole-stage
    # codegen, and the Python worker pool (first mapInPandas otherwise costs
    # whichever query alphabetically happens to hit it first ~1-2s).
    from pyspark.sql import functions as F

    from duckdb_nats_jetstream_spark.session import read_table

    for fname in os.listdir(sf_dir):
        if fname.endswith(".parquet"):
            read_table(spark, sf_dir, fname[: -len(".parquet")]).count()
    spark.range(100000).repartition(8).groupBy(
        (F.col("id") % 10).alias("k")
    ).count().write.mode("overwrite").format("noop").save()

    def _identity(it):
        for pdf in it:
            yield pdf

    spark.range(1000).repartition(8).mapInPandas(_identity, "id long").write.mode(
        "overwrite"
    ).format("noop").save()

    # Best-of-2 per query: single-shot timings on this rig show random
    # 5-10s spikes on a rotating victim query (host jitter / GC pauses),
    # which would mis-rank queries run-to-run. Each attempt executes the
    # full query plan end-to-end (noop sink). Failures are ISOLATED per
    # query — one broken plan must never void the other ~90 timings (that is
    # exactly what aborted the round-1 bench), so every exception is caught
    # and reported per query, and the JSON line always prints.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in sorted(registry):
        fn, _sql = registry[name]
        best = float("inf")
        for _ in range(2):
            try:
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            except Exception as e:  # noqa: BLE001 — isolation is the point
                errors[name] = f"{type(e).__name__}: {e}"[:500]
                break
        if best != float("inf"):
            timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))


if __name__ == "__main__":
    main()
