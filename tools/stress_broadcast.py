"""Broadcast-cliff stress batch (round 6, batch 8): when does a
``F.broadcast`` hint stop being "free map-side join" and become a
driver/heap cliff — and does the runtime-sized hint pick the right side
of the line at both ends?

The package hints broadcasts in two classes (see
``operators/broadcast_guard``): structurally bounded sides (dims, sketch
grids — fine forever) and statistics-shaped sides (per-group bounds /
counts, |rows| = group cardinality of the input). This batch measures
the second class's failure mode directly:

- facts = the 100x events table (10M rows, built by ``stress_skew``),
  each row keyed into one of N groups;
- dim = a generated per-group bounds relation (N rows x ~88 B: key, two
  doubles, a 64-char label — the realistic width of a quantile-bounds or
  group-count row);
- workload = facts ⋈ dim on the group key → clip + global aggregate
  (the exact shape of ``winsorize`` / ``stratified_hash_topn``).

Variants per cardinality N ∈ {1e4, 1e6, 1e7}, each in a FRESH
constrained-heap JVM (OOM isolation, like batch 7):

- ``hint``  — unconditional ``F.broadcast(dim)`` (the pre-guard code);
- ``plain`` — no hint; AQE decides from runtime stats;
- ``auto``  — ``sized_broadcast(dim)`` (the guard, 5M-row cap).

Reported: wall, the FINAL (post-AQE) join strategy from the executed
plan, the aggregate checksum (all variants must agree), and whether the
JVM survived. The expected picture: ``hint`` fastest while N is small
and DEAD (or thrashing past timeout) at N=1e7 on the constrained heap;
``plain`` always survives but pays the facts-side shuffle even at tiny
N; ``auto`` tracks ``hint`` below the cap and ``plain`` above it.

Run:  python tools/stress_broadcast.py          (orchestrates the JVMs)
      python tools/stress_broadcast.py worker 1000000 hint 4g
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
UI_PORT = 4083
CARDINALITIES = (10_000, 1_000_000, 10_000_000)
HEAP = os.environ.get("SPARK_GRAFT_BCAST_MEM", "4g")
TIMEOUT_S = int(os.environ.get("SPARK_GRAFT_BCAST_TIMEOUT", "420"))


def _dim(spark, n: int):
    from pyspark.sql import functions as F

    # deterministic lo/hi pair per group + a 64-char label for realistic
    # row width; no RNG so every variant joins the identical relation
    return spark.range(n).select(
        F.col("id").alias("g"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 1000.0).alias("_lo"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 1000.0 + 1.0).alias("_hi"),
        F.rpad(F.conv(F.col("id").cast("string"), 10, 16), 64, "x").alias(
            "label"
        ),
    )


def worker(n: int, variant: str, mem: str) -> None:
    from pyspark.sql import functions as F

    from duckdb_nats_jetstream_spark.operators.broadcast_guard import (
        sized_broadcast,
    )

    spark = _sparkui.build_session(
        f"stress-bcast-{variant}-{n}", UI_PORT, driver_memory=mem
    )
    spark.sparkContext.setLogLevel("ERROR")
    facts = spark.read.parquet(DATA).withColumn(
        "g", F.pmod(F.xxhash64("event_id"), F.lit(n))
    )

    t0 = time.perf_counter()
    dim = _dim(spark, n)
    if variant == "hint":
        side = F.broadcast(dim)
    elif variant == "plain":
        side = dim
    elif variant == "auto":
        side = sized_broadcast(dim)
    else:
        raise SystemExit(f"unknown variant {variant}")

    out = (
        facts.join(side, "g")
        .select(
            F.least(F.greatest("value", F.col("_lo")), F.col("_hi")).alias(
                "w"
            ),
            ((F.col("value") < F.col("_lo")) | (F.col("value") > F.col("_hi")))
            .cast("long")
            .alias("clipped"),
        )
        .agg(
            F.count("*").alias("rows"),
            F.sum("clipped").alias("n_clipped"),
            F.round(F.sum("w"), 3).alias("sum_w"),
        )
    )
    row = out.collect()[0]
    wall = time.perf_counter() - t0
    # FINAL plan — post-AQE, so this is the strategy that actually ran
    final = out._jdf.queryExecution().executedPlan().toString()
    strategy = next(
        (
            s
            for s in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
            )
            if s in final
        ),
        "?",
    )
    print(
        "RESULT "
        + json.dumps(
            {
                "n": n,
                "variant": variant,
                "wall_s": round(wall, 2),
                "strategy": strategy,
                "rows": row["rows"],
                "n_clipped": row["n_clipped"],
                "sum_w": row["sum_w"],
            }
        )
    )


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "worker":
        worker(int(sys.argv[2]), sys.argv[3], sys.argv[4])
        return
    if not os.path.exists(DATA):
        print(
            "build the 100x table first: python tools/stress_skew.py",
            file=sys.stderr,
        )
        sys.exit(1)

    results = []
    for n in CARDINALITIES:
        for variant in ("hint", "plain", "auto"):
            t0 = time.perf_counter()
            try:
                proc = subprocess.run(
                    [
                        sys.executable,
                        os.path.abspath(__file__),
                        "worker",
                        str(n),
                        variant,
                        HEAP,
                    ],
                    capture_output=True,
                    text=True,
                    timeout=TIMEOUT_S,
                )
                line = [
                    l
                    for l in proc.stdout.splitlines()
                    if l.startswith("RESULT ")
                ]
                if line:
                    r = json.loads(line[0][len("RESULT "):])
                else:
                    err = (proc.stderr or "")[-400:]
                    tag = (
                        "OOM"
                        if "OutOfMemory" in (proc.stderr or "") + proc.stdout
                        else f"exit={proc.returncode}"
                    )
                    r = {
                        "n": n,
                        "variant": variant,
                        "wall_s": round(time.perf_counter() - t0, 2),
                        "strategy": "—",
                        "failed": tag,
                        "stderr_tail": err,
                    }
            except subprocess.TimeoutExpired:
                r = {
                    "n": n,
                    "variant": variant,
                    "wall_s": TIMEOUT_S,
                    "strategy": "—",
                    "failed": f"timeout>{TIMEOUT_S}s",
                }
            results.append(r)
            print(f"{n} {variant}: {r}", file=sys.stderr)

    print(f"\nheap={HEAP}, facts=10M rows, dim width ~88 B/row")
    print("| N groups | variant | wall | final join | outcome |")
    print("|---|---|---|---|---|")
    for r in results:
        outcome = r.get("failed") or (
            f"ok rows={r['rows']:,} clipped={r['n_clipped']:,}"
        )
        print(
            f"| {r['n']:,} | {r['variant']} | {r['wall_s']}s "
            f"| {r['strategy']} | {outcome} |"
        )


if __name__ == "__main__":
    main()
