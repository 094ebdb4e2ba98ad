"""Adjudicate the BENCH_r10 +37% regression (r10 verdict ask #1).

The 11-query mover cluster (similarity/Arrow family + two JSON-extract
scans + text_bigram_topk) inflated 2-4x in the driver's single-shot
BENCH_r10 vs the round-close local trio, on plans PLAN_AUDIT records as
unchanged or improved. The quiet-host protocol (PERF.md) demands
per-query steady-state evidence before calling that host draw.

This harness produces that evidence: the SAME session + warm-up as
``bench.py`` (imported from it, one source of truth), then **8 timed
end-to-end runs per mover** (noop sink, like bench). It prints one
``RESULT {json}`` line with all 8 wall times per query, the median, the
r10 driver-shot time, and the round-close trio time (``prev_s`` from
BENCH_DETAIL.json).

Reading the result:
- median(8 runs) ~= prev_s (trio)  -> the plan's steady-state cost is
  the trio number; the driver shot's inflation is host/first-run state.
- median(8 runs) ~= driver shot    -> a real regression shipped between
  the trio and the snapshot commit; bisect the plan.
- run[0] >> runs[1..7]             -> per-session first-run cost (cold
  Python workers / codegen / page cache) that best-of-3 inside ONE
  bench invocation should absorb -- points at cross-query state decay
  (e.g. worker pool reaped mid-bench) rather than plan cost.

Port 4118 (unique per tools/README.md convention). The companion
cold-process replica of driver conditions is a plain ``python bench.py``
run in a FRESH interpreter right after a heavy build workload -- see
PERF.md r11 notes for that half of the evidence.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Default mover set = the r12 driver-shot inflators named by the r12
#: verdict (ask #1): uniform-slow per-attempt arrays, no plan change.
#: Override on the command line: ``python tools/adjudicate_bench.py q1 q2``.
MOVERS = [
    "scan_daily_dashboard",
    "sim_kmeans",
    "text_bpe_apply",
    "nats_source_scan",
    "dedup_simhash",
]

RUNS = int(os.environ.get("SPARK_GRAFT_ADJ_RUNS", "8"))

#: cheap, long-stable plan; its quiet-week steady state is ~0.28 s at
#: sf0.1 — any elevation here is host regime by definition
CONTROL = "rel_pricing_summary"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)

    import bench  # repo-root module; shares warm-up with the official run

    from duckdb_nats_jetstream_spark.queries import full_registry
    from duckdb_nats_jetstream_spark.session import get_spark

    spark = get_spark("adjudicate-bench")
    registry = full_registry()
    bench.warm_up(spark, sf_dir)

    driver_detail: dict = {}
    try:
        with open(os.path.join(REPO, "BENCH_DETAIL.json")) as f:
            driver_detail = json.load(f).get("queries", {})
    except Exception:  # noqa: BLE001 — comparison columns are best-effort
        pass

    def _steal():
        f = open("/proc/stat").readline().split()
        return int(f[8]), sum(int(x) for x in f[1:])

    # CONTROL first (r13 adjudication lesson): a cheap query whose plan
    # has not changed in many rounds. If the control's steady state is
    # elevated over its quiet-week value, the host regime is slower and
    # mover elevation must be judged against the control's factor, not
    # against prev_s alone — that single column turned the r13 pass from
    # ambiguous to decisive. Steal% per run rules hypervisor CPU steal
    # in or out (it was ~0 during the r13 bursts: host state, not steal).
    movers = sys.argv[1:] or MOVERS
    if CONTROL not in movers:
        movers = [CONTROL] + movers
    out: dict[str, dict] = {}
    for name in movers:
        fn, _sql = registry[name]
        runs: list[float] = []
        steals: list[float] = []
        for i in range(RUNS):
            s0, c0 = _steal()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            runs.append(round(time.perf_counter() - t0, 3))
            s1, c1 = _steal()
            steals.append(round(100 * (s1 - s0) / max(c1 - c0, 1), 2))
            print(f"  {name} run {i + 1}/{RUNS}: {runs[-1]:.3f}s", file=sys.stderr)
        prior = driver_detail.get(name, {})
        out[name] = {
            "runs": runs,
            "median": round(statistics.median(runs), 3),
            "steady": round(statistics.median(runs[1:]), 3),
            "steal_pct": steals,
            "load1": round(os.getloadavg()[0], 1),
            "driver_shot": prior.get("spark_s"),
            "trio_prev": prior.get("prev_s"),
        }

    print("RESULT " + json.dumps({"sf_dir": sf_dir, "movers": out}))


if __name__ == "__main__":
    main()
