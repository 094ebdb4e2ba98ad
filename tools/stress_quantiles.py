"""Exact-quantiles stress batch (20): range-partition rank selection must
stay PARALLEL and LINEAR where the obvious plan collapses onto G tasks.

`operators/quantiles.exact_group_quantiles` claims order statistics with
"everything that grows with data distributed" — a range shuffle sorted
32-way, then targeted order-statistic fetches. The obvious plan
(`groupBy(g).agg(percentile(v, p))`) builds an ObjectHashAggregate map
of every distinct value per group and merges those maps on G reduce
tasks: with continuous values (near-all distinct — any real metric) and
few groups, 32 cores do G tasks' work and the merge task IS the wall.

Experiment, G=3 groups, values = xxhash64 % 1e9+7 (near-all distinct,
the honest case for value-map aggregates), ps = [.1, .5, .9, .99]:

- exact path at 10M / 20M / 40M rows — shuffle bytes and wall must
  double per doubling (asserted [1.7, 2.3]); the heaviest stage's
  median/max task seconds are reported (32-way spread, no straggler);
- the naive percentile agg at 1M / 10M ONLY — its wall is expected to
  live in the G-task merge stage (max task ≈ stage wall) and grow ~10×
  on 10× data; asserted ≥3× slower than the exact path at 10M;
- parity: at 10M, per-(group, p) values are BIT-EQUAL between the two
  paths (the operator interpolates with the same symmetric expression
  Spark's `percentile` evaluates).

Run:  python tools/stress_quantiles.py   (~4 min) → paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402 — needs REPO on sys.path

UI_PORT = 4100
G = 3
PS = [0.1, 0.5, 0.9, 0.99]


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_nats_jetstream_spark.operators.quantiles import (
        exact_group_quantiles,
    )

    spark = _sparkui.build_session("stress-quantiles", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")

    def data(n: int):
        # lazy codegen range — generation is identical (and negligible vs
        # the shuffle) for both measured paths, so no checkpoint needed
        return spark.range(n).select(
            (F.col("id") % G).alias("g"),
            (F.xxhash64("id") % 1_000_000_007).cast("double").alias("v"),
        )

    def run_exact(n: int):
        before = _sparkui.stage_ids(UI_PORT)
        t0 = time.time()
        res = exact_group_quantiles(data(n), "g", "v", PS)
        rows = {r.g: [r[f"q_{i}"] for i in range(len(PS))] for r in res.collect()}
        wall = time.time() - t0
        med, mx = _sparkui.worst_task(UI_PORT, before)
        return wall, _sparkui.shuffle_write_bytes(UI_PORT, before), med, mx, rows

    def run_naive(n: int):
        before = _sparkui.stage_ids(UI_PORT)
        t0 = time.time()
        # the FAIR form: one percentile aggregate over the array of ps —
        # one shared value map per group, exactly what winsorize's agg
        # path runs. Four separate percentile(v, p) calls would keep four
        # copies of the map and inflate the comparison ~4x.
        collected = (
            data(n)
            .groupBy("g")
            .agg(
                F.percentile(
                    "v", F.array(*[F.lit(p) for p in PS])
                ).alias("pp")
            )
            .select("g", *[F.col("pp")[i].alias(f"q_{i}") for i in range(len(PS))])
            .collect()
        )
        wall = time.time() - t0
        med, mx = _sparkui.worst_task(UI_PORT, before)
        rows = {r.g: [r[f"q_{i}"] for i in range(len(PS))] for r in collected}
        return wall, med, mx, rows

    run_exact(1_000_000)  # warmup: JVM codegen + Python mapInPandas workers

    out = {"exact": {}, "naive": {}}
    exact_rows_10m = None
    for n in (10_000_000, 20_000_000, 40_000_000):
        (w1, sh, med, mx, rows) = run_exact(n)
        (w2, _, _, _, _) = run_exact(n)
        key = f"{n // 1_000_000}M"
        out["exact"][key] = {
            "wall_s": round(min(w1, w2), 1),
            "shuffle_mb": round(sh / 1e6, 1),
            "task_med_s": round(med, 2),
            "task_max_s": round(mx, 2),
        }
        if n == 10_000_000:
            exact_rows_10m = rows
        print(f"exact {key}: {out['exact'][key]}", file=sys.stderr)
    sh = {k: v["shuffle_mb"] for k, v in out["exact"].items()}
    out["exact_shuffle_doubling"] = [
        round(sh["20M"] / sh["10M"], 2),
        round(sh["40M"] / sh["20M"], 2),
    ]
    for r in out["exact_shuffle_doubling"]:
        assert 1.7 <= r <= 2.3, out["exact_shuffle_doubling"]

    naive_rows_10m = None
    for n in (1_000_000, 10_000_000):
        w, med, mx, rows = run_naive(n)
        key = f"{n // 1_000_000}M"
        out["naive"][key] = {
            "wall_s": round(w, 1),
            "task_med_s": round(med, 2),
            "task_max_s": round(mx, 2),
        }
        if n == 10_000_000:
            naive_rows_10m = rows
        print(f"naive {key}: {out['naive'][key]}", file=sys.stderr)

    # the collapse, asserted: the naive merge straggler is most of its wall,
    # and the exact path wins by >= 3x at equal data (measured ~17x)
    nv, ex = out["naive"]["10M"], out["exact"]["10M"]
    assert nv["task_max_s"] >= 0.5 * nv["wall_s"], nv
    out["win_10m"] = round(nv["wall_s"] / ex["wall_s"], 1)
    assert out["win_10m"] >= 3.0, out["win_10m"]

    # parity: bit-equal per (group, p) at 10M
    assert exact_rows_10m is not None and naive_rows_10m is not None
    assert set(exact_rows_10m) == set(naive_rows_10m)
    for g in exact_rows_10m:
        for a, b in zip(exact_rows_10m[g], naive_rows_10m[g]):
            assert a == b, (g, exact_rows_10m[g], naive_rows_10m[g])
    out["parity"] = f"bit-equal {len(exact_rows_10m) * len(PS)} quantiles"
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
