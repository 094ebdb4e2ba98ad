"""Global-order stress batch (17): chunk-partitioned windows vs the
single-partition collapse.

`operators/ordered.chunked_lag` exists because a plain
``lag().over(Window.orderBy(col))`` runs the ENTIRE dataset through one
task (Spark's "No Partition Defined" warning) — batch 16 measured that
shape for a skewed partition; this batch measures it for NO partition,
the gap-detection plan. The chunked design buckets the ordering key
into ~1M-value chunks (parallel windows) and fixes chunk boundaries
with a window over the tiny per-chunk aggregate table.

Data: N sequential rows with ~190 B payload and 1% deleted (so gaps
exist), at 10M and 40M. Both paths must emit the IDENTICAL gap list
(asserted set-equal); the measurement is the slope of the critical
task as data grows 4×.

Run:  python tools/stress_ordered.py   (~4 min) → paste into
SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402 — needs REPO on sys.path

UI_PORT = 4096


def _measure(rows: int) -> dict:
    """One Spark session per scale — see stress_sampling._measure: a
    localCheckpointed DataFrame's blocks survive `unpersist()`, so a
    fresh session is the reliable release."""
    from pyspark.sql import Window as W, functions as F

    from duckdb_nats_jetstream_spark.operators.ordered import chunked_lag

    spark = _sparkui.build_session(f"stress-ordered-{rows}", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(rows)
        .select(
            F.col("id").alias("seq"),
            F.repeat(F.md5(F.col("id").cast("string")), 6).alias("payload"),
        )
        .filter(F.col("seq") % 100 != 37)  # 1% gaps
        .localCheckpoint(eager=True)
    )
    df.count()
    out, results = {}, {}

    def gaps_naive(d):
        prev = F.lag("seq").over(W.orderBy("seq"))
        return (
            d.select("seq", prev.alias("prev"))
            .filter(F.col("seq") - F.col("prev") > 1)
            .select("prev", "seq")
        )

    def gaps_chunked(d):
        lagged = chunked_lag(d, "seq", "prev")
        return (
            lagged.filter(F.col("seq") - F.col("prev") > 1)
            .select("prev", "seq")
        )

    for label, fn in (("global_window", gaps_naive), ("chunked", gaps_chunked)):
        before = _sparkui.stage_ids(UI_PORT)
        t0 = time.time()
        got = fn(df).collect()
        wall = round(time.time() - t0, 1)
        worst = _sparkui.worst_task(UI_PORT, before)
        results[label] = {(r.prev, r.seq) for r in got}
        out[label] = {
            "wall_s": wall,
            "gaps": len(got),
            "worst_stage_med_max_s": [round(x, 2) for x in worst],
        }
        print(f"{rows//1_000_000}M {label}: {out[label]}", file=sys.stderr)
    assert results["global_window"] == results["chunked"]
    assert len(results["chunked"]) == rows // 100  # one gap per removed seq
    out["identical_gaps"] = True
    spark.stop()
    return out


def main() -> None:
    out = {
        f"{rows // 1_000_000}M": _measure(rows)
        for rows in (10_000_000, 40_000_000)
    }
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
