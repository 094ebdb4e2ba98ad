"""Stratified-sampling stress batch (16): where the hash-prefix
prefilter earns its extra corpus passes.

`operators/sampling.stratified_hash_topn` claims its coarse prefilter
(`margin × n` expected survivors per group) is what makes exact
n-per-group sampling survive a skewed stratum: without it, the
`row_number` window sorts the WHOLE hot stratum in one task — the same
single-reducer collapse batch 4 measured for skewed collect_list, and
un-rescuable by AQE (windows aren't joins). The prefilter is not free:
it pays ~3 corpus passes (count, survivor join, shortfall-redo scan).
So the honest experiment is the SLOPE, not one point: scale the data
4× and watch which path's critical task grows.

Data: one stratum owns 90% of N rows (~190 B each — documents carry
text; on bare longs the single-task sort is invisible), the rest
spread over 1,000 groups; n=100 per group, at N = 10M and 40M. Both
paths must return the IDENTICAL row set at each N (the prefilter is a
pure plan optimization: it keeps every row whose salted hash can rank
≤ n, and the shortfall redo catches starved groups), asserted by
comparing collected (group, doc_id) sets.

Run:  python tools/stress_sampling.py   (~5 min) → paste into
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

UI_PORT = 4095
N_PER_GROUP = 100


def _measure(rows: int) -> dict:
    """One Spark session per scale: `unpersist()` on a localCheckpointed
    DataFrame is a no-op (its RDD persistence is not registered with the
    CacheManager), so the only way to release the smaller corpus's blocks
    before the bigger run is to end the session."""
    from pyspark.sql import functions as F

    from duckdb_nats_jetstream_spark.operators.sampling import (
        stratified_hash_topn,
    )

    spark = _sparkui.build_session(f"stress-sampling-{rows}", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(rows)
        .select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 10 < 9, F.lit("hot"))
            .otherwise(
                F.concat(
                    F.lit("g"),
                    ((F.col("id") / 10).cast("long") % 1000).cast("string"),
                )
            )
            .alias("source"),
            F.repeat(F.md5(F.col("id").cast("string")), 6).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    df.count()
    out, results = {}, {}
    for label, margin in (("plain_window", None), ("prefiltered", 4.0)):
        before = _sparkui.stage_ids(UI_PORT)
        t0 = time.time()
        got = stratified_hash_topn(
            df, "source", N_PER_GROUP, margin=margin
        ).collect()
        wall = round(time.time() - t0, 1)
        worst = _sparkui.worst_task(UI_PORT, before)
        results[label] = {(r.source, r.doc_id) for r in got}
        out[label] = {
            "wall_s": wall,
            "rows": len(got),
            "worst_stage_med_max_s": [round(x, 2) for x in worst],
        }
        print(f"{rows//1_000_000}M {label}: {out[label]}", file=sys.stderr)
    assert results["plain_window"] == results["prefiltered"], (
        "prefilter changed the sample"
    )
    assert len(results["prefiltered"]) == 1001 * N_PER_GROUP, len(
        results["prefiltered"]
    )
    out["identical_samples"] = True
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
