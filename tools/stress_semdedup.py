"""SemDeDup stress batch (23): the SRP blocking dial must govern the
quadratic, and matching it to corpus size must hold the wall flat.

`operators/semantic.semantic_dedup_pruned` claims the cluster (SRP
bucket) "bounds the quadratic pair search": per-block work is
(n/2^bits)^2 inside one Arrow task, the only shuffle is linear in n
(one exchange of (id, bucket, vector) — identical at every bits
setting). Two consequences, both measured here:

- **the dial is real**: at fixed n=400k, dropping 12→8 bits multiplies
  expected per-block pairs by 16x per 2 bits — wall and hot-task time
  must climb accordingly (asserted wall(8 bits) > 3x wall(12 bits));
- **the scale recipe works**: bits ≈ log2(n / target_bucket). Doubling
  the corpus AND adding 2 bits holds expected bucket size constant —
  wall(400k, 12 bits) must stay within 2x of wall(200k, 10 bits),
  which is how the operator survives a growing corpus (the paper's
  k-means variant grows k with n for the same reason);
- correctness at every setting: 1,000 planted exact-duplicate copies
  (same vector ⇒ same SRP signs ⇒ same bucket at ANY bits) must all be
  condemned — blocking can tune cost, never recall of exact dups.

Run:  python tools/stress_semdedup.py   (~4 min) → paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402 — needs REPO on sys.path

UI_PORT = 4104
DIM = 64
N_PLANT = 1_000


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_nats_jetstream_spark.operators.semantic import (
        semantic_dedup_pruned,
    )

    spark = _sparkui.build_session("stress-semdedup", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")

    def data(n: int):
        # ids >= n are exact copies of ids 0..N_PLANT-1 (same vector ⇒ same
        # bucket); the rest are uniform hash vectors (cosine ≈ 0 pairwise)
        base = F.when(F.col("id") >= n, F.col("id") - n).otherwise(F.col("id"))
        vec = F.array(*[
            ((F.xxhash64(base, F.lit(i)) % 2001) - 1000).cast("double") / 1000.0
            for i in range(DIM)
        ])
        return (
            spark.range(n + N_PLANT)
            .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
            .localCheckpoint(eager=True)
        )

    def run(df, n: int, bits: int):
        before = _sparkui.stage_ids(UI_PORT)
        t0 = time.time()
        out = semantic_dedup_pruned(
            df, threshold=0.4, n_bits=bits, dim=DIM
        )
        condemned = {r.vec_id for r in out.collect()}
        wall = time.time() - t0
        med, mx = _sparkui.worst_task(UI_PORT, before)
        sh = _sparkui.shuffle_write_bytes(UI_PORT, before)
        planted = set(range(n, n + N_PLANT))
        assert planted <= condemned, sorted(planted - condemned)[:5]
        return {
            "wall_s": round(wall, 1),
            "task_max_s": round(mx, 2),
            "shuffle_mb": round(sh / 1e6, 1),
            "n_condemned": len(condemned),
        }

    d200 = data(200_000)
    run(d200, 200_000, 12)  # warmup, discarded

    out = {}
    out["200k_10bits"] = run(d200, 200_000, 10)
    print(f"200k/10bits: {out['200k_10bits']}", file=sys.stderr)
    d200.unpersist()

    d400 = data(400_000)
    for bits in (12, 10, 8):
        out[f"400k_{bits}bits"] = run(d400, 400_000, bits)
        print(f"400k/{bits}bits: {out[f'400k_{bits}bits']}", file=sys.stderr)
    d400.unpersist()

    # the dial: 4 fewer bits = 16x expected per-block pairs
    out["dial_wall_ratio_8_vs_12"] = round(
        out["400k_8bits"]["wall_s"] / out["400k_12bits"]["wall_s"], 1
    )
    assert out["dial_wall_ratio_8_vs_12"] > 3.0, out
    # the recipe: 2x corpus + 2 bits = constant bucket size = flat wall
    out["recipe_wall_ratio"] = round(
        out["400k_12bits"]["wall_s"] / out["200k_10bits"]["wall_s"], 2
    )
    assert out["recipe_wall_ratio"] < 2.0, out
    # the shuffle is the linear exchange, bits-independent at fixed n
    shs = [out[f"400k_{b}bits"]["shuffle_mb"] for b in (12, 10, 8)]
    assert max(shs) / max(min(shs), 0.001) < 1.3, shs
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
