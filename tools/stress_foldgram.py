"""Re-measure the sf10 exact near-dup wall with the r12 fold_gram kernel.

Batch 35's addendum measured ``dedup.embedding_near_dup_pairs`` (auto
blocking ⇒ 49 blocks) on the 100× replica at **19,595,470 pairs /
1867 s**, with the wall dominated by the old allocate-per-dimension
gram kernel (docs/R12_PLAN.md §4). The r12 open landed the row-tiled
in-place form (bit-identical — tests/test_vector_np.py); this harness
repeats the identical call on the identical replica so SCALING.md can
carry a before/after row. Expected pair count is pinned: any drift
means the kernel change was NOT execution-only and must be reverted.

Run:  python tools/stress_foldgram.py   (~10-35 min, one query)
Port 4119 (tools/README.md convention: one port per harness).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402

SF10_DIR = os.path.join(REPO, ".stress", "sf10full")
EXPECTED_PAIRS = 19_595_470
UI_PORT = 4119


def main() -> None:
    assert os.path.isdir(SF10_DIR), "build the replica first (stress_decades)"
    spark = _sparkui.build_session("stress-foldgram", UI_PORT)
    from duckdb_nats_jetstream_spark.operators.dedup import (
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet(os.path.join(SF10_DIR, "embeddings.parquet"))
    emb.count()  # warm the scan
    t0 = time.perf_counter()
    # threshold=0.4 replicates the batch-35 call exactly (the default 0.8
    # admits only the 2000 x C(100,2) within-sibling pairs = 9,900,000)
    n = embedding_near_dup_pairs(emb, threshold=0.4).count()
    wall = time.perf_counter() - t0
    ok = n == EXPECTED_PAIRS
    print(
        json.dumps(
            {
                "query": "embedding_near_dup_pairs@sf10",
                "pairs": n,
                "pairs_match_batch35": ok,
                "wall_s": round(wall, 1),
                "batch35_wall_s": 1867,
                "speedup": round(1867 / wall, 2),
            }
        )
    )
    spark.stop()
    if not ok:
        sys.exit(1)


if __name__ == "__main__":
    main()
