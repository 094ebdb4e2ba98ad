"""Multimodal stress batch (15): the Arrow-batched codec stages must
scale with CORES (CPU-bound per-row work), and binaries must not
shuffle.

`operators/multimodal.resize_images` / `image_dhash` claim their cost
is the per-image codec (pure-Python PNG decode + numpy), parallelized
by `mapInPandas` over scan partitions — so doubling cores should
approach halving wall, and the stage plan should carry ZERO shuffle
(binaries move only via explicit repartition; `spread()` splits the
few-file local fixture before the Python stage).

Harness: 2,048 synthetic 48×48 RGB PNGs written to parquet once,
replicated ×64 in-Spark to 131,072 distinct media rows (the per-image
codec is ~0.3-0.5 ms, so a six-figure row count is what makes compute
visible over fixed job overhead), eagerly materialized so the measured
region is ONLY the codec stages, then `resize_images(32×32)` +
`image_dhash` drained at local[4], local[16], local[32] in separate
Spark sessions (one JVM each — `local[N]` is fixed at session start).
Reports wall + speedup + shuffle bytes inside the measured region
(must be ~0: binaries move only in the explicit pre-materialization
repartition, never inside the mapInPandas stages).

Run:  python tools/stress_multimodal.py   (~3-5 min) → paste into
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

UI_PORT = 4094
N_IMAGES = 2048
REPLICAS = 64
WORK = os.path.join(REPO, ".stress", "multimodal")


def _build_images() -> str:
    """131,072 48×48 RGB PNG rows (2,048 distinct images ×64) as a
    MANY-FILE parquet directory — the shape a 100 TB media corpus
    actually arrives in, and the shape `tables.spread()`'s file
    heuristic recognizes, so the measured region has NO shuffle at all
    (spread no-ops; the codec stages are map-only)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from duckdb_nats_jetstream_spark.functions.imagecodec import png_encode

    path = os.path.join(WORK, "images256.parquet")
    if os.path.isdir(path):
        return path
    os.makedirs(WORK + "/.tmp_img", exist_ok=True)
    rng = np.random.default_rng(7)
    blobs = [
        png_encode(rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8))
        for _ in range(N_IMAGES)
    ]
    n_files = 256
    per_file = N_IMAGES * REPLICAS // n_files  # 512 rows
    k = 0
    for f in range(n_files):
        ids = list(range(k, k + per_file))
        k += per_file
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "data": pa.array(
                          [blobs[i % N_IMAGES] for i in ids], pa.binary())}),
            os.path.join(WORK, ".tmp_img", f"part-{f:05d}.parquet"),
        )
    os.rename(os.path.join(WORK, ".tmp_img"), path)
    return path


def _run_at(cores: int, path: str) -> dict:
    os.environ["SPARK_GRAFT_CPUS"] = str(cores)
    from duckdb_nats_jetstream_spark.operators.multimodal import (
        as_media,
        image_dhash,
        resize_images,
    )

    spark = _sparkui.build_session(f"stress-mm-{cores}", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        df = as_media(spark.read.parquet(path), "doc_id", "data", fmt="png")
        n_rows = df.count()  # warm the scan listing
        assert n_rows == N_IMAGES * REPLICAS
        before = _sparkui.stage_ids(UI_PORT)
        t0 = time.time()
        n_resized = resize_images(df, 32, 32).count()
        n_hashed = image_dhash(df, bytes_col="data").count()
        wall = round(time.time() - t0, 1)
        assert n_resized == n_rows and n_hashed == n_rows
        shuffle_mb = round(
            _sparkui.shuffle_write_bytes(UI_PORT, before) / 1e6, 2
        )
        return {"cores": cores, "wall_s": wall, "shuffle_mb": shuffle_mb,
                "img_per_s": int(2 * n_rows / wall)}
    finally:
        spark.stop()


def main() -> None:
    path = _build_images()
    out = []
    for cores in (4, 16, 32):
        r = _run_at(cores, path)
        out.append(r)
        print(r, file=sys.stderr)
    base = out[0]["wall_s"]
    for r in out:
        r["speedup_vs_4"] = round(base / r["wall_s"], 2)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
