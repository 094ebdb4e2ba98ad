"""Batch-15 follow-up (r08): re-measure `spread()` (now `tables.spread`; `session.spread` through r08) on a
MATERIALIZED (localCheckpoint) binary-media input after the non-file fix.

Batch 15 found the blind spot: a checkpointed input reports zero
`inputFiles()`, so the pre-fix spread() re-shuffled an
already-well-partitioned materialized relation — ~1× the binary column
per codec stage (2×460 MB observed at the batch-15 scale). The r08 fix
gates an `rdd.getNumPartitions()` probe to the n_files == 0 branch.

Harness: 32,768 48×48 PNG rows staged via repartition(32) +
localCheckpoint (the exact shape that triggered the re-shuffle), then
`resize_images` + `image_dhash` — both call spread() internally —
drained with UI stage accounting. PASS = ZERO shuffle bytes in the
measured region (the codec stages are map-only over the checkpoint
partitions). Also re-checks the under-partitioned case still spreads:
a coalesce(1) checkpoint must show ~1× the binary column shuffled
(the probe only skips the exchange when parallelism already exists).

Run:  python tools/stress_spreadfix.py   (~2 min) → paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402 — needs REPO on sys.path

UI_PORT = 4097
N_IMAGES = 1024
REPLICAS = 32  # 32,768 rows, ~115 MB decoded binary column


def _images_df(spark):
    import numpy as np

    from duckdb_nats_jetstream_spark.functions.imagecodec import png_encode
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    blobs = [
        (i, png_encode(rng.integers(0, 256, size=(48, 48, 3), dtype=np.uint8)))
        for i in range(N_IMAGES)
    ]
    base = spark.createDataFrame(blobs, "doc_id long, data binary")
    return (
        base.crossJoin(spark.range(REPLICAS).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") * REPLICAS + F.col("rep"))
        .drop("rep")
    )


def _measure(df, label: str) -> dict:
    from duckdb_nats_jetstream_spark.operators.multimodal import (
        as_media,
        image_dhash,
        resize_images,
    )

    media = as_media(df, "doc_id", "data", fmt="png")
    before = _sparkui.stage_ids(UI_PORT)
    t0 = time.time()
    n1 = resize_images(media, 32, 32).count()
    n2 = image_dhash(media, bytes_col="data").count()
    wall = round(time.time() - t0, 1)
    assert n1 == N_IMAGES * REPLICAS and n2 == n1
    mb = round(_sparkui.shuffle_write_bytes(UI_PORT, before) / 1e6, 2)
    return {"case": label, "wall_s": wall, "shuffle_mb": mb}


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    spark = _sparkui.build_session("stress-spreadfix", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")
    out = []
    try:
        base = _images_df(spark)

        # the batch-15 trigger shape: well-partitioned materialized input
        staged = base.repartition(32).localCheckpoint(eager=True)
        assert staged.inputFiles() == []  # non-file leaf
        r = _measure(staged, "checkpointed_32_parts")
        assert r["shuffle_mb"] == 0.0, f"re-shuffle NOT gone: {r}"
        out.append(r)

        # control: a genuinely narrow materialized input must still spread
        narrow = base.coalesce(1).localCheckpoint(eager=True)
        r2 = _measure(narrow, "checkpointed_1_part")
        assert r2["shuffle_mb"] > 50, f"narrow input no longer spreads: {r2}"
        out.append(r2)
    finally:
        spark.stop()
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
