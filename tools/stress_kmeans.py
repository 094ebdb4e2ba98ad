"""Distributed k-means stress batch (21): per-iteration shuffle must be
k·dim-BOUNDED (flat as the corpus grows), never corpus-sized.

`operators/kmeans.kmeans_assignments` claims: assignment is map-only
(centroids ride as broadcast literals inside the pandas UDF), the
centroid update is one hash agg whose map-side partials cap shuffle
traffic at k·dim rows per input partition, and the driver holds k×dim
numbers between iterations. If any of that is wrong — e.g. the explode
feeding the update agg shuffled pre-aggregation — shuffle would scale
with corpus×dim and the operator would not survive 100 TB.

Experiment: dim=32 vectors planted around k=8 well-separated centers
(center j adds +10 on dims ≡ j mod 8; noise < 1), ids 0..7 seed one
center each. File-backed fixtures (32 parquet files per size, so
`spread()` exits on its file-count check and the measurement isolates
the operator):

- corpus at 1M / 2M / 4M vectors — total shuffle across the full
  kmeans_assignments call + consuming action must stay FLAT (asserted
  ratio 4M/1M < 1.5; expected ≈ partitions × k × dim update partials,
  a few hundred KB) while wall grows with the map work;
- correctness closed-form: iteration-2 assignments recover the planted
  partition exactly — 8 distinct clusters, (cluster, planted) pairs
  form a bijection, asserted at every size.

Run:  python tools/stress_kmeans.py   (~4 min) → paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402 — needs REPO on sys.path

UI_PORT = 4101
K = 8
DIM = 32
STRESS_DIR = os.path.join(REPO, ".stress")


def fixture(spark, n: int) -> str:
    """Planted-center vectors as a 32-file parquet fixture (atomic build)."""
    from pyspark.sql import functions as F

    path = os.path.join(STRESS_DIR, f"kmeans_{n}.parquet")
    if os.path.exists(path):
        return path
    tmp = path + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    vec = F.array(*[
        (
            F.when(F.lit(i % K) == (F.col("id") % K), F.lit(10.0)).otherwise(F.lit(0.0))
            + (F.xxhash64(F.col("id"), F.lit(i)) % 1000).cast("double") / 1000.0
        )
        for i in range(DIM)
    ])
    (
        spark.range(n)
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .repartition(32)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    os.rename(tmp, path)
    return path


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_nats_jetstream_spark.operators.kmeans import kmeans_assignments

    spark = _sparkui.build_session("stress-kmeans", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")

    def run(n: int):
        df = spark.read.parquet(fixture(spark, n))
        before = _sparkui.stage_ids(UI_PORT)
        t0 = time.time()
        out = kmeans_assignments(df, k=K, dim=DIM)
        # consume iteration-2 assignments AND check the planted recovery in
        # the same action: 8 clusters, (cluster, planted) a bijection
        pairs = (
            out.select("cluster_iter2", (F.col("vec_id") % K).alias("planted"))
            .distinct()
            .collect()
        )
        wall = time.time() - t0
        sh = _sparkui.shuffle_write_bytes(UI_PORT, before)
        assert len(pairs) == K, pairs
        assert len({p.cluster_iter2 for p in pairs}) == K, pairs
        assert len({p.planted for p in pairs}) == K, pairs
        return wall, sh

    run(1_000_000)  # warmup: JVM + pandas-UDF workers (fixture builds cache)

    out = {"sizes": {}}
    for n in (1_000_000, 2_000_000, 4_000_000):
        wall, sh = run(n)
        key = f"{n // 1_000_000}M"
        out["sizes"][key] = {
            "wall_s": round(wall, 1),
            "shuffle_kb": round(sh / 1e3, 1),
        }
        print(f"kmeans {key}: {out['sizes'][key]}", file=sys.stderr)

    r = out["sizes"]["4M"]["shuffle_kb"] / max(out["sizes"]["1M"]["shuffle_kb"], 0.001)
    out["shuffle_ratio_4m_vs_1m"] = round(r, 2)
    assert r < 1.5, out
    out["planted_recovery"] = "bijective at all sizes"
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
