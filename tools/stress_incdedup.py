"""Incremental-dedup stress batch (24): the per-batch bill must not grow
with the corpus — which requires the signature STORE, not the API alone.

`dedup.incremental_near_dups` documents the steady-state design
("banded signatures precomputed once and stored ... corpus text is never
rescanned per batch") but its API takes the raw reference corpus and
re-shingles + re-minhashes it on EVERY call — so the per-batch wall
grows with corpus size even at a fixed batch. The store-backed twin
(`operators/dedup.py`, folded in at r08) makes the docstring true: the reference side
arrives as two prebuilt narrow relations.

Experiment: fixed 5k-doc incoming batch (500 of them exact copies of
corpus docs — planted contamination), corpus grown 50k → 100k → 200k:

- rescanning API: wall per batch, expected to GROW with the corpus
  (the corpus re-shingle dominates);
- store-backed: store built once per size (cost reported separately —
  it amortizes over every future batch), then the per-batch call
  measured; expected near-flat (asserted: 200k/50k wall ratio at most
  half the rescanning path's ratio);
- correctness: flags bit-identical between the two paths at every size
  (set-equal (doc_id, n_ref_dups)), and all 500 planted copies flagged.

Run:  python tools/stress_incdedup.py   (~4 min) → paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402 — needs REPO on sys.path

UI_PORT = 4105
BATCH = 5_000
N_PLANT = 500
TOKENS = 25


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_nats_jetstream_spark.operators.dedup import (
        incremental_near_dups,
    )
    from duckdb_nats_jetstream_spark.operators.dedup import (
        build_signature_store,
        incremental_near_dups_stored,
    )

    spark = _sparkui.build_session("stress-incdedup", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")

    def text_of(base):
        return F.concat_ws(
            " ",
            *[
                F.concat(
                    F.lit("w"),
                    (F.xxhash64(base, F.lit(i)) % 3000).cast("string"),
                )
                for i in range(TOKENS)
            ],
        )

    def corpus(n: int):
        df = spark.range(n).select(
            F.col("id").alias("doc_id"), text_of(F.col("id")).alias("text")
        )
        return df.localCheckpoint(eager=True)

    def batch(n_corpus: int):
        # ids offset by 10M; the first N_PLANT copy corpus docs 0..N_PLANT-1
        base = F.when(
            F.col("id") < N_PLANT, F.col("id")
        ).otherwise(F.col("id") + 20_000_000)  # outside any corpus id range
        df = spark.range(BATCH).select(
            (F.col("id") + 10_000_000).alias("doc_id"),
            text_of(base).alias("text"),
        )
        return df.localCheckpoint(eager=True)

    def flags(df):
        return {(r.doc_id, r.n_ref_dups) for r in df.collect()}

    new = batch(0)
    planted_ids = set(range(10_000_000, 10_000_000 + N_PLANT))

    warm = corpus(50_000)
    incremental_near_dups(new, warm)  # warmup, discarded
    warm.unpersist()

    out = {"rescan_wall_s": {}, "stored_wall_s": {}, "store_build_s": {}}
    for n in (50_000, 100_000, 200_000):
        ref = corpus(n)
        key = f"{n // 1000}k"

        t0 = time.time()
        a = flags(incremental_near_dups(new, ref))
        out["rescan_wall_s"][key] = round(time.time() - t0, 1)

        t0 = time.time()
        sh, bands = build_signature_store(ref)
        shp = os.path.join("/tmp", f"incstore_{n}_sh.parquet")
        bdp = os.path.join("/tmp", f"incstore_{n}_bands.parquet")
        sh.write.mode("overwrite").parquet(shp)
        bands.write.mode("overwrite").parquet(bdp)
        out["store_build_s"][key] = round(time.time() - t0, 1)

        t0 = time.time()
        b = flags(
            incremental_near_dups_stored(
                new, spark.read.parquet(shp), spark.read.parquet(bdp)
            )
        )
        out["stored_wall_s"][key] = round(time.time() - t0, 1)

        assert a == b, (len(a), len(b))  # bit-identical flags
        assert planted_ids <= {d for d, _ in a}  # all planted copies caught
        print(
            f"{key}: rescan {out['rescan_wall_s'][key]}s, "
            f"stored {out['stored_wall_s'][key]}s "
            f"(build {out['store_build_s'][key]}s), flags {len(a)}",
            file=sys.stderr,
        )
        ref.unpersist()

    r = out["rescan_wall_s"]
    s = out["stored_wall_s"]
    out["rescan_growth_200k_vs_50k"] = round(r["200k"] / r["50k"], 2)
    out["stored_growth_200k_vs_50k"] = round(s["200k"] / s["50k"], 2)
    # the store must flatten the growth: at most half the rescan ratio
    assert (
        out["stored_growth_200k_vs_50k"]
        <= 0.5 * out["rescan_growth_200k_vs_50k"]
    ), out
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
