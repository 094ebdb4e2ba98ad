"""Decontamination stress batch (18): exact vs Bloom as the BENCHMARK
side grows — bounded broadcast, graceful degradation, and the
no-false-negative invariant.

`operators/decon.ngram_contamination` broadcasts the exact benchmark
gram set: memory grows LINEARLY with the eval corpus. The Bloom variant
(`bloom_contamination`) broadcasts occupied cells in a FIXED universe
(n_hashes · 16^cell_hex): memory is CAPPED up front, chosen before the
data is seen, and a benchmark that outgrows it degrades to false
positives — it can never OOM the broadcast and it can never produce a
false NEGATIVE (a truly-overlapping gram is always flagged).

Experiment: fixed training corpus (sf0.1 documents + 100 planted
contaminated copies of benchmark text), benchmark at 1× (50k docs,
~300k distinct grams) and 16× (800k docs, ~4.8M grams), cell_hex=5
(1,048,576 cells per hash, 3 hashes). Measured per path and size:

- broadcast-side cardinality (exact: distinct grams — linear 16×;
  bloom: occupied cells — saturating toward the 3.1M cap),
- wall,
- planted-doc recall (must be 100% on BOTH paths at BOTH sizes),
- per-doc no-false-negative check (bloom n_flagged ≥ exact n_matched),
- clean-doc false-positive rate (bloom flag_r where exact contam_r=0)
  — the honest price of the cap once the 16× benchmark saturates it.

Run:  python tools/stress_decon.py   (~4 min) → paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402 — needs REPO on sys.path

UI_PORT = 4098
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CELL_HEX = 5
N_HASHES = 3
N_PLANT = 100


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_nats_jetstream_spark.functions.text import shingles, tokens
    from duckdb_nats_jetstream_spark.operators.decon import (
        bloom_contamination,
        ngram_contamination,
    )

    spark = _sparkui.build_session("stress-decon", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")

    def synth_bench(n_docs: int):
        # 8 unique md5 words per doc → ~6 globally-distinct trigrams/doc
        words = [
            F.md5(F.concat(F.lit(f"w{w}:"), F.col("id").cast("string")))
            for w in range(8)
        ]
        return spark.range(n_docs).select(
            F.concat_ws(" ", *words).alias("text")
        )

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    planted_src = synth_bench(N_PLANT).localCheckpoint(eager=True)
    train = (
        docs.select("doc_id", "text")
        .unionByName(
            planted_src.select(
                (F.monotonically_increasing_id() + 10_000_000).alias("doc_id"),
                "text",
            )
        )
        .localCheckpoint(eager=True)
    )
    train.count()
    planted_ids_df = train.filter(F.col("doc_id") >= 10_000_000).select("doc_id")
    n_planted = planted_ids_df.count()
    assert n_planted == N_PLANT

    out = {}
    for scale, n_bench in (("bench_x1", 50_000), ("bench_x16", 800_000)):
        bench = synth_bench(n_bench).unionByName(
            planted_src  # the planted docs' text IS in the benchmark
        ).localCheckpoint(eager=True)
        bench.count()
        gram = F.array_distinct(shingles(tokens(F.col("text")), 3))
        n_grams = bench.select(F.explode(gram).alias("g")).distinct().count()
        res = {}
        for label, fn, kw in (
            ("exact", ngram_contamination, {}),
            ("bloom", bloom_contamination,
             dict(n_hashes=N_HASHES, cell_hex=CELL_HEX)),
        ):
            t0 = time.time()
            got = fn(train, bench, n=3, **kw).localCheckpoint(eager=True)
            n_docs_out = got.count()
            wall = round(time.time() - t0, 1)
            hit_col = "n_matched" if label == "exact" else "n_flagged"
            planted_hit = (
                got.join(planted_ids_df, "doc_id")
                .filter(F.col(hit_col) == F.col("n_grams"))
                .count()
            )
            res[label] = {"wall_s": wall, "out_docs": n_docs_out,
                          "planted_fully_hit": planted_hit}
            # broadcast-side cardinality, keyed exactly as the operator
            # keys it: distinct grams (exact) vs distinct (hash_i, cell)
            # pairs (bloom; cap = N_HASHES * 16^CELL_HEX)
            res[label]["bcast_rows"] = (
                n_grams if label == "exact" else
                bench.select(F.explode(gram).alias("g")).distinct()
                .select(F.explode(F.array(*[
                    F.concat(F.lit(f"{i}:"),
                             F.substring(F.md5(F.concat(F.lit(f"{i}:"),
                                                        F.col("g"))),
                                         1, CELL_HEX))
                    for i in range(N_HASHES)])).alias("c"))
                .distinct().count()
            )
        # no false negatives + clean-doc FP price, from the joined outputs
        ex = ngram_contamination(train, bench, n=3).alias("e")
        bl = bloom_contamination(
            train, bench, n=3, n_hashes=N_HASHES, cell_hex=CELL_HEX
        ).alias("b")
        j = ex.join(bl, "doc_id").localCheckpoint(eager=True)
        fn_violations = j.filter(
            F.col("b.n_flagged") < F.col("e.n_matched")
        ).count()
        assert fn_violations == 0, "Bloom produced a FALSE NEGATIVE"
        clean = j.filter(F.col("e.n_matched") == 0)
        fp = clean.agg(
            (F.sum("b.n_flagged") / F.sum("b.n_grams")).alias("r")
        ).collect()[0].r
        res["bench_grams"] = n_grams
        res["false_negatives"] = fn_violations
        res["clean_doc_fp_rate"] = round(float(fp or 0.0), 4)
        out[scale] = res
        print(f"{scale}: {json.dumps(res)}", file=sys.stderr)
        bench.unpersist()
    assert all(
        out[s][p]["planted_fully_hit"] == N_PLANT
        for s in out for p in ("exact", "bloom")
    )
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
