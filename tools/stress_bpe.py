"""BPE-induction stress batch (14): the merge loop must be VOCABULARY-
bound, not corpus-bound.

`operators/bpe.bpe_merge_table` claims one corpus-scale shuffle (the
word-frequency aggregation) and then per-round work on the vocab
relation only (pair-count agg + replace map + 1-row collect). At 100 TB
that difference is the whole ballgame: V merge rounds × a corpus scan
would be unrunnable; V rounds × a few-million-row vocab agg is cheap.

Experiment: the sf0.1 documents corpus vs the SAME corpus replicated
10× (crossJoin with range(10)). Replication keeps the distinct-word
vocabulary IDENTICAL (counts ×10), so:

- the rounds=0 wall (vocab build + one frontier agg) should scale with
  corpus size,
- the incremental per-round wall ((rounds=8 wall − rounds=0 wall) / 8)
  should be ≈ EQUAL at 1× and 10×,
- the chosen merges must be the same pairs in the same order with
  exactly 10× the counts (scale must not change the learned tokenizer).

Run:  python tools/stress_bpe.py   (~2-3 min) → paste into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools import _sparkui  # noqa: E402 — needs REPO on sys.path

UI_PORT = 4093
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
ROUNDS = 8


def main() -> None:
    from pyspark.sql import functions as F

    from duckdb_nats_jetstream_spark.operators.bpe import bpe_merge_table

    spark = _sparkui.build_session("stress-bpe", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .select("text")
        .localCheckpoint(eager=True)
    )
    big = docs.crossJoin(spark.range(10)).select("text")
    bpe_merge_table(docs, rounds=1, top_k=5).collect()  # warmup, discarded
    out, merges = {}, {}
    for label, df in (("x1", docs), ("x10", big)):
        walls = {}
        for rounds in (0, ROUNDS):
            before = _sparkui.stage_ids(UI_PORT)
            t0 = time.time()
            res = bpe_merge_table(df, rounds=rounds, top_k=5).collect()
            walls[rounds] = (
                round(time.time() - t0, 1),
                round(_sparkui.shuffle_write_bytes(UI_PORT, before) / 1e6, 1),
            )
        merges[label] = [
            (r.step, r.pair, r.n_occ) for r in res if r.rank == 1 and r.step <= ROUNDS
        ]
        out[label] = {
            "n_docs": df.count(),
            "wall_r0_s": walls[0][0],
            "wall_r8_s": walls[ROUNDS][0],
            "per_round_s": round((walls[ROUNDS][0] - walls[0][0]) / ROUNDS, 2),
            "shuffle_r0_mb": walls[0][1],
            "rounds_shuffle_mb": round(walls[ROUNDS][1] - walls[0][1], 1),
        }
        print(f"{label}: {out[label]}", file=sys.stderr)
    # scale must not change the learned tokenizer: same pairs, same order,
    # exactly 10x the occurrence counts
    assert [(s, p) for s, p, _ in merges["x1"]] == [
        (s, p) for s, p, _ in merges["x10"]
    ], (merges["x1"], merges["x10"])
    assert all(
        n10 == 10 * n1
        for (_, _, n1), (_, _, n10) in zip(merges["x1"], merges["x10"])
    )
    out["merges_identical_counts_10x"] = True
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
