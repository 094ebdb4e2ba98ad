"""Connected-components stress batch (13): measure the dedup-cluster
backbone's round count, per-round wall, and shuffle bill on the three
graph shapes that decide whether it survives 100 TB.

`operators.components.connected_components` is the step that turns
near-dup PAIRS into keep/drop CLUSTERS, so every dedup pipeline funnels
through it. Its scale claims so far were argued + toy-tested:

- **O(log diameter) rounds** via pointer doubling (Kiveris et al.) — a
  chain is the adversarial case: plain hash-min needs `n` rounds, the
  doubling claim says ~log2(n). Measured here on a 300k-vertex path.
- **Flat per-round cost** — lineage is truncated per round with an eager
  ``localCheckpoint``, so round k must cost the same as round 2 (a plan
  that grows with iterations would show super-linear round walls).
- **Edge-sized shuffle per round** — the propagation join + vertex agg
  move O(E) + O(V) per round, nothing accumulates.
- **Hub skew** — a power-law hub (one vertex on ~95% of edges) makes the
  propagation join's edge side hot on one key. Batch 5 showed AQE's
  OptimizeSkewedJoin rescues a plain skewed SMJ but is DEFEATED when an
  aggregate sits under the join child; here the agg sits ABOVE the join
  (join → groupBy), which the batch-5 rule says is rescuable. Measured
  med/max task time of the heaviest join stage decides it.

Scenarios (all vertex ids are longs; expected labels are closed-form,
so correctness is asserted exactly, no oracle needed):

- ``cliques``  — 20k clusters of 10 (900k edges): the realistic near-dup
  shape; expect 2-3 rounds (init counts as round 1).
- ``chain``    — 300k-vertex path (diameter 300k): expect ~log2(300k)≈18
  rounds + 1 fixpoint-detection round, NOT 300k.
- ``hub``      — 1M vertices, vertex 0 adjacent to 900k (~95% of edges),
  plus 50k background chains of 2: the skew case.

Run:  python tools/stress_components.py   (~2-4 min) → paste into
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

UI_PORT = 4097


def _scenarios(spark):
    from pyspark.sql import functions as F

    # cliques: cluster c = id // 10; all 45 intra-cluster pairs
    ids = spark.range(200_000).select(
        "id", (F.col("id") / 10).cast("long").alias("c")
    )
    cliques = (
        ids.alias("x")
        .join(ids.alias("y"), "c")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
    )

    # chain: i -- i+1 over 300k vertices
    chain = spark.range(299_999).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )

    # hub: 0 -- i for i in 1..900k, plus 50k disjoint 2-chains above
    hub = spark.range(1, 900_001).select(
        F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b")
    )
    tails = spark.range(50_000).select(
        (900_001 + 2 * F.col("id")).alias("id_a"),
        (900_002 + 2 * F.col("id")).alias("id_b"),
    )
    hub = hub.unionAll(tails)

    def check_cliques(rows):
        assert len(rows) == 200_000
        assert all(r["component"] == (r["doc_id"] // 10) * 10 for r in rows)

    def check_chain(rows):
        assert len(rows) == 300_000
        assert all(r["component"] == 0 for r in rows)

    def check_hub(rows):
        assert len(rows) == 1_000_001
        for r in rows:
            want = 0 if r["doc_id"] <= 900_000 else (
                900_001 + ((r["doc_id"] - 900_001) // 2) * 2
            )
            assert r["component"] == want, r
    return [
        ("cliques", cliques, check_cliques),
        ("chain", chain, check_chain),
        ("hub", hub, check_hub),
    ]


def main() -> None:
    from duckdb_nats_jetstream_spark.operators.components import (
        connected_components,
    )

    spark = _sparkui.build_session("stress-components", UI_PORT)
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name, edges, check in _scenarios(spark):
        edges = edges.localCheckpoint(eager=True)  # time CC, not the gen
        n_edges = edges.count()
        before = _sparkui.stage_ids(UI_PORT)
        round_walls = []

        def tick(i, _t=[time.time()]):
            now = time.time()
            round_walls.append(round(now - _t[0], 2))
            _t[0] = now

        t0 = time.time()
        labels = connected_components(
            edges, max_iter=60, edges_unique=True, on_round=tick
        )
        rows = labels.collect()
        wall = round(time.time() - t0, 1)
        check(rows)
        worst = _sparkui.worst_task(UI_PORT, before)
        out[name] = {
            "edges": n_edges,
            "rounds": len(round_walls),
            "wall_s": wall,
            "round_walls_s": round_walls,
            "shuffle_write_mb": round(
                _sparkui.shuffle_write_bytes(UI_PORT, before) / 1e6, 1
            ),
            "worst_stage_med_max_s": [round(x, 2) for x in worst],
        }
        print(f"{name}: {out[name]}", file=sys.stderr)
    print("RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
