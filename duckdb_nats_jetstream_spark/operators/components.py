"""Connected components over a near-duplicate pair list — the step that
turns MinHash/Jaccard PAIRS into canonical document CLUSTERS (transitive
closure), which is what a dedup pipeline actually keys its keep/drop
decision on at 100 TB.

Algorithm: hash-min label propagation. Every vertex starts labeled with its
own id; each round, labels flow across edges and every vertex keeps the
minimum label it has seen; fixpoint = each vertex holds its component's
minimum id. Rounds needed = graph diameter — near-dup graphs are dense
little clique-ish clusters, so 2-4 rounds in practice. Per round the cost
is one edge-sized shuffle (join) + one vertex-sized aggregation, both plain
DataFrame ops Catalyst/AQE handle; lineage is truncated per round with
``localCheckpoint`` so the plan doesn't grow with iterations (on a cluster
with an HDFS checkpoint dir, swap for ``checkpoint``).

For adversarial graphs (long chains / power-law), plain hash-min needs
diameter rounds — a 10k-vertex chain would blow any fixed iteration budget
and silently return unconverged labels. Each round therefore also does one
**pointer-doubling** step (labels join labels: ``comp ← min(comp,
comp[comp])`` — the shortcutting half of Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14): the distance a label travels
doubles every round, so convergence is O(log diameter) — ~15 rounds for a
30k chain, verified in tests — at the cost of one extra vertex-sized
self-join per round (cheap next to the edge-sized propagation join).

The reference engine has no graph surface at all — this belongs to the
north-star pipeline operators. Oracle: a recursive CTE computes the same
min-reachable-id fixpoint in DuckDB (see pipeline.DEDUP_COMPONENTS_SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    id_out: str = "doc_id",
    comp_out: str = "component",
    max_iter: int = 50,
    edges_unique: bool = False,
) -> DataFrame:
    """(vertex, component-min-id) for every vertex appearing in ``edges``.

    Returns one row per distinct vertex; ``comp_out`` is the smallest vertex
    id in its connected component. Deterministic for any edge order.

    ``edges_unique=True`` skips the dedup shuffle: pass it when the pair
    list is distinct with ``src < dst`` by construction (every pair
    generator in :mod:`operators.dedup` emits exactly that), making the
    two-direction union automatically duplicate-free.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    # undirected: propagate both ways; distinct so multi-edges cost nothing
    und = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    if not edges_unique:
        und = und.distinct()
    und = und.persist()
    # Init IS the first propagation round: every vertex appears as `a` in the
    # undirected edge list, so min(self, direct neighbors) in one aggregation
    # replaces the separate vertex-distinct job + one full loop iteration.
    labels = (
        und.groupBy(F.col("a").alias("id"))
        .agg(F.least(F.first("a"), F.min("b")).alias("comp"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter - 1):
        nbr_min = (
            und.alias("e")
            .join(labels.alias("l"), F.col("e.a") == F.col("l.id"))
            .groupBy(F.col("e.b").alias("id"))
            .agg(F.min("l.comp").alias("nbr"))
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.col("comp").alias("old"),
            F.least(F.col("comp"), F.coalesce(F.col("nbr"), F.col("comp"))).alias(
                "comp1"
            ),
        )
        # Pointer doubling: follow the label one hop (comp ← comp[comp]).
        # Every comp value is itself a vertex id with a labels row, so the
        # lookup is a vertex-sized self-join; it doubles the distance a
        # minimum travels per round, turning chain graphs from O(diameter)
        # into O(log diameter) rounds.
        hop = stepped.select(
            F.col("id").alias("cid"), F.col("comp1").alias("ccomp")
        )
        labels = (
            stepped.join(hop, stepped.comp1 == hop.cid, "left")
            .select(
                "id",
                F.least(
                    F.col("comp1"), F.coalesce(F.col("ccomp"), F.col("comp1"))
                ).alias("comp"),
                (
                    F.least(
                        F.col("comp1"), F.coalesce(F.col("ccomp"), F.col("comp1"))
                    )
                    < F.col("old")
                ).alias("upd"),
            )
            .localCheckpoint(eager=True)
        )
        # Convergence flag rides the checkpointed frame — detecting the
        # fixpoint costs a take(1) over cached partitions, not an extra
        # old-vs-new shuffle join per round.
        if labels.filter(F.col("upd")).isEmpty():
            break
    und.unpersist(blocking=True)
    return labels.select(F.col("id").alias(id_out), F.col("comp").alias(comp_out))
