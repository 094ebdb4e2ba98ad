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

For adversarial graphs (long chains / power-law), the known upgrade is the
alternating large-star/small-star rewrite (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14), which converges in
O(log^2 n) rounds with the same building blocks; not needed for the
near-dup workload.

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
        # Convergence flag rides the checkpointed frame — detecting the
        # fixpoint costs a take(1) over cached partitions, not an extra
        # old-vs-new shuffle join per round.
        labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(F.col("comp"), F.coalesce(F.col("nbr"), F.col("comp"))).alias(
                    "comp"
                ),
                (F.col("nbr") < F.col("comp")).alias("upd"),
            )
            .localCheckpoint(eager=True)
        )
        if labels.filter(F.col("upd")).isEmpty():
            break
    und.unpersist(blocking=False)
    return labels.select(F.col("id").alias(id_out), F.col("comp").alias(comp_out))
