"""Skew-resilient aggregation: two-phase salted groupBy.

At 100 TB a hot key (one subject carrying half the stream) turns a single
reducer into the job's critical path. Salting splits each key into
``n_salts`` shards for the partial aggregate, then merges shards in a second
(tiny) aggregation. AQE's skew-join handling covers joins; this covers
aggregations whose partials are algebraic.

The decimal-exact sum pattern (``functions.exact``) makes the two-phase
result *identical* to a direct aggregate — so the oracle for a salted query
is simply the plain GROUP BY.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    partial_aggs: list[Column],
    final_aggs: list[Column],
    n_salts: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Aggregate with per-key sharding.

    ``partial_aggs`` run per (keys, salt); ``final_aggs`` merge the shards
    per key. The salt is derived deterministically (hash of a high-card
    column mod n_salts) so results are reproducible.
    """
    salt_col = (
        F.abs(F.hash(F.col(salt_source))) % n_salts
        if salt_source
        else (F.monotonically_increasing_id() % n_salts)
    )
    partial = (
        df.withColumn("__salt", salt_col)
        .groupBy(*keys, "__salt")
        .agg(*partial_aggs)
    )
    return partial.groupBy(*keys).agg(*final_aggs)


def skew_join_ready(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize an aggregate-topped relation so a downstream skewed
    sort-merge join stays rescuable by AQE.

    ``OptimizeSkewedJoin`` pattern-matches ONLY
    ``SMJ(Sort(ShuffleRead), Sort(ShuffleRead))``. If a join child still
    carries its aggregate (``distinct()``, a groupBy result, a window)
    above the shuffle, the rule silently no-ops — measured at 100× data
    with a 90% hot key (SCALING.md Round-6, batch 5): the straggler
    survives ``skewJoin=on`` at 11.3×, while the same join over a
    materialized side flattens to 1.1× and runs 3× faster end-to-end.

    Call this on the aggregate side BEFORE joining it against a
    potentially skewed fact. Locally this is an eager ``localCheckpoint``;
    on a cluster swap for ``checkpoint`` or a staging write (same
    guidance as every other lineage-truncation site in the package).
    Only needed when the other side is a skew-prone FACT — aggregate ⋈
    aggregate joins have one row per key per side and cannot skew.
    """
    return df.localCheckpoint(eager=eager)
