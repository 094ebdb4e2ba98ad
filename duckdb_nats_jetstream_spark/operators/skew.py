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
