"""Per-group winsorization: clip a numeric column to per-key quantile bounds.

A standard training-data normalization step (outlier-robust quality/length
scores) that the reference's host engine would express as a correlated
quantile subquery. Spark-first plan:

1. one aggregation computes the (lo, hi) quantile pair per key — OUTPUT is
   |keys| rows, tiny regardless of input size (exact interpolated
   ``percentile``: same (n-1)p formula as DuckDB ``quantile_cont``, so the
   bounds are bit-identical cross-engine). The default ``percentile``
   aggregate's MERGE STATE is not tiny, though: it is a value map of every
   distinct value per key, so with few keys over a continuous column the
   final merge lands on |keys| tasks holding that key's whole distinct set
   (measured in SCALING.md batch 20: 24.6 s single-task merge = 97% of the
   wall at 10M near-distinct values, 3 groups). ``bounds_path="rank"``
   (single key) computes the same bit-identical bounds via
   ``quantiles.exact_group_quantiles`` — range-partitioned rank selection,
   6.8× ahead at the measured point (superlinearly widening with per-key
   volume) and parallel at any per-key volume; it
   runs its two passes eagerly at call time;
2. the bounds broadcast-join back onto the fact rows — no shuffle of the
   input side, which at 100 TB is the difference between a map-side join
   and a full repartition. The hint is RUNTIME-SIZED (``sized_broadcast``):
   |keys| scales with the input's group cardinality, and an unconditional
   hint on a 10^8-key corpus would OOM the driver (SCALING.md batch 8) —
   past the cap the join falls back to the planner's shuffle strategy;
3. the clip itself is ``least(greatest(x, lo), hi)`` — pure comparisons,
   no arithmetic, so clipped values are exact pass-throughs of either the
   input or the bound.

The input column is cast to double once up front (quantile bounds are
interpolated doubles; comparing long-vs-double would re-introduce
engine-specific coercion rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from duckdb_nats_jetstream_spark.errors import BindError

from .broadcast_guard import DEFAULT_MAX_BROADCAST_ROWS, sized_broadcast


def winsorize(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str = "w",
    max_broadcast_keys: int | None = DEFAULT_MAX_BROADCAST_ROWS,
    bounds_path: str = "agg",
) -> DataFrame:
    """Append ``out_col`` = ``value_col`` clipped to the per-key
    [``lower``, ``upper``] quantile range, plus ``_clipped`` (1 if the row
    was clipped, else 0). All input columns are preserved.

    ``max_broadcast_keys`` caps the broadcast of the per-key bounds
    relation (default guard runs one eager sizing job; ``None`` asserts
    key cardinality is structurally bounded and keeps the call lazy).

    ``bounds_path``: ``"agg"`` (default) computes bounds with the built-in
    ``percentile`` aggregate — right when per-key volume is modest, and the
    whole call stays lazy. ``"rank"`` (single key only) computes the SAME
    bit-identical bounds via distributed rank selection
    (:func:`..quantiles.exact_group_quantiles`) — the scale path when a few
    keys each hold a large continuous value set, where the percentile value
    map would merge on |keys| tasks (SCALING.md batch 20). The rank path
    runs eagerly at call time.

    NULL handling, identical on both paths: rows whose KEY is NULL are
    dropped (the bounds join is a plain equi-join, matching the SQL
    mirror's semantics — coalesce keys upstream to keep them); keys whose
    VALUES are all NULL keep their rows with NULL bounds (clip of NULL is
    NULL)."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got ({lower}, {upper})")
    if bounds_path not in ("agg", "rank"):
        raise ValueError(f"bounds_path must be 'agg'|'rank', got {bounds_path!r}")
    v = F.col(value_col).cast("double")
    if bounds_path == "rank":
        if len(keys) != 1:
            raise BindError(
                "winsorize: bounds_path='rank' supports a single key column "
                f"(got {keys!r}); pre-concatenate a composite key or use the "
                "default 'agg' path"
            )
        from .quantiles import exact_group_quantiles

        # NULL keys are excluded BEFORE the rank selection (its driver-side
        # rank coordination sorts group keys, which a None cannot join), and
        # from the join's left side — reproducing the agg path's equi-join
        # drop of NULL-key rows exactly
        joined_left = df.filter(F.col(keys[0]).isNotNull())
        bounds = exact_group_quantiles(
            joined_left.select(F.col(keys[0]), v.alias("__wv")), keys[0],
            "__wv", [lower, upper],
        ).select(keys[0], F.col("q_0").alias("_lo"), F.col("q_1").alias("_hi"))
        # left: all-null-VALUE keys are absent from the rank bounds (its
        # NULL filter drops them) but present with NULL bounds on the agg
        # path — a left join restores identical row-preserving semantics
        join_type = "left"
    else:
        bounds = (
            df.groupBy(*keys)
            .agg(F.percentile(v, F.array(F.lit(lower), F.lit(upper))).alias("pp"))
            .select(*keys, F.col("pp")[0].alias("_lo"), F.col("pp")[1].alias("_hi"))
        )
        # inner: every non-NULL key is present in bounds, and NULL-key rows
        # are dropped either way because the equi-join never matches NULL —
        # the documented (SQL-mirror) semantics, NOT an every-row guarantee
        join_type = "inner"
        joined_left = df
    return (
        joined_left.join(sized_broadcast(bounds, max_broadcast_keys), keys, join_type)
        .withColumn(out_col, F.least(F.greatest(v, F.col("_lo")), F.col("_hi")))
        .withColumn(
            "_clipped",
            # coalesce: a NULL value (or NULL bounds on the left path)
            # makes the comparison NULL — the documented contract is
            # "1 if the row was clipped, else 0", and a NULL row was
            # not clipped; without this, sum(_clipped) audits undercount
            # silently
            F.coalesce(
                ((v < F.col("_lo")) | (v > F.col("_hi"))).cast("int"),
                F.lit(0),
            ),
        )
        .drop("_lo", "_hi")
    )
