"""Per-group winsorization: clip a numeric column to per-key quantile bounds.

A standard training-data normalization step (outlier-robust quality/length
scores) that the reference's host engine would express as a correlated
quantile subquery. Spark-first plan:

1. one aggregation computes the (lo, hi) quantile pair per key — output is
   |keys| rows, tiny regardless of input size (exact interpolated
   ``percentile``: same (n-1)p formula as DuckDB ``quantile_cont``, so the
   bounds are bit-identical cross-engine);
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

from .broadcast_guard import DEFAULT_MAX_BROADCAST_ROWS, sized_broadcast


def winsorize(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    lower: float = 0.05,
    upper: float = 0.95,
    out_col: str = "w",
    max_broadcast_keys: int | None = DEFAULT_MAX_BROADCAST_ROWS,
) -> DataFrame:
    """Append ``out_col`` = ``value_col`` clipped to the per-key
    [``lower``, ``upper``] quantile range, plus ``_clipped`` (1 if the row
    was clipped, else 0). All input columns are preserved.

    ``max_broadcast_keys`` caps the broadcast of the per-key bounds
    relation (default guard runs one eager sizing job; ``None`` asserts
    key cardinality is structurally bounded and keeps the call lazy)."""
    if not 0.0 <= lower < upper <= 1.0:
        raise ValueError(f"need 0 <= lower < upper <= 1, got ({lower}, {upper})")
    v = F.col(value_col).cast("double")
    bounds = (
        df.groupBy(*keys)
        .agg(F.percentile(v, F.array(F.lit(lower), F.lit(upper))).alias("pp"))
        .select(*keys, F.col("pp")[0].alias("_lo"), F.col("pp")[1].alias("_hi"))
    )
    return (
        df.join(sized_broadcast(bounds, max_broadcast_keys), keys)
        .withColumn(out_col, F.least(F.greatest(v, F.col("_lo")), F.col("_hi")))
        .withColumn(
            "_clipped",
            ((v < F.col("_lo")) | (v > F.col("_hi"))).cast("int"),
        )
        .drop("_lo", "_hi")
    )
