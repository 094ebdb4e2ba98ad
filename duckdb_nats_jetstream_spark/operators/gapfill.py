"""Time-bucket gap-filling: dense time series from sparse event streams.

``time_bucket_gapfill`` turns per-key bucketed aggregates into a *dense*
series — one row per (key, bucket) for every bucket in the observed range —
with three fill strategies computed side-by-side:

- zero-fill for counts (missing bucket → 0 events),
- LOCF (last observation carried forward) for gauges,
- linear interpolation between the bracketing observed values.

This is the hypertable-style ``time_bucket_gapfill``/``locf``/``interpolate``
surface that neither the reference (which delegates all post-scan relational
work to its host engine, ref:src/nats_scan.cpp:13 — and whose host exposes no
gapfill either) nor Spark has built in.

Spark-first plan, and why it scales:

1. the input aggregates per (key, bucket) first — the only shuffle that is
   proportional to data size, with map-side partial aggregation;
2. the spine is ``sequence(min_bucket, max_bucket, interval)`` exploded per
   key — generated, not shuffled; its size is |keys| × |buckets|, independent
   of row count;
3. the left join of spine↔aggregates co-partitions on (key, bucket) — at
   100 TB both sides hash-partition, and AQE broadcasts the spine when tiny;
4. LOCF/interpolation are windows partitioned BY KEY — parallel across keys,
   never a global sort. A series with billions of buckets for ONE key would
   need the chunked-window treatment of :mod:`operators.ordered`; typical
   gapfill output (thousands of buckets per key) does not.

Cross-engine exactness: the value column should be decimal-exact (see
``functions.exact``); the interpolation fraction is a ratio of *integer*
epoch buckets, so ``prev + (next - prev) * frac`` is the same three IEEE ops
in both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

#: interval string → seconds (the bucket widths we support; arbitrary
#: second-multiples are fine because the spine is generated in epoch space)
_UNIT_SECONDS = {
    "minute": 60,
    "hour": 3600,
    "day": 86400,
}


def _bucket_seconds(bucket_width: str) -> int:
    parts = bucket_width.strip().split()
    if len(parts) == 1:
        n, unit = 1, parts[0]
    elif len(parts) == 2:
        n, unit = int(parts[0]), parts[1]
    else:
        raise ValueError(f"unparseable bucket width: {bucket_width!r}")
    unit = unit.rstrip("s").lower()
    if unit not in _UNIT_SECONDS:
        raise ValueError(
            f"unsupported bucket unit {unit!r}; one of {sorted(_UNIT_SECONDS)}"
        )
    if n <= 0:
        # a zero step would divide-by-zero the bucket index (NULL buckets
        # non-ANSI, a runtime throw under ANSI); fail at bind time instead
        raise ValueError(f"bucket width must be positive: {bucket_width!r}")
    return n * _UNIT_SECONDS[unit]


def time_bucket_gapfill(
    df: DataFrame,
    ts_col: str,
    value_col: Column,
    keys: list[str],
    bucket_width: str = "1 hour",
) -> DataFrame:
    """Dense per-key time series with zero-fill / LOCF / interpolation.

    Parameters
    ----------
    df : input rows (one per event)
    ts_col : timestamp column to bucket
    value_col : aggregate over each (key, bucket) group — must be
        deterministic and cross-engine exact if oracle-checked; aliased
        name becomes the observed-value column ``v``
    keys : series identity columns (the spine is dense per key)
    bucket_width : e.g. ``"1 hour"``, ``"15 minutes"``, ``"1 day"``

    Returns one row per (key, bucket) over the *global* observed bucket
    range with columns: ``*keys, bucket, n (zero-filled count), v (observed
    or NULL), v_locf, v_interp``. ``v_interp`` is NULL outside the first/last
    observation for the key (no extrapolation).
    """
    step = _bucket_seconds(bucket_width)
    # epoch-bucket index: integer floor-div — exact, tz-free, and the unit
    # the interpolation fraction is computed in. A NULL timestamp has no
    # bucket: dropped HERE, explicitly — otherwise it forms a NULL-eb
    # aggregate the spine join silently discards.
    observed = (
        df.filter(F.col(ts_col).isNotNull())
        .withColumn(
            "eb", F.floor(F.unix_timestamp(F.col(ts_col)) / step).cast("long")
        )
        .groupBy(*keys, "eb")
        .agg(F.count("*").alias("n_obs"), value_col.alias("v_obs"))
    )

    bounds = observed.agg(
        F.min("eb").alias("eb_min"), F.max("eb").alias("eb_max")
    )
    key_rows = observed.select(*keys).distinct()
    spine = (
        key_rows.crossJoin(F.broadcast(bounds))
        .select(
            *keys,
            F.explode(F.sequence(F.col("eb_min"), F.col("eb_max"))).alias("eb"),
        )
    )

    # NULL-safe on the key columns: a NULL-key series is a series like any
    # other (groupBy already made it one group) — plain equality would leave
    # its spine rows unmatched, emitting a phantom all-empty dense series
    # while the real observations vanish. eqNullSafe is still an equi-key,
    # so the join stays hash/sort-merge co-partitioned.
    dense = (
        spine.alias("s")
        .join(
            observed.alias("o"),
            [
                F.col(f"s.{k}").eqNullSafe(F.col(f"o.{k}")) for k in keys
            ]
            + [F.col("s.eb") == F.col("o.eb")],
            "left_outer",
        )
        .select(
            *[F.col(f"s.{k}").alias(k) for k in keys],
            F.col("s.eb").alias("eb"),
            F.col("o.n_obs").alias("n_obs"),
            F.col("o.v_obs").alias("v_obs"),
        )
    )

    w_past = (
        W.partitionBy(*keys).orderBy("eb").rowsBetween(W.unboundedPreceding, 0)
    )
    w_future = (
        W.partitionBy(*keys).orderBy("eb").rowsBetween(0, W.unboundedFollowing)
    )
    prev_v = F.last("v_obs", ignorenulls=True).over(w_past)
    next_v = F.first("v_obs", ignorenulls=True).over(w_future)
    prev_eb = F.last(
        F.when(F.col("v_obs").isNotNull(), F.col("eb")), ignorenulls=True
    ).over(w_past)
    next_eb = F.first(
        F.when(F.col("v_obs").isNotNull(), F.col("eb")), ignorenulls=True
    ).over(w_future)

    frac = (F.col("eb") - F.col("_prev_eb")).cast("double") / (
        F.col("_next_eb") - F.col("_prev_eb")
    ).cast("double")
    interp = F.when(F.col("v_obs").isNotNull(), F.col("v_obs")).otherwise(
        F.when(
            F.col("_prev_v").isNotNull() & F.col("_next_v").isNotNull(),
            F.col("_prev_v") + (F.col("_next_v") - F.col("_prev_v")) * frac,
        )
    )

    return (
        dense.select(
            *keys,
            "eb",
            "n_obs",
            "v_obs",
            prev_v.alias("_prev_v"),
            next_v.alias("_next_v"),
            prev_eb.alias("_prev_eb"),
            next_eb.alias("_next_eb"),
        )
        .select(
            *keys,
            F.timestamp_seconds(F.col("eb") * step).alias("bucket"),
            F.coalesce(F.col("n_obs"), F.lit(0)).alias("n"),
            F.col("v_obs").alias("v"),
            F.coalesce(F.col("v_obs"), F.col("_prev_v")).alias("v_locf"),
            interp.alias("v_interp"),
        )
    )
