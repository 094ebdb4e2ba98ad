"""Watermarked stream-stream interval join — the streaming twin of
:mod:`operators.interval_join`, and a capability far past the reference's
single-stream scan model (its roadmap stops at durable consumers,
ref:docs/GUIDE.md:461-488; correlating two live subjects requires exporting
to the host engine and re-reading).

Spark's stream-stream inner join buffers both sides in state; the watermark
plus the time-range predicate lets it evict state it can no longer match, so
the join runs indefinitely in bounded memory — state size ≈ (input rate ×
(watermark delay + join window)), independent of total stream length. Both
conditions are REQUIRED at scale: without the range bound the state grows
without limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    within: str = "1 hour",
    watermark: str = "2 hours",
    left_ts: str = "ts_nats",
    right_ts: str = "ts_nats",
) -> DataFrame:
    """Rows of ``right`` that land inside the ``within``-window opened by a
    ``left`` row with the same ``on`` key: inner join on key plus
    ``left_ts <= right_ts <= left_ts + within``, both sides watermarked.

    Column names from both sides are preserved with ``l_`` / ``r_``
    prefixes (stream-stream joins forbid ambiguous references).
    """
    # the prefixing reserves l_ts / r_ts / __k / __rk; a side carrying a
    # column that prefixes INTO one of those (e.g. a payload-extracted
    # column literally named 'ts' → 'l_ts') would produce a duplicate
    # name and fail later with AMBIGUOUS_REFERENCE at watermark/filter
    # time — fail loud at definition time instead (r09 review)
    for side, df_, ts_c, reserved in (
        ("left", left, left_ts, {"l_ts", "__k"}),
        ("right", right, right_ts, {"r_ts", "__rk"}),
    ):
        pref = "l_" if side == "left" else "r_"
        # only PREFIXED names survive the select below (a raw input name
        # like 'l_ts' becomes 'l_l_ts'), so only they can clash — unioning
        # the raw names in rejected joinable inputs on false positives
        produced = {f"{pref}{c}" for c in df_.columns if c not in (on, ts_c)}
        clash = produced & reserved
        if clash:
            raise ValueError(
                f"stream_interval_join: {side} side would produce "
                f"reserved column(s) {sorted(clash)} — rename the "
                f"conflicting input column(s) before joining"
            )
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (on, left_ts)],
    ).withWatermark("l_ts", watermark)
    r = right.select(
        F.col(on).alias("__rk"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (on, right_ts)],
    ).withWatermark("r_ts", watermark)
    joined = l.join(
        r,
        (F.col("__k") == F.col("__rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
    )
    return joined.select(F.col("__k").alias(on), *[c for c in joined.columns if c not in ("__k", "__rk")])


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream–static enrichment join: every micro-batch joins against the
    (batch) dimension table — no state, no watermark needed. Spark
    re-evaluates the static side's PLAN per trigger, so a dim backed by a
    re-resolvable source (catalog table, view, Delta-style table) picks up
    updates between batches; a plain ``spark.read.parquet`` dim pins its
    file listing at creation — new/overwritten files are NOT seen (rebuild
    the dim DataFrame or use a table for SCD use). The dimension is
    broadcast-hinted: at scale the stream side never shuffles, each
    executor probes a local hash map (the only sane plan for a hot-path
    enrichment)."""
    return stream.join(F.broadcast(dim), on, how)
