"""Streaming windowed distinct-count at constant state — the HLL sketch
(`operators/hll.py`) composed with Structured Streaming's watermarked
windowed aggregation.

Exact streaming COUNT(DISTINCT) is unbounded state (every seen value per
open window); the register sketch caps state at m=256 rows per window
forever, because ``max`` is the aggregation — Spark keeps one partial max
per (window, register) key, updates it per micro-batch, and emits the
closed window at watermark. Both builds share the SAME row-local register/
rank expressions (`operators.hll.register_rank_cols`), so a closed
streaming window's register table is bit-identical to the batch build over
the same rows (pinned by ``tests/test_stream_cardinality.py``), and the
batch estimator (`hll_estimate` grouped by window) reads either.

This is the streaming sibling of the count-min cell table and the
Misra–Gries heavy hitters (`streaming/heavyhitters.py`): all three keep a
fixed-size summary per window under the same merge algebra (max / sum /
counter-decrement) the batch operator tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from duckdb_nats_jetstream_spark.operators.hll import register_rank_cols


def _windowed_registers(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    window: str,
    salt: str,
    watermark: str | None,
) -> DataFrame:
    """One builder for BOTH twins — the module's whole claim is that the
    closed streaming window is bit-identical to the batch build, so the
    two pipelines must be identical BY CONSTRUCTION (r09 review: the
    bodies were copy-paste twins, and an edit landing in one but not the
    other would silently break the parity the tests pin). The watermark
    is the only legitimate difference: applied iff given."""
    reg, rank = register_rank_cols(value_col, salt)
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(F.col(ts_col), reg.alias("register"), rank.alias("rank"))
        .groupBy(F.window(ts_col, window).alias("win"), F.col("register"))
        .agg(F.max("rank").alias("max_rank"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "register",
            "max_rank",
        )
    )


def windowed_hll_registers(
    stream_df: DataFrame,
    value_col: str = "subject",
    ts_col: str = "ts_nats",
    window: str = "1 hour",
    watermark: str = "2 hours",
    salt: str = "hll:",
) -> DataFrame:
    """Per-window HLL register relation from a streaming message scan:
    ``(window_start, window_end, register, max_rank)``. Append-mode safe —
    rows emit when the watermark closes the window; state per open window
    is ≤ m register maxima."""
    return _windowed_registers(
        stream_df, value_col, ts_col, window, salt, watermark
    )


def batch_windowed_hll_registers(
    df: DataFrame,
    value_col: str = "subject",
    ts_col: str = "ts_nats",
    window: str = "1 hour",
    salt: str = "hll:",
) -> DataFrame:
    """The batch twin: identical expressions, identical output — what the
    streaming build must converge to on the same closed data (shared
    builder, so identical by construction)."""
    return _windowed_registers(df, value_col, ts_col, window, salt, None)
