"""Distributed operators over a globally ordered column.

A plain ``lag().over(Window.orderBy(col))`` collapses the whole dataset into
ONE partition (Spark warns ``WindowExec: No Partition Defined``) — fine at
sf0.001, fatal at 100 TB. The scalable shape is the classic two-level
decomposition:

1. bucket rows into coarse **chunks** of the ordering key (``floor(key /
   chunk_size)``) and run the window *partitioned by chunk* — each chunk is
   an independent, bounded unit of work;
2. fix up chunk boundaries with a second window over the **per-chunk
   aggregates** — one row per non-empty chunk, orders of magnitude smaller
   than the data, and broadcast back onto the fact side.

The reference engine never needs this (it scans a single NATS stream on one
node, ref:src/nats_scan.cpp sequential consume loop); on Spark it is what
makes sequence-continuity audits (`scan_gap_detection`) cluster-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

# 2^20 ordering-key values per chunk: at seq densities near 1 row/value this
# bounds a chunk's window sort to ~1M rows, while the boundary table stays
# ~1e6x smaller than the input.
DEFAULT_CHUNK_SIZE = 1 << 20

_CHUNK, _PREV_IN, _CMAX, _PREV_CHUNK_MAX = (
    "__ord_chunk",
    "__ord_prev_in_chunk",
    "__ord_chunk_max",
    "__ord_prev_chunk_max",
)


def chunked_lag(
    df: DataFrame,
    order_col: str,
    out_col: str = "prev_value",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> DataFrame:
    """Equivalent of ``F.lag(order_col).over(Window.orderBy(order_col))``
    without the single-partition collapse.

    ``order_col`` must be a non-negative integral column (a log sequence
    number). Within each chunk the lag is a normal partitioned window; the
    first row of every chunk takes the max of the *previous non-empty chunk*
    from a tiny chunk-level window, joined back via broadcast. Rows tied on
    ``order_col`` receive the same predecessor either way, so any aggregate
    over ``out_col`` differences matches the global-window answer exactly.
    """
    # `/` here round-trips through double, so above 2^53 the chunk index
    # is approximate — examined in the r10 review and left as-is on
    # purpose: correctness needs only a MONOTONE chunk function of the
    # key (per-chunk lag + previous-non-empty-chunk max yields the exact
    # global predecessor under any monotone chunking; equal keys always
    # co-chunk), and double rounding is monotone. Only the chunk-size
    # bound gets fuzzy at uint64 extremes, not any answer.
    chunked = df.withColumn(
        _CHUNK, (F.col(order_col) / F.lit(chunk_size)).cast("long")
    )
    in_chunk = W.partitionBy(_CHUNK).orderBy(order_col)

    # One row per non-empty chunk; the chunk-level window IS single-partition
    # but over ~input/chunk_size rows — the intended tiny fix-up table.
    boundaries = (
        chunked.groupBy(_CHUNK)
        .agg(F.max(order_col).alias(_CMAX))
        .withColumn(_PREV_CHUNK_MAX, F.lag(_CMAX).over(W.orderBy(_CHUNK)))
        .select(_CHUNK, _PREV_CHUNK_MAX)
    )

    return (
        chunked.join(F.broadcast(boundaries), _CHUNK, "left")
        .withColumn(_PREV_IN, F.lag(order_col).over(in_chunk))
        .withColumn(out_col, F.coalesce(_PREV_IN, F.col(_PREV_CHUNK_MAX)))
        .drop(_CHUNK, _PREV_IN, _PREV_CHUNK_MAX)
    )


def sequence_gaps(
    df: DataFrame,
    seq_col: str = "seq",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> DataFrame:
    """Continuity audit over a sequence column: total rows, count of gaps
    (places where the next stored seq jumps by >1), and the covered span —
    the distributed twin of the reference's LAG-based continuity check
    (ref:test/sql/test_sequence_ranges.sql:92-107)."""
    with_prev = chunked_lag(df, seq_col, out_col="__prev_seq", chunk_size=chunk_size)
    return with_prev.agg(
        F.count("*").alias("n_msgs"),
        F.sum(
            F.when(F.col(seq_col) - F.col("__prev_seq") > 1, F.lit(1)).otherwise(
                F.lit(0)
            )
        ).alias("n_gaps"),
        (F.max(seq_col) - F.min(seq_col) + F.lit(1)).alias("span"),
    )


def ranged_running_sum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "running_sum",
    num_chunks: int | None = None,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Distributed prefix sum of an INTEGRAL column over a globally ordered
    frame — ``SUM(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)``
    without the single-partition collapse.

    Same two-level decomposition as :func:`chunked_lag`, but the ordering
    key need not be an integral sequence: ``repartitionByRange`` carves the
    order into ``num_chunks`` range chunks (ascending chunk id = ascending
    key range), the running sum is a window PARTITIONED by chunk, and each
    chunk adds the exclusive prefix of per-chunk totals — one row per
    chunk, broadcast back. The result is INDEPENDENT of where the sampled
    range boundaries land: long addition is associative and ``order_cols``
    must be a TOTAL order (include a unique id tie-break), so any range
    carve-up yields the identical prefix sum — boundary sampling
    nondeterminism can move work between tasks, never change an answer.

    ``value_col`` must be integral (it is summed as ``long``; doubles
    would make the answer depend on grouping — refused at bind time).
    NULL values contribute 0 (SUM skips them on both engines). Returns the
    input columns plus ``out_col`` (inclusive running sum).

    ``partition_cols`` restarts the sum per group —
    ``SUM(v) OVER (PARTITION BY g ORDER BY ...)`` — while keeping the
    chunked decomposition: the range carve-up spans groups freely (a
    chunk boundary may split a group), because the in-chunk window and
    the offset chain are BOTH keyed by the group: offsets are per
    (chunk, group), accumulated by a window over chunk ids partitioned
    by group (still one fix-up row per non-empty (chunk, group)). The
    group key rides in a struct, so NULL groups survive the offset join
    (struct equality is null-safe — the stratified_hash_topn lesson).
    """
    field = df.schema[value_col].dataType.simpleString()
    if field not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"ranged_running_sum: {value_col!r} must be integral for an "
            f"order-independent exact sum (got {field}); doubles would make "
            "the result depend on chunk boundaries"
        )
    reserved = {"__rs_pid", "__rs_psum", "__rs_off", "__rs_gk", out_col}
    taken = reserved & set(df.columns)
    if taken:
        raise ValueError(
            f"ranged_running_sum: column(s) {sorted(taken)} collide with "
            "internals"
        )
    if num_chunks is None:
        num_chunks = df.sparkSession.sparkContext.defaultParallelism * 2
    parts = list(partition_cols or [])
    range_keys = [F.col(c) for c in parts] + list(order_cols)
    r = (
        df.repartitionByRange(num_chunks, *range_keys)
        .withColumn("__rs_pid", F.spark_partition_id())
        .withColumn("__rs_gk", F.struct(*[F.col(c) for c in parts]))
    )
    in_w = (
        W.partitionBy("__rs_pid", "__rs_gk")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # one row per non-empty (chunk, group); the fix-up window runs over
    # chunk ids WITHIN each group — still the intended tiny table
    offsets = (
        r.groupBy("__rs_pid", "__rs_gk")
        .agg(F.sum(F.col(value_col).cast("long")).alias("__rs_psum"))
        .withColumn(
            "__rs_off",
            F.coalesce(
                F.sum("__rs_psum").over(
                    W.partitionBy("__rs_gk")
                    .orderBy("__rs_pid")
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0).cast("long"),
            ),
        )
        .select("__rs_pid", "__rs_gk", "__rs_off")
    )
    return (
        r.join(F.broadcast(offsets), ["__rs_pid", "__rs_gk"])
        .withColumn(
            out_col,
            F.col("__rs_off")
            + F.coalesce(
                F.sum(F.col(value_col).cast("long")).over(in_w),
                F.lit(0).cast("long"),
            ),
        )
        .drop("__rs_pid", "__rs_off", "__rs_gk")
    )
