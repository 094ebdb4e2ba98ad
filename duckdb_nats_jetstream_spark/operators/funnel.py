"""Ordered multi-stage funnel over an event log — single-pass, one shuffle.

The textbook funnel (stage k's timestamp = min event time of type k strictly
after stage k-1) is usually written as a cascade of k aggregations, each
rescanning the log. Here the log is scanned ONCE: one user-keyed aggregation
collects each user's time-sorted event array, and every stage timestamp is
an ordered array lookup (first matching element of a sorted array == min
matching timestamp — identical semantics to the cascade, which is what the
DuckDB oracle runs).

Scale shape: one shuffle on ``user_col``; per-user state is that user's
event structs — the same state bound a session window holds, skew-safe for
human-scale activity (a pathological hot user caps via the same salting
dial as ``scan_salted_agg``). k stages cost k array scans over the in-memory
array, not k corpus scans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def funnel_user_stages(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_gap: str | None = None,
) -> DataFrame:
    """Per-user stage timestamps ``(user, t1..tk)``; ``t_k`` is NULL once
    the chain breaks (strict ``>`` between consecutive stages). With
    ``max_gap`` (an INTERVAL string like ``"2 hours"``), each stage must
    also land within that gap of the previous one — the conversion-window
    variant every funnel product exposes. Same plan either way: the bound
    is one more predicate inside the array filter, not a new join or
    shuffle. NOTE: a too-late event does not fail the funnel outright — a
    later in-window event of the same stage can still convert (min matching
    ts within the window, the standard semantics)."""
    ev = df.filter(F.col(type_col).isin(*stages)).select(
        user_col, ts_col, type_col
    )
    out = ev.groupBy(user_col).agg(
        F.array_sort(F.collect_list(F.struct(ts_col, type_col))).alias("__a")
    )
    def _first(stage: str):
        # exactly-one-arg lambda (PySpark HOFs infer arity from the signature)
        return lambda x: x[type_col] == stage

    def _first_after(stage: str, prev_col: str):
        if max_gap is None:
            return lambda x: (x[type_col] == stage) & (x[ts_col] > F.col(prev_col))
        deadline = F.col(prev_col) + F.expr(f"INTERVAL {max_gap}")
        return lambda x: (
            (x[type_col] == stage)
            & (x[ts_col] > F.col(prev_col))
            & (x[ts_col] <= deadline)
        )

    prev = None
    for i, stage in enumerate(stages, start=1):
        pred = _first(stage) if prev is None else _first_after(stage, prev)
        name = f"t{i}"
        # try_element_at: NULL on an empty match (ANSI mode makes plain
        # element_at THROW on out-of-bounds — a broken chain is data, not
        # an error)
        out = out.withColumn(
            name, F.try_element_at(F.filter("__a", pred), F.lit(1))[ts_col]
        )
        prev = name
    return out.drop("__a")


def funnel_summary(per_user: DataFrame, n_stages: int) -> DataFrame:
    """One-row stage counts + stage-to-stage conversion rates."""
    counts = [F.count(f"t{i}").alias(f"n_stage{i}") for i in range(1, n_stages + 1)]
    convs = [
        (F.count(f"t{i + 1}").cast("double") / F.count(f"t{i}").cast("double")).alias(
            f"conv_{i + 1}"
        )
        for i in range(1, n_stages)
    ]
    return per_user.agg(*counts, *convs)
