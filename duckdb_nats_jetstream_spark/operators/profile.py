"""Single-pass table profiling — per-column row/null/distinct counts and
min/max, the first step of any large-corpus ingestion pipeline (schema
sanity, null audits, cardinality estimates for join planning).

Scale design: ONE aggregation pass over the table produces every column's
stats. Multiple COUNT(DISTINCT) in one agg makes Catalyst plan a single
Expand + two-phase hash aggregate — table is read once, shuffled once
(expanded rows carry only the profiled columns, pruned at the scan). The
wide one-row result is then unpivoted driver-side-free with ``stack``.

For 100 TB profiling where exact distincts aren't needed, pass
``approx=True`` — swaps COUNT(DISTINCT) for HLL++ ``approx_count_distinct``
(no Expand, fully mergeable sketches, one ordinary agg).

The reference has no profiling surface; this extends the engine for
training-data curation (SURVEY.md north-star operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile(df: DataFrame, columns: list[str], approx: bool = False) -> DataFrame:
    """One row per profiled column: ``column_name, n_rows, n_nulls,
    n_distinct, min_value, max_value`` (min/max rendered as strings)."""
    if not columns:
        raise ValueError("profile() needs at least one column")
    missing = [c for c in columns if c not in df.columns]
    if missing:
        raise ValueError(f"profile(): unknown columns {missing}")

    ndist = F.approx_count_distinct if approx else F.countDistinct
    # internal aliases are POSITIONAL (__nn_0, not __nn_<name>): a profiled
    # column named `a-b` or `a b` is a legal Spark name but not a bare SQL
    # identifier, and the stack() expr below is parsed as SQL text
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(columns):
        aggs += [
            F.count(F.col(c)).alias(f"__nn_{i}"),
            ndist(F.col(c)).alias(f"__nd_{i}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{i}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{i}"),
        ]
    wide = df.agg(*aggs)

    parts = ", ".join(
        # the column NAME is a string literal inside the expr — escape quotes
        f"'{c.replace(chr(39), chr(39) * 2)}', __nn_{i}, __nd_{i}, __min_{i}, __max_{i}"
        for i, c in enumerate(columns)
    )
    stacked = wide.select(
        F.col("__n").alias("n_rows"),
        F.expr(
            f"stack({len(columns)}, {parts}) AS "
            "(column_name, __nn, n_distinct, min_value, max_value)"
        ),
    )
    return stacked.select(
        "column_name",
        "n_rows",
        (F.col("n_rows") - F.col("__nn")).alias("n_nulls"),
        "n_distinct",
        "min_value",
        "max_value",
    ).orderBy("column_name")
