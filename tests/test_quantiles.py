"""Distributed exact quantiles: bit-equality with Spark's percentile
aggregate (which is itself oracle-matched to DuckDB quantile_cont)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.operators.quantiles import exact_group_quantiles
from duckdb_nats_jetstream_spark.tables import read_table


def test_matches_percentile_aggregate(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem")
    got = {
        r.l_returnflag: (r.q_0, r.q_1, r.n)
        for r in exact_group_quantiles(
            li, "l_returnflag", "l_extendedprice", [0.5, 0.9]
        ).collect()
    }
    ref = {
        r.l_returnflag: (r.p50, r.p90, r.n)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", 0.5).alias("p50"),
            F.percentile("l_extendedprice", 0.9).alias("p90"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert got == ref  # bit-exact, including the interpolation ulp


def test_integral_position_and_tiny_groups(spark):
    # n=5, p=0.5 -> pos integral (lo == hi); n=1 -> degenerate group;
    # also exercises a group smaller than the partition count
    rows = [("a", float(v)) for v in (10, 20, 30, 40, 50)] + [("b", 7.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        r.g: (r.q_0, r.q_1, r.n)
        for r in exact_group_quantiles(df, "g", "v", [0.5, 0.75]).collect()
    }
    assert got == {"a": (30.0, 40.0, 5), "b": (7.0, 7.0, 1)}


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("a", 3.0)], "g string, v double"
    )
    got = exact_group_quantiles(df, "g", "v", [0.5]).collect()[0]
    assert (got.q_0, got.n) == (2.0, 2)


def test_group_cardinality_guard(spark):
    """r05 verdict ask #5: an unbounded group key must raise (naming the
    histsketch alternative) instead of silently collecting O(partitions ×
    groups) coordination rows to the driver — and a deliberate raise of
    the threshold must still work."""
    import pytest

    df = spark.range(200).select(
        F.col("id").cast("string").alias("g"),
        F.col("id").cast("double").alias("v"),
    )
    with pytest.raises(ValueError, match="hist_quantiles"):
        exact_group_quantiles(df, "g", "v", [0.5], max_coordination_rows=50)
    got = exact_group_quantiles(
        df, "g", "v", [0.5], max_coordination_rows=10_000
    )
    assert got.count() == 200
