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


def test_randomized_ties_and_partitionings_match_numpy(spark):
    """Fuzz the rank-coordination math (r09): heavy TIES (values drawn
    from a tiny domain, so order statistics repeat and lo/hi often land
    on equal values), skewed group sizes, several partition counts —
    every (group, p) must equal numpy's linear interpolation, which is
    the same symmetric form Spark's percentile evaluates. One seeded
    dataset per partition-count (a Spark job per hypothesis example
    would be minutes per run; the seed keeps failures reproducible)."""
    import numpy as np

    rng = np.random.default_rng(90210)
    groups = ["a"] * 1 + ["b"] * 7 + ["c"] * 311 + ["d"] * 64
    vals = rng.integers(0, 9, size=len(groups)).astype(float)  # many ties
    rows = list(zip(groups, vals.tolist()))
    rng.shuffle(rows)
    ps = [0.0, 0.25, 0.5, 0.9, 1.0]  # includes both endpoints
    ref = {}
    by_g: dict[str, list[float]] = {}
    for g, v in rows:
        by_g.setdefault(g, []).append(v)
    for g, vs in by_g.items():
        ref[g] = tuple(
            float(np.percentile(np.array(vs), p * 100, method="linear"))
            for p in ps
        )
    for n_partitions in (1, 3, 32, 97):  # more partitions than rows too
        df = spark.createDataFrame(rows, "g string, v double")
        got = {
            r.g: tuple(r[f"q_{i}"] for i in range(len(ps)))
            for r in exact_group_quantiles(
                df, "g", "v", ps, n_partitions=n_partitions
            ).collect()
        }
        assert got == ref, f"n_partitions={n_partitions}"


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


def test_null_group_key_is_a_group(spark):
    """SQL GROUP BY semantics: a NULL group key forms a group; the driver
    assembly must not crash sorting None against str (r10 review sweep)."""
    from duckdb_nats_jetstream_spark.operators.quantiles import (
        exact_group_quantiles,
    )

    rows = [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 20.0), (None, 30.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r.g: (r.q_0, r.n) for r in exact_group_quantiles(df, "g", "v", [0.5]).collect()}
    assert out["a"] == (2.0, 2)
    assert out[None] == (20.0, 3)


def test_out_of_range_ps_fail_fast(spark):
    import pytest

    from duckdb_nats_jetstream_spark.operators.quantiles import (
        exact_group_quantiles,
    )

    df = spark.createDataFrame([("a", 1.0)], "g string, v double")
    with pytest.raises(ValueError, match="outside"):
        exact_group_quantiles(df, "g", "v", [1.5])
    with pytest.raises(ValueError, match="non-empty"):
        exact_group_quantiles(df, "g", "v", [])
