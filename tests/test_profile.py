"""Profile operator: stats correctness, null accounting, approx mode,
bind-time validation, and the one-pass plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from duckdb_nats_jetstream_spark.operators.profile import profile


@pytest.fixture(scope="module")
def tbl(spark):
    return spark.createDataFrame(
        [
            Row(k=1, name="a", v=10.0),
            Row(k=2, name="b", v=None),
            Row(k=2, name=None, v=30.0),
            Row(k=4, name="a", v=None),
        ]
    )


def test_profile_stats(tbl):
    rows = {r.column_name: r for r in profile(tbl, ["k", "name", "v"]).collect()}
    assert set(rows) == {"k", "name", "v"}
    assert all(r.n_rows == 4 for r in rows.values())
    assert rows["k"].n_nulls == 0 and rows["k"].n_distinct == 3
    assert rows["k"].min_value == "1" and rows["k"].max_value == "4"
    assert rows["name"].n_nulls == 1 and rows["name"].n_distinct == 2
    assert rows["name"].min_value == "a" and rows["name"].max_value == "b"
    assert rows["v"].n_nulls == 2 and rows["v"].n_distinct == 2


def test_profile_approx_mode(tbl):
    rows = {r.column_name: r for r in profile(tbl, ["k"], approx=True).collect()}
    # HLL++ is exact at this cardinality; the contract is "close", assert sane
    assert abs(rows["k"].n_distinct - 3) <= 1
    assert rows["k"].n_nulls == 0


def test_profile_validation(tbl):
    with pytest.raises(ValueError, match="at least one column"):
        profile(tbl, [])
    with pytest.raises(ValueError, match="unknown columns"):
        profile(tbl, ["k", "nope"])


def test_profile_single_pass_plan(tbl):
    """Exact-distinct profiling must stay ONE aggregation pipeline (Expand),
    not one scan per column."""
    plan = profile(tbl, ["k", "name"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Expand") >= 1
    # the input is scanned once: a single Expand feeds every distinct agg
    assert plan.count("LocalTableScan") + plan.count("Scan ExistingRDD") <= 1


def test_profile_non_identifier_column_names(spark):
    """Profiled columns are legal Spark names, not necessarily bare SQL
    identifiers: hyphens, spaces, and quotes must survive the stack()
    expr (r10 review sweep)."""
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        F.col("id").alias("a-b"),
        F.col("id").alias("a b"),
        F.col("id").alias("it's"),
    )
    got = {r.column_name: r for r in profile(df, ["a-b", "a b", "it's"]).collect()}
    assert set(got) == {"a-b", "a b", "it's"}
    assert all(r.n_rows == 3 and r.n_nulls == 0 and r.n_distinct == 3 for r in got.values())
