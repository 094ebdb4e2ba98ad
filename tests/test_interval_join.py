"""Binned interval join: boundary inclusivity, cross-bin correctness, pair
uniqueness, bind errors, and the no-nested-loop plan guarantee."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from duckdb_nats_jetstream_spark.errors import BindError
from duckdb_nats_jetstream_spark.operators.interval_join import (
    _width_to_us,
    interval_join,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def sides(spark):
    points = spark.createDataFrame(
        [
            Row(k="a", p_ts=_ts(0), pid=1),    # exactly at a window start
            Row(k="a", p_ts=_ts(60), pid=2),   # exactly at a window end
            Row(k="a", p_ts=_ts(61), pid=3),   # just past the end
            Row(k="a", p_ts=_ts(90), pid=4),   # in the second window only
            Row(k="b", p_ts=_ts(30), pid=5),   # right key, different window
            Row(k="c", p_ts=_ts(30), pid=6),   # key with no windows
        ]
    )
    intervals = spark.createDataFrame(
        [
            Row(k="a", start=_ts(0), end=_ts(60), iid=10),
            Row(k="a", start=_ts(75), end=_ts(135), iid=11),  # spans a bin edge
            Row(k="b", start=_ts(100), end=_ts(160), iid=12),
        ]
    )
    return points, intervals


def test_semantics_and_uniqueness(spark, sides):
    points, intervals = sides
    rows = interval_join(
        points, intervals, on="k", point_ts="p_ts",
        start_col="start", end_col="end", bin_width="1 hour",
    ).collect()
    pairs = sorted((r.pid, r.iid) for r in rows)
    # inclusive both ends; pid=3 outside; pid=4 crosses into the interval's
    # second bin; pid=5/6 unmatched; every pair exactly once
    assert pairs == [(1, 10), (2, 10), (4, 11)]


def test_matches_naive_join(spark, sides):
    points, intervals = sides
    binned = interval_join(
        points, intervals, on="k", point_ts="p_ts",
        start_col="start", end_col="end", bin_width="15 minutes",
    )
    from pyspark.sql import functions as F

    naive = points.join(intervals, "k").filter(
        F.col("p_ts").between(F.col("start"), F.col("end"))
    )
    assert sorted((r.pid, r.iid) for r in binned.collect()) == sorted(
        (r.pid, r.iid) for r in naive.collect()
    )


def test_plan_is_hash_join(spark, sides):
    points, intervals = sides
    plan = (
        interval_join(points, intervals, on="k", point_ts="p_ts",
                      start_col="start", end_col="end")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_bind_errors(spark, sides):
    points, intervals = sides
    with pytest.raises(BindError, match="points side lacks"):
        interval_join(points, intervals, "k", "nope", "start", "end")
    with pytest.raises(BindError, match="intervals side lacks"):
        interval_join(points, intervals, "k", "p_ts", "nope", "end")
    with pytest.raises(BindError, match="bad bin_width"):
        interval_join(points, intervals, "k", "p_ts", "start", "end", bin_width="1 fortnight")
    both = intervals.withColumnRenamed("iid", "pid")
    with pytest.raises(BindError, match="alias them first"):
        interval_join(points, both, "k", "p_ts", "start", "end")


def test_width_parse():
    assert _width_to_us("1 hour") == 3_600_000_000
    assert _width_to_us("30 minutes") == 1_800_000_000
    with pytest.raises(BindError):
        _width_to_us("-5 minutes")


def test_reserved_bin_column_rejected(spark, sides):
    from pyspark.sql import functions as F

    points, intervals = sides
    with pytest.raises(BindError, match="__bin"):
        interval_join(
            points.withColumn("__bin", F.lit(1)),
            intervals, "k", "p_ts", "start", "end",
        )
    with pytest.raises(BindError, match="__bin"):
        interval_join(
            points,
            intervals.withColumn("__bin", F.lit(1)),
            "k", "p_ts", "start", "end",
        )


def test_inverted_intervals_never_match_and_never_explode(spark, sides):
    """end < start can never satisfy BETWEEN; the prefilter must drop such
    rows before sequence() walks DOWNWARD through thousands of junk bins
    (r10 review sweep)."""
    from pyspark.sql import functions as F

    points, intervals = sides
    inverted = intervals.select(
        "k",
        F.col("end").alias("start"),
        F.col("start").alias("end"),
        (F.col("iid") + 100).alias("iid"),
    )
    both = intervals.unionByName(inverted)
    base = interval_join(points, intervals, "k", "p_ts", "start", "end")
    with_bad = interval_join(points, both, "k", "p_ts", "start", "end")
    assert sorted(map(tuple, base.collect())) == sorted(map(tuple, with_bad.collect()))
