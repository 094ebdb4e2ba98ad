"""As-of join: backward/forward semantics, inclusive bounds, unmatched-left
NULLs, tie-breaking, bind errors — plus plan discipline (single shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from duckdb_nats_jetstream_spark.errors import BindError
from duckdb_nats_jetstream_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            Row(k="a", t=10, lv="L1"),
            Row(k="a", t=20, lv="L2"),
            Row(k="a", t=5, lv="L0"),   # before any right row
            Row(k="b", t=15, lv="L3"),
            Row(k="c", t=15, lv="L4"),  # key with no right rows at all
        ]
    )
    right = spark.createDataFrame(
        [
            Row(k="a", t=10, rv=100),   # equal ts -> inclusive match
            Row(k="a", t=18, rv=180),
            Row(k="b", t=1, rv=10),
            Row(k="b", t=99, rv=990),   # future only for backward
        ]
    )
    return left, right


def test_backward_semantics(spark, sides):
    left, right = sides
    got = {
        (r.k, r.t): r.rv
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t", right_cols={"rv": "rv"}
        ).collect()
    }
    assert got[("a", 10)] == 100  # inclusive: right at equal ts matches
    assert got[("a", 20)] == 180  # most recent prior, not first
    assert got[("a", 5)] is None  # nothing at-or-before
    assert got[("b", 15)] == 10   # future right row ignored
    assert got[("c", 15)] is None # key absent from right


def test_forward_semantics(spark, sides):
    left, right = sides
    got = {
        (r.k, r.t): r.rv
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            right_cols={"rv": "rv"}, direction="forward",
        ).collect()
    }
    assert got[("a", 10)] == 100  # inclusive at equal ts
    assert got[("a", 20)] is None # nothing at-or-after
    assert got[("a", 5)] == 100   # nearest following
    assert got[("b", 15)] == 990


def test_tie_break_deterministic(spark):
    left = spark.createDataFrame([Row(k="a", t=10)])
    right = spark.createDataFrame(
        [Row(k="a", t=10, rid=1, rv="first"), Row(k="a", t=10, rid=2, rv="second")]
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_ts="t",
        right_cols={"rv": "rv"}, tie_col="rid",
    ).collect()
    assert out[0].rv == "second"  # greatest tie_col wins (backward)


def test_bind_errors(spark, sides):
    left, right = sides
    with pytest.raises(BindError, match="direction"):
        asof_join(left, right, "k", "t", "t", {"rv": "rv"}, direction="nearest")
    with pytest.raises(BindError, match="left side lacks"):
        asof_join(left, right, "nope", "t", "t", {"rv": "rv"})
    with pytest.raises(BindError, match="right side lacks"):
        asof_join(left, right, "k", "t", "t", {"missing": "x"})
    with pytest.raises(BindError, match="collide"):
        asof_join(left, right, "k", "t", "t", {"rv": "lv"})


def test_single_shuffle_plan(spark, sides):
    left, right = sides
    plan = (
        asof_join(left, right, on="k", left_ts="t", right_ts="t", right_cols={"rv": "rv"})
        ._jdf.queryExecution().executedPlan().toString()
    )
    # one hash-partitioning exchange feeds the window; no join node at all
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_null_timestamp_right_rows_never_match(spark):
    """A right row with a NULL timestamp cannot be 'as of' anything —
    but the union+window encoding sorts nulls FIRST, where the
    last(ignorenulls) pick-up would hand its payload to every left row
    with no real predecessor (r10 review; DuckDB ASOF drops such rows)."""
    from pyspark.sql import Row

    left = spark.createDataFrame([Row(k="a", t=5, lv="L")])
    right = spark.createDataFrame(
        [Row(k="a", t=None, rv=666), Row(k="a", t=10, rv=100)],
        "k string, t long, rv long",
    )
    got = asof_join(
        left, right, on="k", left_ts="t", right_ts="t", right_cols={"rv": "rv"}
    ).collect()
    assert got[0].rv is None  # NOT 666 from the null-ts row
