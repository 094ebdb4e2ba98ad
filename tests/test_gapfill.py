"""Unit semantics of operators.gapfill.time_bucket_gapfill: density,
zero-fill, LOCF, interpolation values, and no-extrapolation edges.
(The oracle-checked scan_gapfill query covers the events-table integration.)"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.operators.gapfill import (
    _bucket_seconds,
    time_bucket_gapfill,
)


def _series(spark):
    # key A observed at hours 0 and 3 (values 10 and 40), key B at hours 2,3
    rows = [
        ("A", datetime(2024, 1, 1, 0, 15), 10.0),
        ("A", datetime(2024, 1, 1, 0, 45), 10.0),
        ("A", datetime(2024, 1, 1, 3, 30), 40.0),
        ("B", datetime(2024, 1, 1, 2, 10), 7.0),
        ("B", datetime(2024, 1, 1, 3, 10), 9.0),
    ]
    return spark.createDataFrame(rows, "k string, ts timestamp, v double")


def _fill(spark):
    df = _series(spark)
    out = time_bucket_gapfill(
        df, "ts", F.avg("v").alias("v"), keys=["k"], bucket_width="1 hour"
    )
    return {(r["k"], r["bucket"].hour): r for r in out.collect()}


def test_dense_spine_and_zero_fill(spark):
    got = _fill(spark)
    # global range is hours 0..3 for BOTH keys: 8 rows
    assert len(got) == 8
    assert got[("A", 1)]["n"] == 0 and got[("A", 1)]["v"] is None
    assert got[("A", 0)]["n"] == 2  # two observations in hour 0


def test_locf_carries_last_observation(spark):
    got = _fill(spark)
    assert got[("A", 1)]["v_locf"] == 10.0
    assert got[("A", 2)]["v_locf"] == 10.0
    assert got[("A", 3)]["v_locf"] == 40.0
    # B has no observation before hour 2: nothing to carry
    assert got[("B", 0)]["v_locf"] is None
    assert got[("B", 1)]["v_locf"] is None


def test_linear_interpolation_between_brackets(spark):
    got = _fill(spark)
    # A: 10 @h0 → 40 @h3; interp = 10 + 30 * (eb-0)/3
    assert got[("A", 1)]["v_interp"] == 10.0 + 30.0 * (1.0 / 3.0)
    assert got[("A", 2)]["v_interp"] == 10.0 + 30.0 * (2.0 / 3.0)
    # observed buckets pass through unchanged
    assert got[("A", 0)]["v_interp"] == 10.0
    assert got[("A", 3)]["v_interp"] == 40.0


def test_no_extrapolation_outside_observed_range(spark):
    got = _fill(spark)
    # B before its first observation: no bracketing pair → NULL
    assert got[("B", 0)]["v_interp"] is None
    assert got[("B", 1)]["v_interp"] is None


def test_bucket_width_parsing(spark):
    assert _bucket_seconds("1 hour") == 3600
    assert _bucket_seconds("15 minutes") == 900
    assert _bucket_seconds("day") == 86400
    with pytest.raises(ValueError):
        _bucket_seconds("2 fortnights")
    with pytest.raises(ValueError):
        _bucket_seconds("1 2 3")


def test_null_key_series_survives_with_real_values(spark):
    """A NULL-key series is a series like any other: the spine join is
    null-safe, so its observed aggregates must appear — not a phantom
    all-zero dense series (r10 review sweep)."""
    rows = [
        (None, datetime(2024, 1, 1, 0, 15), 5.0),
        (None, datetime(2024, 1, 1, 2, 15), 15.0),
        ("A", datetime(2024, 1, 1, 1, 30), 10.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = time_bucket_gapfill(
        df, "ts", F.avg("v").alias("v"), keys=["k"], bucket_width="1 hour"
    )
    got = {(r["k"], r["bucket"].hour): r for r in out.collect()}
    assert len(got) == 6  # 2 keys x hours 0..2
    assert got[(None, 0)]["n"] == 1 and got[(None, 0)]["v"] == 5.0
    assert got[(None, 2)]["n"] == 1 and got[(None, 2)]["v"] == 15.0
    assert got[(None, 1)]["n"] == 0 and got[(None, 1)]["v_interp"] == 10.0


def test_null_timestamps_are_dropped_not_phantomed(spark):
    rows = [
        ("A", datetime(2024, 1, 1, 0, 15), 5.0),
        ("A", None, 99.0),  # no bucket: must not crash, must not count
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = time_bucket_gapfill(
        df, "ts", F.avg("v").alias("v"), keys=["k"], bucket_width="1 hour"
    ).collect()
    assert len(out) == 1
    assert out[0]["n"] == 1 and out[0]["v"] == 5.0


def test_nonpositive_bucket_width_rejected():
    for bad in ("0 hours", "-1 hour"):
        with pytest.raises(ValueError, match="positive"):
            _bucket_seconds(bad)
