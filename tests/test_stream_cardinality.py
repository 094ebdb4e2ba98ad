"""Streaming windowed HLL: a closed streaming window's register table must
equal the batch build bit-for-bit, and the grouped estimator must read it."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.operators.hll import hll_estimate
from duckdb_nats_jetstream_spark.sources import message_scan
from duckdb_nats_jetstream_spark.streaming.cardinality import (
    batch_windowed_hll_registers,
    windowed_hll_registers,
)
from duckdb_nats_jetstream_spark.streaming.stream_scan import (
    message_stream,
    run_to_completion,
)


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("hll_log")
    shutil.copy(f"{sf_dir}/events.parquet", d / "part-000.parquet")
    return str(d)


def test_streaming_registers_match_batch(spark, sf_dir, log_dir, tmp_path):
    stream = message_stream(spark, log_dir)
    agg = windowed_hll_registers(stream, window="6 hours", watermark="1 hour")
    got = run_to_completion(agg, str(tmp_path / "ckpt_hll")).collect()
    assert got, "streaming HLL produced no rows"
    batch = message_scan(spark, sf_dir, payload_binary=False)
    want = batch_windowed_hll_registers(batch, window="6 hours").collect()
    got_set = {tuple(r) for r in got}
    want_set = {tuple(r) for r in want}
    # append mode emits a window only when the watermark passes it; the
    # stream's FINAL window stays open when the source drains (no later
    # event advances the watermark past it), so it legitimately has no
    # append-mode row. Every closed window must match the batch build
    # bit-for-bit, and the only batch-extra rows must be that open tail.
    assert got_set <= want_set
    open_tail = max(r.window_start for r in want)
    extras = {t for t in want_set - got_set}
    assert extras and all(t[0] == open_tail for t in extras)
    closed_want = {t for t in want_set if t[0] != open_tail}
    assert got_set == closed_want


def test_windowed_estimates_audit_against_exact(spark, sf_dir):
    """Per-window raw estimates from the register table vs the exact
    windowed COUNT(DISTINCT): dense windows stay inside a generous band;
    sparse windows are reported with their n_zero (the linear-counting
    regime, deliberately not estimated — see operators/hll.py)."""
    batch = message_scan(spark, sf_dir, payload_binary=False)
    regs = batch_windowed_hll_registers(batch, window="6 hours")
    est = hll_estimate(regs, "window_start").collect()
    exact = {
        r.window_start: r.n
        for r in batch.groupBy(
            F.window("ts_nats", "6 hours").alias("win")
        )
        .agg(F.countDistinct("subject").alias("n"))
        .select(F.col("win.start").alias("window_start"), "n")
        .collect()
    }
    assert est and len(est) == len(exact)
    for row in est:
        n = exact[row.window_start]
        if n > 2.5 * row.m:  # dense regime: the HLL guarantee applies
            assert abs(row.raw_estimate - n) / n < 4 * 1.04 / (row.m ** 0.5)
        else:  # sparse: raw HLL overestimates by design; occupancy is sane
            assert row.n_present <= min(n, row.m)


def test_state_is_bounded_per_window(spark, sf_dir):
    """The whole point: a window's register relation never exceeds m rows,
    however many values the window saw."""
    batch = message_scan(spark, sf_dir, payload_binary=False)
    per_win = (
        batch_windowed_hll_registers(batch, window="6 hours")
        .groupBy("window_start")
        .count()
        .collect()
    )
    assert per_win and all(r["count"] <= 256 for r in per_win)
