"""Misra–Gries streaming heavy hitters: the sketch's guarantees must hold
against the exact batch counts on the same log — presence of every true
heavy hitter, and per-counter error ≤ n_part/(k+1)."""

from __future__ import annotations

import shutil
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.streaming.heavyhitters import (
    _mg_merge,
    streaming_heavy_hitters,
)
from duckdb_nats_jetstream_spark.streaming.stream_scan import message_stream

K, N_PARTS = 8, 4


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("hh_log")
    shutil.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    return str(d)


def test_mg_merge_unit_equivalence():
    """Batched merge == unit inserts (same counters after mixed workload)."""
    batched: dict = {}
    unit: dict = {}
    workload = [("a", 5), ("b", 3), ("c", 1), ("d", 2), ("a", 2), ("e", 1)]
    for t, c in workload:
        _mg_merge(batched, t, c, 3)
        for _ in range(c):
            _mg_merge(unit, t, 1, 3)
    assert batched == unit


def test_streaming_heavy_hitters_bounds(spark, sf_dir, log_dir, tmp_path):
    stream = message_stream(spark, log_dir)
    out = streaming_heavy_hitters(stream, token_col="subject", k=K, n_parts=N_PARTS)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        # latest snapshot per partition = the one with the largest n_seen
        """
        SELECT part, token, mg_count, n_seen FROM (
          SELECT *, max(n_seen) OVER (PARTITION BY part) AS mx FROM hh_out
        ) WHERE n_seen = mx
        """
    ).collect()
    assert rows

    from duckdb_nats_jetstream_spark.sources.message_scan import message_scan

    batch = message_scan(spark, sf_dir)  # same log; subject derived like the stream
    exact = {
        r.subject: r.cnt
        for r in batch.groupBy("subject").agg(F.count("*").alias("cnt")).collect()
    }
    part_of = {
        r.subject: r.part
        for r in batch.select(
            "subject",
            F.pmod(F.xxhash64("subject"), F.lit(N_PARTS)).cast("int").alias("part"),
        )
        .distinct()
        .collect()
    }
    n_part: dict = defaultdict(int)
    for s, c in exact.items():
        n_part[part_of[s]] += c

    kept = {(r.part, r.token): r.mg_count for r in rows}
    n_seen_of = {r.part: r.n_seen for r in rows}
    # per-partition n_seen matches the exact total
    for p, n in n_seen_of.items():
        assert n == n_part[p]
    for s, c in exact.items():
        p = part_of[s]
        err = n_part[p] / (K + 1)
        if c > err:  # true heavy hitter must be present
            assert (p, s) in kept, f"heavy hitter {s} (count {c}) missing"
        if (p, s) in kept:  # kept counters never overestimate, bounded under
            assert c - err <= kept[(p, s)] <= c


def test_streaming_heavy_hitters_multibatch_state(spark, sf_dir, tmp_path):
    """The array-typed GroupState must round-trip across micro-batches:
    split the log into two files, one file per trigger, and the final
    snapshots must equal the single-batch run's."""
    d = tmp_path / "hh_log2"
    d.mkdir()
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.filter("event_id % 2 = 0").coalesce(1).write.parquet(str(d / "p0"))
    events.filter("event_id % 2 = 1").coalesce(1).write.parquet(str(d / "p1"))
    import glob
    import shutil

    import os
    import time

    for i, part in enumerate(sorted(glob.glob(f"{d}/p*/part-*.parquet"))):
        dst = d / f"{i}.parquet"
        shutil.copy(part, dst)
        os.utime(dst, (time.time() - 100 + i, time.time() - 100 + i))
    shutil.rmtree(d / "p0")
    shutil.rmtree(d / "p1")

    stream = message_stream(spark, str(d), max_files_per_trigger=1)
    out = streaming_heavy_hitters(stream, token_col="subject", k=K, n_parts=N_PARTS)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_mb_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql(
        """
        SELECT part, token, mg_count, n_seen FROM (
          SELECT *, max(n_seen) OVER (PARTITION BY part) AS mx FROM hh_mb_out
        ) WHERE n_seen = mx
        """
    ).collect()
    # more than one snapshot generation proves multiple batches ran
    n_gens = spark.sql(
        "SELECT count(DISTINCT n_seen) c FROM hh_mb_out"
    ).collect()[0].c
    assert n_gens > 1, "expected multiple micro-batches"
    # n_seen must equal the full exact totals per partition
    from duckdb_nats_jetstream_spark.sources.message_scan import message_scan

    batch = message_scan(spark, sf_dir)
    exact_n = {
        r.part: r.n
        for r in batch.select(
            F.pmod(F.xxhash64("subject"), F.lit(N_PARTS)).cast("int").alias("part")
        )
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got_n = {r.part: r.n_seen for r in rows}
    assert got_n == exact_n
