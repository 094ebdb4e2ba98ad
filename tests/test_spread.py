"""`tables.spread()` contract (lived in `session.py` through r08) —
including the r08 fix for the non-file
blind spot (SCALING batch 15): a cached/localCheckpoint relation reports
zero `inputFiles()`, and before r08 it was round-robin re-shuffled even
when already well-partitioned (~1× data per codec stage; 2×460 MB
observed on binary media). The fix probes `rdd.getNumPartitions()` ONLY
on the n_files == 0 branch, so file relations keep their r07 plans
byte-for-byte (plan-hash-verified across the registry)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.tables import spread


def _target(spark) -> int:
    return spark.sparkContext.defaultParallelism


def test_spread_noop_on_well_partitioned_checkpoint(spark):
    """The batch-15 blind spot, fixed: a materialized input that already
    has >= target partitions must come back UNTOUCHED — no repartition,
    no re-shuffle of the (potentially binary-media) rows."""
    t = _target(spark)
    df = (
        spark.range(0, 4 * t)
        .repartition(t)
        .localCheckpoint(eager=True)
    )
    assert df.inputFiles() == []  # the blind spot's trigger condition
    out = spread(df)
    assert out is df, "well-partitioned checkpointed input was re-shuffled"


def test_spread_repartitions_underpartitioned_checkpoint(spark):
    """A genuinely narrow materialized input (1 partition) still gets the
    round-robin spread — the probe only SKIPS the shuffle when the
    parallelism is already there."""
    t = _target(spark)
    df = spark.range(0, 64).coalesce(1).localCheckpoint(eager=True)
    out = spread(df)
    assert out is not df
    assert out.rdd.getNumPartitions() == t


def test_spread_repartitions_few_file_scan(spark, sf_dir):
    """File relations never reach the probe: the sf0.001 fixtures are
    single-file parquet, so spread adds the round-robin exchange exactly
    as in r07 (registry plans unchanged by the fix)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert 0 < len(df.inputFiles()) < _target(spark)
    out = spread(df)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Repartition" in plan
    assert out.rdd.getNumPartitions() == _target(spark)


def test_spread_noop_on_many_file_scan(spark, tmp_path):
    """>= target files: the scan already parallelizes, no exchange."""
    t = _target(spark)
    path = str(tmp_path / "many")
    spark.range(0, 4 * t).repartition(t).write.parquet(path)
    df = spark.read.parquet(path)
    assert len(df.inputFiles()) >= t
    assert spread(df) is df
