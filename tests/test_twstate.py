"""transformWithStateInPandas running totals must equal the batch groupBy
on the same log (cumulative state == full-log aggregate once drained)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from duckdb_nats_jetstream_spark.streaming.stream_scan import message_stream
from duckdb_nats_jetstream_spark.streaming import twstate
from duckdb_nats_jetstream_spark.streaming.twstate import (
    streaming_subject_totals,
    with_rocksdb_state,
)

needs_protobuf = pytest.mark.skipif(
    not twstate.is_available(),
    reason="transformWithState needs the protobuf python package "
    "(not installed in this container)",
)


@pytest.fixture(scope="module")
def log_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("tws_log")
    shutil.copy(f"{sf_dir}/events.parquet", d / "a.parquet")
    return str(d)


def test_plan_builds_and_schema_is_declared(spark, log_dir):
    # plan construction is JVM-side and independent of the protobuf wire
    # protocol the execution path needs — it must work everywhere
    out = streaming_subject_totals(message_stream(spark, log_dir))
    assert out.isStreaming
    assert (
        out.schema.simpleString()
        == "struct<subject:string,n_msgs:bigint,n_bytes:bigint>"
    )


@needs_protobuf
def test_running_totals_match_batch(spark, sf_dir, log_dir, tmp_path):
    prev = with_rocksdb_state(spark)
    try:
        totals = streaming_subject_totals(message_stream(spark, log_dir))
        q = (
            totals.writeStream.format("memory")
            .queryName("tws_out")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # update mode re-emits a subject's row each microbatch: the final
        # (cumulative) value per subject is the full-log total
        got = {
            r.subject: (r.n_msgs, r.n_bytes)
            for r in spark.sql(
                """SELECT subject, n_msgs, n_bytes FROM (
                     SELECT *, row_number() OVER (
                       PARTITION BY subject ORDER BY n_msgs DESC) rn FROM tws_out)
                   WHERE rn = 1"""
            ).collect()
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)

    from duckdb_nats_jetstream_spark.sources import message_scan

    batch = {
        r.subject: (r.n_msgs, r.n_bytes)
        for r in message_scan(spark, sf_dir)
        .groupBy("subject")
        .agg(
            F.count("*").alias("n_msgs"),
            F.sum(F.length("payload").cast("long")).alias("n_bytes"),
        )
        .collect()
    }
    assert got == batch
