"""Typed extraction: dot-path navigation, bind-time path validation errors
(reference §2.A6/A7, test_protobuf.sql / test_protobuf_errors.sql ports), the
telemetry_proto fixture shape from FIXTURES.md."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F, types as T

from duckdb_nats_jetstream_spark.errors import BindError
from duckdb_nats_jetstream_spark.functions.typed_extract import (
    parse_json_payload,
    typed_extract,
    validate_path,
)

TELEMETRY_SCHEMA = T.StructType([
    T.StructField("device_id", T.StringType()),
    T.StructField("timestamp", T.LongType()),
    T.StructField("location", T.StructType([
        T.StructField("zone", T.StringType()),
        T.StructField("rack", T.StringType()),
        T.StructField("building", T.StringType()),
    ])),
    T.StructField("metrics", T.StructType([
        T.StructField("kw", T.DoubleType()),
        T.StructField("pf", T.DoubleType()),
        T.StructField("voltage", T.DoubleType()),
    ])),
    T.StructField("online", T.BooleanType()),
])


@pytest.fixture(scope="module")
def telemetry(spark):
    rows = [
        Row(seq=1, payload='{"device_id":"pm5560-001","timestamp":1700000000000,'
            '"location":{"zone":"dc1","rack":"A1","building":"North"},'
            '"metrics":{"kw":5.25,"pf":0.9,"voltage":480.0},"online":true}'),
        Row(seq=2, payload='{"device_id":"pm5560-002","timestamp":1700000010000,'
            '"metrics":{"kw":4.75,"pf":0.88,"voltage":478.5},"online":false}'),  # location unset
        Row(seq=3, payload='\x00\x01 not decodable'),  # undecodable
    ]
    return parse_json_payload(spark.createDataFrame(rows), TELEMETRY_SCHEMA)


def test_typed_columns_and_naming(spark, telemetry):
    df = typed_extract(telemetry, ["device_id", "location.zone", "metrics.kw"])
    assert df.columns == ["seq", "payload", "device_id", "location_zone", "metrics_kw"]
    assert isinstance(df.schema["metrics_kw"].dataType, T.DoubleType)
    row = {r.seq: r for r in df.collect()}
    assert row[1].location_zone == "dc1" and row[1].metrics_kw == 5.25


def test_unset_nested_message_is_null(spark, telemetry):
    df = typed_extract(telemetry, ["location.zone", "device_id"])
    row = {r.seq: r for r in df.collect()}
    assert row[2].location_zone is None and row[2].device_id == "pm5560-002"


def test_undecodable_payload_all_null(spark, telemetry):
    df = typed_extract(telemetry, ["device_id", "metrics.kw", "online"])
    row = {r.seq: r for r in df.collect()}
    assert (row[3].device_id, row[3].metrics_kw, row[3].online) == (None, None, None)


def test_unknown_field_bind_error():
    with pytest.raises(BindError, match="not found"):
        validate_path(TELEMETRY_SCHEMA, "location.altitude")


def test_navigate_through_scalar_bind_error():
    with pytest.raises(BindError, match="non-message"):
        validate_path(TELEMETRY_SCHEMA, "device_id.sub")


def test_aggregate_on_extracted(spark, telemetry):
    df = typed_extract(telemetry, ["metrics.kw", "online"])
    out = df.filter(F.col("online")).agg(F.avg("metrics_kw").alias("avg_kw")).collect()[0]
    assert out.avg_kw == 5.25
