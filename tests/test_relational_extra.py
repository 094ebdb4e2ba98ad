"""Remaining §2.B surface: parquet sink roundtrip (the reference's COPY TO,
docs/EXAMPLES.md:225-233), approximate aggregates, schema introspection (the
``typeof`` analogue — engine-level, per SURVEY §2.B note)."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from duckdb_nats_jetstream_spark.sources import message_scan


def test_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    out = str(tmp_path / "export.parquet")
    df = message_scan(spark, sf_dir, json_fields=["k"]).select(
        "seq", "subject", "ts_nats", "k"
    )
    df.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_approx_count_distinct_tolerance(spark, sf_dir):
    df = message_scan(spark, sf_dir)
    row = df.agg(
        F.countDistinct("subject").alias("exact"),
        F.approx_count_distinct("subject", 0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) <= max(2, 0.05 * row.exact)


def test_schema_introspection_typeof_analogue(spark, sf_dir):
    # the reference tests `typeof(payload)` switching BLOB/VARCHAR
    # (test_payload_blob.sql); in Spark, payload type is a plan-time fact
    blob_mode = message_scan(spark, sf_dir)
    str_mode = message_scan(spark, sf_dir, json_fields=["k"])
    assert isinstance(blob_mode.schema["payload"].dataType, T.BinaryType)
    assert isinstance(str_mode.schema["payload"].dataType, T.StringType)
    assert dict(zip(str_mode.columns, (f.dataType.simpleString() for f in str_mode.schema)))[
        "seq"
    ] == "bigint"
