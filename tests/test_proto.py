"""Pure-python protobuf codec + typed extraction: the reference's
telemetry/types_test schema shapes (FIXTURES.md §3-4), wire-format roundtrip
over every scalar type, NULL semantics, bind-error surface."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, types as T

from duckdb_nats_jetstream_spark.errors import BindError
from duckdb_nats_jetstream_spark.functions.proto import (
    decode_message,
    encode_message,
    parse_proto,
    proto_extract,
    validate_proto_path,
)

TELEMETRY_PROTO = """
syntax = "proto3";
message Telemetry {
  string device_id = 1;
  int64 timestamp = 2;
  Location location = 3;
  Metrics metrics = 4;
  bool online = 5;
  string firmware_version = 6;
}
message Location { string zone = 1; string rack = 2; string building = 3; }
message Metrics { double kw = 1; double pf = 2; double voltage = 3; }
"""

TYPES_PROTO = """
syntax = "proto3";
message AllTypes {
  string str_field = 1;
  bytes bytes_field = 2;
  int32 int32_field = 3;
  sint32 sint32_field = 4;
  sfixed32 sfixed32_field = 5;
  int64 int64_field = 6;
  sint64 sint64_field = 7;
  sfixed64 sfixed64_field = 8;
  uint32 uint32_field = 9;
  fixed32 fixed32_field = 10;
  uint64 uint64_field = 11;
  fixed64 fixed64_field = 12;
  float float_field = 13;
  double double_field = 14;
  bool bool_field = 15;
  Status status_field = 16;
}
enum Status { UNKNOWN = 0; ACTIVE = 1; INACTIVE = 2; }
"""


def test_parse_proto_structure():
    messages, enums = parse_proto(TELEMETRY_PROTO)
    assert "Telemetry" in messages and "Location" in messages
    assert messages["Telemetry"].fields["location"][1] == "Location"
    m2, e2 = parse_proto(TYPES_PROTO)
    assert e2["Status"] == {0: "UNKNOWN", 1: "ACTIVE", 2: "INACTIVE"}


ALL_VALUES = dict(
    str_field="hello",
    bytes_field=b"\x00\x01\xff",
    int32_field=-(2**31) + 1,
    sint32_field=-12345,
    sfixed32_field=-54321,
    int64_field=-(2**63) + 1,
    sint64_field=-(10**18),
    sfixed64_field=-(10**17),
    uint32_field=2**32 - 1,
    fixed32_field=2**32 - 1,
    uint64_field=2**63 - 1,  # documented narrowing boundary
    fixed64_field=2**62,
    float_field=1.5,
    double_field=-2.25e10,
    bool_field=True,
    status_field="ACTIVE",
)


def test_wire_roundtrip_all_types():
    messages, enums = parse_proto(TYPES_PROTO)
    desc = messages["AllTypes"]
    data = encode_message(ALL_VALUES, desc, messages, enums)
    out = decode_message(data, desc, messages, enums)
    assert out == ALL_VALUES


def test_nested_roundtrip_and_unset():
    messages, enums = parse_proto(TELEMETRY_PROTO)
    desc = messages["Telemetry"]
    v = dict(
        device_id="pm5560-001",
        timestamp=1700000000000,
        location=dict(zone="dc1", rack="A1", building="North"),
        metrics=dict(kw=5.25, pf=0.9, voltage=480.0),
        online=True,
        firmware_version="v2.1.0",
    )
    out = decode_message(encode_message(v, desc, messages, enums), messages["Telemetry"], messages, enums)
    assert out == v
    # unset nested message simply absent
    v2 = dict(device_id="pm5560-002", online=False)
    out2 = decode_message(encode_message(v2, desc, messages, enums), desc, messages, enums)
    assert "location" not in out2


def test_bind_errors():
    messages, enums = parse_proto(TELEMETRY_PROTO)
    with pytest.raises(BindError, match="not found in message"):
        validate_proto_path("location.altitude", messages["Telemetry"], messages, enums)
    with pytest.raises(BindError, match="non-message"):
        validate_proto_path("device_id.x", messages["Telemetry"], messages, enums)


def test_spark_proto_extract_typed(spark):
    messages, enums = parse_proto(TELEMETRY_PROTO)
    desc = messages["Telemetry"]
    rows = []
    for i, (zone, kw, online) in enumerate(
        [("dc1", 5.25, True), ("dc2", 4.75, False)], start=1
    ):
        payload = encode_message(
            dict(
                device_id=f"pm5560-00{i}",
                location=dict(zone=zone, rack="A1", building="North"),
                metrics=dict(kw=kw, pf=0.9, voltage=480.0),
                online=online,
            ),
            desc, messages, enums,
        )
        rows.append(Row(seq=i, payload=bytearray(payload)))
    rows.append(Row(seq=3, payload=bytearray(b"\xff\xff\xff garbage")))  # undecodable
    df = spark.createDataFrame(rows, schema="seq long, payload binary")
    out = proto_extract(
        df, TELEMETRY_PROTO, "Telemetry",
        ["device_id", "location.zone", "metrics.kw", "online"],
    )
    assert [f.name for f in out.schema.fields] == [
        "seq", "payload", "device_id", "location_zone", "metrics_kw", "online",
    ]
    assert isinstance(out.schema["metrics_kw"].dataType, T.DoubleType)
    assert isinstance(out.schema["online"].dataType, T.BooleanType)
    got = {r.seq: r for r in out.collect()}
    assert got[1].location_zone == "dc1" and got[1].metrics_kw == 5.25
    assert got[2].online is False
    assert (got[3].device_id, got[3].metrics_kw, got[3].online) == (None, None, None)


def test_spark_proto_enum_and_unset_nested(spark):
    messages, enums = parse_proto(TYPES_PROTO)
    desc = messages["AllTypes"]
    p = encode_message(dict(status_field="INACTIVE", int32_field=7), desc, messages, enums)
    df = spark.createDataFrame([Row(payload=bytearray(p))], schema="payload binary")
    out = proto_extract(df, TYPES_PROTO, "AllTypes", ["status_field", "int32_field", "str_field"]).collect()[0]
    assert out.status_field == "INACTIVE"  # enum NAME, not number
    assert out.int32_field == 7
    # reference reflection semantics: absent proto3 scalar reads its DEFAULT
    # (ref:src/nats_scan.cpp:456-544); NULL is reserved for unset parents
    assert out.str_field == ""

def test_unset_parent_null_vs_scalar_default(spark):
    messages, enums = parse_proto(TELEMETRY_PROTO)
    desc = messages["Telemetry"]
    p = encode_message(dict(device_id="d1"), desc, messages, enums)  # no location
    df = spark.createDataFrame([Row(payload=bytearray(p))], schema="payload binary")
    out = proto_extract(
        df, TELEMETRY_PROTO, "Telemetry", ["location.zone", "online", "timestamp"]
    ).collect()[0]
    assert out.location_zone is None       # unset parent message → NULL
    assert out.online is False             # absent scalar → default
    assert out.timestamp == 0


def test_output_name_collision_bind_error(spark):
    messages, enums = parse_proto(TELEMETRY_PROTO)
    p = encode_message(dict(device_id="d1"), messages["Telemetry"], messages, enums)
    df = spark.createDataFrame(
        [Row(device_id="x", payload=bytearray(p))], schema="device_id string, payload binary"
    )
    with pytest.raises(BindError, match="collide"):
        proto_extract(df, TELEMETRY_PROTO, "Telemetry", ["device_id"])


def test_unknown_message_bind_error(spark):
    df = spark.createDataFrame([Row(payload=bytearray(b""))], schema="payload binary")
    with pytest.raises(BindError, match="Message type"):
        proto_extract(df, TYPES_PROTO, "NoSuchMessage", ["x"])


# --- repeated / map / oneof (reference roadmap parity-plus,
# ref:docs/GUIDE.md:466-472 lists these as unimplemented) -----------------

REPEATED_PROTO = """
syntax = "proto3";
message Doc {
  string id = 1;
  repeated int64 vals = 2;
  repeated string tags = 3;
  repeated Point points = 4;
  map<string, int64> attrs = 5;
  repeated double scores = 6;
  oneof body {
    string text = 7;
    bytes blob = 8;
  }
}
message Point { sint32 x = 1; sint32 y = 2; }
"""


def test_parse_repeated_map_oneof():
    messages, enums = parse_proto(REPEATED_PROTO)
    doc = messages["Doc"]
    assert doc.fields["vals"] == (2, "int64", True)
    assert doc.fields["tags"] == (3, "string", True)
    # oneof members are plain fields of the enclosing message
    assert doc.fields["text"] == (7, "string", False)
    assert doc.fields["blob"] == (8, "bytes", False)
    # map synthesizes an entry descriptor
    entry_name = doc.fields["attrs"][1]
    assert messages[entry_name].map_kv == ("string", "int64")
    # Point survived the oneof block (stack stayed balanced)
    assert messages["Point"].fields["x"] == (1, "sint32", True) or messages[
        "Point"
    ].fields["x"] == (1, "sint32", False)
    assert messages["Point"].fields["x"][1] == "sint32"


def test_repeated_map_roundtrip():
    messages, enums = parse_proto(REPEATED_PROTO)
    desc = messages["Doc"]
    v = dict(
        id="d1",
        vals=[1, -2, 3_000_000_000],
        tags=["a", "b", ""],
        points=[dict(x=-1, y=2), dict(x=3, y=-4)],
        attrs={"k1": 10, "k2": -20},
        scores=[1.5, -2.25],
        text="hello",
    )
    out = decode_message(encode_message(v, desc, messages, enums), desc, messages, enums)
    assert out == v
    # empty containers serialize to nothing → absent on decode
    out2 = decode_message(
        encode_message(dict(id="d2", vals=[], attrs={}), desc, messages, enums),
        desc, messages, enums,
    )
    assert out2 == {"id": "d2"}


def test_unpacked_repeated_decode():
    # one tag per element (proto2 style / non-default proto3) must decode
    # identically to packed
    from duckdb_nats_jetstream_spark.functions.proto import _write_varint

    messages, enums = parse_proto(REPEATED_PROTO)
    desc = messages["Doc"]
    wire = b"".join(_write_varint(2 << 3) + _write_varint(n) for n in [7, 8, 9])
    assert decode_message(wire, desc, messages, enums) == {"vals": [7, 8, 9]}


def test_repeated_navigation_bind_errors():
    messages, enums = parse_proto(REPEATED_PROTO)
    desc = messages["Doc"]
    with pytest.raises(BindError, match="repeated"):
        validate_proto_path("points.x", desc, messages, enums)
    with pytest.raises(BindError, match="map"):
        validate_proto_path("attrs.k1", desc, messages, enums)
    with pytest.raises(BindError, match="repeated message"):
        validate_proto_path("points", desc, messages, enums)
    assert isinstance(
        validate_proto_path("vals", desc, messages, enums), T.ArrayType
    )
    mt = validate_proto_path("attrs", desc, messages, enums)
    assert isinstance(mt, T.MapType) and isinstance(mt.valueType, T.LongType)


def test_spark_proto_extract_repeated_and_map(spark):
    messages, enums = parse_proto(REPEATED_PROTO)
    desc = messages["Doc"]
    rows = [
        Row(seq=1, payload=bytearray(encode_message(
            dict(id="d1", vals=[1, 2, 3], tags=["x", "y"],
                 attrs={"u": 7}, text="t1"),
            desc, messages, enums,
        ))),
        Row(seq=2, payload=bytearray(encode_message(
            dict(id="d2"), desc, messages, enums,  # all containers absent
        ))),
    ]
    df = spark.createDataFrame(rows, schema="seq long, payload binary")
    out = proto_extract(df, REPEATED_PROTO, "Doc", ["id", "vals", "tags", "attrs", "text"])
    assert isinstance(out.schema["vals"].dataType, T.ArrayType)
    assert isinstance(out.schema["attrs"].dataType, T.MapType)
    got = {r.seq: r for r in out.collect()}
    assert got[1].vals == [1, 2, 3] and got[1].tags == ["x", "y"]
    assert got[1].attrs == {"u": 7} and got[1].text == "t1"
    # absent repeated/map → proto3 default (empty), absent oneof str → ""
    assert got[2].vals == [] and got[2].tags == [] and got[2].attrs == {}
    assert got[2].text == ""
