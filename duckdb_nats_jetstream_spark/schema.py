"""Schemas and type maps.

Base message schema (ref:src/nats_scan.cpp:365-385; docs/GUIDE.md:112):
``stream, subject, seq, ts_nats, payload`` — computed at *bind* time from the
query parameters, never inferred from data. Payload is string when JSON
extraction is requested, binary otherwise (the v0.1.1 semantics,
ref:CHANGELOG.md:9-10, src/nats_scan.cpp:379-385).

Protobuf/typed-field → Spark type map (ref:src/nats_scan.cpp:130-166):
Spark has no unsigned integers, so uint32→long (lossless) and uint64→long
(documented narrowing; values > 2^63-1 out of scope).
"""

from __future__ import annotations

from pyspark.sql import types as T

BASE_FIELDS = [
    ("stream", T.StringType()),
    ("subject", T.StringType()),
    ("seq", T.LongType()),
    ("ts_nats", T.TimestampType()),
]


def message_schema(*, payload_binary: bool, extracted: list[tuple[str, T.DataType]] | None = None) -> T.StructType:
    """Output schema for a message scan, computed at plan time.

    ``payload_binary=False`` only in JSON-extraction mode
    (ref:src/nats_scan.cpp:379-385).
    """
    fields = [T.StructField(n, t, True) for n, t in BASE_FIELDS]
    payload_t: T.DataType = T.BinaryType() if payload_binary else T.StringType()
    fields.append(T.StructField("payload", payload_t, True))
    for name, dtype in extracted or []:
        fields.append(T.StructField(name, dtype, True))
    return T.StructType(fields)


# protobuf scalar type name → Spark type (ref:src/nats_scan.cpp:130-166)
PROTO_TO_SPARK: dict[str, T.DataType] = {
    "string": T.StringType(),
    "bytes": T.BinaryType(),
    "int32": T.IntegerType(),
    "sint32": T.IntegerType(),
    "sfixed32": T.IntegerType(),
    "int64": T.LongType(),
    "sint64": T.LongType(),
    "sfixed64": T.LongType(),
    "uint32": T.LongType(),  # no unsigned in Spark; lossless widening
    "fixed32": T.LongType(),
    "uint64": T.LongType(),  # documented narrowing for values > 2^63-1
    "fixed64": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "bool": T.BooleanType(),
    "enum": T.StringType(),  # enum *name*, not number (ref:src/nats_scan.cpp:530-533)
}
