"""Property-based hardening (hypothesis): the proto wire codec must roundtrip
arbitrary values; decode must never crash on arbitrary bytes; text metrics
hold their invariants. Pure-python properties — no SparkSession needed, so
hundreds of examples run in seconds."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from duckdb_nats_jetstream_spark.functions.proto import (
    decode_message,
    encode_message,
    parse_proto,
)
from tests.test_proto import TYPES_PROTO

MESSAGES, ENUMS = parse_proto(TYPES_PROTO)
DESC = MESSAGES["AllTypes"]

value_strategy = st.fixed_dictionaries(
    {},
    optional={
        "str_field": st.text(max_size=200),
        "bytes_field": st.binary(max_size=200),
        "int32_field": st.integers(-(2**31), 2**31 - 1),
        "sint32_field": st.integers(-(2**31), 2**31 - 1),
        "sfixed32_field": st.integers(-(2**31), 2**31 - 1),
        "int64_field": st.integers(-(2**63), 2**63 - 1),
        "sint64_field": st.integers(-(2**62), 2**62 - 1),
        "sfixed64_field": st.integers(-(2**63), 2**63 - 1),
        "uint32_field": st.integers(0, 2**32 - 1),
        "fixed32_field": st.integers(0, 2**32 - 1),
        "uint64_field": st.integers(0, 2**63 - 1),  # long-narrowed domain
        "fixed64_field": st.integers(0, 2**63 - 1),
        "double_field": st.floats(allow_nan=False),
        "bool_field": st.booleans(),
        "status_field": st.sampled_from(["UNKNOWN", "ACTIVE", "INACTIVE"]),
    },
)


@settings(max_examples=300, deadline=None)
@given(value_strategy)
def test_proto_roundtrip_arbitrary_values(values):
    data = encode_message(values, DESC, MESSAGES, ENUMS)
    out = decode_message(data, DESC, MESSAGES, ENUMS)
    assert out == values


@settings(max_examples=150, deadline=None)
@given(st.floats(width=32, allow_nan=True))
def test_proto_float_field_roundtrip(f):
    data = encode_message({"float_field": f}, DESC, MESSAGES, ENUMS)
    out = decode_message(data, DESC, MESSAGES, ENUMS)
    got = out["float_field"]
    assert (math.isnan(got) and math.isnan(f)) or got == f


@settings(max_examples=500, deadline=None)
@given(st.binary(max_size=300))
def test_proto_decode_never_crashes(data):
    """Arbitrary bytes either decode or raise ValueError — nothing else."""
    try:
        decode_message(data, DESC, MESSAGES, ENUMS)
    except ValueError:
        pass


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=120))
def test_proto_decode_prefix_stability(data):
    """A valid encoding with trailing garbage either fails cleanly or parses
    the valid prefix — never wrong-typed values."""
    base = encode_message({"int32_field": 7, "str_field": "x"}, DESC, MESSAGES, ENUMS)
    try:
        out = decode_message(base + data, DESC, MESSAGES, ENUMS)
    except ValueError:
        return
    assert isinstance(out.get("int32_field", 0), int)
    assert isinstance(out.get("str_field", ""), str)
