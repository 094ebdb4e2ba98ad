"""Protocol Buffers payload extraction without external libraries.

The reference parses .proto schema text at bind time (runtime parsing, no
codegen — ref:src/nats_scan.cpp:287-363), then reflection-decodes each
message and walks dot paths to typed values (ref:src/nats_scan.cpp:456-544).
The usual Spark route is ``from_protobuf`` + a compiled descriptor set, but
neither spark-protobuf nor protoc is bundled here — so this module implements
the same capability with zero dependencies:

- a minimal .proto parser for the subset the reference supports: proto3
  messages, all 15 scalar wire types, nested messages, enums
  (ref:test/proto/telemetry.proto, test/proto/types_test.proto);
- a proto wire-format decoder (varint / zigzag / fixed32 / fixed64 /
  length-delimited) and encoder (for tests and roundtrips);
- ``proto_extract``: bind-time path validation with the reference's error
  surface (unknown message, unknown field, navigating through a scalar —
  ref:src/nats_scan.cpp:316-362), typed output columns named with
  dots→underscores, Arrow-batched decode via mapInPandas.

Semantics preserved: enum columns carry the enum *name* (ref:src/nats_scan.
cpp:530-533); unset nested message → NULL (ref:487-499); undecodable payload
→ all-NULL row (ref:852-858); uint64 narrows to long (documented).
"""

from __future__ import annotations

import re
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, types as T

from duckdb_nats_jetstream_spark.errors import BindError
from duckdb_nats_jetstream_spark.schema import PROTO_TO_SPARK

SCALARS = set(PROTO_TO_SPARK) - {"enum"}

_TOKEN = re.compile(
    r"message\s+(\w+)\s*\{|enum\s+(\w+)\s*\{|\}|"
    r"(repeated\s+|optional\s+|required\s+)?(\w[\w.]*)\s+(\w+)\s*=\s*(\d+)\s*(?:\[[^\]]*\])?\s*;|"
    r"(\w+)\s*=\s*(\d+)\s*;"
)


class Descriptor:
    """One message type: fields by name and number."""

    def __init__(self, name: str):
        self.name = name
        self.fields: dict[str, tuple[int, str, bool]] = {}  # name -> (number, type, repeated)
        self.by_number: dict[int, tuple[str, str, bool]] = {}

    def add(self, fname: str, number: int, ftype: str, repeated: bool):
        self.fields[fname] = (number, ftype, repeated)
        self.by_number[number] = (fname, ftype, repeated)


def parse_proto(text: str) -> tuple[dict[str, Descriptor], dict[str, dict[int, str]]]:
    """Parse .proto text → ({message name: Descriptor}, {enum name: {num: name}}).

    Nested message/enum names are visible both bare and dotted
    (``Outer.Inner``), matching protobuf name resolution closely enough for
    the reference's schemas. Comments are stripped first."""
    text = re.sub(r"//[^\n]*", "", text)
    text = re.sub(r"/\*.*?\*/", "", text, flags=re.S)
    messages: dict[str, Descriptor] = {}
    enums: dict[str, dict[int, str]] = {}
    stack: list[tuple[str, object]] = []  # ("message", Descriptor) | ("enum", dict)
    for m in _TOKEN.finditer(text):
        if m.group(1):  # message X {
            name = m.group(1)
            full = ".".join(
                [n for k, d in stack if k == "message" for n in [d.name.split(".")[-1]]]
                + [name]
            )
            d = Descriptor(full)
            messages[full] = d
            messages.setdefault(name, d)
            stack.append(("message", d))
        elif m.group(2):  # enum X {
            name = m.group(2)
            e: dict[int, str] = {}
            enums[name] = e
            stack.append(("enum", e))
        elif m.group(0) == "}":
            if stack:
                stack.pop()
        elif m.group(5):  # field
            if not stack or stack[-1][0] != "message":
                continue
            repeated = bool(m.group(3) and "repeated" in m.group(3))
            ftype, fname, num = m.group(4), m.group(5), int(m.group(6))
            stack[-1][1].add(fname, num, ftype, repeated)
        elif m.group(7):  # enum value
            if stack and stack[-1][0] == "enum":
                stack[-1][1][int(m.group(8))] = m.group(7)
    return messages, enums


# --- wire format --------------------------------------------------------------


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("truncated varint")
        b = data[pos]
        result |= (b & 0x7F) << shift
        pos += 1
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _zigzag_decode(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _to_signed(v: int, bits: int) -> int:
    if v >= 1 << (bits - 1):
        v -= 1 << bits
    return v


def decode_message(
    data: bytes,
    desc: Descriptor,
    messages: dict[str, Descriptor],
    enums: dict[str, dict[int, str]],
) -> dict:
    """Wire decode → python dict (enum → name string; nested → dict;
    unknown field numbers skipped; raises ValueError on malformed input)."""
    out: dict = {}
    pos = 0
    while pos < len(data):
        tag, pos = _read_varint(data, pos)
        fnum, wire = tag >> 3, tag & 7
        field = desc.by_number.get(fnum)
        if wire == 0:
            raw, pos = _read_varint(data, pos)
            if field:
                # wire-type/declared-type mismatches are skipped as unknown
                # fields (assigning through the wire type would corrupt the
                # typed output — found by hypothesis)
                name, ftype, _rep = field
                if ftype == "bool":
                    out[name] = bool(raw)
                elif ftype in ("sint32", "sint64"):
                    out[name] = _zigzag_decode(raw)
                elif ftype in ("int32", "int64"):
                    out[name] = _to_signed(raw, 64)
                elif ftype in ("uint32", "uint64"):
                    out[name] = raw  # uint64 > 2^63-1 out of scope (long narrow)
                elif ftype in enums:
                    out[name] = enums[ftype].get(raw)
        elif wire == 1:
            if pos + 8 > len(data):
                raise ValueError("truncated fixed64")
            chunk = data[pos : pos + 8]
            pos += 8
            if field:
                name, ftype, _rep = field
                if ftype == "double":
                    out[name] = struct.unpack("<d", chunk)[0]
                elif ftype == "sfixed64":
                    out[name] = _to_signed(int.from_bytes(chunk, "little"), 64)
                elif ftype == "fixed64":
                    out[name] = int.from_bytes(chunk, "little")
        elif wire == 2:
            ln, pos = _read_varint(data, pos)
            if pos + ln > len(data):
                raise ValueError("truncated length-delimited")
            chunk = data[pos : pos + ln]
            pos += ln
            if field:
                name, ftype, _rep = field
                if ftype == "string":
                    out[name] = chunk.decode("utf-8")
                elif ftype == "bytes":
                    out[name] = chunk
                elif ftype in messages:
                    out[name] = decode_message(chunk, messages[ftype], messages, enums)
        elif wire == 5:
            if pos + 4 > len(data):
                raise ValueError("truncated fixed32")
            chunk = data[pos : pos + 4]
            pos += 4
            if field:
                name, ftype, _rep = field
                if ftype == "float":
                    out[name] = struct.unpack("<f", chunk)[0]
                elif ftype == "sfixed32":
                    out[name] = _to_signed(int.from_bytes(chunk, "little"), 32)
                elif ftype == "fixed32":
                    out[name] = int.from_bytes(chunk, "little")
        else:
            raise ValueError(f"unsupported wire type {wire}")
    return out


def _write_varint(v: int) -> bytes:
    if v < 0:
        v += 1 << 64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def encode_message(
    values: dict,
    desc: Descriptor,
    messages: dict[str, Descriptor],
    enums: dict[str, dict[int, str]],
) -> bytes:
    """Deterministic encoder (fields in number order) — for tests/roundtrips."""
    out = bytearray()
    for num in sorted(desc.by_number):
        name, ftype, _rep = desc.by_number[num]
        if name not in values or values[name] is None:
            continue
        v = values[name]
        if ftype in ("int32", "int64", "uint32", "uint64", "bool"):
            out += _write_varint(num << 3) + _write_varint(int(v))
        elif ftype in ("sint32", "sint64"):
            out += _write_varint(num << 3) + _write_varint((int(v) << 1) ^ (int(v) >> 63))
        elif ftype in ("fixed64", "sfixed64"):
            out += _write_varint((num << 3) | 1) + int(v).to_bytes(8, "little", signed=v < 0)
        elif ftype == "double":
            out += _write_varint((num << 3) | 1) + struct.pack("<d", float(v))
        elif ftype == "string":
            b = str(v).encode("utf-8")
            out += _write_varint((num << 3) | 2) + _write_varint(len(b)) + b
        elif ftype == "bytes":
            out += _write_varint((num << 3) | 2) + _write_varint(len(v)) + bytes(v)
        elif ftype in ("fixed32", "sfixed32"):
            out += _write_varint((num << 3) | 5) + int(v).to_bytes(4, "little", signed=v < 0)
        elif ftype == "float":
            out += _write_varint((num << 3) | 5) + struct.pack("<f", float(v))
        elif ftype in messages:
            b = encode_message(v, messages[ftype], messages, enums)
            out += _write_varint((num << 3) | 2) + _write_varint(len(b)) + b
        elif ftype in enums:
            rev = {n: k for k, n in enums[ftype].items()}
            out += _write_varint(num << 3) + _write_varint(rev[v])
        else:
            raise BindError(f"cannot encode field type {ftype}")
    return bytes(out)


# --- bind-time schema / validation --------------------------------------------


def _proto3_default(
    ftype: str,
    messages: dict[str, Descriptor],
    enums: dict[str, dict[int, str]],
):
    """proto3 default for an absent scalar (what reference reflection reads,
    ref:src/nats_scan.cpp:456-544). Messages default to None."""
    if ftype == "string":
        return ""
    if ftype == "bytes":
        return b""
    if ftype == "bool":
        return False
    if ftype in ("float", "double"):
        return 0.0
    if ftype in enums:
        return enums[ftype].get(0)
    if ftype in messages:
        return None
    return 0  # all integer types


def _leaf_spark_type(
    ftype: str, enums: dict[str, dict[int, str]]
) -> T.DataType | None:
    if ftype in SCALARS:
        return PROTO_TO_SPARK[ftype]
    if ftype in enums:
        return PROTO_TO_SPARK["enum"]
    return None


def validate_proto_path(
    path: str,
    msg: Descriptor,
    messages: dict[str, Descriptor],
    enums: dict[str, dict[int, str]],
) -> T.DataType:
    """Walk a dot path through nested message descriptors; return the Spark
    type. Errors mirror ref:src/nats_scan.cpp:330-362."""
    parts = path.split(".")
    cur = msg
    for i, part in enumerate(parts):
        if part not in cur.fields:
            raise BindError(
                f"Field '{part}' not found in message '{cur.name}' (path '{path}')"
            )
        _num, ftype, _rep = cur.fields[part]
        last = i == len(parts) - 1
        if last:
            t = _leaf_spark_type(ftype, enums)
            if t is None:
                # terminal nested message → reference maps to VARCHAR w/ NULL
                # values (ref:src/nats_scan.cpp:159-161,534-536)
                return T.StringType()
            return t
        if ftype not in messages:
            raise BindError(
                f"Cannot navigate through non-message field '{part}' "
                f"(type {ftype}) in path '{path}'"
            )
        cur = messages[ftype]
    raise BindError(f"empty path '{path}'")


def proto_extract(
    df: DataFrame,
    proto_text: str,
    message_name: str,
    paths: list[str],
    payload_col: str = "payload",
) -> DataFrame:
    """Append one natively-typed column per dot path (dots→underscores),
    decoded from a protobuf payload column. Bind-time schema: validated
    against the .proto before any job is submitted."""
    if not paths:
        raise BindError("proto_extract requires at least one field path")
    messages, enums = parse_proto(proto_text)
    if message_name not in messages:
        raise BindError(f"Message type '{message_name}' not found in proto schema")
    desc = messages[message_name]
    types = [validate_proto_path(p, desc, messages, enums) for p in paths]
    out_names = [p.replace(".", "_") for p in paths]
    clash = set(out_names) & set(df.columns)
    if clash:
        raise BindError(
            f"proto_extract output column(s) {sorted(clash)} collide with "
            f"existing columns; rename or drop them before extraction"
        )

    in_fields = df.schema.fields
    out_schema = T.StructType(
        list(in_fields) + [T.StructField(n, t, True) for n, t in zip(out_names, types)]
    )

    # Reference reflection semantics (ref:src/nats_scan.cpp:456-544): an
    # absent *scalar* reads as its proto3 default; NULL only when an
    # ancestor nested message is unset (ref:487-499) or the leaf is itself a
    # message (ref:534-536). Precompute each path's leaf default.
    defaults = []
    for p in paths:
        cur = desc
        dval = None
        for i, part in enumerate(p.split(".")):
            _num, ftype, _rep = cur.fields[part]
            if i == len(p.split(".")) - 1:
                dval = _proto3_default(ftype, messages, enums)
            else:
                cur = messages[ftype]
        defaults.append(dval)

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        def extract(payload):
            if payload is None:
                return [None] * len(paths)
            try:
                msg = decode_message(bytes(payload), desc, messages, enums)
            except (ValueError, UnicodeDecodeError):
                return [None] * len(paths)  # undecodable → all-NULL
            row = []
            for p, dval in zip(paths, defaults):
                node = msg
                unset_parent = False
                parts = p.split(".")
                for part in parts[:-1]:
                    node = node.get(part) if isinstance(node, dict) else None
                    if node is None:
                        unset_parent = True
                        break
                if unset_parent:
                    row.append(None)
                    continue
                leaf = node.get(parts[-1]) if isinstance(node, dict) else None
                if isinstance(leaf, dict):
                    row.append(None)  # terminal message → NULL
                else:
                    row.append(dval if leaf is None else leaf)
            return row

        for pdf in it:
            extracted = [extract(v) for v in pdf[payload_col]]
            for i, name in enumerate(out_names):
                pdf[name] = [r[i] for r in extracted]
            yield pdf

    return df.mapInPandas(batches, out_schema)
