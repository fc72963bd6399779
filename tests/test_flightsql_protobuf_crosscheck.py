"""Cross-implementation check of the FlightSQL codec against the
OFFICIAL protobuf runtime — skip-gated: `google.protobuf` is not in
this container (verified round 6), so the test documents the residual
and runs automatically the moment the library appears. Descriptors are
built dynamically from the same field tables the codec uses
(`flightsql_proto.MESSAGES`), so no .proto compiler is needed.

For every golden fixture and a battery of synthetic values:
- bytes from the official serializer must decode to the same values
  through our codec (wire compatibility in);
- bytes from our encoder must parse identically under the official
  runtime (wire compatibility out);
- both canonical serializations must be byte-identical (both emit
  fields in ascending field-number order).
"""

from __future__ import annotations

import pytest

protobuf = pytest.importorskip("google.protobuf")

from kamu_cli_spark.api.flightsql_proto import (  # noqa: E402
    MESSAGES,
    decode_message,
    encode_message,
)
from tests.fixtures.flightsql_golden import GOLDEN  # noqa: E402


def _build_factory():
    from google.protobuf import descriptor_pb2, message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "flightsql_crosscheck.proto"
    fdp.package = "arrow.flight.protocol.sql"
    fdp.syntax = "proto3"
    T = descriptor_pb2.FieldDescriptorProto
    kinds = {
        "string": (T.TYPE_STRING, T.LABEL_OPTIONAL),
        "bytes": (T.TYPE_BYTES, T.LABEL_OPTIONAL),
        "bool": (T.TYPE_BOOL, T.LABEL_OPTIONAL),
        "repeated_string": (T.TYPE_STRING, T.LABEL_REPEATED),
    }
    for msg_name, fields in MESSAGES.items():
        m = fdp.message_type.add()
        m.name = msg_name
        for num, (fname, kind) in sorted(fields.items()):
            f = m.field.add()
            f.name = fname
            f.number = num
            f.type, f.label = kinds[kind]
    try:
        pool = None
        from google.protobuf import descriptor_pool

        pool = descriptor_pool.DescriptorPool()
        fd = pool.Add(fdp)
        return {
            name: message_factory.GetMessageClass(
                fd.message_types_by_name[name]
            )
            for name in MESSAGES
        }
    except Exception as e:  # pragma: no cover - runtime API drift
        pytest.skip(f"protobuf runtime cannot build dynamic messages: {e}")


CASES = {
    "CommandStatementQuery": {"query": "SELECT 1", "transaction_id": b"\x00\xff"},
    "TicketStatementQuery": {"statement_handle": b"h\x00andle"},
    "ActionCreatePreparedStatementResult": {
        "prepared_statement_handle": b"p1",
        "dataset_schema": b"\x01\x02",
        "parameter_schema": b"",
    },
    "CommandGetTables": {
        "catalog": "kamu",
        "table_name_filter_pattern": "line%",
        "table_types": ["TABLE", "VIEW"],
        "include_schema": True,
    },
    "CommandGetCatalogs": {},
}


def test_official_runtime_roundtrip():
    classes = _build_factory()
    for name, values in CASES.items():
        cls = classes[name]
        msg = cls()
        for k, v in values.items():
            if isinstance(v, list):
                getattr(msg, k).extend(v)
            elif v != b"" or not isinstance(v, bytes):
                setattr(msg, k, v)
        official = msg.SerializeToString()
        ours = encode_message(name, values)
        # canonical ascending order on both sides -> byte-identical
        assert official == ours, name
        # their bytes through our decoder
        dec = decode_message(name, official)
        for k, v in values.items():
            if v in (b"", [], False, ""):
                continue  # proto3 default: absent on the wire
            assert dec.get(k) == v, (name, k)
        # our bytes through their parser
        back = cls()
        back.ParseFromString(ours)
        for k, v in values.items():
            got = getattr(back, k)
            got = list(got) if isinstance(v, list) else got
            assert got == v, (name, k)


def test_golden_frames_parse_under_official_runtime():
    from google.protobuf import any_pb2

    classes = _build_factory()
    for key, (frame_hex, msg_name, expected) in GOLDEN.items():
        buf = bytes.fromhex(frame_hex)
        any_msg = any_pb2.Any()
        any_msg.ParseFromString(buf)
        assert any_msg.type_url.endswith(msg_name), key
        inner = classes[msg_name]()
        inner.ParseFromString(any_msg.value)
        for k, v in expected.items():
            got = getattr(inner, k)
            got = list(got) if isinstance(v, list) else got
            assert got == v, (key, k)
