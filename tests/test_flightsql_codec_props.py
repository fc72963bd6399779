"""Property tests for the hand-rolled FlightSQL protobuf codec: every
message round-trips byte-exactly, and arbitrary garbage never crashes
the Any decoder (it returns None and the server falls back to the JSON
envelope)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from kamu_cli_spark.api import flightsql_proto as fsql

texts = st.text(max_size=200)
blobs = st.binary(max_size=200)


@given(q=texts, tid=st.one_of(st.none(), blobs))
@settings(max_examples=100)
def test_statement_query_roundtrip(q, tid):
    values = {"query": q}
    if tid is not None:
        values["transaction_id"] = tid
    buf = fsql.pack_any("CommandStatementQuery", values)
    name, out = fsql.unpack_any(buf)
    assert name == "CommandStatementQuery"
    assert out == values


@given(
    cat=st.one_of(st.none(), texts),
    pat=st.one_of(st.none(), texts),
    types=st.lists(st.text(min_size=1, max_size=20), max_size=5),
    inc=st.booleans(),
)
@settings(max_examples=100)
def test_get_tables_roundtrip(cat, pat, types, inc):
    values = {}
    if cat is not None:
        values["catalog"] = cat
    if pat is not None:
        values["table_name_filter_pattern"] = pat
    if types:
        values["table_types"] = types
    if inc:
        values["include_schema"] = True
    buf = fsql.pack_any("CommandGetTables", values)
    name, out = fsql.unpack_any(buf)
    assert name == "CommandGetTables" and out == values


@given(handle=blobs, ds=blobs, ps=blobs)
@settings(max_examples=100)
def test_prepared_result_roundtrip(handle, ds, ps):
    values = {
        "prepared_statement_handle": handle,
        "dataset_schema": ds,
        "parameter_schema": ps,
    }
    buf = fsql.pack_any("ActionCreatePreparedStatementResult", values)
    name, out = fsql.unpack_any(buf)
    assert name == "ActionCreatePreparedStatementResult"
    # empty bytes fields are omitted on the wire (proto3 default), which
    # decodes as absent — semantically identical for the protocol
    assert out == {k: v for k, v in values.items() if v != b""} or out == values


@given(garbage=st.binary(max_size=500))
@settings(max_examples=300)
def test_unpack_any_never_crashes(garbage):
    result = fsql.unpack_any(garbage)
    assert result is None or (
        isinstance(result, tuple) and result[0] in fsql.MESSAGES
    )


@given(n=st.integers(min_value=0, max_value=2**63 - 1))
@settings(max_examples=200)
def test_varint_roundtrip(n):
    buf = fsql.write_varint(n)
    val, pos = fsql.read_varint(buf, 0)
    assert val == n and pos == len(buf)
