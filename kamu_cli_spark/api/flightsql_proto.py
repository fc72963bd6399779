"""Hand-rolled protobuf wire codec for the Arrow FlightSQL messages.

The FlightSQL protocol wraps every command in a ``google.protobuf.Any``
(type_url + value) serialized into the Flight descriptor ``cmd``, the
ticket, and action bodies. Stock clients (ADBC, JDBC) negotiate these
frames — a server speaking anything else cannot interoperate
(reference: adapter/flight-sql/src/service.rs:691-810 dispatches on the
decoded Any type_url).

No protobuf runtime exists in this environment, so this module
implements the wire format directly — it only needs varints and
length-delimited fields, the two encodings FlightSQL's messages use
(message definitions: the public FlightSql.proto in apache/arrow).
The repo already hand-parses ESRI shapefiles on the same principle.

Supported messages (field numbers from FlightSql.proto):

=====================================  ==========================================
message                                fields
=====================================  ==========================================
CommandStatementQuery                  1 query (string), 2 transaction_id (bytes)
TicketStatementQuery                   1 statement_handle (bytes)
CommandPreparedStatementQuery          1 prepared_statement_handle (bytes)
ActionCreatePreparedStatementRequest   1 query (string), 2 transaction_id (bytes)
ActionCreatePreparedStatementResult    1 prepared_statement_handle (bytes),
                                       2 dataset_schema (bytes),
                                       3 parameter_schema (bytes)
ActionClosePreparedStatementRequest    1 prepared_statement_handle (bytes)
CommandGetCatalogs                     (no fields)
CommandGetDbSchemas                    1 catalog (string),
                                       2 db_schema_filter_pattern (string)
CommandGetTables                       1 catalog (string),
                                       2 db_schema_filter_pattern (string),
                                       3 table_name_filter_pattern (string),
                                       4 table_types (repeated string),
                                       5 include_schema (bool)
=====================================  ==========================================
"""

from __future__ import annotations

ANY_PREFIX = "type.googleapis.com/arrow.flight.protocol.sql."

# message name -> {field_number: (name, kind)}; kind: "string" | "bytes"
# | "bool" | "repeated_string"
MESSAGES: dict[str, dict[int, tuple[str, str]]] = {
    "CommandStatementQuery": {1: ("query", "string"), 2: ("transaction_id", "bytes")},
    "TicketStatementQuery": {1: ("statement_handle", "bytes")},
    "CommandPreparedStatementQuery": {1: ("prepared_statement_handle", "bytes")},
    "ActionCreatePreparedStatementRequest": {
        1: ("query", "string"),
        2: ("transaction_id", "bytes"),
    },
    "ActionCreatePreparedStatementResult": {
        1: ("prepared_statement_handle", "bytes"),
        2: ("dataset_schema", "bytes"),
        3: ("parameter_schema", "bytes"),
    },
    "ActionClosePreparedStatementRequest": {
        1: ("prepared_statement_handle", "bytes"),
    },
    "CommandGetCatalogs": {},
    "CommandGetDbSchemas": {
        1: ("catalog", "string"),
        2: ("db_schema_filter_pattern", "string"),
    },
    "CommandGetTables": {
        1: ("catalog", "string"),
        2: ("db_schema_filter_pattern", "string"),
        3: ("table_name_filter_pattern", "string"),
        4: ("table_types", "repeated_string"),
        5: ("include_schema", "bool"),
    },
}


# -- wire primitives ----------------------------------------------------


def write_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift > 63:
            raise ValueError("varint too long")


def _ld(field_number: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return write_varint(field_number << 3 | 2) + write_varint(len(payload)) + payload


def _vi(field_number: int, value: int) -> bytes:
    """Varint field (wire type 0)."""
    return write_varint(field_number << 3) + write_varint(value)


def decode_fields(buf: bytes) -> dict[int, list]:
    """Raw field map {field_number: [value, ...]} — length-delimited
    fields yield bytes, varint fields yield int. Unknown wire types
    are rejected (FlightSQL uses only 0 and 2)."""
    fields: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = read_varint(buf, pos)
        num, wt = tag >> 3, tag & 7
        if wt == 2:
            ln, pos = read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("truncated length-delimited field")
            val: object = buf[pos : pos + ln]
            pos += ln
        elif wt == 0:
            val, pos = read_varint(buf, pos)
        else:
            raise ValueError(f"unsupported wire type {wt}")
        fields.setdefault(num, []).append(val)
    return fields


# -- message codec ------------------------------------------------------


def encode_message(name: str, values: dict) -> bytes:
    schema = MESSAGES[name]
    out = bytearray()
    for num in sorted(schema):
        fname, kind = schema[num]
        v = values.get(fname)
        if v is None:
            continue
        if kind == "string":
            out += _ld(num, v.encode("utf-8"))
        elif kind == "bytes":
            out += _ld(num, v)
        elif kind == "bool":
            if v:
                out += _vi(num, 1)
        elif kind == "repeated_string":
            for item in v:
                out += _ld(num, item.encode("utf-8"))
    return bytes(out)


def decode_message(name: str, buf: bytes) -> dict:
    schema = MESSAGES[name]
    raw = decode_fields(buf)
    out: dict = {}
    for num, vals in raw.items():
        if num not in schema:
            continue  # unknown field: skip, per protobuf semantics
        fname, kind = schema[num]
        if kind == "string":
            out[fname] = vals[-1].decode("utf-8")
        elif kind == "bytes":
            out[fname] = bytes(vals[-1])
        elif kind == "bool":
            out[fname] = bool(vals[-1])
        elif kind == "repeated_string":
            out[fname] = [v.decode("utf-8") for v in vals]
    return out


# -- google.protobuf.Any ------------------------------------------------


def pack_any(name: str, values: dict) -> bytes:
    """Serialize Any{type_url, value=encode_message(name, values)}."""
    return _ld(1, (ANY_PREFIX + name).encode("utf-8")) + _ld(
        2, encode_message(name, values)
    )


def unpack_any(buf: bytes) -> tuple[str, dict] | None:
    """Decode an Any frame → (message_name, values); None when the
    bytes are not an Any wrapping a known FlightSQL message (callers
    fall back to the JSON envelope)."""
    try:
        raw = decode_fields(buf)
    except ValueError:
        return None
    urls = raw.get(1)
    if not urls or not isinstance(urls[-1], (bytes, bytearray)):
        return None
    try:
        type_url = bytes(urls[-1]).decode("utf-8")
    except UnicodeDecodeError:
        return None
    if not type_url.startswith(ANY_PREFIX):
        return None
    name = type_url[len(ANY_PREFIX) :]
    if name not in MESSAGES:
        return None
    vals = raw.get(2)
    payload = bytes(vals[-1]) if vals else b""
    return name, decode_message(name, payload)
