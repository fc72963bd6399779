"""Golden FlightSQL protobuf frames, hand-derived from the PUBLIC
FlightSql.proto / google.protobuf.Any wire format — NOT produced by the
repo's codec, so they catch self-consistent-but-wrong encodings.

Derivation (standard protobuf encoding, the bytes any stock
ADBC/JDBC client's protobuf runtime emits for these values):

- varint: little-endian base-128, msb = continuation;
- length-delimited field: tag = (field_number << 3) | 2, then varint
  length, then payload;
- varint field: tag = (field_number << 3) | 0, then varint value;
- Any: field 1 = type_url string
  ("type.googleapis.com/arrow.flight.protocol.sql." + message name),
  field 2 = serialized inner message;
- canonical serializers emit fields in field-number order, but ANY
  order is legal on the wire — the *_unordered fixtures exercise that,
  plus unknown-field skipping (fields 15/14) that protobuf requires.

Example, `stmt_query` (CommandStatementQuery{query="SELECT * FROM
lineitem LIMIT 5"}):

    inner = 0A 1E "SELECT * FROM lineitem LIMIT 5"
            ^tag(1,LD) ^len 30
    any   = 0A 43 <type_url 67 bytes> 12 20 <inner 32 bytes>
            ^tag(1,LD) ^len 67        ^tag(2,LD) ^len

Each entry: (frame hex, message name, expected decoded values).
"""

GOLDEN = {
    "stmt_query": (
        "0a43747970652e676f6f676c65617069732e636f6d2f6172726f772e666c69676874"
        "2e70726f746f636f6c2e73716c2e436f6d6d616e6453746174656d656e7451756572"
        "7912200a1e53454c454354202a2046524f4d206c696e656974656d204c494d495420"
        "35",
        "CommandStatementQuery",
        {"query": "SELECT * FROM lineitem LIMIT 5"},
    ),
    "stmt_query_txn": (
        "0a43747970652e676f6f676c65617069732e636f6d2f6172726f772e666c69676874"
        "2e70726f746f636f6c2e73716c2e436f6d6d616e6453746174656d656e7451756572"
        "7912100a0853454c4543542031120400ff107f",
        "CommandStatementQuery",
        {"query": "SELECT 1", "transaction_id": b"\x00\xff\x10\x7f"},
    ),
    "create_prepared": (
        "0a52747970652e676f6f676c65617069732e636f6d2f6172726f772e666c69676874"
        "2e70726f746f636f6c2e73716c2e416374696f6e4372656174655072657061726564"
        "53746174656d656e745265717565737412360a3453454c454354206c5f6f72646572"
        "6b65792046524f4d206c696e656974656d205748455245206c5f7175616e74697479"
        "203e203f",
        "ActionCreatePreparedStatementRequest",
        {"query": "SELECT l_orderkey FROM lineitem WHERE l_quantity > ?"},
    ),
    "prepared_query": (
        "0a4b747970652e676f6f676c65617069732e636f6d2f6172726f772e666c69676874"
        "2e70726f746f636f6c2e73716c2e436f6d6d616e6450726570617265645374617465"
        "6d656e74517565727912070a05010203feff",
        "CommandPreparedStatementQuery",
        {"prepared_statement_handle": b"\x01\x02\x03\xfe\xff"},
    ),
    "ticket_stmt": (
        "0a42747970652e676f6f676c65617069732e636f6d2f6172726f772e666c69676874"
        "2e70726f746f636f6c2e73716c2e5469636b657453746174656d656e745175657279"
        "120d0a0b68616e646c652d30303432",
        "TicketStatementQuery",
        {"statement_handle": b"handle-0042"},
    ),
    "get_catalogs": (
        "0a40747970652e676f6f676c65617069732e636f6d2f6172726f772e666c69676874"
        "2e70726f746f636f6c2e73716c2e436f6d6d616e64476574436174616c6f67731200",
        "CommandGetCatalogs",
        {},
    ),
    "get_db_schemas": (
        "0a41747970652e676f6f676c65617069732e636f6d2f6172726f772e666c69676874"
        "2e70726f746f636f6c2e73716c2e436f6d6d616e644765744462536368656d617312"
        "0b0a046b616d7512036d6125",
        "CommandGetDbSchemas",
        {"catalog": "kamu", "db_schema_filter_pattern": "ma%"},
    ),
    "get_tables": (
        "0a3e747970652e676f6f676c65617069732e636f6d2f6172726f772e666c69676874"
        "2e70726f746f636f6c2e73716c2e436f6d6d616e644765745461626c6573121c0a04"
        "6b616d751a056c696e652522055441424c452204564945572801",
        "CommandGetTables",
        {
            "catalog": "kamu",
            "table_name_filter_pattern": "line%",
            "table_types": ["TABLE", "VIEW"],
            "include_schema": True,
        },
    ),
    "close_prepared": (
        "0a51747970652e676f6f676c65617069732e636f6d2f6172726f772e666c69676874"
        "2e70726f746f636f6c2e73716c2e416374696f6e436c6f73655072657061726564"
        "53746174656d656e7452657175657374120d0a0b68616e646c652d30303432",
        "ActionClosePreparedStatementRequest",
        {"prepared_statement_handle": b"handle-0042"},
    ),
}

# Legal-but-noncanonical frames a foreign serializer may emit: fields
# out of field-number order, unknown fields (15 string, 14 varint) that
# MUST be skipped. Decode-only — a canonical encoder never produces
# these bytes.
GOLDEN_DECODE_ONLY = {
    "get_tables_unordered_unknown": (
        "0a3e747970652e676f6f676c65617069732e636f6d2f6172726f772e666c69676874"
        "2e70726f746f636f6c2e73716c2e436f6d6d616e644765745461626c6573121b2801"
        "1a01250a046b616d757a0c6675747572652d6669656c647007",
        "CommandGetTables",
        {
            "catalog": "kamu",
            "table_name_filter_pattern": "%",
            "include_schema": True,
        },
    ),
    "any_fields_swapped": (
        "120a0a0853454c45435420320a43747970652e676f6f676c65617069732e636f6d2f"
        "6172726f772e666c696768742e70726f746f636f6c2e73716c2e436f6d6d616e6453"
        "746174656d656e745175657279",
        "CommandStatementQuery",
        {"query": "SELECT 2"},
    ),
}
