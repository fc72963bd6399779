"""Arrow Flight SQL endpoint — the reference's FlightSQL adapter shape
(SURVEY.md §2.8; adapter/flight-sql/src/service.rs:691-810):

- **statement queries**: ``get_flight_info`` PLANS the statement
  (Catalyst analysis only — no execution) and returns the result schema
  with a ticket; ``do_get`` executes ONCE and streams Arrow record
  batches collected natively (``DataFrame.toArrow()`` — executors emit
  Arrow, no pandas materialization on the driver).
- **prepared statements** (service.rs: CreatePreparedStatement /
  do_put bind / ClosePreparedStatement): ``do_action("prepare", sql)``
  returns a handle; ``do_put`` with descriptor ``{"prepared": handle}``
  binds one row of parameters (column names bind `:name` markers, or
  positional columns `?` in order); ``do_get`` on
  ``{"prepared": handle}`` executes with the bound values via Spark
  parameterized SQL (no string splicing — injection-safe).
- **catalog metadata** (service.rs: get_catalogs/get_schemas/
  get_tables): JSON commands ``{"cmd": "get_catalogs" | "get_db_schemas"
  | "get_tables"}`` stream the same column shapes FlightSQL defines,
  including the optional serialized Arrow schema per table.

Wire envelope: REAL FlightSQL protobuf frames (google.protobuf.Any
wrapping CommandStatementQuery / CommandPreparedStatementQuery /
TicketStatementQuery / ActionCreatePreparedStatement* /
CommandGetCatalogs|DbSchemas|Tables — hand-rolled codec in
:mod:`kamu_cli_spark.api.flightsql_proto`, mirroring the dispatch in
service.rs:691-810), with the JSON command envelope kept as a
pyarrow-client-friendly fallback for frames that aren't an Any.
"""

from __future__ import annotations

import json
import threading
import uuid

import pyarrow as pa
import pyarrow.flight as flight
from pyspark.sql import DataFrame, SparkSession

from kamu_cli_spark.api import flightsql_proto as fsql

CATALOG_NAME = "kamu"
SCHEMA_NAME = "default"


def _arrow_schema(df: DataFrame) -> pa.Schema:
    """Arrow schema from the ANALYZED (not executed) plan."""
    try:
        from pyspark.sql.pandas.types import to_arrow_schema

        return to_arrow_schema(df.schema)
    except Exception:
        # fallback: zero-row execution (cheap — no shuffle tasks run)
        return df.limit(0).toArrow().schema


class KamuFlightServer(flight.FlightServerBase):
    def __init__(self, spark: SparkSession, workspace: str, location: str):
        super().__init__(location)
        from kamu_cli_spark.query import QueryService

        self.spark = spark
        self.qs = QueryService(spark, workspace)
        self.location = location
        self._prepared: dict[str, dict] = {}
        self._lock = threading.Lock()

    # -- command routing ----------------------------------------------

    @staticmethod
    def _parse_command(raw: bytes) -> dict:
        """FlightSQL protobuf Any frames route first (stock ADBC/JDBC
        clients); JSON commands and bare SQL are kept as a
        pyarrow-client-friendly fallback. The returned dict carries
        ``__proto`` with the decoded (message, values) so responses can
        be framed in protobuf too."""
        decoded = fsql.unpack_any(raw)
        if decoded is not None:
            name, v = decoded
            if name == "CommandStatementQuery":
                return {"sql": v["query"], "__proto": (name, v)}
            if name == "TicketStatementQuery":
                # reference (service.rs:726-729): the statement handle IS
                # the encoded CommandStatementQuery
                inner = fsql.decode_message(
                    "CommandStatementQuery", v.get("statement_handle", b"")
                )
                return {"sql": inner["query"], "__proto": (name, v)}
            if name == "CommandPreparedStatementQuery":
                handle = v.get("prepared_statement_handle", b"").decode("utf-8")
                return {"prepared": handle, "__proto": (name, v)}
            if name == "CommandGetCatalogs":
                return {"cmd": "get_catalogs", "__proto": (name, v)}
            if name == "CommandGetDbSchemas":
                return {"cmd": "get_db_schemas", "__proto": (name, v)}
            if name == "CommandGetTables":
                out = {"cmd": "get_tables", "__proto": (name, v)}
                if "table_name_filter_pattern" in v:
                    out["table_name_filter_pattern"] = v[
                        "table_name_filter_pattern"
                    ]
                if v.get("include_schema"):
                    out["include_schema"] = True
                return out
        try:
            cmd = json.loads(raw.decode("utf-8"))
            if isinstance(cmd, dict):
                return cmd
        except (ValueError, UnicodeDecodeError):
            pass
        return {"sql": raw.decode("utf-8")}

    def _statement_df(self, cmd: dict) -> DataFrame:
        if "prepared" in cmd:
            with self._lock:
                st = self._prepared.get(cmd["prepared"])
            if st is None:
                raise flight.FlightServerError(
                    f"unknown prepared statement: {cmd['prepared']}"
                )
            return self.qs.sql(st["sql"], args=st.get("params"))
        return self.qs.sql(cmd["sql"])

    # -- catalog metadata (FlightSQL CommandGetCatalogs et al.) -------

    def _metadata_table(self, cmd: dict) -> pa.Table:
        kind = cmd["cmd"]
        if kind == "get_catalogs":
            return pa.table({"catalog_name": [CATALOG_NAME]})
        if kind == "get_db_schemas":
            return pa.table(
                {"catalog_name": [CATALOG_NAME], "db_schema_name": [SCHEMA_NAME]}
            )
        if kind == "get_tables":
            names = self.qs.list_datasets()
            pat = cmd.get("table_name_filter_pattern")
            if pat:
                import fnmatch

                names = [n for n in names if fnmatch.fnmatch(n, pat)]
            cols: dict = {
                "catalog_name": [CATALOG_NAME] * len(names),
                "db_schema_name": [SCHEMA_NAME] * len(names),
                "table_name": names,
                "table_type": ["TABLE"] * len(names),
            }
            if cmd.get("include_schema"):
                schemas = []
                for n in names:
                    df = self.qs.get_data(n)
                    schemas.append(
                        _arrow_schema(df).serialize().to_pybytes()
                        if df is not None
                        else b""
                    )
                cols["table_schema"] = schemas
            return pa.table(cols)
        raise flight.FlightServerError(f"unknown metadata command: {kind}")

    # -- flight verbs --------------------------------------------------

    @staticmethod
    def _ticket_bytes(cmd: dict) -> bytes:
        """Round-trippable ticket for do_get: protobuf framing for
        protobuf requests (statement queries travel as
        TicketStatementQuery whose handle is the encoded command, like
        the reference service.rs:726-729), JSON otherwise."""
        proto = cmd.get("__proto")
        if proto is None:
            return json.dumps(cmd).encode("utf-8")
        name, values = proto
        if name in ("CommandStatementQuery", "TicketStatementQuery"):
            handle = (
                values.get("statement_handle")
                if name == "TicketStatementQuery"
                else fsql.encode_message("CommandStatementQuery", values)
            )
            return fsql.pack_any(
                "TicketStatementQuery", {"statement_handle": handle}
            )
        return fsql.pack_any(name, values)

    def get_flight_info(self, context, descriptor):
        cmd = self._parse_command(descriptor.command)
        if "cmd" in cmd:
            table = self._metadata_table(cmd)
            schema, total = table.schema, table.num_rows
        else:
            schema, total = _arrow_schema(self._statement_df(cmd)), -1
        ticket = flight.Ticket(self._ticket_bytes(cmd))
        endpoint = flight.FlightEndpoint(ticket, [self.location])
        return flight.FlightInfo(schema, descriptor, [endpoint], total, -1)

    def do_get(self, context, ticket):
        cmd = self._parse_command(ticket.ticket)
        if "cmd" in cmd:
            return flight.RecordBatchStream(self._metadata_table(cmd))
        table = self._statement_df(cmd).toArrow()
        return flight.RecordBatchStream(table)

    def do_put(self, context, descriptor, reader, writer):
        cmd = self._parse_command(descriptor.command)
        handle = cmd.get("prepared")
        if handle is None:
            raise flight.FlightServerError("do_put requires a prepared handle")
        params = reader.read_all()
        if params.num_rows != 1:
            raise flight.FlightServerError(
                f"expected exactly one parameter row, got {params.num_rows}"
            )
        row = params.to_pylist()[0]
        positional = all(
            name.startswith(("param_", "$")) or name.isdigit()
            for name in params.column_names
        ) and len(params.column_names) > 0
        with self._lock:
            if handle not in self._prepared:
                raise flight.FlightServerError(f"unknown prepared statement: {handle}")
            self._prepared[handle]["params"] = (
                [row[c] for c in params.column_names] if positional else row
            )

    def do_action(self, context, action):
        raw = action.body.to_pybytes() if action.body else b""
        if action.type == "CreatePreparedStatement":
            # FlightSQL: body = Any(ActionCreatePreparedStatementRequest);
            # result = Any(ActionCreatePreparedStatementResult) carrying
            # the handle + the planned (not executed) result schema
            decoded = fsql.unpack_any(raw)
            if decoded is None or decoded[0] != "ActionCreatePreparedStatementRequest":
                raise flight.FlightServerError(
                    "CreatePreparedStatement requires an Any-wrapped request"
                )
            sql = decoded[1]["query"]
            handle = uuid.uuid4().hex
            with self._lock:
                self._prepared[handle] = {"sql": sql, "params": None}
            try:
                # lazily plan (no execution) for the result schema; a
                # statement with unbound ? markers can't analyze yet —
                # clients get the schema at get_flight_info time instead
                schema = _arrow_schema(self.qs.sql(sql))
            except Exception:
                schema = pa.schema([])
            yield fsql.pack_any(
                "ActionCreatePreparedStatementResult",
                {
                    "prepared_statement_handle": handle.encode("utf-8"),
                    "dataset_schema": schema.serialize().to_pybytes(),
                    "parameter_schema": pa.schema([]).serialize().to_pybytes(),
                },
            )
        elif action.type == "ClosePreparedStatement":
            decoded = fsql.unpack_any(raw)
            if decoded is None or decoded[0] != "ActionClosePreparedStatementRequest":
                raise flight.FlightServerError(
                    "ClosePreparedStatement requires an Any-wrapped request"
                )
            handle = decoded[1]["prepared_statement_handle"].decode("utf-8")
            with self._lock:
                self._prepared.pop(handle, None)
            yield b""
        elif action.type == "prepare":  # legacy JSON envelope
            body = raw.decode("utf-8")
            handle = uuid.uuid4().hex
            with self._lock:
                self._prepared[handle] = {"sql": body, "params": None}
            yield json.dumps({"handle": handle}).encode("utf-8")
        elif action.type == "close_prepared":
            with self._lock:
                self._prepared.pop(raw.decode("utf-8"), None)
            yield b"{}"
        else:
            raise flight.FlightServerError(f"unknown action: {action.type}")

    def list_actions(self, context):
        return [
            ("CreatePreparedStatement", "FlightSQL: body = Any(ActionCreatePreparedStatementRequest)"),
            ("ClosePreparedStatement", "FlightSQL: body = Any(ActionClosePreparedStatementRequest)"),
            ("prepare", "Legacy: create a prepared statement; body = SQL text"),
            ("close_prepared", "Legacy: discard a prepared statement; body = handle"),
        ]

    def list_flights(self, context, criteria):
        for name in self.qs.list_datasets():
            ds = self.qs.dataset(name)
            n = sum(d["num_records"] for d in ds.chain.data_files())
            descriptor = flight.FlightDescriptor.for_path(name.encode())
            schema = pa.schema([])
            yield flight.FlightInfo(
                schema, descriptor,
                [flight.FlightEndpoint(flight.Ticket(f"SELECT * FROM {name}".encode()), [self.location])],
                n, -1,
            )


def serve_flight(
    spark: SparkSession,
    workspace: str,
    port: int = 8815,
    background: bool = False,
) -> KamuFlightServer:
    location = f"grpc://127.0.0.1:{port}"
    server = KamuFlightServer(spark, workspace, location)
    if background:
        threading.Thread(target=server.serve, daemon=True).start()
        return server
    server.serve()
    return server
