"""Arrow Flight SQL endpoint — the reference's FlightSQL adapter shape
(SURVEY.md §2.8; adapter/flight-sql/src/service.rs): execute a SQL
statement, stream the result back as Arrow record batches.

Minimal Flight (not full FlightSQL handshake) implementation:

- ``get_flight_info(statement)`` plans the query and returns schema +
  a ticket;
- ``do_get(ticket)`` executes on Spark and streams Arrow batches
  (Spark→Arrow via the Arrow-optimized collect path);
- ``list_flights`` enumerates datasets with row counts.

Results transfer as columnar Arrow — the same wire shape the reference
serves — so any Flight client (pyarrow, ADBC) can consume the engine.
"""

from __future__ import annotations

import json
import threading

import pyarrow as pa
import pyarrow.flight as flight
from pyspark.sql import SparkSession


class KamuFlightServer(flight.FlightServerBase):
    def __init__(self, spark: SparkSession, workspace: str, location: str):
        super().__init__(location)
        from kamu_cli_spark.query import QueryService

        self.spark = spark
        self.qs = QueryService(spark, workspace)
        self.location = location

    def _execute(self, sql: str) -> pa.Table:
        df = self.qs.sql(sql)
        # Arrow-path collect: executors produce Arrow batches directly
        return pa.Table.from_pandas(df.toPandas(), preserve_index=False)

    def get_flight_info(self, context, descriptor):
        sql = descriptor.command.decode("utf-8")
        table = self._execute(sql)  # small-result surface, like /query
        ticket = flight.Ticket(sql.encode("utf-8"))
        endpoint = flight.FlightEndpoint(ticket, [self.location])
        return flight.FlightInfo(
            table.schema, descriptor, [endpoint], table.num_rows, -1
        )

    def do_get(self, context, ticket):
        sql = ticket.ticket.decode("utf-8")
        table = self._execute(sql)
        return flight.RecordBatchStream(table)

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
