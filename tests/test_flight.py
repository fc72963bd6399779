"""Arrow Flight SQL endpoint: get_flight_info → do_get round trip."""

from __future__ import annotations

import socket
from datetime import datetime, timezone

import pyarrow.flight as flight

from kamu_cli_spark.api.flight import serve_flight
from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def test_flight_sql_roundtrip(spark, tmp_path):
    ws = str(tmp_path)
    ds = Dataset.create(ws, "cities", system_time=T0.isoformat())
    DataWriter(ds, MergeStrategyLedger(["city"])).write(
        spark,
        spark.createDataFrame(
            [("kyiv", 3), ("lviv", 7)], "city string, population int"
        ),
        system_time=T0,
    )

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    server = serve_flight(spark, ws, port=port, background=True)
    try:
        client = flight.connect(f"grpc://127.0.0.1:{port}")
        desc = flight.FlightDescriptor.for_command(
            b"SELECT city, population FROM cities ORDER BY city"
        )
        info = client.get_flight_info(desc)
        assert info.total_records == 2
        assert [f.name for f in info.schema] == ["city", "population"]

        table = client.do_get(info.endpoints[0].ticket).read_all()
        assert table.column("city").to_pylist() == ["kyiv", "lviv"]
        assert table.column("population").to_pylist() == [3, 7]

        flights = list(client.list_flights())
        assert len(flights) == 1 and flights[0].total_records == 2
    finally:
        server.shutdown()
