"""Arrow Flight SQL endpoint: statement round trip, prepared
statements with parameter binding, and catalog metadata commands."""

from __future__ import annotations

import json
import socket
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.flight as flight
import pytest

from kamu_cli_spark.api.flight import serve_flight
from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


@pytest.fixture()
def flight_client(spark, tmp_path):
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
    client = flight.connect(f"grpc://127.0.0.1:{port}")
    yield client
    server.shutdown()


def test_flight_sql_roundtrip(flight_client):
    client = flight_client
    desc = flight.FlightDescriptor.for_command(
        b"SELECT city, population FROM cities ORDER BY city"
    )
    info = client.get_flight_info(desc)
    # planning-only: schema known, row count not (no double execution)
    assert info.total_records == -1
    assert [f.name for f in info.schema] == ["city", "population"]

    table = client.do_get(info.endpoints[0].ticket).read_all()
    assert table.column("city").to_pylist() == ["kyiv", "lviv"]
    assert table.column("population").to_pylist() == [3, 7]

    flights = list(client.list_flights())
    assert len(flights) == 1 and flights[0].total_records == 2


def test_flight_prepared_statement_named_params(flight_client):
    client = flight_client
    res = next(
        client.do_action(
            flight.Action(
                "prepare",
                b"SELECT city, population FROM cities WHERE city = :city",
            )
        )
    )
    handle = json.loads(res.body.to_pybytes())["handle"]

    desc = flight.FlightDescriptor.for_command(
        json.dumps({"prepared": handle}).encode()
    )
    params = pa.table({"city": ["lviv"]})
    writer, _ = client.do_put(desc, params.schema)
    writer.write_table(params)
    writer.close()

    info = client.get_flight_info(desc)
    assert [f.name for f in info.schema] == ["city", "population"]
    out = client.do_get(info.endpoints[0].ticket).read_all()
    assert out.to_pylist() == [{"city": "lviv", "population": 7}]

    # rebind → re-execute without re-preparing
    params = pa.table({"city": ["kyiv"]})
    writer, _ = client.do_put(desc, params.schema)
    writer.write_table(params)
    writer.close()
    out = client.do_get(info.endpoints[0].ticket).read_all()
    assert out.to_pylist() == [{"city": "kyiv", "population": 3}]

    next(client.do_action(flight.Action("close_prepared", handle.encode())))
    with pytest.raises(flight.FlightServerError, match="unknown prepared"):
        client.do_get(info.endpoints[0].ticket).read_all()


def test_flight_prepared_positional_params(flight_client):
    client = flight_client
    res = next(
        client.do_action(
            flight.Action("prepare", b"SELECT city FROM cities WHERE population > ?")
        )
    )
    handle = json.loads(res.body.to_pybytes())["handle"]
    desc = flight.FlightDescriptor.for_command(
        json.dumps({"prepared": handle}).encode()
    )
    params = pa.table({"param_0": [5]})
    writer, _ = client.do_put(desc, params.schema)
    writer.write_table(params)
    writer.close()
    out = client.do_get(
        client.get_flight_info(desc).endpoints[0].ticket
    ).read_all()
    assert out.to_pylist() == [{"city": "lviv"}]


def test_flight_catalog_metadata(flight_client):
    client = flight_client
    get = lambda cmd: client.do_get(
        client.get_flight_info(
            flight.FlightDescriptor.for_command(json.dumps(cmd).encode())
        ).endpoints[0].ticket
    ).read_all()

    cats = get({"cmd": "get_catalogs"})
    assert cats.to_pylist() == [{"catalog_name": "kamu"}]

    schemas = get({"cmd": "get_db_schemas"})
    assert schemas.to_pylist() == [
        {"catalog_name": "kamu", "db_schema_name": "default"}
    ]

    tables = get({"cmd": "get_tables", "include_schema": True})
    rows = tables.to_pylist()
    assert [r["table_name"] for r in rows] == ["cities"]
    assert rows[0]["table_type"] == "TABLE"
    schema = pa.ipc.read_schema(pa.py_buffer(rows[0]["table_schema"]))
    assert "city" in schema.names and "population" in schema.names

    filtered = get({"cmd": "get_tables", "table_name_filter_pattern": "nope*"})
    assert filtered.num_rows == 0
