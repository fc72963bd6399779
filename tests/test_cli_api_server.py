"""`api-server` CLI verb: REST + Flight over one workspace
(reference: `kamu system api-server`)."""

from __future__ import annotations

import json
import socket
import urllib.request
from datetime import datetime, timezone

import pyarrow.flight as flight

from kamu_cli_spark import cli
from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_cli_api_server_rest_and_flight(spark, tmp_path):
    ws = str(tmp_path)
    ds = Dataset.create(ws, "cities", system_time=T0.isoformat())
    DataWriter(ds, MergeStrategyLedger(["city"])).write(
        spark,
        spark.createDataFrame([("kyiv", 3), ("lviv", 7)], "city string, population int"),
        system_time=T0,
    )
    rest_port, flight_port = _free_port(), _free_port()
    rc = cli.main(
        [
            "--workspace", ws,
            "api-server",
            "--port", str(rest_port),
            "--flight-port", str(flight_port),
            "--no-block",
        ]
    )
    assert rc == 0
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{rest_port}/datasets"
        ) as r:
            assert json.loads(r.read())["datasets"] == ["cities"]

        client = flight.connect(f"grpc://127.0.0.1:{flight_port}")
        info = client.get_flight_info(
            flight.FlightDescriptor.for_command(b"SELECT count(*) AS n FROM cities")
        )
        table = client.do_get(info.endpoints[0].ticket).read_all()
        assert table.column("n").to_pylist() == [2]
    finally:
        for srv in cli._SERVERS:
            srv.shutdown()
