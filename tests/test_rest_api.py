"""REST adapter: /query /tail /ingest /metadata /verify /datasets."""

from __future__ import annotations

import json
import socket
import urllib.request
from datetime import datetime, timezone

from kamu_cli_spark.api import serve
from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _get(port, path):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
        return json.loads(r.read())


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_rest_api_roundtrip(spark, tmp_path):
    ws = str(tmp_path)
    ds = Dataset.create(ws, "cities", system_time=T0.isoformat())
    ds.chain.append(
        {"kind": "SetPollingSource", "merge": {"kind": "ledger", "primary_key": ["city"]}},
        system_time=T0.isoformat(),
    )
    DataWriter(ds, MergeStrategyLedger(["city"])).write(
        spark,
        spark.createDataFrame([("kyiv", 3), ("lviv", 7)], "city string, population int"),
        system_time=T0,
    )

    port = _free_port()
    srv = serve(spark, ws, port=port, background=True)
    try:
        assert _get(port, "/datasets")["datasets"] == ["cities"]

        q = _post(port, "/query", {"query": "select count(*) as n from cities"})
        assert q["data"] == [{"n": 2}]

        soa = _post(
            port,
            "/query",
            {"query": "select city from cities order by city", "dataFormat": "soa"},
        )
        assert soa["data"]["city"] == ["kyiv", "lviv"]

        t = _get(port, "/tail?dataset=cities&limit=1")
        assert t["data"][0]["city"] == "lviv"

        meta = _get(port, "/metadata?dataset=cities")
        assert [b["event"]["kind"] for b in meta["blocks"]] == [
            "Seed",
            "SetPollingSource",
            "SetDataSchema",
            "AddData",
        ]

        ing = _post(
            port,
            "/ingest",
            {"dataset": "cities", "data": [{"city": "odessa", "population": 5}]},
        )
        assert ing["committed"]["num_records"] == 1

        v = _post(port, "/verify", {"dataset": "cities"})
        assert v["ok"] and v["slices"] == 2

        # OData protocol
        svc = _get(port, "/odata/")
        assert [s["name"] for s in svc["value"]] == ["cities"]
        meta = _get(port, "/odata/$metadata")
        assert any(f["name"] == "city" for f in meta["entities"]["cities"])
        ent = _get(
            port,
            "/odata/cities?$top=1&$orderby=population%20desc&$select=city,population",
        )
        assert ent["value"] == [{"city": "lviv", "population": 7}]

        # error paths
        try:
            _post(port, "/query", {})
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            _get(port, "/tail?dataset=nope")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()
