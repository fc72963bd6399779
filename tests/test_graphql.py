"""GraphQL adapter: datasets.byName(...).data.tail/query."""

from __future__ import annotations

import json
from datetime import datetime, timezone

from kamu_cli_spark.api.graphql_api import execute_graphql
from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def test_graphql_surface(spark, tmp_path):
    ws = str(tmp_path)
    ds = Dataset.create(ws, "cities", system_time=T0.isoformat())
    DataWriter(ds, MergeStrategyLedger(["city"])).write(
        spark,
        spark.createDataFrame(
            [("kyiv", 3), ("lviv", 7)], "city string, population int"
        ),
        system_time=T0,
        source_event_time=T0,
    )

    res = execute_graphql(
        spark,
        ws,
        """
        {
          datasets {
            list
            byName(name: "cities") {
              name kind numBlocks numRecords watermark metadata
              data {
                tail(limit: 1)
                query(sql: "select city, population from cities order by city")
              }
            }
          }
        }
        """,
    )
    assert "errors" not in res, res
    d = res["data"]["datasets"]
    assert d["list"] == ["cities"]
    ds_node = d["byName"]
    assert ds_node["kind"] == "Root" and ds_node["numRecords"] == 2
    assert ds_node["metadata"] == ["Seed", "SetDataSchema", "AddData"]
    assert ds_node["watermark"].startswith("2024-01-01")
    tail = json.loads(ds_node["data"]["tail"])
    assert len(tail) == 1 and tail[0]["city"] == "lviv"
    rows = json.loads(ds_node["data"]["query"])
    assert rows == [
        {"city": "kyiv", "population": 3},
        {"city": "lviv", "population": 7},
    ]

    # unknown dataset → null node, no crash
    res2 = execute_graphql(spark, ws, '{ datasets { byName(name: "nope") { name } } }')
    assert res2["data"]["datasets"]["byName"] is None
