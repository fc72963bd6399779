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
              name kind numBlocks numRecords watermark
              metadata { eventKinds }
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
    assert ds_node["metadata"]["eventKinds"] == ["Seed", "SetDataSchema", "AddData"]
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


def test_graphql_metadata_chain_info_license_and_byid(spark, tmp_path):
    """Mirrors the reference's dataset_metadata.rs projections: byId
    lookup, metadata chain pagination, SetInfo/SetLicense, schema."""
    ws = str(tmp_path)
    ds = Dataset.create(ws, "cities", system_time=T0.isoformat())
    DataWriter(ds, MergeStrategyLedger(["city"])).write(
        spark,
        spark.createDataFrame([("kyiv", 3)], "city string, population int"),
        system_time=T0,
    )
    ds.set_info(
        description="City registry",
        keywords=["cities", "geo"],
        readme="# Cities",
        system_time=T0.isoformat(),
    )
    ds.set_license(
        "apache-2.0",
        "Apache License 2.0",
        spdx_id="Apache-2.0",
        website_url="https://www.apache.org/licenses/LICENSE-2.0",
        system_time=T0.isoformat(),
    )
    dataset_id = ds.chain.last_event("Seed").event["dataset_id"]

    res = execute_graphql(
        spark,
        ws,
        """
        {
          datasets {
            byId(id: "%s") {
              id name head
              metadata {
                chain {
                  blockCount
                  blocks(limit: 2) { hash prevHash sequenceNumber eventKind }
                }
                currentInfo { description keywords }
                currentLicense { shortName name spdxId websiteUrl }
                currentReadme
                currentSchema
                currentWatermark
              }
            }
          }
        }
        """
        % dataset_id,
    )
    assert "errors" not in res, res
    node = res["data"]["datasets"]["byId"]
    assert node["name"] == "cities" and node["id"] == dataset_id

    md = node["metadata"]
    # Seed, SetDataSchema, AddData, SetInfo, SetLicense
    assert md["chain"]["blockCount"] == 5
    blocks = md["chain"]["blocks"]
    # newest first; head hash matches; prev-hash chains
    assert blocks[0]["eventKind"] == "SetLicense"
    assert blocks[0]["hash"] == node["head"]
    assert blocks[1]["hash"] == blocks[0]["prevHash"]
    assert md["currentInfo"] == {
        "description": "City registry",
        "keywords": ["cities", "geo"],
    }
    assert md["currentLicense"]["spdxId"] == "Apache-2.0"
    assert md["currentReadme"] == "# Cities"
    assert "city" in md["currentSchema"]

    # blockByHash finds a specific block
    res2 = execute_graphql(
        spark,
        ws,
        '{ datasets { byName(name: "cities") { metadata { chain { '
        'blockByHash(hash: "%s") { eventKind sequenceNumber } } } } } }'
        % blocks[1]["hash"],
    )
    found = res2["data"]["datasets"]["byName"]["metadata"]["chain"]["blockByHash"]
    assert found["eventKind"] == "SetInfo"

    # unknown id → null
    res3 = execute_graphql(spark, ws, '{ datasets { byId(id: "nope") { name } } }')
    assert res3["data"]["datasets"]["byId"] is None


def test_graphql_lineage_and_dependencies(spark, tmp_path):
    """Upstream/downstream dependency projections through the
    SetTransform declarations (dataset_metadata.rs:147-202)."""
    from kamu_cli_spark.transform import set_transform

    ws = str(tmp_path)
    root = Dataset.create(ws, "raw", system_time=T0.isoformat())
    DataWriter(root, MergeStrategyLedger(["k"])).write(
        spark,
        spark.createDataFrame([("a", 1)], "k string, v int"),
        system_time=T0,
    )
    deriv = Dataset.create(ws, "clean", kind="Derivative", system_time=T0.isoformat())
    set_transform(
        deriv,
        {"raw": str(tmp_path / "raw")},
        "SELECT k, v FROM raw",
        system_time=T0.isoformat(),
    )

    res = execute_graphql(
        spark,
        ws,
        """
        {
          datasets {
            byName(name: "clean") {
              lineage { name kind inputs { name kind alias inputs { name } } }
              metadata {
                currentTransform
                currentUpstreamDependencies { name alias }
              }
            }
            root: byName(name: "raw") {
              metadata { currentDownstreamDependencies }
            }
          }
        }
        """,
    )
    assert "errors" not in res, res
    clean = res["data"]["datasets"]["byName"]
    assert clean["lineage"]["name"] == "clean"
    assert clean["lineage"]["inputs"][0]["name"] == "raw"
    assert clean["lineage"]["inputs"][0]["alias"] == "raw"
    assert clean["lineage"]["inputs"][0]["inputs"] == []
    assert "SELECT k, v FROM raw" in clean["metadata"]["currentTransform"]
    ups = clean["metadata"]["currentUpstreamDependencies"]
    assert [u["name"] for u in ups] == ["raw"]
    downs = res["data"]["datasets"]["root"]["metadata"]
    assert downs["currentDownstreamDependencies"] == ["clean"]


def test_graphql_search(spark, tmp_path):
    """Mirrors the reference search endpoint (search.rs): lowercased
    substring match over names (+SetInfo text here), paginated."""
    ws = str(tmp_path)
    for name in ("cities", "city-stats", "weather"):
        ds = Dataset.create(ws, name, system_time=T0.isoformat())
        if name == "weather":
            ds.set_info(
                description="Observations near big Cities",
                keywords=["meteo"],
                system_time=T0.isoformat(),
            )

    res = execute_graphql(
        spark,
        ws,
        """
        {
          search {
            query(query: "CIT") {
              totalCount
              nodes { name }
              pageInfo { hasNextPage hasPreviousPage currentPage totalPages }
            }
          }
        }
        """,
    )
    assert "errors" not in res, res
    conn = res["data"]["search"]["query"]
    # "cit" hits cities/city-stats by name and weather via its SetInfo
    # description ("Cities", lowercased)
    assert conn["totalCount"] == 3
    assert [n["name"] for n in conn["nodes"]] == ["cities", "city-stats", "weather"]
    assert conn["pageInfo"] == {
        "hasNextPage": False,
        "hasPreviousPage": False,
        "currentPage": 0,
        "totalPages": 1,
    }

    # pagination: perPage=1, middle page
    res = execute_graphql(
        spark,
        ws,
        '{ search { query(query: "cit", page: 1, perPage: 1) { '
        "totalCount nodes { name } "
        "pageInfo { hasNextPage hasPreviousPage currentPage totalPages } } } }",
    )
    conn = res["data"]["search"]["query"]
    assert conn["totalCount"] == 3
    assert [n["name"] for n in conn["nodes"]] == ["city-stats"]
    assert conn["pageInfo"] == {
        "hasNextPage": True,
        "hasPreviousPage": True,
        "currentPage": 1,
        "totalPages": 3,
    }

    # no match
    res = execute_graphql(
        spark, ws, '{ search { query(query: "nope") { totalCount pageInfo { totalPages } } } }'
    )
    assert res["data"]["search"]["query"]["totalCount"] == 0
    assert res["data"]["search"]["query"]["pageInfo"]["totalPages"] == 1
