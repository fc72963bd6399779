"""OData $filter parser: expression subset → Spark Column semantics
(reference: adapter/odata/src/handler.rs:50-254), plus the REST
endpoint integration."""

from __future__ import annotations

import json
import socket
import urllib.parse
import urllib.request
from datetime import datetime, timezone

import pytest

from kamu_cli_spark.api import serve
from kamu_cli_spark.api.odata_filter import ODataFilterError, parse_filter
from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


@pytest.fixture(scope="module")
def cities(spark):
    return spark.createDataFrame(
        [
            ("kyiv", 2967, "ua"),
            ("lviv", 717, "ua"),
            ("krakow", 779, "pl"),
            (None, 1, "xx"),
        ],
        "city string, population int, country string",
    )


def _names(df):
    return sorted(r["city"] or "?" for r in df.collect())


def test_filter_comparisons(cities):
    assert _names(cities.filter(parse_filter("population gt 750"))) == [
        "krakow", "kyiv",
    ]
    assert _names(cities.filter(parse_filter("city eq 'kyiv'"))) == ["kyiv"]
    assert _names(cities.filter(parse_filter("city ne 'kyiv'"))) == [
        "krakow", "lviv",
    ]
    assert _names(cities.filter(parse_filter("city eq null"))) == ["?"]
    assert _names(cities.filter(parse_filter("city ne null"))) == [
        "krakow", "kyiv", "lviv",
    ]


def test_filter_boolean_combinators(cities):
    got = cities.filter(
        parse_filter("country eq 'ua' and population lt 1000")
    )
    assert _names(got) == ["lviv"]
    got = cities.filter(
        parse_filter("(city eq 'kyiv' or city eq 'krakow') and population gt 800")
    )
    assert _names(got) == ["kyiv"]
    got = cities.filter(parse_filter("not (country eq 'ua')"))
    assert _names(got) == ["krakow", "xx"] or _names(got) == ["?", "krakow"]


def test_filter_string_functions(cities):
    assert _names(cities.filter(parse_filter("contains(city, 'yi')"))) == ["kyiv"]
    assert _names(cities.filter(parse_filter("startswith(city, 'k')"))) == [
        "krakow", "kyiv",
    ]
    assert _names(cities.filter(parse_filter("endswith(city, 'viv')"))) == ["lviv"]
    assert _names(
        cities.filter(parse_filter("tolower(country) eq 'pl'"))
    ) == ["krakow"]


def test_filter_quote_escape(spark):
    df = spark.createDataFrame([("o'brien",), ("smith",)], "name string")
    got = df.filter(parse_filter("name eq 'o''brien'")).collect()
    assert [r["name"] for r in got] == ["o'brien"]


def test_filter_errors(cities):
    for bad in ["population gt", "eq 5", "city foo 'x'", "contains(city",
                "city eq 'kyiv' trailing"]:
        with pytest.raises(ODataFilterError):
            parse_filter(bad)


def test_odata_endpoint_filter(spark, tmp_path):
    ws = str(tmp_path)
    ds = Dataset.create(ws, "cities", system_time=T0.isoformat())
    DataWriter(ds, MergeStrategyLedger(["city"])).write(
        spark,
        spark.createDataFrame(
            [("kyiv", 2967), ("lviv", 717), ("krakow", 779)],
            "city string, population int",
        ),
        system_time=T0,
    )
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = serve(spark, ws, port=port, background=True)
    try:
        flt = urllib.parse.quote("population gt 750 and startswith(city, 'k')")
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/odata/cities?$filter={flt}&$orderby=city"
        ) as r:
            body = json.loads(r.read())
        assert [v["city"] for v in body["value"]] == ["krakow", "kyiv"]
    finally:
        srv.shutdown()
