"""End-to-end runs of the example pipelines (mirrors of the reference's
examples/covid and examples/overdue_shipments)."""

from __future__ import annotations

import os
from datetime import datetime, timezone

import yaml

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators.merge import make_merge_strategy
from kamu_cli_spark.query import QueryService
from kamu_cli_spark.transform import TransformExecutor, set_transform
from kamu_cli_spark.writer import DataWriter

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _add(ws, manifest_path, system_time=T0):
    m = yaml.safe_load(open(manifest_path))
    ds = Dataset.create(ws, m["name"], kind=m.get("kind", "Root"),
                        system_time=system_time.isoformat())
    if m.get("merge"):
        ds.chain.append(
            {"kind": "SetPollingSource", "merge": m["merge"]},
            system_time=system_time.isoformat(),
        )
    if m.get("kind") == "Derivative":
        inputs = {a: os.path.join(ws, r) for a, r in m["inputs"].items()}
        set_transform(ds, inputs, m["queries"], system_time=system_time.isoformat())
    return ds, m


def test_covid_pipeline(spark, tmp_path):
    ws = str(tmp_path)
    root, m = _add(ws, f"{EXAMPLES}/covid/bc.case-details.yaml")
    hm, _ = _add(ws, f"{EXAMPLES}/covid/bc.case-details.hm.yaml")
    daily, _ = _add(ws, f"{EXAMPLES}/covid/daily-cases.yaml")

    strat = make_merge_strategy(**{
        "kind": m["merge"]["kind"], "primary_key": m["merge"]["primary_key"]})
    w = DataWriter(root, strat)
    w.write(
        spark,
        spark.createDataFrame(
            [
                (1, "Male", "30-39", "Vancouver"),
                (2, "F", "<10", "Surrey"),
                (3, "unknown", "90+", "Victoria"),
            ],
            "id long, gender string, age_group string, location string",
        ),
        system_time=T0,
        source_event_time=T0,
    )
    TransformExecutor(hm).execute(spark, system_time=T0)
    TransformExecutor(daily).execute(spark, system_time=T0)

    qs = QueryService(spark, ws)
    got = {
        (r["gender"], r["case_count"])
        for r in qs.sql("select gender, case_count from `daily-cases`").collect()
    }
    assert got == {("M", 1), ("F", 1), ("U", 1)}
    # harmonization applied CASE mapping
    hm_rows = {r["gender"] for r in hm.read(spark).collect()}
    assert hm_rows == {"M", "F", "U"}


def test_shipments_pipeline(spark, tmp_path):
    ws = str(tmp_path)
    for name in ("com.acme.orders", "com.acme.shipments"):
        ds = Dataset.create(ws, name, system_time=T0.isoformat())
        ds.chain.append(
            {"kind": "SetPollingSource",
             "merge": {"kind": "ledger", "primary_key": ["order_id", "event_time"]}},
            system_time=T0.isoformat(),
        )
    overdue, _ = _add(ws, f"{EXAMPLES}/shipments/com.acme.shipments.overdue.yaml")

    d = lambda day, h=0: datetime(2024, 1, day, h, tzinfo=timezone.utc)  # noqa: E731
    orders = Dataset(os.path.join(ws, "com.acme.orders"))
    shipments = Dataset(os.path.join(ws, "com.acme.shipments"))
    from kamu_cli_spark.operators import MergeStrategyLedger

    DataWriter(orders, MergeStrategyLedger(["order_id"])).write(
        spark,
        spark.createDataFrame(
            [(d(1), 1, 10), (d(1), 2, 120), (d(3), 3, 9)],
            "event_time timestamp, order_id long, quantity long",
        ),
        system_time=d(5),
    )
    DataWriter(shipments, MergeStrategyLedger(["order_id"])).write(
        spark,
        spark.createDataFrame(
            [
                (d(1, 4), 1, 10),    # order 1 fully shipped within window
                (d(2), 2, 100),      # order 2 partially shipped → overdue
                (d(3, 1), 3, 4),     # order 3 partial → overdue
            ],
            "event_time timestamp, order_id long, quantity long",
        ),
        system_time=d(5),
    )
    TransformExecutor(overdue).execute(spark, system_time=d(6))

    rows = {
        (r["order_id"], r["ordered"], r["shipped"])
        for r in overdue.read(spark).collect()
    }
    assert rows == {(2, 120, 100), (3, 9, 4)}
