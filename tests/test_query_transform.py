"""Query service + incremental transform tests (reference lifecycle:
query_service_impl.rs, transform_executor_impl.rs)."""

from __future__ import annotations

from datetime import datetime, timezone

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.query import QueryService
from kamu_cli_spark.transform import TransformExecutor, set_transform
from kamu_cli_spark.vocab import OperationType as Op
from kamu_cli_spark.writer import DataWriter


T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
T1 = datetime(2024, 1, 2, tzinfo=timezone.utc)
T2 = datetime(2024, 1, 3, tzinfo=timezone.utc)


def _mk_root(spark, ws, rows1):
    ds = Dataset.create(ws, "cases", system_time=T0.isoformat())
    ds.chain.append(
        {
            "kind": "SetPollingSource",
            "merge": {"kind": "ledger", "primary_key": ["id"]},
        },
        system_time=T0.isoformat(),
    )
    w = DataWriter(ds, MergeStrategyLedger(["id"]))
    w.write(
        spark,
        spark.createDataFrame(rows1, "id long, gender string"),
        system_time=T0,
        source_event_time=T0,
    )
    return ds, w


def test_sql_and_tail(spark, tmp_path):
    ws = str(tmp_path)
    _mk_root(spark, ws, [(1, "M"), (2, "F"), (3, "F")])
    qs = QueryService(spark, ws)

    out = qs.sql("select gender, count(*) as cnt from cases group by gender")
    got = {r["gender"]: r["cnt"] for r in out.collect()}
    assert got == {"M": 1, "F": 2}

    t = qs.tail("cases", limit=2)
    assert [r["id"] for r in t.collect()] == [2, 3]
    t2 = qs.tail("cases", skip=1, limit=2)
    assert [r["id"] for r in t2.collect()] == [1, 2]


def test_to_table_projection(spark, tmp_path):
    ws = str(tmp_path)
    _mk_root(spark, ws, [(1, "M"), (2, "F")])
    qs = QueryService(spark, ws)
    out = qs.sql("select count(*) as n from to_table('cases')")
    assert out.collect()[0]["n"] == 2


def test_incremental_transform(spark, tmp_path):
    ws = str(tmp_path)
    root, w = _mk_root(spark, ws, [(1, "M"), (2, "F"), (3, "F")])

    deriv = Dataset.create(ws, "by_gender", kind="Derivative", system_time=T0.isoformat())
    set_transform(
        deriv,
        inputs={"cases": root.path},
        queries=[
            {
                "alias": "harmonized",
                "query": "select event_time, id, upper(gender) as gender from cases",
            },
            {"query": "select event_time, id, gender from harmonized"},
        ],
        system_time=T0.isoformat(),
    )

    ex = TransformExecutor(deriv)
    ev = ex.execute(spark, system_time=T1)
    assert ev["new_data"]["num_records"] == 3
    assert ev["query_inputs"]["cases"]["new_offset"] == 2

    # no new input → up-to-date, nothing committed
    assert ex.execute(spark, system_time=T1) is None

    # append new input rows → only the delta is processed
    w.write(
        spark,
        spark.createDataFrame([(3, "F"), (4, "m")], "id long, gender string"),
        system_time=T1,
        source_event_time=T1,
    )
    ev2 = ex.execute(spark, system_time=T2)
    assert ev2["new_data"]["num_records"] == 1  # only id=4 is new
    assert ev2["query_inputs"]["cases"]["prev_offset"] == 2
    assert ev2["query_inputs"]["cases"]["new_offset"] == 3

    df = deriv.read(spark).orderBy("offset")
    rows = [(r["offset"], r["op"], r["id"], r["gender"]) for r in df.collect()]
    assert rows == [
        (0, Op.APPEND, 1, "M"),
        (1, Op.APPEND, 2, "F"),
        (2, Op.APPEND, 3, "F"),
        (3, Op.APPEND, 4, "M"),
    ]
    deriv.chain.verify()


def test_sql_registration_is_ast_based_not_textual(spark, tmp_path):
    """A dataset name inside a string literal or matching a CTE alias
    must NOT be auto-registered/rewritten (parser walk, not regex —
    reference query_service_impl.rs:741-808)."""
    from kamu_cli_spark.query import QueryService

    ws = str(tmp_path)
    ds = Dataset.create(ws, "cities", system_time=T0.isoformat())
    DataWriter(ds, MergeStrategyLedger(["city"])).write(
        spark,
        spark.createDataFrame([("kyiv", 3)], "city string, population int"),
        system_time=T0,
    )
    qs = QueryService(spark, ws)

    # name only in a string literal → no registration, literal untouched
    df, state = qs.sql_with_state("SELECT 'cities' AS label, 1 AS n")
    assert state == []
    assert df.collect()[0]["label"] == "cities"

    # CTE alias shadowing the dataset name → the CTE wins, no state pin
    df2, state2 = qs.sql_with_state(
        "WITH cities AS (SELECT 'x' AS city) SELECT city FROM cities"
    )
    assert state2 == []
    assert df2.collect()[0]["city"] == "x"

    # real reference still registers and pins
    df3, state3 = qs.sql_with_state("SELECT count(*) AS n FROM cities")
    assert [s["alias"] for s in state3] == ["cities"]
    assert df3.collect()[0]["n"] == 1
