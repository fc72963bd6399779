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
        set_transform(
            ds, inputs, m["queries"], system_time=system_time.isoformat(),
            temporal_tables=m.get("temporal_tables"),
            executor=m.get("executor"),
        )
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


def test_leaderboard_pipeline(spark, tmp_path):
    """Mirrors the reference's leaderboard example
    (examples/leaderboard/leaderboard.yaml, RisingWave top-N): the
    global top-2 is maintained as a changelog — a new high score must
    RETRACT/CORRECT displaced entries, not just append."""
    from kamu_cli_spark.operators import MergeStrategyLedger
    from kamu_cli_spark.transform import make_transform_executor
    from kamu_cli_spark.vocab import OperationType as Op

    ws = str(tmp_path)
    scores, m = _add(ws, f"{EXAMPLES}/leaderboard/player-scores.yaml")
    board, _ = _add(ws, f"{EXAMPLES}/leaderboard/leaderboard.yaml")

    d = lambda day: datetime(2024, 1, day, tzinfo=timezone.utc)  # noqa: E731
    w = DataWriter(scores, MergeStrategyLedger(["match_id", "player_id"]))
    w.write(
        spark,
        spark.createDataFrame(
            [(d(1), 1, "alice", 100), (d(1), 1, "bob", 80)],
            "match_time timestamp, match_id long, player_id string, score long",
        ),
        system_time=d(2),
    )
    # the manifest declares the stateful executor; pull-side dispatch
    # (make_transform_executor == what `kamu pull` uses) must pick it up
    ex = make_transform_executor(board)
    from kamu_cli_spark.transform import StatefulTransformExecutor

    assert isinstance(ex, StatefulTransformExecutor)
    ex.execute(spark, system_time=d(2))

    from kamu_cli_spark.operators.merge import project_changelog

    def board_state():
        return {
            (r["place"], r["player_id"], r["score"])
            for r in project_changelog(board.read(spark), ["place"]).collect()
        }

    state1 = board_state()
    assert state1 == {(1, "alice", 100), (2, "bob", 80)}

    # charlie takes 1st place: both rows must be corrected
    w.write(
        spark,
        spark.createDataFrame(
            [(d(3), 2, "charlie", 120)],
            "match_time timestamp, match_id long, player_id string, score long",
        ),
        system_time=d(4),
    )
    ex.execute(spark, system_time=d(4))
    state2 = board_state()
    assert state2 == {(1, "charlie", 120), (2, "alice", 100)}

    # the second commit is corrections (-C/+C pairs), not plain appends
    ops = [
        int(r["op"])
        for r in board.read(spark).filter("offset >= 2").collect()
    ]
    assert sorted(ops) == sorted(
        [int(Op.CORRECT_FROM), int(Op.CORRECT_TO)] * 2
    )


def test_currency_conversion_pipeline(spark, tmp_path):
    """Mirrors the reference's currency_conversion example: a temporal
    (versioned) exchange-rate table joined FOR SYSTEM_TIME AS OF each
    transaction's event time — expressed in Spark SQL as a LATERAL
    as-of lookup, with the rate history registered in full."""
    from kamu_cli_spark.operators import MergeStrategyLedger

    ws = str(tmp_path)
    rates, _ = _add(ws, f"{EXAMPLES}/currency_conversion/exchange-rates.yaml")
    tx, _ = _add(ws, f"{EXAMPLES}/currency_conversion/transactions.yaml")
    cad, _ = _add(ws, f"{EXAMPLES}/currency_conversion/transactions-cad.yaml")

    d = lambda day: datetime(2024, 1, day, tzinfo=timezone.utc)  # noqa: E731
    wr = DataWriter(
        rates, MergeStrategyLedger(["currency_base", "currency_target", "event_time"])
    )
    wt = DataWriter(tx, MergeStrategyLedger(["tx_id"]))

    wr.write(
        spark,
        spark.createDataFrame(
            [(d(1), "USD", "CAD", 1.3)],
            "event_time timestamp, currency_base string, currency_target string, rate double",
        ),
        system_time=d(1),
    )
    wt.write(
        spark,
        spark.createDataFrame(
            [(d(2), 1, "AAPL", "USD", 2, 10.0, 20.0)],
            "event_time timestamp, tx_id long, symbol string, currency string,"
            " quantity long, price double, settlement double",
        ),
        system_time=d(2),
    )
    from kamu_cli_spark.transform import TransformExecutor

    TransformExecutor(cad).execute(spark, system_time=d(2))
    rows1 = {
        (r["tx_id"], r["price_cad"], r["settlement_cad"])
        for r in cad.read(spark).collect()
    }
    assert rows1 == {(1, 13.0, 26.0)}

    # rate moves to 1.4 on day 3; a day-4 trade uses the NEW rate while
    # the incremental pull leaves the day-2 conversion untouched
    wr.write(
        spark,
        spark.createDataFrame(
            [(d(3), "USD", "CAD", 1.4)],
            "event_time timestamp, currency_base string, currency_target string, rate double",
        ),
        system_time=d(3),
    )
    wt.write(
        spark,
        spark.createDataFrame(
            [(d(4), 2, "MSFT", "USD", 1, 100.0, 100.0)],
            "event_time timestamp, tx_id long, symbol string, currency string,"
            " quantity long, price double, settlement double",
        ),
        system_time=d(4),
    )
    TransformExecutor(cad).execute(spark, system_time=d(4))
    rows2 = {
        (r["tx_id"], r["price_cad"], r["settlement_cad"])
        for r in cad.read(spark).collect()
    }
    assert rows2 == {(1, 13.0, 26.0), (2, 140.0, 140.0)}


def test_trading_pipeline(spark, tmp_path):
    """Mirrors the reference's trading example (examples/trading/*):
    transactions ledger → Flink-style cumulative holdings (stateful
    re-evaluate + diff, appends only) → market value via a temporal
    `FOR SYSTEM_TIME AS OF` join of holdings against the daily ticker
    stream, expressed as a LATERAL as-of lookup."""
    from kamu_cli_spark.operators import MergeStrategyLedger
    from kamu_cli_spark.transform import (
        StatefulTransformExecutor,
        TransformExecutor,
        make_transform_executor,
    )

    ws = str(tmp_path)
    tickers, _ = _add(ws, f"{EXAMPLES}/trading/tickers.yaml")
    tx, _ = _add(ws, f"{EXAMPLES}/trading/transactions.yaml")
    holdings, _ = _add(ws, f"{EXAMPLES}/trading/holdings.yaml")
    mv, _ = _add(ws, f"{EXAMPLES}/trading/holdings-market-value.yaml")

    d = lambda day, h=0: datetime(2024, 1, day, h, tzinfo=timezone.utc)  # noqa: E731
    wt = DataWriter(tx, MergeStrategyLedger(["event_time"]))
    wk = DataWriter(tickers, MergeStrategyLedger(["event_time", "symbol"]))

    # day 1: buy 10 SPY @ 100; day 2: buy 5 SPY @ 110, buy 8 IPO @ 50
    wt.write(
        spark,
        spark.createDataFrame(
            [
                (d(1, 9), "SPY", 10, 100.0, -1000.0),
                (d(2, 9), "SPY", 5, 110.0, -550.0),
                (d(2, 10), "IPO", 8, 50.0, -400.0),
            ],
            "event_time timestamp, symbol string, quantity long,"
            " price double, settlement double",
        ),
        system_time=d(3),
    )
    wk.write(
        spark,
        spark.createDataFrame(
            [(d(1, 23), "SPY", 101.0), (d(2, 23), "SPY", 111.0), (d(2, 23), "IPO", 55.0)],
            "event_time timestamp, symbol string, close_adj double",
        ),
        system_time=d(3),
    )

    ex = make_transform_executor(holdings)
    assert isinstance(ex, StatefulTransformExecutor)
    ex.execute(spark, system_time=d(3))
    got = {
        (r["event_time"], r["symbol"], r["cum_quantity"], r["cum_balance"])
        for r in holdings.read(spark).collect()
    }
    assert got == {
        (d(1, 9).replace(tzinfo=None), "SPY", 10, -1000.0),
        (d(2, 9).replace(tzinfo=None), "SPY", 15, -1550.0),
        (d(2, 10).replace(tzinfo=None), "IPO", 8, -400.0),
    }

    TransformExecutor(mv).execute(spark, system_time=d(3))
    got_mv = {
        (r["event_time"], r["symbol"], r["market_value"])
        for r in mv.read(spark).collect()
    }
    # day-1 ticker sees only the day-1 position (10 SPY)
    assert got_mv == {
        (d(1, 23).replace(tzinfo=None), "SPY", 10 * 101.0),
        (d(2, 23).replace(tzinfo=None), "SPY", 15 * 111.0),
        (d(2, 23).replace(tzinfo=None), "IPO", 8 * 55.0),
    }

    # incremental pull: day-3 sell of 12 SPY and the day-3 tickers —
    # holdings appends ONE row (past cumulative rows never change) and
    # market value prices the new positions as-of day 3
    wt.write(
        spark,
        spark.createDataFrame(
            [(d(3, 9), "SPY", -12, 120.0, 1440.0)],
            "event_time timestamp, symbol string, quantity long,"
            " price double, settlement double",
        ),
        system_time=d(4),
    )
    wk.write(
        spark,
        spark.createDataFrame(
            [(d(3, 23), "SPY", 121.0), (d(3, 23), "IPO", 60.0)],
            "event_time timestamp, symbol string, close_adj double",
        ),
        system_time=d(4),
    )
    n_before = holdings.read(spark).count()
    ex.execute(spark, system_time=d(4))
    appended = holdings.read(spark).filter(f"offset >= {n_before}").collect()
    assert len(appended) == 1 and appended[0]["cum_quantity"] == 3

    TransformExecutor(mv).execute(spark, system_time=d(4))
    day3 = {
        (r["symbol"], r["market_value"])
        for r in mv.read(spark)
        .filter("event_time = timestamp'2024-01-03 23:00:00'")
        .collect()
    }
    assert day3 == {("SPY", 3 * 121.0), ("IPO", 8 * 60.0)}
