"""Retractions/corrections flowing through derivative transforms —
the cross-engine golden behavior in the reference
(test_engine_transform.rs:395-738): a snapshot root emits -C/+C/-R
events; a map-style derivative keeping the op column propagates them.
"""

from __future__ import annotations

from datetime import datetime, timezone

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategySnapshot
from kamu_cli_spark.transform import TransformExecutor, set_transform
from kamu_cli_spark.vocab import OperationType as Op
from kamu_cli_spark.writer import DataWriter


def T(d):
    return datetime(2024, 1, d, tzinfo=timezone.utc)


def test_corrections_propagate_through_map_transform(spark, tmp_path):
    ws = str(tmp_path)
    root = Dataset.create(ws, "cities", system_time=T(1).isoformat())
    w = DataWriter(root, MergeStrategySnapshot(["city"]))

    deriv = Dataset.create(ws, "big", kind="Derivative", system_time=T(1).isoformat())
    set_transform(
        deriv,
        {"cities": root.path},
        # map transform keeps op → changelog semantics flow through
        "select op, event_time, city, population * 10 as pop10 "
        "from cities where population > 1",
        system_time=T(1).isoformat(),
    )
    ex = TransformExecutor(deriv)

    # poll 1: 3 cities
    w.write(
        spark,
        spark.createDataFrame(
            [("kyiv", 3), ("lviv", 7), ("odessa", 1)], "city string, population int"
        ),
        system_time=T(1),
        source_event_time=T(1),
    )
    ex.execute(spark, system_time=T(1))
    d1 = deriv.read(spark)
    assert {(r["op"], r["city"], r["pop10"]) for r in d1.collect()} == {
        (Op.APPEND, "kyiv", 30),
        (Op.APPEND, "lviv", 70),
        # odessa filtered out by population > 1
    }

    # poll 2: kyiv corrected, lviv retracted
    w.write(
        spark,
        spark.createDataFrame(
            [("kyiv", 4), ("odessa", 1)], "city string, population int"
        ),
        system_time=T(2),
        source_event_time=T(2),
    )
    ex.execute(spark, system_time=T(2))
    d2 = deriv.read(spark).orderBy("offset")
    new_events = [
        (r["op"], r["city"], r["pop10"]) for r in d2.collect()[2:]
    ]
    assert sorted(new_events) == [
        (Op.RETRACT, "lviv", 70),
        (Op.CORRECT_FROM, "kyiv", 30),
        (Op.CORRECT_TO, "kyiv", 40),
    ]

    # derivative state projection reflects the corrected world
    from kamu_cli_spark.operators import project_changelog

    state = project_changelog(deriv.read(spark), ["city"])
    assert {(r["city"], r["pop10"]) for r in state.collect()} == {("kyiv", 40)}
    deriv.chain.verify()


def test_retraction_aware_aggregation(spark, tmp_path):
    """Changelog-in/changelog-out incremental GROUP BY: -R/-C/+C on the
    input re-aggregate ONLY the affected groups and emit +A/-C,+C/-R on
    the aggregate (the streaming-engine behavior the reference's
    aggregating transforms provide, test_engine_transform.rs:651-738)."""
    from kamu_cli_spark.transform import AggregatingTransformExecutor

    ws = str(tmp_path)
    root = Dataset.create(ws, "cities", system_time=T(1).isoformat())
    w = DataWriter(root, MergeStrategySnapshot(["city"]))

    deriv = Dataset.create(ws, "by_country", kind="Derivative", system_time=T(1).isoformat())
    set_transform(
        deriv,
        {"cities": root.path},
        "select country, sum(population) as total_pop, count(*) as n_cities "
        "from cities group by country",
        system_time=T(1).isoformat(),
    )
    ex = AggregatingTransformExecutor(
        deriv, group_keys=["country"], input_primary_key=["city"]
    )

    def poll(day, rows):
        w.write(
            spark,
            spark.createDataFrame(rows, "city string, country string, population int"),
            system_time=T(day),
            source_event_time=T(day),
        )
        ex.execute(spark, system_time=T(day))

    # poll 1: three countries
    poll(1, [("kyiv", "UA", 3), ("lviv", "UA", 7), ("krakow", "PL", 5), ("berlin", "DE", 9)])
    d1 = deriv.read(spark)
    assert {(r["op"], r["country"], r["total_pop"], r["n_cities"]) for r in d1.collect()} == {
        (Op.APPEND, "UA", 10, 2),
        (Op.APPEND, "PL", 5, 1),
        (Op.APPEND, "DE", 9, 1),
    }

    # poll 2: kyiv corrected 3->4, krakow retracted; berlin untouched
    poll(2, [("kyiv", "UA", 4), ("lviv", "UA", 7), ("berlin", "DE", 9)])
    d2 = deriv.read(spark).orderBy("offset")
    new_events = [
        (r["op"], r["country"], r["total_pop"], r["n_cities"])
        for r in d2.collect()[3:]
    ]
    assert sorted(new_events) == [
        (Op.RETRACT, "PL", 5, 1),
        (Op.CORRECT_FROM, "UA", 10, 2),
        (Op.CORRECT_TO, "UA", 11, 2),
    ]
    # the untouched DE group produced NO new events (incremental proof)
    assert sum(1 for r in d2.collect() if r["country"] == "DE") == 1

    # poll 3: lviv MOVES country UA->PL — both groups re-aggregate
    poll(3, [("kyiv", "UA", 4), ("lviv", "PL", 7), ("berlin", "DE", 9)])
    d3 = deriv.read(spark).orderBy("offset")
    new_events = [
        (r["op"], r["country"], r["total_pop"], r["n_cities"])
        for r in d3.collect()[6:]
    ]
    assert sorted(new_events) == [
        (Op.APPEND, "PL", 7, 1),
        (Op.CORRECT_FROM, "UA", 11, 2),
        (Op.CORRECT_TO, "UA", 4, 1),
    ]

    # final projected aggregate state equals a from-scratch aggregation
    from kamu_cli_spark.operators import project_changelog

    state = project_changelog(deriv.read(spark), ["country"])
    assert {(r["country"], r["total_pop"], r["n_cities"]) for r in state.collect()} == {
        ("UA", 4, 1),
        ("PL", 7, 1),
        ("DE", 9, 1),
    }
    deriv.chain.verify()
