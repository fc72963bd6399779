"""Writer pipeline + metadata chain lifecycle tests.

Mirrors the reference's writer/chain invariants (writer.rs pipeline,
metadata_chain.rs:968-990): dense contiguous offsets, monotonic
watermark, prev-hash chaining, schema fixed at first write, slice files
sorted by offset.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.ledger import ChainIntegrityError
from kamu_cli_spark.operators import MergeStrategyLedger, MergeStrategySnapshot
from kamu_cli_spark.vocab import OperationType as Op
from kamu_cli_spark.writer import DataWriter, WriterError


T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
T1 = datetime(2024, 1, 2, tzinfo=timezone.utc)
T2 = datetime(2024, 1, 3, tzinfo=timezone.utc)


def test_ledger_ingest_lifecycle(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "cities", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["city"]))

    poll1 = spark.createDataFrame(
        [("vancouver", 1), ("seattle", 2)], "city string, population int"
    )
    ev1 = w.write(spark, poll1, system_time=T0, source_event_time=T0)
    assert ev1["new_data"]["offset_interval"] == {"start": 0, "end": 1}

    # overlapping poll → only unseen key appended, offsets continue
    poll2 = spark.createDataFrame(
        [("seattle", 2), ("kyiv", 3)], "city string, population int"
    )
    ev2 = w.write(spark, poll2, system_time=T1, source_event_time=T1)
    assert ev2["new_data"]["offset_interval"] == {"start": 2, "end": 2}

    # up-to-date poll → no commit
    ev3 = w.write(spark, poll2, system_time=T2, source_event_time=T2)
    assert ev3 is None

    df = ds.read(spark)
    assert df.count() == 3
    rows = {r["city"]: r for r in df.collect()}
    assert rows["kyiv"]["offset"] == 2 and rows["kyiv"]["op"] == Op.APPEND
    assert df.columns[:4] == ["offset", "op", "system_time", "event_time"]

    ds.chain.verify()
    kinds = [b.event["kind"] for b in ds.chain.blocks()]
    assert kinds == ["Seed", "SetDataSchema", "AddData", "AddData"]


def test_snapshot_ingest_watermark_and_offsets(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "snap", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategySnapshot(["city"]))

    poll1 = spark.createDataFrame(
        [("vancouver", 1), ("seattle", 2), ("kyiv", 3)], "city string, population int"
    )
    w.write(spark, poll1, system_time=T0, source_event_time=T0)
    poll2 = spark.createDataFrame(
        [("seattle", 2), ("kyiv", 4), ("odessa", 5)], "city string, population int"
    )
    w.write(spark, poll2, system_time=T1, source_event_time=T1)

    df = ds.read(spark).orderBy("offset")
    got = [(r["offset"], r["op"], r["city"], r["population"]) for r in df.collect()]
    # poll1: appends sorted by (city, op); poll2: kyiv -C/+C pair, odessa +A,
    # vancouver -R — sorted by (city, op), offsets dense & contiguous
    assert got == [
        (0, Op.APPEND, "kyiv", 3),
        (1, Op.APPEND, "seattle", 2),
        (2, Op.APPEND, "vancouver", 1),
        (3, Op.CORRECT_FROM, "kyiv", 3),
        (4, Op.CORRECT_TO, "kyiv", 4),
        (5, Op.APPEND, "odessa", 5),
        (6, Op.RETRACT, "vancouver", 1),
    ]
    wm = ds.chain.current_watermark()
    assert wm is not None and wm.startswith("2024-01-02")
    ds.chain.verify()


def test_system_column_clash_rejected(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "clash", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["city"]))
    bad = spark.createDataFrame([(0, "a", 1)], "offset long, city string, v int")
    with pytest.raises(WriterError, match="clashes"):
        w.write(spark, bad, system_time=T0)


def test_schema_fixed_after_first_write(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "fixed", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["city"]))
    w.write(spark, spark.createDataFrame([("a", 1)], "city string, v int"), system_time=T0)
    with pytest.raises(WriterError, match="incompatible"):
        w.write(
            spark,
            spark.createDataFrame([("b", "oops")], "city string, v string"),
            system_time=T1,
        )


def test_chain_tamper_detection(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "tamper", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["city"]))
    w.write(spark, spark.createDataFrame([("a", 1)], "city string, v int"), system_time=T0)

    path = ds.chain.path
    lines = open(path).read().splitlines()
    lines[-1] = lines[-1].replace('"num_records":1', '"num_records":999')
    open(path, "w").write("\n".join(lines) + "\n")

    tampered = Dataset(ds.path)
    with pytest.raises(ChainIntegrityError):
        tampered.chain.verify()


def test_read_between_offset_interval(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "interval", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["k"]))
    w.write(spark, spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"), system_time=T0)
    w.write(spark, spark.createDataFrame([("c", 3), ("d", 4)], "k string, v int"), system_time=T1)

    inc = ds.read_between(spark, prev_offset=1, new_offset=None)
    assert sorted(r["k"] for r in inc.collect()) == ["c", "d"]
    assert ds.read_between(spark, prev_offset=3, new_offset=None) is None
