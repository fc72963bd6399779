"""Additive schema evolution: later batches may add columns (fresh
SetDataSchema block, old rows read as typed nulls) or omit declared
columns (null-filled); type changes stay rejected. The reference fixes
the schema at first write (writer.rs:413-515) and tracks evolution as a
TODO — this surface deliberately exceeds it, mirroring Delta-style
additive evolution on the ODF ledger model."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators.merge import MergeStrategyLedger, MergeStrategySnapshot
from kamu_cli_spark.writer import DataWriter, WriterError

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
T1 = datetime(2024, 1, 2, tzinfo=timezone.utc)
T2 = datetime(2024, 1, 3, tzinfo=timezone.utc)


def test_additive_column_evolves_schema(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "grow", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["city"]))
    w.write(
        spark,
        spark.createDataFrame([("a", 1), ("b", 2)], "city string, v int"),
        system_time=T0,
    )
    w.write(
        spark,
        spark.createDataFrame(
            [("c", 3, 0.5)], "city string, v int, score double"
        ),
        system_time=T1,
    )
    df = ds.read(spark)
    assert "score" in df.columns
    rows = {r["city"]: r["score"] for r in df.collect()}
    # pre-evolution rows surface the new column as nulls
    assert rows == {"a": None, "b": None, "c": 0.5}
    # the ledger carries BOTH schema declarations, in order
    schemas = [
        b.event["fields"]
        for b in ds.chain.iter_events("SetDataSchema")
    ]
    assert len(schemas) == 2
    assert [f["name"] for f in schemas[0]][-2:] == ["city", "v"]
    assert [f["name"] for f in schemas[1]][-3:] == ["city", "v", "score"]


def test_as_of_read_pins_pre_evolution_schema(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "pin", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["city"]))
    w.write(
        spark,
        spark.createDataFrame([("a", 1)], "city string, v int"),
        system_time=T0,
    )
    head_before = ds.head_hash()
    w.write(
        spark,
        spark.createDataFrame([("b", 2, 9.0)], "city string, v int, score double"),
        system_time=T1,
    )
    pinned = ds.read(spark, as_of=head_before)
    assert "score" not in pinned.columns
    assert pinned.count() == 1
    assert "score" in ds.read(spark).columns


def test_missing_declared_column_null_filled(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "shrinkin", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["city"]))
    w.write(
        spark,
        spark.createDataFrame([("a", 1)], "city string, v int"),
        system_time=T0,
    )
    # batch omits `v` entirely — accepted, lands as null
    w.write(
        spark,
        spark.createDataFrame([("b",)], "city string"),
        system_time=T1,
    )
    rows = {r["city"]: r["v"] for r in ds.read(spark).collect()}
    assert rows == {"a": 1, "b": None}
    # no new schema block for an omission: declared schema is unchanged
    assert len(list(ds.chain.iter_events("SetDataSchema"))) == 1


def test_type_change_still_rejected(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "fixed2", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["city"]))
    w.write(
        spark,
        spark.createDataFrame([("a", 1)], "city string, v int"),
        system_time=T0,
    )
    with pytest.raises(WriterError, match="incompatible"):
        w.write(
            spark,
            spark.createDataFrame([("b", "oops")], "city string, v string"),
            system_time=T1,
        )


def test_snapshot_cdc_across_evolution(spark, tmp_path):
    """A snapshot batch that introduces a column diffs against prev
    where the column reads as null: rows gaining a value emit -C/+C,
    truly-unchanged rows emit nothing."""
    ds = Dataset.create(str(tmp_path), "snap_evo", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategySnapshot(["pk"]))
    w.write(
        spark,
        spark.createDataFrame([(1, "x"), (2, "y")], "pk int, name string"),
        system_time=T0,
    )
    # same names, but pk=1 gains tier="gold"; pk=2's tier stays null
    w.write(
        spark,
        spark.createDataFrame(
            [(1, "x", "gold"), (2, "y", None)],
            "pk int, name string, tier string",
        ),
        system_time=T1,
    )
    df = ds.read(spark)
    ops = [
        (r["pk"], r["op"], r["tier"])
        for r in df.orderBy("offset").collect()
    ]
    assert ops == [
        (1, 0, None),  # +A t0
        (2, 0, None),  # +A t0
        (1, 2, None),  # -C old (tier read back as null)
        (1, 3, "gold"),  # +C new
    ]


def test_changelog_projection_after_evolution(spark, tmp_path):
    from kamu_cli_spark.operators.merge import project_changelog

    ds = Dataset.create(str(tmp_path), "proj_evo", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategySnapshot(["pk"]))
    w.write(
        spark,
        spark.createDataFrame([(1, "x"), (2, "y")], "pk int, name string"),
        system_time=T0,
    )
    w.write(
        spark,
        spark.createDataFrame(
            [(1, "x", "gold"), (2, "y", None)],
            "pk int, name string, tier string",
        ),
        system_time=T1,
    )
    state = project_changelog(ds.read(spark), ["pk"])
    rows = {r["pk"]: (r["name"], r["tier"]) for r in state.collect()}
    assert rows == {1: ("x", "gold"), 2: ("y", None)}
