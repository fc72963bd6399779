"""Ingest schema-inference heuristics (reference preprocess_default,
ingest_common.rs:60-177): system-column clashes are renamed with a
leading underscore instead of rejected, numeric event_time is treated
as UNIX seconds, string event_time as RFC3339 — applied only on ingest
paths (infer_schema=True) when the source declares no explicit read
schema; direct writer use stays strict.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.operators.merge import MergeStrategyChangelogStream
from kamu_cli_spark.sources.fetch import ingest_files_glob
from kamu_cli_spark.writer import DataWriter, WriterError

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
T1 = datetime(2024, 1, 2, tzinfo=timezone.utc)


def test_system_column_clash_renamed_not_rejected(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "ren", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["city"]), infer_schema=True)
    df = spark.createDataFrame(
        [(7, T0, "vancouver", 1)],
        "offset long, system_time timestamp, city string, v int",
    )
    w.write(spark, df, system_time=T0)
    out = ds.read(spark)
    assert "_offset" in out.columns and "_system_time" in out.columns
    # the REAL system columns are the writer's, not the renamed data
    row = out.select("offset", "_offset", "city").collect()[0]
    assert row["offset"] == 0 and row["_offset"] == 7


def test_op_clash_renamed_for_ledger_kept_for_changelog(spark, tmp_path):
    # ledger stamps its own op → a data 'op' column is a clash → renamed
    ds = Dataset.create(str(tmp_path), "opren", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["k"]), infer_schema=True)
    df = spark.createDataFrame([(9, "a")], "op long, k string")
    w.write(spark, df, system_time=T0)
    assert "_op" in ds.read(spark).columns

    # changelog-stream input legitimately carries op → NOT renamed
    ds2 = Dataset.create(str(tmp_path), "opkeep", system_time=T0.isoformat())
    w2 = DataWriter(
        ds2, MergeStrategyChangelogStream(["k"]), infer_schema=True
    )
    df2 = spark.createDataFrame([(0, "a", 1)], "op int, k string, v int")
    w2.write(spark, df2, system_time=T0)
    out2 = ds2.read(spark)
    assert "_op" not in out2.columns


def test_numeric_event_time_coerced_as_unix_seconds(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "unixet", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["k"]), infer_schema=True)
    # 2024-01-01T00:00:00Z == 1704067200
    df = spark.createDataFrame([(1704067200, "a")], "event_time long, k string")
    w.write(spark, df, system_time=T1)
    out = ds.read(spark)
    assert dict(out.dtypes)["event_time"].startswith("timestamp")
    et = out.select("event_time").collect()[0][0]
    assert et.strftime("%Y-%m-%d %H:%M:%S") == "2024-01-01 00:00:00"


def test_string_event_time_coerced_as_rfc3339(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "stret", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["k"]), infer_schema=True)
    df = spark.createDataFrame(
        [("2024-01-01T12:30:00Z", "a")], "event_time string, k string"
    )
    w.write(spark, df, system_time=T1)
    out = ds.read(spark)
    assert dict(out.dtypes)["event_time"].startswith("timestamp")
    et = out.select("event_time").collect()[0][0]
    assert et.strftime("%Y-%m-%d %H:%M:%S") == "2024-01-01 12:30:00"


def test_direct_writer_stays_strict_without_flag(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "strict", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["k"]))
    df = spark.createDataFrame([(1, "a")], "offset long, k string")
    with pytest.raises(WriterError, match="clashes"):
        w.write(spark, df, system_time=T0)


def test_files_glob_ingest_applies_inference_every_poll(spark, tmp_path):
    """A CSV feed carrying offset + numeric event_time columns ingests
    the way the reference does — including on the SECOND poll, after
    the dataset schema is committed (the rename is idempotent)."""
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    (inbox / "a.csv").write_text("offset,event_time,k\n5,1704067200,x\n")

    ds = Dataset.create(str(tmp_path), "feed")
    strat = MergeStrategyLedger(["k"])
    evs = ingest_files_glob(
        spark, ds, strat, str(inbox / "*.csv")
    )
    assert len(evs) == 1
    out = ds.read(spark)
    assert "_offset" in out.columns
    assert dict(out.dtypes)["event_time"].startswith("timestamp")

    (inbox / "b.csv").write_text("offset,event_time,k\n6,1704153600,y\n")
    evs2 = ingest_files_glob(
        spark, ds, strat, str(inbox / "*.csv")
    )
    assert len(evs2) == 1
    assert ds.read(spark).count() == 2
