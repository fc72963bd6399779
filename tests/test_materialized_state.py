"""Materialized-state equivalence: merges against the compact
latest-per-PK state must produce byte-identical commits to merges
against the full history scan (the reference's flagged perf debt)."""

from __future__ import annotations

from datetime import datetime, timezone

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategySnapshot
from kamu_cli_spark.writer import DataWriter


def T(d):
    return datetime(2024, 1, d, tzinfo=timezone.utc)


POLLS = [
    [("kyiv", 3), ("lviv", 7), ("odessa", 5)],
    [("kyiv", 4), ("lviv", 7)],                       # change + delete
    [("kyiv", 4), ("lviv", 8), ("dnipro", 2)],        # change + add
    [("lviv", 8), ("dnipro", 2)],                      # delete kyiv
    [("kyiv", 9), ("lviv", 8), ("dnipro", 2)],        # re-add after retract
]


def _ingest(spark, ws, name, maintain_state):
    ds = Dataset.create(ws, name, system_time=T(1).isoformat())
    w = DataWriter(
        ds, MergeStrategySnapshot(["city"]), maintain_state=maintain_state
    )
    for i, rows in enumerate(POLLS):
        w.write(
            spark,
            spark.createDataFrame(rows, "city string, population int"),
            system_time=T(i + 1),
            source_event_time=T(i + 1),
        )
    return ds


def test_state_equivalence(spark, tmp_path):
    with_state = _ingest(spark, str(tmp_path), "a", True)
    without = _ingest(spark, str(tmp_path), "b", False)

    da = with_state.read(spark).orderBy("offset")
    db = without.read(spark).orderBy("offset")
    cols = ["offset", "op", "city", "population"]
    assert [tuple(r) for r in da.select(cols).collect()] == [
        tuple(r) for r in db.select(cols).collect()
    ]

    # the state table exists, tracks head, and holds latest-per-PK
    # including the retracted kyiv generations collapsed to one row
    st = with_state.read_state(spark)
    assert st is not None
    state_rows = {r["city"]: (r["op"], r["population"]) for r in st.collect()}
    # re-add after retraction is +A (the projection drops retracted keys
    # before the diff, so kyiv looks new again)
    assert state_rows["kyiv"] == (0, 9)
    assert len(state_rows) == 4  # kyiv, lviv, odessa(-R latest), dnipro


def test_state_invalidated_by_compaction(spark, tmp_path):
    from kamu_cli_spark.compaction import compact

    ds = _ingest(spark, str(tmp_path), "c", True)
    assert ds.read_state(spark) is not None
    compact(spark, ds, max_slice_records=100)
    # chain head changed → stale state must not be served
    assert ds.read_state(spark) is None
    # and a subsequent write falls back to full scan and rebuilds state
    w = DataWriter(ds, MergeStrategySnapshot(["city"]), maintain_state=True)
    w.write(
        spark,
        spark.createDataFrame(
            [("kyiv", 9), ("lviv", 8), ("dnipro", 3)], "city string, population int"
        ),
        system_time=T(9),
        source_event_time=T(9),
    )
    assert ds.read_state(spark) is not None


def test_read_state_pk_guard(spark, tmp_path):
    """State materialized under one projection key must not be served
    to a caller expecting another (it would be silently wrong)."""
    ds = _ingest(spark, str(tmp_path), "guarded", True)
    assert ds.read_state(spark) is not None
    assert ds.read_state(spark, primary_key=["city"]) is not None
    assert ds.read_state(spark, primary_key=["country"]) is None
    assert ds.read_state(spark, primary_key=["city", "x"]) is None
