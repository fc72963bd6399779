"""Edge-case tests: as-of join strictness/suffixes, top-N ties, orphan
slice recovery, salted agg vs empty input."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.operators.asof import asof_join
from kamu_cli_spark.operators.windows import top_n
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _t(d):
    return datetime(2024, 1, d, tzinfo=timezone.utc)


def test_asof_inclusive_vs_strict(spark):
    left = spark.createDataFrame([(1, _t(5))], "k int, t timestamp")
    right = spark.createDataFrame(
        [(1, _t(5), 100), (1, _t(3), 50)], "k int, rt timestamp, v int"
    )
    inc = asof_join(left, right, ["k"], "t", "rt")
    assert inc.collect()[0]["v"] == 100  # rt == t matches inclusively
    strict = asof_join(left, right, ["k"], "t", "rt", strict=True)
    assert strict.collect()[0]["v"] == 50  # rt < t only


def test_asof_no_match_and_suffix(spark):
    left = spark.createDataFrame([(1, _t(2), "L")], "k int, t timestamp, v string")
    right = spark.createDataFrame([(1, _t(9), 7)], "k int, rt timestamp, v int")
    out = asof_join(left, right, ["k"], "t", "rt", suffix="_r")
    row = out.collect()[0]
    assert row["v"] == "L" and row["v_r"] is None  # clash suffixed, no match → null


def test_asof_left_payload_preserved(spark):
    left = spark.createDataFrame(
        [(1, _t(5), "a", 10), (2, _t(5), "b", 20)],
        "k int, t timestamp, name string, qty int",
    )
    right = spark.createDataFrame([(1, _t(1), 5.0)], "k int, rt timestamp, rate double")
    out = asof_join(left, right, ["k"], "t", "rt")
    rows = {r["k"]: r for r in out.collect()}
    assert rows[1]["name"] == "a" and rows[1]["rate"] == 5.0
    assert rows[2]["qty"] == 20 and rows[2]["rate"] is None


def test_top_n_global_plan_has_no_global_sort_shuffle(spark):
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 100).alias("score")
    )
    top = top_n(df, 3, order_by=[F.desc("score"), F.asc("id")])
    assert [r["id"] for r in top.collect()] == [99, 199, 299]
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # per-partition heaps, no full sort


def test_orphan_slice_cleanup(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "o", system_time=T0.isoformat())
    DataWriter(ds, MergeStrategyLedger(["k"])).write(
        spark, spark.createDataFrame([("a", 1)], "k string, v int"), system_time=T0
    )
    # simulate a crashed writer: slice file exists, never committed
    orphan = tmp_path / "o" / "data" / "999999-5-9.parquet"
    orphan.write_bytes(b"not really parquet")
    removed = ds.clean_orphan_slices()
    assert removed == ["data/999999-5-9.parquet"]
    assert ds.read(spark).count() == 1
    ds.chain.verify()


def test_orphan_cleanup_min_age_spares_inflight_slice(spark, tmp_path):
    """gc's --min-age applies to unreferenced parquet too: a writer
    lands its slice in data/ BEFORE committing the chain block, so a
    fresh unreferenced slice may belong to an in-flight commit and must
    survive an aged gc pass."""
    ds = Dataset.create(str(tmp_path), "o", system_time=T0.isoformat())
    DataWriter(ds, MergeStrategyLedger(["k"])).write(
        spark, spark.createDataFrame([("a", 1)], "k string, v int"), system_time=T0
    )
    inflight = tmp_path / "o" / "data" / "000010-1-1.parquet"
    inflight.write_bytes(b"slice awaiting its chain commit")
    assert ds.clean_orphan_slices(min_age=3600.0) == []  # spared
    assert inflight.exists()
    assert ds.clean_orphan_slices() == ["data/000010-1-1.parquet"]


def test_reset_cleanup_spares_unrelated_orphans(spark, tmp_path):
    """reset reaps exactly the slices its truncation dropped — an
    unreferenced file from a concurrent in-flight writer is untouched."""
    from kamu_cli_spark.reset import reset_dataset

    ds = Dataset.create(str(tmp_path), "o", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["k"]))
    w.write(spark, spark.createDataFrame([("a", 1)], "k string, v int"), system_time=T0)
    head_after_first = ds.head_hash()
    w.write(spark, spark.createDataFrame([("b", 2)], "k string, v int"), system_time=_t(2))
    inflight = tmp_path / "o" / "data" / "999999-5-9.parquet"
    inflight.write_bytes(b"concurrent writer, not yet committed")
    out = reset_dataset(ds, new_head=head_after_first)
    assert out["dropped_blocks"] == 1
    assert len(out["removed_slices"]) == 1  # the dropped slice only
    assert inflight.exists()
    ds.chain.verify()
    assert ds.read(spark).count() == 1
