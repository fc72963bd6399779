"""Streaming sessionization (`session_aggregate`): session windows with
watermark-driven close, equivalence with the batch gaps-and-islands
`sessionize` operator on the same data."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import functions as F

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyAppend
from kamu_cli_spark.operators.windows import sessionize
from kamu_cli_spark.streaming import read_dataset_stream, session_aggregate
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _events(spark):
    rows = [
        # key a: two sessions (10s gap, then a 2h jump)
        ("a", T0, 1),
        ("a", T0 + timedelta(seconds=10), 2),
        ("a", T0 + timedelta(hours=2), 3),
        # key b: one session
        ("b", T0 + timedelta(minutes=5), 4),
    ]
    return spark.createDataFrame(rows, "k string, event_time timestamp, v int")


def test_session_aggregate_matches_batch_sessionize(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "sess", system_time=T0.isoformat())
    DataWriter(ds, MergeStrategyAppend()).write(spark, _events(spark), system_time=T0)

    stream = read_dataset_stream(spark, ds)
    sessions = session_aggregate(
        stream,
        "event_time",
        gap_duration="30 minutes",
        watermark_delay="0 seconds",
        keys=["k"],
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v")],
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["k"], r["session_start"]): (r["n"], r["sum_v"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }

    # batch twin over the identical rows
    batch = (
        sessionize(_events(spark), "event_time", ["k"], gap_seconds=1800)
        .groupBy("k", "session_id")
        .agg(
            F.min("event_time").alias("session_start"),
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("sum_v"),
        )
    )
    want = {
        (r["k"], r["session_start"]): (r["n"], r["sum_v"])
        for r in batch.collect()
    }
    assert got == want
    assert len(want) == 3  # a×2 sessions + b×1


def test_session_aggregate_append_mode_closes_on_watermark(spark, tmp_path):
    """Append mode only emits once the watermark passes session end +
    gap: a second slice far in the future closes the first sessions."""
    ds = Dataset.create(str(tmp_path), "sess2", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyAppend())
    w.write(spark, _events(spark), system_time=T0)
    flush = spark.createDataFrame(
        [("a", T0 + timedelta(days=2), 9), ("b", T0 + timedelta(days=2), 9)],
        "k string, event_time timestamp, v int",
    )
    w.write(spark, flush, system_time=T0 + timedelta(days=1))

    stream = read_dataset_stream(spark, ds, max_files_per_trigger=1)
    sessions = session_aggregate(
        stream,
        "event_time",
        gap_duration="30 minutes",
        watermark_delay="0 seconds",
        keys=["k"],
        aggs=[F.count(F.lit(1)).alias("n")],
    )
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions_closed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql(
        "SELECT k, n FROM sessions_closed ORDER BY k, session_start"
    ).collect()
    # the three original sessions emitted as CLOSED; the flush events'
    # own sessions are still open (watermark == their time) and withheld
    assert [(r["k"], r["n"]) for r in rows] == [("a", 2), ("a", 1), ("b", 1)]
