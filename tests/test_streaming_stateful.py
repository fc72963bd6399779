"""Stateful streaming upsert: continuous path must equal the batch
UpsertStream strategy over the same inputs."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.streaming import read_dataset_stream
from kamu_cli_spark.streaming.stateful import streaming_upsert_to_changelog
from kamu_cli_spark.vocab import OperationType as Op
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
T1 = datetime(2024, 1, 2, tzinfo=timezone.utc)


def test_streaming_upsert_state_across_batches(spark, tmp_path):
    """Two source slices → two micro-batches; state carries between
    them so corrections classify against batch-1 values."""
    ws = str(tmp_path)
    src = Dataset.create(ws, "ups", system_time=T0.isoformat())
    w = DataWriter(src, MergeStrategyLedger(["seq"]))
    # batch 1: two appends
    w.write(
        spark,
        spark.createDataFrame(
            [(1, Op.APPEND, "kyiv", 3), (2, Op.APPEND, "lviv", 7)],
            "seq long, user_op int, city string, population int",
        ),
        system_time=T0,
    )
    # batch 2: correction, no-op, retract, retract-unseen
    w.write(
        spark,
        spark.createDataFrame(
            [
                (3, Op.APPEND, "kyiv", 4),     # correction
                (4, Op.APPEND, "lviv", 7),     # no-op
                (5, Op.RETRACT, "kyiv", 0),    # retract
                (6, Op.RETRACT, "odessa", 0),  # retract unseen → drop
            ],
            "seq long, user_op int, city string, population int",
        ),
        system_time=T1,
    )

    stream = read_dataset_stream(spark, src, max_files_per_trigger=1).select(
        "seq", F.col("user_op").alias("op"), "city", "population"
    )
    changelog = streaming_upsert_to_changelog(
        stream,
        primary_key=["city"],
        value_columns=["population"],
        order_column="seq",
    )
    q = (
        changelog.writeStream.format("memory")
        .queryName("upsert_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        (r["city"], r["op"], r["population"])
        for r in spark.sql("select * from upsert_out").collect()
    )
    assert got == sorted(
        [
            ("kyiv", Op.APPEND, 3),
            ("lviv", Op.APPEND, 7),
            ("kyiv", Op.CORRECT_FROM, 3),
            ("kyiv", Op.CORRECT_TO, 4),
            ("kyiv", Op.RETRACT, 4),
        ]
    )


def test_continuous_cdc_into_dataset(spark, tmp_path):
    """Full continuous path: upsert stream → stateful changelog →
    foreachBatch → ChangelogStream writer → committed dataset whose
    state projection reflects the latest values."""
    from kamu_cli_spark.operators import MergeStrategyChangelogStream, project_changelog
    from kamu_cli_spark.streaming import stream_ingest

    ws = str(tmp_path)
    src = Dataset.create(ws, "ups2", system_time=T0.isoformat())
    w = DataWriter(src, MergeStrategyLedger(["seq"]))
    w.write(
        spark,
        spark.createDataFrame(
            [
                (1, Op.APPEND, "kyiv", 3),
                (2, Op.APPEND, "kyiv", 4),   # intra-stream correction
                (3, Op.APPEND, "lviv", 7),
                (4, Op.RETRACT, "lviv", 0),
            ],
            "seq long, user_op int, city string, population int",
        ),
        system_time=T0,
    )

    stream = read_dataset_stream(spark, src).select(
        "seq", F.col("user_op").alias("op"), "city", "population"
    )
    changelog = streaming_upsert_to_changelog(
        stream, ["city"], ["population"], order_column="seq"
    )
    dst = Dataset.create(ws, "cdc", system_time=T0.isoformat())
    q = stream_ingest(
        changelog,
        dst,
        MergeStrategyChangelogStream(["city"]),
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(180)

    full = dst.read(spark)
    assert full.count() == 5  # +A,-C,+C kyiv; +A,-R lviv
    state = project_changelog(full, ["city"])
    assert {(r["city"], r["population"]) for r in state.collect()} == {("kyiv", 4)}
    dst.chain.verify()


def test_streaming_upsert_null_value_no_spurious_corrections(spark, tmp_path):
    """Repeated upserts carrying a NULL value column are no-ops; the
    NaN-unsafe `vals != prev_vals` compare used to emit a spurious
    -C/+C pair every micro-batch (regression: ADVICE r1/r2)."""
    ws = str(tmp_path)
    src = Dataset.create(ws, "upsnull", system_time=T0.isoformat())
    w = DataWriter(src, MergeStrategyLedger(["seq"]))
    # two slices → two micro-batches, same null-valued upsert in each
    w.write(
        spark,
        spark.createDataFrame(
            [(1, Op.APPEND, "kyiv", None)],
            "seq long, user_op int, city string, population int",
        ),
        system_time=T0,
    )
    w.write(
        spark,
        spark.createDataFrame(
            [(2, Op.APPEND, "kyiv", None), (3, Op.APPEND, "lviv", 7)],
            "seq long, user_op int, city string, population int",
        ),
        system_time=T1,
    )

    stream = read_dataset_stream(spark, src, max_files_per_trigger=1).select(
        "seq", F.col("user_op").alias("op"), "city", "population"
    )
    changelog = streaming_upsert_to_changelog(
        stream, ["city"], ["population"], order_column="seq"
    )
    q = (
        changelog.writeStream.format("memory")
        .queryName("upsert_null_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckptn"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = sorted(
        (r["city"], r["op"], r["population"])
        for r in spark.sql("select * from upsert_null_out").collect()
    )
    # exactly one +A per key — no -C/+C churn from the null value
    assert got == sorted(
        [("kyiv", Op.APPEND, None), ("lviv", Op.APPEND, 7)]
    )
