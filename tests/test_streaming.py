"""Structured Streaming over the dataset layout."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyAppend, MergeStrategyLedger
from kamu_cli_spark.streaming import (
    read_dataset_stream,
    stream_ingest,
    windowed_aggregate,
)
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
T1 = datetime(2024, 1, 2, tzinfo=timezone.utc)


def _mk_source(spark, ws):
    ds = Dataset.create(ws, "src", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["k"]))
    w.write(
        spark,
        spark.createDataFrame(
            [("a", 1, T0), ("b", 2, T0)], "k string, v int, event_time timestamp"
        ),
        system_time=T0,
    )
    w.write(
        spark,
        spark.createDataFrame(
            [("c", 3, T1), ("d", 4, T1)], "k string, v int, event_time timestamp"
        ),
        system_time=T1,
    )
    return ds


def test_stream_ingest_end_to_end(spark, tmp_path):
    """Dataset dir → readStream → foreachBatch → writer → new dataset."""
    ws = str(tmp_path)
    src = _mk_source(spark, ws)
    dst = Dataset.create(ws, "dst", system_time=T0.isoformat())

    stream = read_dataset_stream(spark, src)
    q = stream_ingest(
        stream.select("k", "v", "event_time"),
        dst,
        MergeStrategyAppend(),
        checkpoint_dir=str(tmp_path / "ckpt"),
        transform=lambda df: df.withColumn("v2", F.col("v") * 10),
    )
    q.awaitTermination(120)

    out = dst.read(spark)
    assert out is not None
    rows = {r["k"]: r["v2"] for r in out.collect()}
    assert rows == {"a": 10, "b": 20, "c": 30, "d": 40}
    dst.chain.verify()

    # restart with same checkpoint → no reprocessing (exactly-once files)
    q2 = stream_ingest(
        read_dataset_stream(spark, src).select("k", "v", "event_time"),
        dst,
        MergeStrategyAppend(),
        checkpoint_dir=str(tmp_path / "ckpt"),
        transform=lambda df: df.withColumn("v2", F.col("v") * 10),
    )
    q2.awaitTermination(120)
    assert dst.read(spark).count() == 4


def test_windowed_aggregate_stream(spark, tmp_path):
    ws = str(tmp_path)
    src = _mk_source(spark, ws)
    stream = read_dataset_stream(spark, src)
    agg = windowed_aggregate(
        stream,
        "event_time",
        "1 day",
        watermark_delay="1 day",
        keys=[],
        aggs=[F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum_v")],
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("winagg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"].day: (r["n"], r["sum_v"])
        for r in spark.sql("select * from winagg").collect()
    }
    assert got == {1: (2, 3), 2: (2, 7)}


def test_streaming_dedup_exact(spark, tmp_path):
    """Continuous exact dedup drops same-fingerprint documents across
    micro-batches; normalization matches the batch operator (case +
    whitespace folding)."""
    from kamu_cli_spark.streaming import streaming_dedup_exact

    src = tmp_path / "docs"
    src.mkdir()
    spark.createDataFrame(
        [(1, "Hello  World"), (2, "unique one")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(
        [(3, "hello world"), (4, "another doc")], "doc_id long, text string"
    ).coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = (
        streaming_dedup_exact(stream, "doc_id")
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT doc_id, fingerprint FROM dedup_out").collect()
    fps = [r["fingerprint"] for r in rows]
    assert len(fps) == len(set(fps)) == 3  # doc 1/3 collapse to one
    survivors = {r["doc_id"] for r in rows}
    assert {2, 4}.issubset(survivors)
    assert len(survivors & {1, 3}) == 1
