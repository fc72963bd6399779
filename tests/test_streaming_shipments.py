"""CONTINUOUS overdue-shipments pipeline: the reference runs all three
queries of examples/overdue_shipments as one continuous Flink job
(interval join → TUMBLE aggregation → under-fulfilled filter). Spark
twin: a single streaming query chaining TWO stateful operators — the
stream-stream interval join and the windowed aggregation — with the
filter on top, in append mode with watermark propagation (multiple
stateful operators, supported since Spark 3.5.1+ / 4.x). Asserted
against the same data and expected rows as the batch transform port
(tests/test_examples.py::shipments)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyAppend
from kamu_cli_spark.streaming import read_dataset_stream, streaming_interval_join
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def d(day, h=0):
    return datetime(2024, 1, day, h, tzinfo=timezone.utc)


def test_continuous_overdue_shipments(spark, tmp_path):
    ws = str(tmp_path)
    orders = Dataset.create(ws, "orders", system_time=T0.isoformat())
    DataWriter(orders, MergeStrategyAppend()).write(
        spark,
        spark.createDataFrame(
            [(d(1), 1, 10), (d(1), 2, 120), (d(3), 3, 9)],
            "order_time timestamp, order_id long, quantity long",
        ),
        system_time=d(5),
    )
    ships = Dataset.create(ws, "shipments", system_time=T0.isoformat())
    DataWriter(ships, MergeStrategyAppend()).write(
        spark,
        spark.createDataFrame(
            [
                (d(1, 4), 1, 10),   # order 1 fully shipped within window
                (d(2), 2, 100),     # order 2 partial -> overdue
                (d(3, 1), 3, 4),    # order 3 partial -> overdue
                (d(9), 99, 1),      # heartbeat: the agg's watermark lags the
                                    # input by the 2-day join bound, so it must
                                    # clear every window end + 2d
            ],
            "ship_time timestamp, order_id long, shipped long",
        ),
        system_time=d(6),
    )
    # heartbeat on the orders side too so BOTH watermarks advance
    DataWriter(Dataset(orders.path), MergeStrategyAppend()).write(
        spark,
        spark.createDataFrame(
            [(d(9), 98, 1)], "order_time timestamp, order_id long, quantity long"
        ),
        system_time=d(6),
    )

    lo = read_dataset_stream(spark, Dataset(orders.path)).drop(
        "offset", "op", "system_time", "event_time"
    )
    rs = read_dataset_stream(spark, ships).drop(
        "offset", "op", "system_time", "event_time"
    )

    # query 1: LEFT JOIN shipments within [order_time, order_time + 2d]
    joined = streaming_interval_join(
        lo,
        rs,
        on=["order_id"],
        left_time="order_time",
        right_time="ship_time",
        lower="INTERVAL 0 DAY",
        upper="INTERVAL 2 DAY",
        watermark_delay="0 seconds",
        how="left_outer",
    ).select(
        "order_time",
        "order_id",
        F.col("quantity").alias("order_quantity"),
        F.col("ship_time").alias("shipped_time"),
        F.coalesce(F.col("shipped"), F.lit(0)).alias("shipped_quantity"),
    )

    # query 2: TUMBLE(order_time, 1 day) aggregation — second stateful
    # operator in the same continuous query; the event-time watermark
    # PROPAGATES through the join (re-declaring it is disallowed under
    # multi-stateful mode)
    agg = (
        joined.groupBy(F.window("order_time", "1 day").alias("w"), "order_id")
        .agg(
            F.count(F.lit(1)).alias("num_shipments"),
            F.min("shipped_time").alias("first_shipment"),
            F.max("shipped_time").alias("last_shipment"),
            F.max("order_quantity").alias("order_quantity"),
            F.sum("shipped_quantity").alias("shipped_quantity_total"),
        )
        .select(F.col("w.start").alias("order_time"), "*")
        .drop("w")
    )

    # query 3: under-fulfilled orders only
    overdue = agg.filter(F.col("order_quantity") != F.col("shipped_quantity_total"))

    out_dir, ck = ws + "/out", ws + "/ck"
    q = (
        overdue.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = {
        (r["order_id"], r["order_quantity"], r["shipped_quantity_total"])
        for r in spark.read.parquet(out_dir).collect()
        if r["order_id"] not in (98, 99)
    }
    assert rows == {(2, 120, 100), (3, 9, 4)}  # same as the batch port
