"""Streaming interval-join twin (`streaming_interval_join`): the
reference's overdue-shipments pattern (continuous stream-to-stream
join on Flink, examples/overdue_shipments — ``s.event_time BETWEEN
o.event_time AND o.event_time + INTERVAL '2' DAY``), run as a NATIVE
Structured Streaming stream-stream join and equivalence-tested against
the batch `operators.windows.interval_join` — the same pairing
test_streaming_asof.py uses for the as-of twin."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyAppend
from kamu_cli_spark.operators.windows import interval_join
from kamu_cli_spark.streaming import read_dataset_stream, streaming_interval_join
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def D(d):
    return T0 + timedelta(days=d)


ORDERS = [
    (1, D(0), 100),   # shipped twice within window
    (2, D(1), 50),    # shipped once, second shipment too late
    (3, D(2), 75),    # never shipped
]
SHIPMENTS = [
    (1, D(1), 60),
    (1, D(2), 40),
    (2, D(2), 30),
    (2, D(5), 20),    # outside [order_time, order_time + 2d]
    (9, D(1), 10),    # unknown order
]

O_SCHEMA = "order_id int, event_time timestamp, quantity int"
S_SCHEMA = "order_id int, ship_time timestamp, shipped int"


def _mk(spark, ws, name, rows, schema, t=T0):
    ds = Dataset.create(ws, name, system_time=T0.isoformat())
    DataWriter(ds, MergeStrategyAppend()).write(
        spark, spark.createDataFrame(rows, schema), system_time=t
    )
    return ds


def _run_stream(spark, orders_ds, ship_ds, ckpt, how, out_dir):
    lo = read_dataset_stream(spark, orders_ds).drop("offset", "op", "system_time")
    # the writer stamps its own event_time on the ships dataset; the
    # stream side carries ship_time, so drop the stamped column
    rs = read_dataset_stream(spark, ship_ds).drop(
        "offset", "op", "system_time", "event_time"
    )
    joined = streaming_interval_join(
        lo,
        rs,
        on=["order_id"],
        left_time="event_time",
        right_time="ship_time",
        lower="INTERVAL 0 DAY",
        upper="INTERVAL 2 DAY",
        watermark_delay="0 seconds",
        how=how,
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(out_dir)


def _batch(spark, how):
    return interval_join(
        spark.createDataFrame(ORDERS, O_SCHEMA).select(
            "order_id", "event_time", "quantity"
        ),
        spark.createDataFrame(SHIPMENTS, S_SCHEMA),
        ["order_id"],
        "event_time",
        "ship_time",
        "INTERVAL 0 DAY",
        "INTERVAL 2 DAY",
        how=how,
    )


def _key(r):
    return (r["order_id"], r["event_time"], r["quantity"], r["ship_time"], r["shipped"])


def test_streaming_interval_inner_matches_batch(spark, tmp_path):
    ws = str(tmp_path)
    orders = _mk(spark, ws, "orders", ORDERS, O_SCHEMA)
    ships = _mk(spark, ws, "ships", SHIPMENTS, S_SCHEMA)
    got = sorted(
        _key(r)
        for r in _run_stream(spark, orders, ships, ws + "/ck_inner", "inner", ws + "/out_inner").collect()
    )
    want = sorted(_key(r) for r in _batch(spark, "inner").collect())
    assert got == want
    assert len(want) == 3  # (1,d1), (1,d2), (2,d2) — late + unknown excluded


def test_streaming_interval_left_outer_flushes_on_watermark(spark, tmp_path):
    """Outer rows (order 3, and order 2's unmatched tail) emit once the
    watermark passes their upper bound — driven here by a later slice
    arriving on both streams, the bounded-replay flush pattern."""
    ws = str(tmp_path)
    orders = _mk(spark, ws, "orders", ORDERS, O_SCHEMA)
    ships = _mk(spark, ws, "ships", SHIPMENTS, S_SCHEMA)
    ck = ws + "/ck_outer"
    first = _run_stream(spark, orders, ships, ck, "left_outer", ws + "/out_outer").collect()

    # heartbeat slices far past every order's upper bound advance the
    # watermark; the next trigger flushes the withheld outer rows
    hb = D(30)
    DataWriter(Dataset(orders.path), MergeStrategyAppend()).write(
        spark, spark.createDataFrame([(99, hb, 1)], O_SCHEMA), system_time=hb
    )
    DataWriter(Dataset(ships.path), MergeStrategyAppend()).write(
        spark, spark.createDataFrame([(98, hb, 1)], S_SCHEMA), system_time=hb
    )
    flushed = _run_stream(spark, orders, ships, ck, "left_outer", ws + "/out_outer")

    got = sorted(
        _key(r)
        for r in flushed.collect()
        if r["order_id"] not in (98, 99)
    )
    want = sorted(_key(r) for r in _batch(spark, "left_outer").collect())
    assert got == want
    unmatched = [k for k in got if k[3] is None]
    assert {k[0] for k in unmatched} == {3}  # order 3 never shipped
