"""Streaming temporal/as-of join twin (`streaming_asof_enrich`): the
currency-conversion pattern (reference Flink `FOR SYSTEM_TIME AS OF`,
examples/currency_conversion) run as a Structured Streaming foreachBatch
pipeline, equivalence-tested against the batch `operators.asof.asof_join`
— the same pairing test_streaming_sessions.py does for sessionization."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyAppend
from kamu_cli_spark.operators.asof import asof_join
from kamu_cli_spark.streaming import read_dataset_stream, streaming_asof_enrich
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def H(h):
    return T0 + timedelta(hours=h)


RATES = [
    ("USD", H(0), 1.30),
    ("USD", H(6), 1.35),
    ("EUR", H(0), 1.45),
]

TXS = [
    (1, "USD", H(1), 100.0),   # rate 1.30
    (2, "USD", H(7), 200.0),   # rate 1.35
    (3, "EUR", H(2), 50.0),    # rate 1.45
    (4, "GBP", H(3), 10.0),    # no rate -> null
]


def _mk(spark, ws, name, rows, schema):
    ds = Dataset.create(ws, name, system_time=T0.isoformat())
    DataWriter(ds, MergeStrategyAppend()).write(
        spark, spark.createDataFrame(rows, schema), system_time=T0
    )
    return ds


def test_streaming_asof_matches_batch(spark, tmp_path):
    ws = str(tmp_path)
    rates = _mk(
        spark, ws, "rates", RATES, "currency string, event_time timestamp, rate double"
    )
    txs = _mk(
        spark,
        ws,
        "txs",
        TXS,
        "tx_id int, currency string, event_time timestamp, amount double",
    )
    out = Dataset.create(ws, "txs_cad", kind="Derivative", system_time=T0.isoformat())

    q = streaming_asof_enrich(
        read_dataset_stream(spark, txs).drop("offset", "op", "system_time"),
        rates,
        out,
        MergeStrategyAppend(),
        checkpoint_dir=str(tmp_path / "ckpt"),
        on=["currency"],
        left_time="event_time",
        right_time="event_time",
        right_values=["rate"],
    )
    q.awaitTermination(180)

    got = {
        r["tx_id"]: (r["amount"], r["rate"])
        for r in out.read(spark).collect()
    }

    batch = asof_join(
        spark.createDataFrame(
            TXS, "tx_id int, currency string, event_time timestamp, amount double"
        ),
        spark.createDataFrame(
            RATES, "currency string, event_time timestamp, rate double"
        ),
        ["currency"],
        "event_time",
        "event_time",
        right_values=["rate"],
    )
    want = {r["tx_id"]: (r["amount"], r["rate"]) for r in batch.collect()}
    assert got == want
    assert want[1] == (100.0, 1.30)
    assert want[2] == (200.0, 1.35)
    assert want[4] == (10.0, None)
    out.chain.verify()


def test_streaming_asof_sees_rates_committed_between_batches(spark, tmp_path):
    """A lookup version committed after the first run is visible to
    later micro-batches — the lookup history is re-read per batch, the
    processing-time temporal-join progression."""
    ws = str(tmp_path)
    rates = _mk(
        spark,
        ws,
        "rates",
        [("USD", H(0), 1.30)],
        "currency string, event_time timestamp, rate double",
    )
    txs = _mk(
        spark,
        ws,
        "txs",
        [(1, "USD", H(1), 100.0)],
        "tx_id int, currency string, event_time timestamp, amount double",
    )
    out = Dataset.create(ws, "enriched", kind="Derivative", system_time=T0.isoformat())

    def run():
        q = streaming_asof_enrich(
            read_dataset_stream(spark, txs).drop("offset", "op", "system_time"),
            rates,
            out,
            MergeStrategyAppend(),
            checkpoint_dir=str(tmp_path / "ckpt"),
            on=["currency"],
            left_time="event_time",
            right_time="event_time",
            right_values=["rate"],
        )
        q.awaitTermination(180)

    run()

    # new rate at H(6) and a new transaction at H(7) arrive; the
    # checkpoint makes the second run process ONLY the new slice
    DataWriter(Dataset(rates.path), MergeStrategyAppend()).write(
        spark,
        spark.createDataFrame(
            [("USD", H(6), 1.35)], "currency string, event_time timestamp, rate double"
        ),
        system_time=H(6),
    )
    DataWriter(Dataset(txs.path), MergeStrategyAppend()).write(
        spark,
        spark.createDataFrame(
            [(2, "USD", H(7), 200.0)],
            "tx_id int, currency string, event_time timestamp, amount double",
        ),
        system_time=H(7),
    )
    run()

    got = {r["tx_id"]: r["rate"] for r in Dataset(out.path).read(spark).collect()}
    assert got == {1: 1.30, 2: 1.35}
