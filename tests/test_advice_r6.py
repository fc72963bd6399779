"""Regression tests for the round-6 ADVICE defects:

1. `streaming_asof_enrich` joined against the RAW lookup changelog, so
   retraction (-R) and correct-from (-C) rows remained candidate
   versions — a retracted key kept enriching and a correction tied
   nondeterministically with the value it corrected. Fixed by
   projecting to live versions (max-offset per (key, event_time),
   drop -R/-C) before the as-of join.
2. foreachBatch sinks committed a chain block per micro-batch with no
   batch_id idempotence guard; foreachBatch is at-least-once, so a
   crash between chain commit and streaming-checkpoint write replayed
   the batch into duplicate AddData rows. Fixed by recording
   (source, batch_id) in the committed event and skipping known ids.
3. `Dataset.refresh_state` ignored a pinned `new_offset` older than
   the checkpoint's coverage, serving rows past the pin. Fixed by
   bypassing the checkpoint paths when new_offset < coverage.
"""

from __future__ import annotations

import shutil
from datetime import datetime, timedelta, timezone

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyAppend, MergeStrategySnapshot
from kamu_cli_spark.streaming import read_dataset_stream, streaming_asof_enrich
from kamu_cli_spark.streaming.stream import stream_ingest
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def H(h):
    return T0 + timedelta(hours=h)


def test_streaming_asof_ignores_retracted_and_corrected_versions(spark, tmp_path):
    """Lookup maintained by snapshot CDC: after a poll that drops EUR
    (-R) and corrects USD (-C/+C), the stream must enrich with the
    corrected USD value and find NO rate for EUR — not the retracted
    1.45 and not a tie between 1.30 and 1.35."""
    ws = str(tmp_path)
    rates = Dataset.create(ws, "rates", system_time=T0.isoformat())
    w = DataWriter(rates, MergeStrategySnapshot(["currency"]))
    w.write(
        spark,
        spark.createDataFrame(
            [("USD", 1.30), ("EUR", 1.45)], "currency string, rate double"
        ),
        system_time=H(0),
        source_event_time=H(0),
    )
    w.write(
        spark,
        spark.createDataFrame([("USD", 1.35)], "currency string, rate double"),
        system_time=H(6),
        source_event_time=H(6),
    )

    txs = Dataset.create(ws, "txs", system_time=T0.isoformat())
    DataWriter(txs, MergeStrategyAppend()).write(
        spark,
        spark.createDataFrame(
            [(1, "USD", H(7), 100.0), (2, "EUR", H(7), 50.0), (3, "EUR", H(1), 20.0)],
            "tx_id int, currency string, event_time timestamp, amount double",
        ),
        system_time=H(7),
    )
    out = Dataset.create(ws, "enriched", kind="Derivative", system_time=T0.isoformat())

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

    got = {r["tx_id"]: r["rate"] for r in out.read(spark).collect()}
    assert got[1] == 1.35  # corrected value, never the superseded 1.30
    assert got[2] is None  # EUR retracted at H(6) — tombstone matches H(7)
    assert got[3] == 1.45  # before the retraction the version was live


def _mk_ingest_pair(spark, ws):
    src = Dataset.create(ws, "src", system_time=T0.isoformat())
    DataWriter(src, MergeStrategyAppend()).write(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"),
        system_time=T0,
    )
    tgt = Dataset.create(ws, "tgt", kind="Derivative", system_time=T0.isoformat())
    return src, tgt


def _run_ingest(spark, src, tgt, ckpt):
    q = stream_ingest(
        read_dataset_stream(spark, src).drop("offset", "op", "system_time"),
        tgt,
        MergeStrategyAppend(),
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(180)


def test_stream_ingest_replayed_batch_is_noop(spark, tmp_path):
    """Simulate the at-least-once crash window: lose the sink-side
    PROGRESS (offsets/commits) but keep the checkpoint's identity
    (metadata), as a real crash between chain commit and checkpoint
    write does — the replayed batch must be skipped, not appended
    twice."""
    ws = str(tmp_path)
    src, tgt = _mk_ingest_pair(spark, ws)
    ckpt = str(tmp_path / "ckpt")

    _run_ingest(spark, src, tgt, ckpt)
    assert Dataset(tgt.path).read(spark).count() == 2

    for sub in ("offsets", "commits"):
        shutil.rmtree(ckpt + "/" + sub, ignore_errors=True)
    _run_ingest(spark, src, tgt, ckpt)  # replays batch 0, same query id
    assert Dataset(tgt.path).read(spark).count() == 2
    Dataset(tgt.path).chain.verify()


def test_stream_ingest_checkpoint_reset_reprocesses(spark, tmp_path):
    """Deleting the WHOLE checkpoint is a deliberate reset: the new run
    mints a new query id, so its batch ids must NOT collide with the
    previous run's markers — fresh data is reprocessed (appended
    again), never silently dropped (round-7 review finding)."""
    ws = str(tmp_path)
    src, tgt = _mk_ingest_pair(spark, ws)
    ckpt = str(tmp_path / "ckpt")

    _run_ingest(spark, src, tgt, ckpt)
    assert Dataset(tgt.path).read(spark).count() == 2

    shutil.rmtree(ckpt)  # full reset, metadata (query id) included
    _run_ingest(spark, src, tgt, ckpt)
    assert Dataset(tgt.path).read(spark).count() == 4  # reprocessed
    Dataset(tgt.path).chain.verify()


def test_refresh_state_honors_pinned_offset_older_than_checkpoint(spark, tmp_path):
    """A checkpoint covering the head must NOT be served for a pinned
    new_offset older than its coverage — the as-of state at the pin
    has the original values, not the later corrections."""
    ds = Dataset.create(str(tmp_path), "cities", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategySnapshot(["city"]))
    w.write(
        spark,
        spark.createDataFrame(
            [("kyiv", 3), ("lviv", 7)], "city string, population int"
        ),
        system_time=H(0),
        source_event_time=H(0),
    )
    head_after_poll1 = ds.chain.next_offset() - 1
    w.write(
        spark,
        spark.createDataFrame(
            [("kyiv", 4), ("lviv", 7)], "city string, population int"
        ),
        system_time=H(1),
        source_event_time=H(1),
    )
    # materialize a checkpoint at the current head (covers the correction)
    full = ds.refresh_state(spark, ["city"])
    assert {r["city"]: r["population"] for r in full.collect()}["kyiv"] == 4

    pinned = ds.refresh_state(spark, ["city"], new_offset=head_after_poll1)
    vals = {r["city"]: r["population"] for r in pinned.collect()}
    assert vals["kyiv"] == 3  # pre-correction value, not the checkpoint's 4
    assert max(r["offset"] for r in pinned.collect()) <= head_after_poll1


def test_batch_temporal_table_ignores_retracted_and_corrected_versions(
    spark, tmp_path
):
    """BATCH side of the same defect class: a temporal-table transform's
    LATERAL as-of SQL must see projected versions, not the raw
    changelog — corrected rates supersede, retracted currencies stop
    matching from the retraction onward."""
    from kamu_cli_spark.transform import TransformExecutor, set_transform

    ws = str(tmp_path)
    rates = Dataset.create(ws, "rates", system_time=T0.isoformat())
    w = DataWriter(rates, MergeStrategySnapshot(["currency"]))
    w.write(
        spark,
        spark.createDataFrame(
            [("USD", 1.30), ("EUR", 1.45)], "currency string, rate double"
        ),
        system_time=H(0),
        source_event_time=H(0),
    )
    w.write(  # corrects USD, retracts EUR
        spark,
        spark.createDataFrame([("USD", 1.35)], "currency string, rate double"),
        system_time=H(6),
        source_event_time=H(6),
    )
    txs = Dataset.create(ws, "txs", system_time=T0.isoformat())
    DataWriter(txs, MergeStrategyAppend()).write(
        spark,
        spark.createDataFrame(
            [(1, "USD", H(7), 100.0), (2, "EUR", H(7), 50.0), (3, "EUR", H(1), 20.0)],
            "tx_id int, currency string, event_time timestamp, amount double",
        ),
        system_time=H(7),
    )
    out = Dataset.create(ws, "txs_cad", kind="Derivative", system_time=T0.isoformat())
    set_transform(
        out,
        {"exchange_rates": rates.path, "transactions": txs.path},
        """
        SELECT tr.event_time, tr.tx_id, tr.amount * exc.rate AS amount_conv
        FROM transactions tr
        LEFT JOIN LATERAL (
          SELECT rate FROM exchange_rates r
          WHERE r.currency = tr.currency AND r.event_time <= tr.event_time
          ORDER BY r.event_time DESC LIMIT 1
        ) exc ON true
        """,
        system_time=T0.isoformat(),
        temporal_tables={"exchange_rates": ["currency"]},
    )
    TransformExecutor(out).execute(spark, system_time=H(8))
    got = {r["tx_id"]: r["amount_conv"] for r in out.read(spark).collect()}
    assert got[1] == 100.0 * 1.35  # corrected rate, not 1.30 and not a tie
    assert got[2] is None          # EUR retracted at H(6): tombstone matches
    assert got[3] == 20.0 * 1.45   # before the retraction the rate was live


def test_stateful_temporal_table_ignores_dead_versions(spark, tmp_path):
    """The materialized-view executor shares set_transform's
    temporal_tables declaration and must apply the same version
    projection as the base executor (round-7 review finding: it
    registered the raw changelog)."""
    from kamu_cli_spark.operators.merge import project_changelog
    from kamu_cli_spark.transform import StatefulTransformExecutor, set_transform

    ws = str(tmp_path)
    rates = Dataset.create(ws, "rates", system_time=T0.isoformat())
    w = DataWriter(rates, MergeStrategySnapshot(["currency"]))
    w.write(
        spark,
        spark.createDataFrame(
            [("USD", 1.30), ("EUR", 1.45)], "currency string, rate double"
        ),
        system_time=H(0),
        source_event_time=H(0),
    )
    w.write(  # corrects USD, retracts EUR
        spark,
        spark.createDataFrame([("USD", 1.35)], "currency string, rate double"),
        system_time=H(6),
        source_event_time=H(6),
    )
    txs = Dataset.create(ws, "txs", system_time=T0.isoformat())
    DataWriter(txs, MergeStrategyAppend()).write(
        spark,
        spark.createDataFrame(
            [(1, "USD", H(7), 100.0), (2, "EUR", H(7), 50.0)],
            "tx_id int, currency string, event_time timestamp, amount double",
        ),
        system_time=H(7),
    )
    out = Dataset.create(ws, "view", kind="Derivative", system_time=T0.isoformat())
    set_transform(
        out,
        {"exchange_rates": rates.path, "transactions": txs.path},
        """
        SELECT tr.event_time, tr.tx_id, tr.amount * exc.rate AS amount_conv
        FROM transactions tr
        LEFT JOIN LATERAL (
          SELECT rate FROM exchange_rates r
          WHERE r.currency = tr.currency AND r.event_time <= tr.event_time
          ORDER BY r.event_time DESC LIMIT 1
        ) exc ON true
        """,
        system_time=T0.isoformat(),
        temporal_tables={"exchange_rates": ["currency"]},
    )
    StatefulTransformExecutor(out, output_primary_key=["tx_id"]).execute(
        spark, system_time=H(8)
    )
    state = project_changelog(out.read(spark), ["tx_id"], out.vocab)
    got = {r["tx_id"]: r["amount_conv"] for r in state.collect()}
    assert got[1] == 100.0 * 1.35  # corrected, not 1.30 and not a tie
    assert got[2] is None          # retracted currency -> tombstone NULL
