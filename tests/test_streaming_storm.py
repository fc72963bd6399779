"""Round-7 judge task #7: storm the STREAMING writer surface — a
foreachBatch sink interleaved with concurrent batch appends and
compactions on the same dataset. The batch chain already has a
randomized storm (test_chain_stress.py); this covers the streaming
sink's exactly-once contract under the same contention, including the
round-8 fix that makes compaction carry the exactly-once markers
forward (without it, a crash-replay after a compaction re-commits rows
that already live inside a compacted slice)."""

from __future__ import annotations

import random
import threading
from datetime import datetime, timezone

from pyspark.sql import functions as F

from kamu_cli_spark.compaction import CompactionError, compact
from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.ledger.chain import ChainIntegrityError
from kamu_cli_spark.operators import MergeStrategyAppend, MergeStrategyLedger
from kamu_cli_spark.streaming import read_dataset_stream, stream_ingest
from kamu_cli_spark.streaming.stream import _ExactlyOnceState
from kamu_cli_spark.writer import DataWriter, WriterError

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _mk_source(spark, ws, n_slices=5, rows_per_slice=4):
    src = Dataset.create(ws, "storm-src", system_time=T0.isoformat())
    w = DataWriter(src, MergeStrategyLedger(["k"]))
    for i in range(n_slices):
        rows = [
            (i * 1000 + j, "stream", T0) for j in range(rows_per_slice)
        ]
        w.write(
            spark,
            spark.createDataFrame(rows, "k long, src string, event_time timestamp"),
            system_time=datetime.now(timezone.utc),
        )
    return src, n_slices * rows_per_slice


def test_markers_survive_compaction(spark, tmp_path):
    """After compacting the target, a fresh sink state (the crash-replay
    path) must still see every committed batch id — the compacted chain
    carries the newest marker per source on its last block."""
    ws = str(tmp_path)
    src, n_rows = _mk_source(spark, ws, n_slices=3)
    tgt = Dataset.create(ws, "tgt", system_time=T0.isoformat())
    ckpt = str(tmp_path / "ckpt")

    q = stream_ingest(
        read_dataset_stream(spark, src, max_files_per_trigger=1).select(
            "k", "src", "event_time"
        ),
        tgt,
        MergeStrategyAppend(),
        checkpoint_dir=ckpt,
    )
    q.awaitTermination(180)
    fresh = Dataset(tgt.path)
    assert fresh.read(spark).count() == n_rows

    out = compact(spark, fresh, max_slice_records=1_000_000)
    assert out["compacted"] is True

    # crash-replay simulation: a brand-new sink closure for the SAME
    # query id scans the compacted chain
    state = _ExactlyOnceState(ckpt, Dataset(tgt.path))
    assert state.already_committed(0)
    assert state.already_committed(1)
    assert state.already_committed(2)
    assert not state.already_committed(3)

    # and the data survived the rewrite intact, exactly once
    df = Dataset(tgt.path).read(spark)
    assert df.count() == n_rows
    assert df.select("k").distinct().count() == n_rows


def test_streaming_sink_storm_with_batch_writers(spark, tmp_path):
    """Seeded storm: one availableNow streaming sink (restarted on race
    losses) vs concurrent batch appends and compactions on the SAME
    dataset. Afterwards: chain verifies, every streamed row is present
    EXACTLY once, every successful batch append survived, no dangling
    slice refs."""
    ws = str(tmp_path)
    src, n_stream_rows = _mk_source(spark, ws, n_slices=5)
    tgt = Dataset.create(ws, "tgt", system_time=T0.isoformat())
    ckpt = str(tmp_path / "ckpt")

    stop = threading.Event()
    batch_keys_committed: list[int] = []
    interferer_errors: list[str] = []

    def _interferer(seed: int) -> None:
        rng = random.Random(seed)
        step = 0
        while not stop.is_set() and step < 40:
            step += 1
            ds = Dataset(tgt.path)
            try:
                if rng.random() < 0.7:
                    key = seed * 100_000 + step
                    DataWriter(ds, MergeStrategyAppend()).write(
                        spark,
                        spark.createDataFrame(
                            [(key, "batch", T0)],
                            "k long, src string, event_time timestamp",
                        ),
                        system_time=datetime.now(timezone.utc),
                    )
                    batch_keys_committed.append(key)
                else:
                    compact(spark, ds, max_slice_records=10)
            except (CompactionError, WriterError):
                pass  # lost a race — expected
            except ChainIntegrityError as e:
                if "system_time regression" not in str(e) and (
                    "offsets not contiguous" not in str(e)
                ):
                    interferer_errors.append(f"worker {seed}: {e}")
                    return
            except Exception as e:  # noqa: BLE001
                msg = str(e)
                if "FILE_NOT_EXIST" in msg or "does not exist" in msg:
                    continue  # reader-vs-gc transient, same as batch storm
                interferer_errors.append(f"worker {seed}: {type(e).__name__}: {e}")
                return

    threads = [
        threading.Thread(target=_interferer, args=(s,), daemon=True)
        for s in range(2)
    ]
    for t in threads:
        t.start()

    # the streaming sink: availableNow over 5 micro-batches; a batch
    # that loses the chain race fails the query — restart with the same
    # checkpoint; markers make replayed batches no-ops
    attempts = 0
    while attempts < 12:
        attempts += 1
        q = stream_ingest(
            read_dataset_stream(spark, src, max_files_per_trigger=1).select(
                "k", "src", "event_time"
            ),
            tgt,
            MergeStrategyAppend(),
            checkpoint_dir=ckpt,
        )
        try:
            q.awaitTermination(180)
            break  # clean availableNow completion: all batches done
        except Exception:
            continue  # race loss mid-batch — restart, replays dedup

    stop.set()
    for t in threads:
        t.join(timeout=60)

    assert interferer_errors == [], interferer_errors

    fin = Dataset(tgt.path)
    fin.chain.verify()
    import os

    for d in fin.chain.data_files():
        assert os.path.exists(os.path.join(fin.path, d["path"])), d["path"]

    df = fin.read(spark)
    streamed = df.filter("src = 'stream'")
    # exactly once: no stream row lost, none duplicated
    assert streamed.count() == n_stream_rows, (
        streamed.groupBy("k").count().filter("count > 1").collect()
    )
    assert streamed.select("k").distinct().count() == n_stream_rows
    # every batch append that reported success is durable
    got_batch = {
        r["k"] for r in df.filter("src = 'batch'").select("k").collect()
    }
    missing = set(batch_keys_committed) - got_batch
    assert missing == set(), f"lost batch appends: {missing}"
