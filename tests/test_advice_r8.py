"""Round-8 ADVICE regressions (see tests/test_streaming_topn.py for
the null-partition-key pre-shrink fix, which lives with its family)."""

from __future__ import annotations

import os
from datetime import datetime, timezone

from kamu_cli_spark import compaction as comp
from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.ledger.chain import MetadataChain
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.writer import DataWriter


def _d(day):
    return datetime(2024, 1, day, tzinfo=timezone.utc)


def test_failed_compaction_reaps_orphan_outputs(spark, tmp_path, monkeypatch):
    """A non-CAS failure mid-rebuild (chain verify raising) must remove
    the freshly written compact-*.parquet outputs — they can never be
    referenced by the surviving chain — and leave the old chain fully
    readable so a retry succeeds."""
    ws = str(tmp_path)
    ds = Dataset.create(ws, "t", system_time=_d(1).isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["k"]))
    for i in range(3):
        w.write(
            spark,
            spark.createDataFrame([(i, i * 10)], "k long, v long"),
            system_time=_d(2 + i),
        )
    data_dir = os.path.join(ds.path, "data")
    before = set(os.listdir(data_dir))

    def boom(self):
        raise RuntimeError("injected verify failure")

    monkeypatch.setattr(MetadataChain, "verify", boom)
    try:
        comp.compact(spark, ds)
        raise AssertionError("compact should have raised")
    except RuntimeError:
        pass
    monkeypatch.undo()

    orphans = [
        f for f in set(os.listdir(data_dir)) - before if f.endswith(".parquet")
    ]
    assert orphans == []

    ds2 = Dataset(ds.path)
    paths = [os.path.join(ds.path, d["path"]) for d in ds2.chain.data_files()]
    assert spark.read.parquet(*paths).count() == 3
    res = comp.compact(spark, ds2)
    assert res["compacted"] and res["slices_after"] == 1
