"""Regression tests for the round-7 ADVICE defects.

1. medium — streaming/stream.py: `_stream_source_id` silently fell
   back to a path-derived hash whenever the checkpoint metadata file
   was unreadable, so a deliberate checkpoint wipe re-used the
   previous incarnation's markers (replayed batches wrongly skipped =
   silent data loss). Now: unreadable metadata RAISES, and the id is
   read once and cached on the sink closure.
2. low — `_batch_already_committed` scanned the whole chain per batch
   when the source had no marker yet. Now: `_ExactlyOnceState` scans
   once and maintains a local high-water mark.
3. low — `ivf_ann_seeded(scale_safe=True)` silently rerouted to the
   hierarchical variant even for an EXPLICIT `n_centroids` above the
   cap. Now: explicit-and-oversized raises ValueError; only a derived
   count auto-dispatches.
4. low — `text_metrics` re-implemented backtick quoting inline; now it
   uses the single-copy `util.sql_ident`.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

import pytest

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyAppend
from kamu_cli_spark.streaming.stream import (
    _ExactlyOnceState,
    _stream_source_id,
)
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


class TestSourceIdNoSilentFallback:
    def test_missing_metadata_raises(self, tmp_path):
        with pytest.raises(RuntimeError, match="query id"):
            _stream_source_id(str(tmp_path / "no-such-ckpt"))

    def test_corrupt_metadata_raises(self, tmp_path):
        ckpt = tmp_path / "ckpt"
        ckpt.mkdir()
        (ckpt / "metadata").write_text("{not json")
        with pytest.raises(RuntimeError, match="query id"):
            _stream_source_id(str(ckpt))

    def test_valid_metadata_returns_query_id(self, tmp_path):
        ckpt = tmp_path / "ckpt"
        ckpt.mkdir()
        (ckpt / "metadata").write_text(json.dumps({"id": "q-123"}))
        assert _stream_source_id(str(ckpt)) == "q-123"

    def test_id_cached_on_state(self, tmp_path):
        """The id is read once; later unreadability (e.g. transient fs
        failure mid-stream) cannot flip it and defeat replay dedup."""
        ckpt = tmp_path / "ckpt"
        ckpt.mkdir()
        (ckpt / "metadata").write_text(json.dumps({"id": "q-abc"}))
        state = _ExactlyOnceState(str(ckpt), target=None)
        assert state.source_id() == "q-abc"
        os.remove(ckpt / "metadata")
        assert state.source_id() == "q-abc"  # cached, no re-read


class TestExactlyOnceScanBounded:
    def _mk_target(self, spark, tmp_path):
        ds = Dataset.create(str(tmp_path), "tgt", system_time=T0.isoformat())
        w = DataWriter(ds, MergeStrategyAppend())
        w.write(
            spark,
            spark.createDataFrame(
                [("a", 1, T0)], "k string, v int, event_time timestamp"
            ),
            system_time=T0,
            extra_event={"streaming_batch": {"source": "q-old", "id": 7}},
        )
        return ds

    def test_single_scan_then_local_high_water(self, spark, tmp_path, monkeypatch):
        ds = self._mk_target(spark, tmp_path)
        ckpt = tmp_path / "ckpt"
        ckpt.mkdir()
        (ckpt / "metadata").write_text(json.dumps({"id": "q-new"}))
        state = _ExactlyOnceState(str(ckpt), ds)

        calls = {"n": 0}
        real_blocks = ds.chain.blocks

        def counting_blocks():
            calls["n"] += 1
            return real_blocks()

        monkeypatch.setattr(ds.chain, "blocks", counting_blocks)
        # brand-new source: no marker in the chain → not committed
        assert not state.already_committed(0)
        assert calls["n"] == 1
        # subsequent checks are O(1): no further chain scans
        assert not state.already_committed(1)
        assert not state.already_committed(2)
        assert calls["n"] == 1
        # after a commit the local mark answers replays
        state.record(1)
        assert state.already_committed(0)
        assert state.already_committed(1)
        assert not state.already_committed(2)
        assert calls["n"] == 1

    def test_restart_finds_existing_marker(self, spark, tmp_path):
        """Crash-replay: a fresh state (new sink closure) sees the
        marker a previous incarnation committed for the SAME query id."""
        ds = self._mk_target(spark, tmp_path)
        ckpt = tmp_path / "ckpt"
        ckpt.mkdir()
        (ckpt / "metadata").write_text(json.dumps({"id": "q-old"}))
        state = _ExactlyOnceState(str(ckpt), ds)
        assert state.already_committed(7)
        assert state.already_committed(3)
        assert not state.already_committed(8)


class TestSeededExplicitCentroids:
    def test_explicit_oversized_raises(self, spark, monkeypatch):
        from kamu_cli_spark.operators import similarity as s

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = e.filter("vec_id % 50 = 0")
        monkeypatch.setattr(s, "MAX_SEED_CENTROIDS", 8)
        with pytest.raises(ValueError, match="MAX_SEED_CENTROIDS"):
            s.ivf_ann_seeded(q, e, "vec_id", "vec_id", n_centroids=16, k=5)

    def test_explicit_oversized_forced_runs_seeded(self, spark, monkeypatch):
        from kamu_cli_spark.operators import similarity as s

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = e.filter("vec_id % 50 = 0")
        monkeypatch.setattr(s, "MAX_SEED_CENTROIDS", 8)
        out = s.ivf_ann_seeded(
            q, e, "vec_id", "vec_id", n_centroids=16, k=5, scale_safe=False
        )
        assert out.count() > 0

    def test_explicit_within_cap_runs(self, spark):
        from kamu_cli_spark.operators import similarity as s

        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = e.filter("vec_id % 50 = 0")
        out = s.ivf_ann_seeded(q, e, "vec_id", "vec_id", n_centroids=16, k=5)
        assert out.count() > 0


class TestTextMetricsSqlIdent:
    def test_single_copy_quoting(self):
        import inspect

        from kamu_cli_spark.operators import text

        src = inspect.getsource(text.text_metrics)
        assert 'c.replace("`", "``")' not in src
        assert "sql_ident(c) for c in df.columns" in src

    def test_backtick_column_roundtrip(self, spark):
        from kamu_cli_spark.operators.text import text_metrics

        df = spark.createDataFrame(
            [("d1", "hello world the quick brown fox", "x")],
            ["doc_id", "body", "weird`name"],
        )
        out = text_metrics(df, text_col="body")
        row = out.collect()[0]
        assert row["weird`name"] == "x"
        assert row["n_tokens"] == 6
