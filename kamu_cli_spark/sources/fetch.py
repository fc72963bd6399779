"""Fetch steps — polling sources that stage files for ingest.

Spark-side analogue of the reference's fetch service (SURVEY.md §2.1):

- **FilesGlob**: poll a local glob, ingest files in deterministic order
  (by name or mtime), one commit per file, recording `SourceState` in
  the chain so an interrupted poll resumes where it left off
  (fetch_service/file.rs semantics).
- **Url**: out of scope in this sandbox (no network) — the staging +
  SourceState (etag/last-modified) bookkeeping is identical; a caller
  can stage with any HTTP client and reuse `ingest_staged`.
"""

from __future__ import annotations

import glob as globmod
import os
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import SparkSession

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators.merge import MergeStrategy
from kamu_cli_spark.sources.readers import prep_decompress, read_format
from kamu_cli_spark.writer import DataWriter


def _last_source_state(ds: Dataset) -> dict[str, Any] | None:
    for b in reversed(ds.chain.blocks()):
        if b.event.get("kind") in ("AddData", "ExecuteTransform") and b.event.get(
            "source_state"
        ):
            return b.event["source_state"]
    return None


def ingest_files_glob(
    spark: SparkSession,
    dataset: Dataset,
    strategy: MergeStrategy,
    pattern: str,
    fmt: str = "csv",
    order: str = "by_name",
    event_time_column: str | None = None,
    **reader_options,
) -> list[dict[str, Any]]:
    """Poll `pattern`; ingest each not-yet-seen file as ONE commit in
    order, advancing the source state (last ingested file marker)."""
    files = globmod.glob(pattern)
    if order == "by_name":
        files.sort()
    elif order == "by_mtime":
        files.sort(key=lambda p: (os.path.getmtime(p), p))
    else:
        raise ValueError(f"unknown order: {order}")

    state = _last_source_state(dataset)
    last_seen = state.get("last_file") if state else None
    events = []
    for path in files:
        marker = os.path.basename(path)
        if last_seen is not None and marker <= last_seen:
            continue
        staged = path
        if path.endswith((".gz", ".zip")):
            staged = prep_decompress(path)
        df = read_format(spark, fmt, staged, **reader_options)
        if event_time_column and event_time_column in df.columns:
            df = df.withColumnRenamed(
                event_time_column, dataset.vocab.event_time_column
            )
        writer = DataWriter(dataset, strategy)
        ev = writer.write(
            spark,
            df,
            system_time=datetime.now(timezone.utc),
            extra_event={"source_state": {"kind": "files_glob", "last_file": marker}},
        )
        if ev is None:
            # up-to-date poll: still advance the marker with a data-less
            # block so the file isn't re-read next poll
            ev = {
                "kind": "AddData",
                "new_data": None,
                "new_watermark": dataset.chain.current_watermark(),
                "source_state": {"kind": "files_glob", "last_file": marker},
            }
            dataset.chain.append(ev)
        events.append(ev)
        last_seen = marker
    return events
