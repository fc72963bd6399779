"""Structured Streaming over the dataset layout.

The reference runs streaming transforms on Flink/RisingWave with
watermark-driven micro-batches (SURVEY.md §2.6, §3.3). Spark-first
equivalents:

- a dataset's ``data/`` directory IS a valid file-source stream:
  slices are immutable, append-only, offset-sorted — exactly the
  contract `readStream.parquet` wants. Checkpointing gives exactly-once
  per-file accounting (the streaming twin of our offset-interval
  elaboration);
- event-time watermarks + windowed aggregations express the TUMBLE
  patterns; late data beyond the delay is dropped deterministically;
- ``stream_ingest`` runs foreachBatch → the SAME DataWriter/merge
  pipeline as batch ingest, so streaming commits are ordinary AddData
  blocks in the chain — one code path for both modes.

Batch-incremental replay (TransformExecutor) stays the deterministic
gold path; these wrappers are the continuous-mode layer on top of the
same storage.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators.merge import MergeStrategy
from kamu_cli_spark.writer import DataWriter


def _stream_source_id(checkpoint_dir: str) -> str:
    """Stable identity for a streaming query: the query id Spark
    persists in ``<checkpoint>/metadata`` at start. It survives
    restarts from the same checkpoint (so crash replays dedup), and a
    DELETED checkpoint mints a fresh id — a deliberate reset
    reprocesses from scratch instead of colliding with the previous
    run's markers and silently dropping data.

    Inside a running sink the file MUST exist (Spark writes it at
    query start), so an unreadable file raises — failing the batch so
    Spark retries — instead of silently falling back to a path-derived
    id (round-7 ADVICE: the fallback re-used the previous
    incarnation's markers after a deliberate checkpoint wipe, wrongly
    skipping replayed batches = silent data loss; a transient read
    failure mid-stream flipped the id and defeated replay dedup)."""
    import json
    import os

    meta = os.path.join(checkpoint_dir, "metadata")
    try:
        with open(meta) as f:
            return json.load(f)["id"]
    except (OSError, ValueError, KeyError) as e:
        raise RuntimeError(
            f"cannot read the streaming query id from {meta}: {e!r}. "
            "Refusing to substitute a path-derived id — it breaks "
            "exactly-once replay dedup. The batch will be retried."
        ) from e


class _ExactlyOnceState:
    """Per-sink memo for foreachBatch exactly-once markers.

    foreachBatch is at-least-once: a crash between the chain commit and
    the streaming checkpoint write replays the batch. Each committed
    block records its (source, batch_id); a replayed batch finds the
    marker and becomes a no-op — making the sink effectively
    exactly-once.

    Round-7 ADVICE hardening, both cached on the sink closure:

    - the query id is read ONCE (first non-empty batch) — it cannot
      change while the query runs, so caching removes the per-batch
      file read and any chance of a transient failure flipping the id;
    - the chain scan for "already committed?" runs ONCE (the restart /
      crash-replay case). Afterwards the newest committed batch id is
      maintained locally: only this query id writes markers for this
      source, so the local high-water mark is authoritative and the
      per-batch cost is O(1) instead of O(chain length) on datasets
      with long chains but no marker for a brand-new source.
    """

    def __init__(self, checkpoint_dir: str, target: Dataset) -> None:
        self._checkpoint_dir = checkpoint_dir
        self._target = target
        self._source_id: str | None = None
        self._max_committed: int | None = None

    def source_id(self) -> str:
        if self._source_id is None:
            self._source_id = _stream_source_id(self._checkpoint_dir)
        return self._source_id

    def already_committed(self, batch_id: int) -> bool:
        if self._max_committed is None:
            # one full tail scan per sink lifetime: find this source's
            # newest marker (batch ids are monotone per source)
            try:
                self._target.chain._reload_if_stale()
            except Exception:
                pass
            newest = -1
            sid = self.source_id()
            for b in reversed(self._target.chain.blocks()):
                # live blocks carry a single `streaming_batch`; compacted
                # blocks carry the per-source newest markers as a
                # `streaming_batches` list (compaction.py) — check both
                markers = [b.event.get("streaming_batch")] + list(
                    b.event.get("streaming_batches") or []
                )
                hits = [
                    sb.get("id")
                    for sb in markers
                    if sb and sb.get("source") == sid
                ]
                if hits:
                    newest = max(hits)
                    break
            self._max_committed = newest
        return batch_id <= self._max_committed

    def record(self, batch_id: int) -> None:
        prior = self._max_committed if self._max_committed is not None else -1
        self._max_committed = max(prior, batch_id)


def read_dataset_stream(
    spark: SparkSession,
    dataset: Dataset,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Open the dataset changelog as a streaming source.

    Schema comes from the chain's SetDataSchema (no inference job);
    each committed slice file becomes a micro-batch input — the
    streaming mirror of offset-interval incremental reads.
    """
    paths = dataset.slice_paths()
    if not paths:
        raise ValueError(f"dataset {dataset.name} has no data to stream")
    # ledger-declared schema when available: no footer inference, and
    # slices from before an additive schema evolution surface the newer
    # columns as typed nulls instead of pinning the stream to whichever
    # file's footer happened to be sampled
    schema = dataset.declared_schema() or spark.read.parquet(paths[0]).schema
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    import os

    return reader.parquet(os.path.join(dataset.path, "data"))


def windowed_aggregate(
    stream: DataFrame,
    time_col: str,
    window_duration: str,
    watermark_delay: str,
    keys: list[str],
    aggs: list,
) -> DataFrame:
    """TUMBLE(time, duration) with late-data handling — the Flink
    shipments pattern (`GROUP BY TUMBLE(order_time, INTERVAL '1' DAY)`)."""
    out = (
        stream.withWatermark(time_col, watermark_delay)
        .groupBy(F.window(F.col(time_col), window_duration).alias("window"), *keys)
        .agg(*aggs)
    )
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[c for c in out.columns if c != "window"],
    )


def session_aggregate(
    stream: DataFrame,
    time_col: str,
    gap_duration: str,
    watermark_delay: str,
    keys: list[str],
    aggs: list,
) -> DataFrame:
    """Streaming gap-based sessionization — `F.session_window` with an
    event-time watermark, the continuous twin of the batch
    `operators.windows.sessionize` gaps-and-islands formulation. A
    session closes (and its aggregate emits, in append mode) once the
    watermark passes session-end + gap; late events inside the
    watermark re-open/merge sessions, later ones are dropped
    deterministically. State is hash-partitioned on the keys — the
    standard scale-out shape for session windows.
    """
    out = (
        stream.withWatermark(time_col, watermark_delay)
        .groupBy(
            F.session_window(F.col(time_col), gap_duration).alias("session"),
            *keys,
        )
        .agg(*aggs)
    )
    return out.select(
        F.col("session.start").alias("session_start"),
        F.col("session.end").alias("session_end"),
        *[c for c in out.columns if c != "session"],
    )


def stream_ingest(
    source: DataFrame,
    target: Dataset,
    strategy: MergeStrategy,
    checkpoint_dir: str,
    transform: Callable[[DataFrame], DataFrame] | None = None,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Continuously ingest a stream into a dataset via foreachBatch.

    Every micro-batch goes through the full writer pipeline (merge
    strategy, deterministic offsets, schema checks, chain commit) — a
    streaming commit is indistinguishable from a batch one.
    """

    state = _ExactlyOnceState(checkpoint_dir, target)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if state.already_committed(batch_id):
            return  # crash-replayed batch: already durable in the chain
        if transform is not None:
            batch_df = transform(batch_df)
        writer = DataWriter(target, strategy)
        writer.write(
            batch_df.sparkSession,
            batch_df,
            system_time=datetime.now(timezone.utc),
            extra_event={
                "streaming_batch": {"source": state.source_id(), "id": batch_id}
            },
        )
        state.record(batch_id)

    writer = (
        source.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_asof_enrich(
    source: DataFrame,
    lookup: Dataset,
    target: Dataset,
    strategy: MergeStrategy,
    checkpoint_dir: str,
    on: list[str],
    left_time: str,
    right_time: str | None = None,
    right_values: list[str] | None = None,
    suffix: str = "",
    strict: bool = False,
    trigger_available_now: bool = True,
) -> StreamingQuery:
    """Streaming twin of the temporal-table / as-of join (the
    reference's Flink ``FOR SYSTEM_TIME AS OF tr.event_time`` pattern,
    dtos_generated.rs:1485-1490, examples/currency_conversion).

    Each micro-batch of the driving stream is enriched with the
    newest `lookup` row per key whose ``right_time`` is at or before
    the event's ``left_time`` — by running the BATCH
    :func:`~kamu_cli_spark.operators.asof.asof_join` against the
    lookup dataset's versioned history, re-read fresh per batch (a
    rate committed between batches is visible to every later batch).
    The enriched batch commits to `target` through the full writer
    pipeline, so results are ordinary AddData blocks replayable by the
    batch executor.

    Semantics contract (same as Flink's processing-time temporal join
    progression): an event is joined against the lookup versions
    *ingested before its micro-batch ran*. When the lookup stream is
    kept ahead of the driving stream (the reference aligns them with
    watermarks), this is exactly the batch as-of result — which is
    what the equivalence test asserts.

    At scale: the lookup side is a versioned dimension (rates,
    configs) — orders of magnitude smaller than the stream — and the
    as-of union-window shuffles on the join keys only; Spark
    broadcasts the small side automatically under AQE.
    """
    from kamu_cli_spark.operators.asof import asof_join
    from kamu_cli_spark.operators.merge import project_temporal_versions

    rt = right_time or lookup.vocab.event_time_column

    state = _ExactlyOnceState(checkpoint_dir, target)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if state.already_committed(batch_id):
            return  # crash-replayed batch: already durable in the chain
        spark = batch_df.sparkSession
        hist = Dataset(lookup.path).read(spark)  # fresh per batch
        if hist is not None:
            v = lookup.vocab
            # project the changelog to temporal-table VERSIONS before
            # the as-of join (round-6 ADVICE: raw changelog leaked dead
            # versions): corrections supersede, retractions tombstone
            hist = project_temporal_versions(hist, on, vocab=v, time_col=rt)
            drop = [
                c
                for c in (v.offset_column, v.system_time_column, v.operation_type_column)
                if c in hist.columns
            ]
            enriched = asof_join(
                batch_df,
                hist.drop(*drop),
                on,
                left_time,
                rt,
                right_values=right_values,
                suffix=suffix,
                strict=strict,
            )
        else:
            enriched = batch_df
        DataWriter(target, strategy).write(
            spark,
            enriched,
            system_time=datetime.now(timezone.utc),
            extra_event={
                "streaming_batch": {"source": state.source_id(), "id": batch_id}
            },
        )
        state.record(batch_id)

    writer = (
        source.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    lower: str,
    upper: str,
    watermark_delay: str = "0 seconds",
    how: str = "inner",
) -> DataFrame:
    """Streaming twin of :func:`kamu_cli_spark.operators.windows.interval_join`
    — the reference's continuous stream-to-stream shipments join
    (examples/overdue_shipments: ``s.event_time BETWEEN o.event_time
    AND o.event_time + INTERVAL '2' DAY`` on Flink; SURVEY §2.6).

    Spark-first: this is a NATIVE Structured Streaming stream-stream
    join, not a foreachBatch emulation. Both sides get an event-time
    watermark and the join carries the equi-key condition plus the
    time-range predicate; Spark derives the state watermark from the
    range bound, so buffered rows are evicted as soon as no future
    match is possible — state is O(in-flight interval), not
    O(stream). ``how='left_outer'`` emits unmatched left rows once the
    watermark passes their upper bound (late flush: in bounded
    ``availableNow`` replays the final outer rows emit on the next
    trigger that advances the watermark, same as Flink's bounded
    semantics).

    At scale both sides shuffle once on the join keys; the range
    predicate is a residual on the per-key sorted state, never a
    cartesian expansion.
    """
    from kamu_cli_spark.operators.windows import interval_join

    # one implementation of the condition/projection logic: the batch
    # operator runs unchanged on watermarked streaming inputs
    return interval_join(
        left.withWatermark(left_time, watermark_delay),
        right.withWatermark(right_time, watermark_delay),
        on,
        left_time,
        right_time,
        lower,
        upper,
        how=how,
    )


def streaming_dedup_exact(
    stream: DataFrame,
    id_col: str,
    text_col: str = "text",
    event_time_col: str | None = None,
    watermark_delay: str = "1 hour",
) -> DataFrame:
    """Continuous exact dedup: the streaming twin of
    :func:`kamu_cli_spark.operators.dedup.dedup_exact`.

    Each record gets the same normalized-text md5 fingerprint as the
    batch operator, then duplicates are dropped on it. With an
    event-time column the state is bounded by a watermark
    (``dropDuplicatesWithinWatermark`` — late duplicates beyond the
    delay are the documented trade-off, exactly as in the reference's
    streaming engines); without one, ``dropDuplicates`` keeps
    all-fingerprint state and is only suitable for bounded replays
    (``availableNow`` backfills).

    At 100 TB the dedup state shuffles on the fingerprint — the same
    single-shuffle shape as the batch operator, held incrementally.
    """
    from kamu_cli_spark.operators.text import fingerprint

    with_fp = stream.withColumn("fingerprint", fingerprint(F.col(text_col)))
    if event_time_col is not None:
        return with_fp.withWatermark(
            event_time_col, watermark_delay
        ).dropDuplicatesWithinWatermark(["fingerprint"])
    return with_fp.dropDuplicates(["fingerprint"])
