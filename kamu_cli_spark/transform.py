"""Incremental derivative transforms.

A derivative dataset declares a SQL transform over input datasets
(`SetTransform`). Each pull processes only the half-open offset interval
``(prev_offset, new_offset]`` of every input, runs the multi-step SQL
(each step = a temp view; the last/unaliased step is the output), and
commits `ExecuteTransform` recording the consumed intervals — fully
deterministic and replayable.

Reference lifecycle: transform_helpers.rs:29-269 (elaboration),
transform_executor_impl.rs:72-191 (execution/commit),
dtos_generated.rs:1496-1539 (Transform DTO: `query` or multi-step
`queries`). Spark-first: the "engine" is just `spark.sql` over temp
views of the pruned slice files — Catalyst sees ONLY the new slices, so
incremental cost tracks new-data volume, not history.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql import Column, functions as F

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators.merge import MergeStrategyAppend, MergeStrategy
from kamu_cli_spark.writer import DataWriter


class TransformError(Exception):
    pass


class _PassthroughOps(MergeStrategy):
    """Transform output already carries an `op` column — retractions and
    corrections from the input flow through map-style transforms
    unchanged (reference: test_engine_transform.rs:395+)."""

    consumes_op_column = True

    def merge(self, prev: DataFrame | None, new: DataFrame) -> DataFrame:
        op = self.vocab.operation_type_column
        others = [c for c in new.columns if c != op]
        return new.select(F.col(op).cast("int").alias(op), *others)

    def sort_order(self) -> list[Column]:
        return [F.col(self.vocab.event_time_column).asc_nulls_first()]


def set_transform(
    dataset: Dataset,
    inputs: dict[str, str],
    queries: list[dict[str, str]] | str,
    system_time: str | None = None,
) -> None:
    """Declare the transform: `inputs` maps query alias → dataset path;
    `queries` is SQL or [{"alias": ..., "query": ...}, ...] where the
    final step (no alias) is the output."""
    if isinstance(queries, str):
        queries = [{"query": queries}]
    dataset.chain.append(
        {"kind": "SetTransform", "inputs": inputs, "queries": queries},
        system_time=system_time,
    )


class TransformExecutor:
    """Plan + execute one incremental transform iteration."""

    def __init__(self, dataset: Dataset, strategy: MergeStrategy | None = None):
        self.dataset = dataset
        b = dataset.chain.last_event("SetTransform")
        if b is None:
            raise TransformError(f"dataset {dataset.name} has no SetTransform")
        self.inputs: dict[str, str] = b.event["inputs"]
        self.queries: list[dict[str, str]] = b.event["queries"]
        self.strategy = strategy or MergeStrategyAppend(dataset.vocab)

    def _last_processed_offsets(self) -> dict[str, int]:
        """Per input alias, last consumed offset (exclusive lower bound)."""
        out: dict[str, int] = {}
        for b in self.dataset.chain.iter_events("ExecuteTransform"):
            for alias, iv in b.event.get("query_inputs", {}).items():
                if iv.get("new_offset") is not None:
                    out[alias] = iv["new_offset"]
        return out

    def elaborate(self, spark: SparkSession) -> dict[str, Any] | None:
        """Compute per-input unprocessed intervals; None if up to date."""
        last = self._last_processed_offsets()
        plan: dict[str, Any] = {"inputs": {}}
        any_new = False
        for alias, path in self.inputs.items():
            src = Dataset(path)
            head_next = src.chain.next_offset()
            prev = last.get(alias)
            new_offset = head_next - 1 if head_next > 0 else None
            interval = {
                "prev_offset": prev,
                "new_offset": new_offset,
            }
            if new_offset is not None and (prev is None or new_offset > prev):
                any_new = True
            plan["inputs"][alias] = interval
        return plan if any_new else None

    def execute(
        self,
        spark: SparkSession,
        system_time: datetime | None = None,
    ) -> dict[str, Any] | None:
        """Run one incremental iteration; returns the committed event."""
        plan = self.elaborate(spark)
        if plan is None:
            return None
        system_time = system_time or datetime.now(timezone.utc)

        for alias, iv in plan["inputs"].items():
            src = Dataset(self.inputs[alias])
            df = src.read_between(spark, iv["prev_offset"], iv["new_offset"])
            if df is None:
                df = spark.read.parquet(  # empty frame w/ right schema
                    *(src.slice_paths()[:1] or [])
                ).limit(0) if src.slice_paths() else None
            if df is None:
                raise TransformError(f"input {alias} has no data or schema")
            df.createOrReplaceTempView(alias)

        result: DataFrame | None = None
        for step in self.queries:
            q = step["query"]
            alias = step.get("alias")
            df = spark.sql(q)
            if alias:
                df.createOrReplaceTempView(alias)
            else:
                result = df
        if result is None:
            raise TransformError("transform has no unaliased output step")

        # drop system columns the inputs carried through, if selected
        v = self.dataset.vocab
        drop = [c for c in (v.offset_column, v.system_time_column) if c in result.columns]
        if drop:
            result = result.drop(*drop)

        strategy = self.strategy
        if v.operation_type_column in result.columns and isinstance(
            strategy, MergeStrategyAppend
        ):
            strategy = _PassthroughOps(v)
        writer = DataWriter(self.dataset, strategy)
        event = writer.write(
            spark,
            result,
            system_time=system_time,
            event_kind="ExecuteTransform",
            extra_event={"query_inputs": plan["inputs"]},
        )
        if event is None:
            # No output rows, but still record consumed intervals so we
            # don't reprocess (reference commits ExecuteTransform with
            # empty new_data).
            event = {
                "kind": "ExecuteTransform",
                "new_data": None,
                "new_watermark": self.dataset.chain.current_watermark(),
                "query_inputs": plan["inputs"],
            }
            self.dataset.chain.append(event, system_time=system_time.isoformat())
        return event
