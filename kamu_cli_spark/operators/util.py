"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

# Inputs at or above this size are assumed to already scan with >= core
# count partitions (128 MB splits); blindly repartitioning them would be
# a full shuffle of the operator's input — the opposite of what spread
# is for.
_SPREAD_MAX_BYTES = 512 * 1024 * 1024


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Round-robin small inputs across the cluster's parallelism so
    per-row-heavy operators (shingling, hashing, vector math) don't run
    on the one partition a small parquet file scans into. Large inputs
    pass through untouched — at scale the scan already yields plenty of
    partitions and an extra shuffle would only hurt.

    The small/large decision reads Catalyst's logical-plan size estimate
    (file-index bytes for scans — tens of ms) instead of materializing
    the plan's RDD for a partition count, which costs >1s of physical
    planning per call and dominated small-SF operator latency.
    """
    target = target or df.sparkSession.sparkContext.defaultParallelism
    try:
        size = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # stats unavailable → fall back to partition count
        if df.rdd.getNumPartitions() >= target:
            return df
        return df.repartition(target)
    if size >= _SPREAD_MAX_BYTES:
        return df
    return df.repartition(target)
