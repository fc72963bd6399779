"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition up to the cluster's parallelism when the input arrives
    in fewer partitions (e.g. one small parquet file) — per-row heavy
    operators (shingling, hashing, vector math) otherwise run on a
    single core. A round-robin shuffle of the raw rows is far cheaper
    than losing core-count parallelism on the downstream work."""
    target = target or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
