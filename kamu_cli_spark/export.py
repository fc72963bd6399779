"""Export service — dataset/query results to parquet/csv/ndjson
(reference: services/export_service_impl.rs:55-110)."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


class ExportError(Exception):
    pass


def export(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    records_per_file: int | None = None,
) -> int:
    """Write `df` to `path`; returns exported row count.

    `records_per_file` maps to Spark's maxRecordsPerFile — the write
    stays fully parallel (each task rolls files at the limit) instead of
    a coalesce(1) bottleneck.
    """
    fmt = fmt.lower()
    n = df.count()
    writer = df.write.mode("overwrite")
    if records_per_file:
        writer = writer.option("maxRecordsPerFile", records_per_file)
        target_files = max(1, math.ceil(n / records_per_file))
        if target_files < df.rdd.getNumPartitions():
            df2 = df.coalesce(target_files)
            writer = df2.write.mode("overwrite").option(
                "maxRecordsPerFile", records_per_file
            )
    if fmt == "parquet":
        writer.parquet(path)
    elif fmt == "csv":
        writer.option("header", True).csv(path)
    elif fmt == "ndjson":
        writer.json(path)
    else:
        raise ExportError(f"unsupported export format: {fmt}")
    return n
