"""Loaders for the driver's synthetic TPC-H-ish parquet tables.

The `events` table stores `ts` as parquet TIMESTAMP(NANOS), which Spark
4 refuses to read natively; we flip the legacy nanos-as-long switch and
convert to microseconds (matching DuckDB's µs TIMESTAMP values exactly).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer division — ns-since-epoch (~1.7e18) exceeds double
            # precision, so a float divide would round the microseconds
            df = df.withColumn(
                "ts",
                F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
            )
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
