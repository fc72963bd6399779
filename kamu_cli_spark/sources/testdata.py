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


# (session, sf_dir, table) -> analyzed DataFrame. The testdata files are
# immutable, so the relation (file listing + footer schema) can be built
# once per session instead of on every query construction — the
# listing/footer read is ~100-300 ms of driver time that otherwise taxes
# EVERY query's plan build. The cached DataFrame pins its session, so
# id(spark) cannot be recycled while the entry lives.
_RELATION_CACHE: dict[tuple[int, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), os.path.abspath(sf_dir), name)
    cached = _RELATION_CACHE.get(key)
    if cached is not None:
        return cached
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
    else:
        df = spark.read.parquet(path)
    _RELATION_CACHE[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}
