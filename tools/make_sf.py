"""Scale a testdata SF directory by integer-factor key-shifted replication.

Usage: python tools/make_sf.py <src_sf_dir> <dst_dir> <factor>

Produces a dataset `factor`× the source: fact/dim rows are replicated
with all key columns shifted by `replica * (max_key + 1)` so join
selectivities, per-key group sizes, and referential integrity are
preserved while total volume scales linearly. Deterministic (no RNG) —
the same inputs always produce byte-identical logical content, so Spark
and DuckDB benches read the exact same rows.

The replication itself is Spark-native (broadcast cross join against a
`range(factor)` replica table — one narrow pipeline per table, no
shuffle), i.e. the generator would scale to making a 100× dataset too.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from kamu_cli_spark.session import get_spark
from kamu_cli_spark.sources.testdata import TABLES, load_table

# key columns shifted per replica (referential groups share max bases:
# orders.o_custkey shifts by customer's base, lineitem.l_orderkey by
# orders' base, etc.)
SHIFT_KEYS: dict[str, list[str]] = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# which table's key a foreign key must shift in lockstep with
FK_BASE: dict[tuple[str, str], tuple[str, str]] = {
    ("orders", "o_custkey"): ("customer", "c_custkey"),
    ("lineitem", "l_orderkey"): ("orders", "o_orderkey"),
    ("lineitem", "l_partkey"): ("part", "p_partkey"),
    ("lineitem", "l_suppkey"): ("supplier", "s_suppkey"),
}


def main() -> None:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    # "scaled" (default): hash-repartition fact tables into ~2 MB
    # files so scans parallelize in any engine — the realistic layout.
    # "legacy": preserve the source's partitioning (historically ONE
    # file = ONE row group per table) — regenerates the exact dataset
    # the round-7 sf1 crossover gate was measured on (BASELINE.md).
    layout = sys.argv[4] if len(sys.argv) > 4 else "scaled"
    spark = get_spark(app_name="make-sf")
    os.makedirs(dst, exist_ok=True)

    # primary-key shift bases, computed once per referenced table
    bases: dict[tuple[str, str], int] = {}
    for t, cols in SHIFT_KEYS.items():
        df = load_table(spark, src, t)
        row = df.agg(*[F.max(c).alias(c) for c in cols]).collect()[0]
        for c in cols:
            bases[(t, c)] = int(row[c]) + 1

    reps = F.broadcast(
        spark.range(factor).select(F.col("id").alias("__rep"))
    )
    for t in TABLES:
        src_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(os.path.join(src, f"{t}.parquet"))
            for f in fs
        ) if os.path.isdir(os.path.join(src, f"{t}.parquet")) else (
            os.path.getsize(os.path.join(src, f"{t}.parquet"))
        )
        if t in SHIFT_KEYS and factor > 1 and layout != "legacy":
            # Scan-parallel scaled layout WITHOUT a shuffle: one output
            # file per READ split, so sizing the split to
            # src_bytes / n_files makes the narrow replicate pipeline
            # write ~n_files files of ~(factor * split) bytes — many
            # row groups, parallel scans in Spark AND DuckDB, the
            # layout any real writer produces (never one giant row
            # group, which decodes on one thread of 32). The first
            # scaled generator hash-repartitioned here instead: a
            # full-table shuffle that DOUBLED the generator's disk
            # footprint (shuffle temp + output) and hit ENOSPC at
            # sf100 — file assignment is physical layout, not logical
            # content, so the shuffle bought nothing.
            n_files = min(64, max(8, int(src_bytes * factor / (2 << 20))))
            split = max(1 << 20, src_bytes // n_files)
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
            spark.conf.set("spark.sql.files.openCostInBytes", str(64 << 10))
        df = load_table(spark, src, t)
        if t in SHIFT_KEYS and factor > 1:
            df = df.crossJoin(reps)
            for c in SHIFT_KEYS[t]:
                base_t, base_c = FK_BASE.get((t, c), (t, c))
                df = df.withColumn(
                    c, F.col(c) + F.col("__rep") * F.lit(bases[(base_t, base_c)])
                )
            df = df.select([c for c in df.columns if c != "__rep"])
        out = os.path.join(dst, f"{t}.parquet")
        df.write.mode("overwrite").parquet(out, compression="snappy")
        spark.conf.unset("spark.sql.files.maxPartitionBytes")
        spark.conf.unset("spark.sql.files.openCostInBytes")
        print(f"{t}: written to {out}")
    spark.stop()


if __name__ == "__main__":
    main()
