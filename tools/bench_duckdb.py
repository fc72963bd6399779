"""DuckDB-side timings of the oracle SQL at a given SF — the single-node
columnar baseline our Spark times are compared against (BASELINE.md)."""
import json
import sys
import time

import duckdb

sys.path.insert(0, ".")
import __spark_entry__ as entry  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main():
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")  # never spill inside the repo

    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # Spark-written table = directory of parts
            p = f"{p}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    times = {}
    for name, sql in entry.oracle_sql().items():
        if only is not None and name not in only:
            continue
        best = None
        for _ in range(2):  # min-of-2, same methodology as bench.py
            t0 = time.time()
            con.execute(sql).fetchall()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
    print(json.dumps({"engine": "duckdb", "sf_dir": sf_dir,
                      "total": round(sum(times.values()), 3), "queries": times}))


if __name__ == "__main__":
    main()
