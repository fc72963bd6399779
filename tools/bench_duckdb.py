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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times = {}
    for name, sql in entry.oracle_sql().items():
        t0 = time.time()
        con.execute(sql).fetchall()
        times[name] = round(time.time() - t0, 3)
    print(json.dumps({"engine": "duckdb", "sf_dir": sf_dir,
                      "total": round(sum(times.values()), 3), "queries": times}))


if __name__ == "__main__":
    main()
