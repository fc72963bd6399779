"""Local replica of the driver's correctness gate.

Runs every `__spark_entry__.queries()` entry on Spark and its
`oracle_sql()` twin on DuckDB over the same parquet tables, then
compares row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted, values canonicalized).

Usage:  python tools/oracle_check.py [sf_dir] [query ...]
Exit code != 0 on any mismatch.
"""

from __future__ import annotations

import hashlib
import math
import sys
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    if v is None or v is pd.NaT:
        return "\\N"
    if isinstance(v, (bool, np.bool_)):
        return "true" if bool(v) else "false"
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        v = float(v)
        if math.isnan(v):
            return "\\N"  # pandas null for a numeric column
        if v == int(v) and abs(v) < 1e15:
            return repr(int(v)) + ".0"
        return repr(v)
    if isinstance(v, datetime):
        # pandas has no date dtype: DuckDB DATE arrives as a midnight
        # Timestamp while Spark collect() keeps datetime.date — hash
        # dates as midnight timestamps on both paths.
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x01".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from kamu_cli_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")  # never spill inside the repo

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    n_run = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        n_run += 1
        import time

        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        spark_s = time.time() - t0

        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows ({spark_s:.1f}s)")
            continue
        try:
            # .df() (not fetchall): the driver's hasher is pandas-based,
            # so DuckDB HUGEINT → float64 drift must be visible here too
            # (fetchall returns Python ints for HUGEINT and hides it).
            ddf = con.execute(oracles[name]).df()
            dcols = list(ddf.columns)
            drows = list(ddf.itertuples(index=False, name=None))
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue

        problems = []
        if len(srows) != len(drows):
            problems.append(f"rowcount spark={len(srows)} duckdb={len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"columns spark={sorted(scols)} duckdb={sorted(dcols)}")
        if not problems:
            hs, hd = table_hash(scols, srows), table_hash(dcols, drows)
            if hs != hd:
                problems.append("value-hash mismatch")
                # print first differing canonical rows to debug
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
                ls = sorted("\x01".join(canon(r[i]) for i in order_s) for r in srows)
                ld = sorted("\x01".join(canon(r[i]) for i in order_d) for r in drows)
                for i, (x, y) in enumerate(zip(ls, ld)):
                    if x != y:
                        print(f"  first diff row {i}:\n    spark : {x!r}\n    duckdb: {y!r}")
                        break
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"OK   {name}: {len(srows)} rows ({spark_s:.1f}s)")

    print(f"\n{n_run - len(failures)}/{n_run} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
