"""Mechanical sweep: no oracle may emit an arrow type that the
driver's pandas-based hasher canonicalizes differently from Spark.

Root cause (round 10, VERDICT.md "What's wrong #1"): DuckDB integer
arithmetic (sum(CASE...), int*int) widens to HUGEINT, which arrives in
arrow as decimal128(38,0) and in pandas as float64 — so a bit-identical
answer hashes as `63.0` on the oracle side vs `63` on the Spark side
and the driver grades hash_match=false. Spark has no 128-bit integer,
so ANY decimal128 / uint64 oracle output column is a latent parity
failure regardless of values.

This test plans every oracle_sql() statement against the sf0.001
tables with a LIMIT-0 wrapper (schema only, no full execution) and
asserts the arrow output schema contains no decimal / uint64 column.
"""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pytest

import __spark_entry__ as entry

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _bad_fields(schema: pa.Schema) -> list[str]:
    bad = []
    for f in schema:
        t = f.type
        if pa.types.is_decimal(t) or t == pa.uint64():
            bad.append(f"{f.name}: {t}")
    return bad


@pytest.mark.skipif(not os.path.isdir(SF_DIR), reason="testdata absent")
def test_no_oracle_emits_pandas_lossy_integer_types():
    con = duckdb.connect()
    con.execute("SET temp_directory='/tmp/duckdb_spill'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    offenders: dict[str, list[str]] = {}
    for name, sql in entry.oracle_sql().items():
        tbl = con.execute(
            f"SELECT * FROM ({sql}) __oracle_schema_probe LIMIT 0"
        ).arrow()
        bad = _bad_fields(tbl.schema)
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracle columns with driver-lossy arrow types (CAST to BIGINT): "
        f"{offenders}"
    )
