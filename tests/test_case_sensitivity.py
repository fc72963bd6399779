"""Case-sensitive identifier opt-in (reference:
engine_config_embedded.rs:18-30 — ODF identifiers are case-sensitive;
Spark's default is kept case-insensitive for oracle compatibility, with
get_spark(case_sensitive=True) as the ODF-semantics mode)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.session import get_spark
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


@pytest.fixture()
def cs_spark(spark):
    """Flip the shared session into case-sensitive mode, restore after."""
    s = get_spark(case_sensitive=True)
    assert s.conf.get("spark.sql.caseSensitive") == "true"
    yield s
    s.conf.set("spark.sql.caseSensitive", "false")


def test_case_distinct_columns_round_trip(cs_spark, tmp_path):
    spark = cs_spark
    df = spark.sql("SELECT 'a' AS k, 1 AS Value, 2 AS value")
    ds = Dataset.create(str(tmp_path), "cased", system_time=T0.isoformat())
    DataWriter(ds, MergeStrategyLedger(["k"])).write(spark, df, system_time=T0)

    out = ds.read(spark)
    assert "Value" in out.columns and "value" in out.columns
    row = out.select("Value", "value").collect()[0]
    assert (row["Value"], row["value"]) == (1, 2)

    # SQL resolves identifiers case-sensitively
    out.createOrReplaceTempView("cased_v")
    got = spark.sql("SELECT Value FROM cased_v").collect()[0][0]
    assert got == 1


def test_case_sensitive_resolution_errors_on_wrong_case(cs_spark):
    spark = cs_spark
    df = spark.sql("SELECT 1 AS Amount")
    df.createOrReplaceTempView("cs_t")
    with pytest.raises(Exception):
        spark.sql("SELECT amount FROM cs_t").collect()


def test_default_session_remains_case_insensitive(spark):
    spark.conf.set("spark.sql.caseSensitive", "false")
    df = spark.sql("SELECT 1 AS Amount")
    df.createOrReplaceTempView("ci_t")
    assert spark.sql("SELECT amount FROM ci_t").collect()[0][0] == 1
