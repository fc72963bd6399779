"""Salted aggregation + ODF type mapping tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kamu_cli_spark.odf_schema import (
    OdfTypeError,
    odf_schema_to_struct,
    odf_to_spark_type,
    spark_to_odf_type,
)
from kamu_cli_spark.plans.skew import salted_aggregate


def test_salted_aggregate_matches_plain(spark):
    # 90% of rows share one hot key
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 != 0, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    salted = salted_aggregate(
        df,
        ["k"],
        {
            "n": ("v", "count"),
            "total": ("v", "sum"),
            "lo": ("v", "min"),
            "hi": ("v", "max"),
            "mean": ("v", "avg"),
        },
    )
    plain = df.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("total"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.avg("v").alias("mean"),
    )
    a = {r["k"]: (r["n"], round(r["total"], 6), r["lo"], r["hi"], round(r["mean"], 9))
         for r in salted.collect()}
    b = {r["k"]: (r["n"], round(r["total"], 6), r["lo"], r["hi"], round(r["mean"], 9))
         for r in plain.collect()}
    assert a == b


def test_odf_type_mapping_roundtrip():
    s = odf_schema_to_struct(
        [
            {"name": "id", "type": "Int64", "nullable": False},
            {"name": "flags", "type": {"kind": "List", "item_type": "Bool"}},
            {
                "name": "amount",
                "type": {"kind": "Decimal", "precision": 18, "scale": 4},
            },
            {"name": "big", "type": "UInt64"},
            {"name": "opt", "type": {"kind": "Option", "inner": "String"}},
        ]
    )
    assert s["id"].dataType == T.LongType() and not s["id"].nullable
    assert s["flags"].dataType == T.ArrayType(T.BooleanType())
    assert s["amount"].dataType == T.DecimalType(18, 4)
    assert s["big"].dataType == T.DecimalType(20, 0)  # unsigned 64 widens
    assert s["opt"].dataType == T.StringType() and s["opt"].nullable

    back = spark_to_odf_type(s["flags"].dataType)
    assert back == {"kind": "List", "item_type": {"kind": "Bool"}}


def test_odf_negative_scale_decimal_widens():
    t = odf_to_spark_type({"kind": "Decimal", "precision": 10, "scale": -2})
    assert t == T.DecimalType(12, 0)


def test_odf_rejected_types():
    with pytest.raises(OdfTypeError):
        odf_to_spark_type("Union")
