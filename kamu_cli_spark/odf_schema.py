"""ODF ⇄ Spark type-system mapping (SURVEY.md §1.2; reference:
dtos_generated.rs:521-890 DataSchema, arrow_conversions.rs:149-380).

Follows the survey's mapping table, including the lossy corners:
unsigned 64-bit widens to Decimal(20,0); Float16 widens to float;
negative-scale decimals widen precision; Time maps to a long
(microseconds) with a marker; Interval/Union/Dictionary are rejected
as in the reference.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import types as T


class OdfTypeError(Exception):
    pass


_SIMPLE = {
    "Bool": T.BooleanType(),
    "Int8": T.ByteType(),
    "Int16": T.ShortType(),
    "Int32": T.IntegerType(),
    "Int64": T.LongType(),
    "UInt8": T.ShortType(),
    "UInt16": T.IntegerType(),
    "UInt32": T.LongType(),
    "UInt64": T.DecimalType(20, 0),
    "Float16": T.FloatType(),
    "Float32": T.FloatType(),
    "Float64": T.DoubleType(),
    "String": T.StringType(),
    "Binary": T.BinaryType(),
    "Date": T.DateType(),
    "Null": T.NullType(),
}

_REJECTED = {"Interval", "Union", "Dictionary"}


def odf_to_spark_type(odf: dict[str, Any] | str) -> T.DataType:
    """ODF logical type descriptor → Spark type."""
    if isinstance(odf, str):
        odf = {"kind": odf}
    kind = odf.get("kind")
    if kind in _REJECTED:
        raise OdfTypeError(f"ODF rejects {kind} (arrow_conversions.rs)")
    if kind in _SIMPLE:
        return _SIMPLE[kind]
    if kind == "Decimal":
        p, s = odf.get("precision", 38), odf.get("scale", 0)
        if s < 0:
            # negative scale unsupported in Spark → widen precision,
            # scale 0 (values are whole multiples anyway)
            p, s = p - s, 0
        return T.DecimalType(p, s)
    if kind == "Time":
        return T.LongType()  # microseconds-since-midnight; no TimeType
    if kind == "Timestamp":
        return T.TimestampType()  # canonicalized to UTC by the engine
    if kind == "Duration":
        return T.DayTimeIntervalType()
    if kind == "List":
        return T.ArrayType(odf_to_spark_type(odf["item_type"]))
    if kind == "Map":
        return T.MapType(
            odf_to_spark_type(odf["key_type"]), odf_to_spark_type(odf["value_type"])
        )
    if kind == "Struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"], odf_to_spark_type(f["type"]), f.get("nullable", True)
                )
                for f in odf["fields"]
            ]
        )
    if kind == "Option":
        return odf_to_spark_type(odf["inner"])  # nullability on the field
    raise OdfTypeError(f"unknown ODF type kind: {kind}")


def odf_schema_to_struct(fields: list[dict[str, Any]]) -> T.StructType:
    out = []
    for f in fields:
        t = f["type"]
        nullable = f.get("nullable", True) or (
            isinstance(t, dict) and t.get("kind") == "Option"
        )
        out.append(T.StructField(f["name"], odf_to_spark_type(t), nullable))
    return T.StructType(out)


_SPARK_TO_ODF = {
    T.BooleanType: "Bool",
    T.ByteType: "Int8",
    T.ShortType: "Int16",
    T.IntegerType: "Int32",
    T.LongType: "Int64",
    T.FloatType: "Float32",
    T.DoubleType: "Float64",
    T.StringType: "String",
    T.BinaryType: "Binary",
    T.DateType: "Date",
    T.TimestampType: "Timestamp",
    T.TimestampNTZType: "Timestamp",
    T.NullType: "Null",
}


def spark_to_odf_type(dt: T.DataType) -> dict[str, Any]:
    if type(dt) in _SPARK_TO_ODF:
        return {"kind": _SPARK_TO_ODF[type(dt)]}
    if isinstance(dt, T.DecimalType):
        return {"kind": "Decimal", "precision": dt.precision, "scale": dt.scale}
    if isinstance(dt, T.ArrayType):
        return {"kind": "List", "item_type": spark_to_odf_type(dt.elementType)}
    if isinstance(dt, T.MapType):
        return {
            "kind": "Map",
            "key_type": spark_to_odf_type(dt.keyType),
            "value_type": spark_to_odf_type(dt.valueType),
        }
    if isinstance(dt, T.StructType):
        return {
            "kind": "Struct",
            "fields": [
                {
                    "name": f.name,
                    "type": spark_to_odf_type(f.dataType),
                    "nullable": f.nullable,
                }
                for f in dt.fields
            ],
        }
    if isinstance(dt, T.DayTimeIntervalType):
        return {"kind": "Duration"}
    raise OdfTypeError(f"no ODF mapping for Spark type {dt}")
