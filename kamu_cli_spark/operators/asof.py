"""Temporal (as-of) join — `FOR SYSTEM_TIME AS OF t` semantics.

For every left row at time ``t``, attach the latest right-side row for
the same key with ``right_time <= t`` (backward direction). This is the
reference's temporal-table join (dtos_generated.rs:1485-1490
TemporalTable; currency_conversion example), which Spark SQL lacks
natively.

Spark-first implementation — the **union + running last_value**
technique, not a range join:

1. project both sides to a common layout (left payload columns ride
   along as nulls on right rows and vice versa), tag right=0 / left=1;
2. union; ONE shuffle partitioned by key, sorted by (time, tag);
3. running ``last(right_payload, ignorenulls=True)`` carries the most
   recent right values forward onto each left row;
4. keep left rows, unpack payloads.

Cost: a single sort-shuffle over |L| + |R| — same order as a sort-merge
join, with no time-range predicate explosion (a naive range join is
O(|L| × matching-window)). Skewed keys are split by AQE. A pandas
`merge_asof` via applyInPandas would give the same result but forces
Arrow transfer; the union trick stays in the JVM under whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    right_values: list[str] | None = None,
    suffix: str = "",
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join.

    Parameters
    ----------
    on: equi-join key columns (present on both sides)
    left_time / right_time: event-time columns
    right_values: right columns to attach (default: all non-key,
        non-time columns); attached with `suffix` appended on name clash
    strict: if True use ``right_time < left_time`` (exclusive);
        default inclusive (``<=``)
    """
    from pyspark.sql.types import IntegerType, StructField, StructType

    from kamu_cli_spark.operators.util import sql_ident as q
    from kamu_cli_spark.operators.util import sql_str as lq

    if right_values is None:
        right_values = [c for c in right.columns if c not in on and c != right_time]
    left_extra = [c for c in left.columns if c not in on and c != left_time]

    # right rows sort before left rows at identical time for inclusive
    # semantics, after them for strict
    right_tag, left_tag = (0, 1) if not strict else (1, 0)

    # Built from STRING SQL expressions (the round-6 CDC trick,
    # operators/merge.py): Column-object chains over wide payloads cost
    # one py4j socket round trip per call (~1,400 for this builder,
    # profiled round 7), and the two `.schema` probes on derived frames
    # each forced a full analysis pass. The payload struct types come
    # from the INPUT schemas instead — one cached property read. The
    # null payload is cast via a StructType OBJECT, not DDL text:
    # simpleString() emits unquoted field names, which breaks on
    # non-identifier column names (spaces etc.) that are legal here.
    ltypes = {f.name: f.dataType for f in left.schema.fields}
    rtypes = {f.name: f.dataType for f in right.schema.fields}

    def null_payload(names: list[str], types: dict):
        fields = (
            [StructField(n, types[n]) for n in names]
            if names  # payload never unpacked when empty; cast needs a type
            else [StructField("__dummy", IntegerType())]
        )
        return F.lit(None).cast(StructType(fields))

    def named_struct(names: list[str]) -> str:
        if not names:
            return "named_struct('__dummy', 1)"
        return (
            "named_struct("
            + ", ".join(f"{lq(n)}, {q(n)}" for n in names)
            + ")"
        )

    l_sel = left.selectExpr(
        *[q(c) for c in on],
        f"{q(left_time)} AS `__t`",
        f"{left_tag} AS `__tag`",
        f"{named_struct(left_extra)} AS `__lpayload`",
    ).withColumn("__rpayload", null_payload(right_values, rtypes))
    r_sel = right.selectExpr(
        *[q(c) for c in on],
        f"{q(right_time)} AS `__t`",
        f"{right_tag} AS `__tag`",
        f"{named_struct(right_values)} AS `__rpayload`",
    ).withColumn("__lpayload", null_payload(left_extra, ltypes))

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc_nulls_first(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        l_sel.unionByName(r_sel)
        .withColumn("__carried", F.last("__rpayload", ignorenulls=True).over(w))
        .filter(f"`__tag` = {left_tag}")
    )

    taken = set(on) | {left_time} | set(left_extra)
    out = carried.selectExpr(
        *[q(c) for c in on],
        f"`__t` AS {q(left_time)}",
        *[f"`__lpayload`.{q(c)} AS {q(c)}" for c in left_extra],
        *[
            f"`__carried`.{q(c)} AS {q(c + suffix if c in taken else c)}"
            for c in right_values
        ],
    )
    return out
