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
    if right_values is None:
        right_values = [c for c in right.columns if c not in on and c != right_time]
    left_extra = [c for c in left.columns if c not in on and c != left_time]

    # right rows sort before left rows at identical time for inclusive
    # semantics, after them for strict
    right_tag, left_tag = (0, 1) if not strict else (1, 0)

    rpayload = F.struct(*[F.col(c) for c in right_values])
    rpayload_t = right.select(rpayload.alias("__rp")).schema["__rp"].dataType
    l_sel = left.select(
        *[F.col(c) for c in on],
        F.col(left_time).alias("__t"),
        F.lit(left_tag).alias("__tag"),
        F.struct(*[F.col(c) for c in left_extra]).alias("__lpayload"),
        F.lit(None).cast(rpayload_t).alias("__rpayload"),
    )
    lpayload_t = l_sel.schema["__lpayload"].dataType
    r_sel = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("__t"),
        F.lit(right_tag).alias("__tag"),
        F.lit(None).cast(lpayload_t).alias("__lpayload"),
        rpayload.alias("__rpayload"),
    )

    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__t").asc_nulls_first(), F.col("__tag").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        l_sel.unionByName(r_sel)
        .withColumn("__carried", F.last("__rpayload", ignorenulls=True).over(w))
        .filter(F.col("__tag") == F.lit(left_tag))
    )

    taken = set(on) | {left_time} | set(left_extra)
    out = carried.select(
        *[F.col(c) for c in on],
        F.col("__t").alias(left_time),
        *[F.col("__lpayload." + c).alias(c) for c in left_extra],
        *[
            F.col("__carried." + c).alias(c + suffix if c in taken else c)
            for c in right_values
        ],
    )
    return out
