"""Skew mitigation — two-phase salted aggregation.

AQE's skew-join splitting covers joins; skewed GROUP BY keys (one hot
key receiving most rows) still funnel into a single reducer. The
classic fix: salt the key, partially aggregate per (key, salt), then
combine. Works for any algebraic aggregate (sum/count/min/max) and —
via the (sum, count) decomposition — averages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    salt_col: str | None = None,
) -> DataFrame:
    """Two-phase aggregation: `aggs` maps output column →
    (input column, fn) with fn in {sum, count, min, max, avg}.

    Phase 1 aggregates on (keys + salt) — the hot key's rows spread over
    `salt_buckets` reducers; phase 2 combines the per-salt partials.

    `salt_col`: a high-cardinality column to derive the salt from
    (``pmod(hash(col), buckets)``). Prefer it over the ``F.rand``
    fallback: a deterministic salt keeps replays byte-identical AND
    stays a deterministic expression, which Catalyst can reorder/fuse —
    ``rand()`` is flagged nondeterministic and pins its own projection
    barrier.
    """
    supported = {"sum", "count", "min", "max", "avg"}
    for out, (col, fn) in aggs.items():
        if fn not in supported:
            raise ValueError(f"{out}: unsupported aggregate {fn}")

    salt = (
        F.pmod(F.hash(F.col(salt_col)), F.lit(salt_buckets))
        if salt_col is not None
        else (F.rand(seed=7) * salt_buckets).cast("int")
    )
    salted = df.withColumn("__salt", salt)

    phase1 = []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1.append(F.count(F.lit(1)).alias(f"__p_{out}"))
        elif fn == "avg":
            phase1.append(F.sum(col).alias(f"__ps_{out}"))
            phase1.append(F.count(col).alias(f"__pc_{out}"))
        else:
            phase1.append(getattr(F, fn)(col).alias(f"__p_{out}"))
    partial = salted.groupBy(*keys, "__salt").agg(*phase1)

    phase2 = []
    for out, (col, fn) in aggs.items():
        if fn in ("sum", "count"):
            phase2.append(F.sum(f"__p_{out}").alias(out))
        elif fn == "avg":
            phase2.append(
                (F.sum(f"__ps_{out}") / F.sum(f"__pc_{out}")).alias(out)
            )
        else:
            phase2.append(getattr(F, fn)(f"__p_{out}").alias(out))
    return partial.groupBy(*keys).agg(*phase2)
