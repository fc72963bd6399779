"""Streaming-style relational operators in batch form: tumbling windows,
interval joins, top-N — the derivative-transform patterns the reference
runs on Flink/RisingWave (SURVEY.md §2.6), expressed as deterministic
batch DataFrame plans (replayable; Structured Streaming variants share
the same expressions via `F.window` / watermarks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window(
    df: DataFrame,
    time_col: str,
    duration: str,
    keys: list[str],
    aggs: list[Column],
    emit_bounds: bool = True,
) -> DataFrame:
    """GROUP BY TUMBLE(time, duration) — e.g. `"1 day"`.

    Uses the built-in `F.window` bucketing (JVM, codegen); partial
    aggregation happens map-side before the shuffle on (window, keys).
    """
    g = df.groupBy(F.window(F.col(time_col), duration).alias("__w"), *keys)
    out = g.agg(*aggs)
    if emit_bounds:
        out = out.withColumn("window_start", F.col("__w.start")).withColumn(
            "window_end", F.col("__w.end")
        )
    return out.drop("__w")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    lower: str,
    upper: str,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream interval join:
    ``right_time BETWEEN left_time + lower AND left_time + upper``
    (e.g. lower="INTERVAL 0 DAY", upper="INTERVAL 2 DAY").

    The equi-key condition keeps this a hash/sort-merge join with a
    residual range predicate — NOT a broadcast-nested-loop. At scale the
    shuffle is on `on`; AQE handles skew.
    """
    lt, rt = F.col(f"__L.{left_time}"), F.col(f"__R.{right_time}")
    cond = [F.col(f"__L.{c}") == F.col(f"__R.{c}") for c in on]
    cond.append(rt >= lt + F.expr(lower))
    cond.append(rt <= lt + F.expr(upper))
    l, r = left.alias("__L"), right.alias("__R")
    joined = l.join(r, on=[c for c in cond], how=how)
    # resolve duplicate key columns: keep left's
    rcols = [c for c in right.columns if c not in on]
    return joined.select(
        *[F.col(f"__L.{c}") for c in left.columns],
        *[F.col(f"__R.{c}") for c in rcols],
    )


def sessionize(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    gap_seconds: int,
) -> DataFrame:
    """Gap-based sessionization (gaps-and-islands): a new session starts
    when the gap to the previous event of the same key exceeds
    `gap_seconds`. Adds `session_id` (0-based per key).

    One shuffle on the keys; the lag + running-sum windows share the
    same sort. This is the deterministic batch formulation of
    `F.session_window` (whose emitted bounds are engine-specific).
    """
    ts = F.unix_timestamp(F.col(time_col).cast("timestamp"))
    w = Window.partitionBy(*keys).orderBy(ts)
    new_session = (
        (ts - F.lag(ts).over(w) > gap_seconds) | F.lag(ts).over(w).isNull()
    ).cast("int")
    wsum = w.rowsBetween(Window.unboundedPreceding, 0)
    return df.withColumn(
        "session_id", (F.sum(new_session).over(wsum) - 1).cast("long")
    )


def top_n(
    df: DataFrame,
    n: int,
    order_by: list[Column],
    partition_by: list[str] | None = None,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-N (optionally per group) via row_number.

    The leaderboard pattern (examples/leaderboard, risingwave top-N).
    With `partition_by`, the window shuffles once on the group keys and
    each group sorts locally. Without it, Spark still avoids a global
    single-partition sort IF n is small — we instead use a
    `limit`-style plan: sort + limit pushes partial top-N to each
    partition (TakeOrderedAndProject).
    """
    if partition_by:
        w = Window.partitionBy(*partition_by).orderBy(*order_by)
        return (
            df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= n)
        )
    # global top-N: TakeOrderedAndProject (per-partition heaps, no full
    # global sort), then re-rank the tiny result
    top = df.orderBy(*order_by).limit(n)
    w = Window.orderBy(*order_by)
    return top.withColumn(rank_col, F.row_number().over(w))
