"""Stateful streaming upsert — continuous UpsertStream merge via
`applyInPandasWithState`.

The batch `MergeStrategyUpsertStream` needs the previous latest-per-PK
state as a DataFrame; in continuous mode that state lives in Spark's
state store instead, keyed by the primary key. Each micro-batch:

1. rows group by PK; per group the handler reads the last-known values
   from GroupState;
2. upserts/retractions classify exactly like the batch strategy
   (+A new key, -C/+C changed values, -R retract existing, drop no-ops
   and retract-unseen);
3. the new latest values persist back into the state store.

Emitted rows form a changelog stream a downstream `foreachBatch` writer
can commit with the ChangelogStream strategy — so the continuous and
batch paths produce identical datasets (asserted in tests).

State scales horizontally: the state store is hash-partitioned on the
PK across executors; each micro-batch shuffles only its own rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kamu_cli_spark.vocab import OperationType as Op


def _null_safe_equal(a: Any, b: Any) -> bool:
    """SQL `a IS NOT DISTINCT FROM b` over pandas scalars: two nulls
    (None/NaN/NaT) compare EQUAL — plain `!=` treats NaN as different
    from itself, which made repeated upserts with a null value column
    emit spurious -C/+C pairs every micro-batch."""
    try:
        a_na, b_na = bool(pd.isna(a)), bool(pd.isna(b))
    except (TypeError, ValueError):  # non-scalar (list-valued column)
        a_na = b_na = False
    if a_na or b_na:
        return a_na and b_na
    return a == b


def _tuples_equal(xs: tuple, ys: tuple) -> bool:
    return all(_null_safe_equal(a, b) for a, b in zip(xs, ys))


def streaming_upsert_to_changelog(
    stream: DataFrame,
    primary_key: list[str],
    value_columns: list[str],
    op_column: str = "op",
    order_column: str | None = None,
) -> DataFrame:
    """Convert a streaming upsert source into a changelog stream.

    `value_columns`: the non-PK payload columns to track/compare.
    `order_column`: intra-batch ordering (latest wins); required for
    deterministic batches with multiple updates per key.
    """
    # Build output schema from the input schema: op + pk + values
    in_schema = dict(zip(stream.schema.names, [f.dataType.simpleString() for f in stream.schema.fields]))
    parts = [f"{op_column} int"]
    for c in primary_key + value_columns:
        parts.append(f"{c} {in_schema[c]}")
    out_schema = ", ".join(parts)
    state_schema = ", ".join(f"{c} {in_schema[c]}" for c in value_columns)

    def handle(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        rows = pd.concat(list(pdfs), ignore_index=True)
        if order_column:
            rows = rows.sort_values(order_column, kind="stable")
        prev_vals = tuple(state.get) if state.exists else None

        out: list[dict[str, Any]] = []
        for _, r in rows.iterrows():
            vals = tuple(r[c] for c in value_columns)
            is_retract = int(r[op_column]) == Op.RETRACT
            if is_retract:
                if prev_vals is None:
                    continue  # retract of unseen key → drop
                out.append(
                    {op_column: Op.RETRACT, **dict(zip(value_columns, prev_vals))}
                )
                prev_vals = None
            elif prev_vals is None:
                out.append({op_column: Op.APPEND, **dict(zip(value_columns, vals))})
                prev_vals = vals
            elif not _tuples_equal(vals, prev_vals):
                out.append(
                    {
                        op_column: Op.CORRECT_FROM,
                        **dict(zip(value_columns, prev_vals)),
                    }
                )
                out.append(
                    {op_column: Op.CORRECT_TO, **dict(zip(value_columns, vals))}
                )
                prev_vals = vals
            # else: no-op upsert → drop

        if prev_vals is None:
            state.remove()
        else:
            state.update(prev_vals)

        if not out:
            yield pd.DataFrame(
                columns=[op_column] + list(primary_key) + list(value_columns)
            )
            return
        df = pd.DataFrame(out)
        for i, c in enumerate(primary_key):
            df[c] = key[i]
        yield df[[op_column] + list(primary_key) + list(value_columns)]

    return stream.groupBy(*primary_key).applyInPandasWithState(
        handle,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_topn_to_changelog(
    stream: DataFrame,
    order_column: str,
    n: int,
    payload_columns: list[str],
    partition_columns: list[str] | None = None,
    ascending: bool = False,
    tie_breakers: list[str] | None = None,
    op_column: str = "op",
    place_column: str = "place",
) -> DataFrame:
    """Continuously-maintained top-N leaderboard as a changelog stream —
    the streaming twin of :class:`StatefulTransformExecutor` over the
    reference's leaderboard pattern (examples/leaderboard/
    leaderboard.yaml: RisingWave `row_number() over (order by score
    desc) <= N`, which emits retractions as the ranking shifts).

    Output is keyed on (`partition_columns` ++ `place`) and follows the
    snapshot-diff op alphabet the batch executor commits: a place newly
    occupied emits +A; a place whose occupant changes emits -C (old
    values) then +C (new values); a place vacated emits -R with the
    departing values — so a downstream foreachBatch writer using
    ChangelogStream produces a dataset IDENTICAL to the batch path
    (asserted in tests/test_streaming_topn.py).

    `tie_breakers` orders rows with equal `order_column` values
    (ascending) and must match the batch query's ORDER BY tail exactly
    — e.g. the leaderboard example ties by (match_id, player_id) — or
    the two paths diverge on the first tied score. Default: the
    remaining payload columns in declaration order.

    State per group is the current top-N rows, JSON-encoded in a single
    string cell — O(N), independent of stream length, the defining
    property that makes a global top-N streamable at all. With
    `partition_columns=None` the leaderboard is GLOBAL: all surviving
    rows hash to one group/one task — safe because a stateless
    per-Arrow-batch top-N pre-shrink runs BEFORE the shuffle (rows
    outside a batch's local top-N can never enter the global top-N on
    an append-only stream), so the single state task sees at most
    n × input-partitions rows per micro-batch, not the raw batch.
    """
    import json

    if order_column not in payload_columns:
        raise ValueError(
            f"order_column {order_column!r} must be in payload_columns"
        )
    group_cols = list(partition_columns or [])
    in_types = {f.name: f for f in stream.schema.fields}
    missing = [c for c in group_cols + payload_columns if c not in in_types]
    if missing:
        raise ValueError(f"columns not in stream: {missing}")
    if tie_breakers is not None:
        bad = [c for c in tie_breakers if c not in payload_columns]
        if bad:
            raise ValueError(f"tie_breakers not in payload_columns: {bad}")
    # temporal payloads round-trip the JSON state as ISO strings; both
    # timestamp and date types need the conversion (NaT/None encode as
    # JSON null — a null score/time must not kill the query)
    ts_cols = [
        c
        for c in payload_columns
        if in_types[c].dataType.simpleString().startswith("timestamp")
    ]
    date_cols = [
        c
        for c in payload_columns
        if in_types[c].dataType.simpleString() == "date"
    ]
    breakers = (
        list(tie_breakers)
        if tie_breakers is not None
        else [c for c in payload_columns if c != order_column]
    )
    sort_cols = [order_column] + breakers
    sort_asc = [ascending] + [True] * len(breakers)

    # quoted identifiers in the DDL strings: unquoted simpleString DDL
    # breaks on column names with spaces (a recorded repo gotcha)
    def _ddl(c: str) -> str:
        return f"`{c.replace('`', '``')}` {in_types[c].dataType.simpleString()}"

    out_parts = [f"`{op_column}` int"]
    out_parts += [_ddl(c) for c in group_cols]
    out_parts.append(f"`{place_column}` int")
    out_parts += [_ddl(c) for c in payload_columns]
    out_schema = ", ".join(out_parts)
    out_cols = [op_column, *group_cols, place_column, *payload_columns]

    def _encode(rows: list[dict[str, Any]]) -> str:
        enc = []
        for r in rows:
            d = dict(r)
            for c in ts_cols + date_cols:
                v = d[c]
                d[c] = None if v is None or pd.isna(v) else pd.Timestamp(v).isoformat()
            enc.append(d)
        return json.dumps(enc)

    def _decode(blob: str) -> list[dict[str, Any]]:
        rows = json.loads(blob)
        for r in rows:
            for c in ts_cols + date_cols:
                if r[c] is not None:
                    r[c] = pd.Timestamp(r[c])
        return rows

    def handle(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        prev_top = _decode(state.get[0]) if state.exists else []
        batch = pd.concat(list(pdfs), ignore_index=True)
        # candidates = previous top-N ++ this batch's rows; anything
        # outside the previous top-N can never re-enter, so this is the
        # complete candidate set (no full-history state)
        cand = pd.concat(
            [pd.DataFrame(prev_top, columns=payload_columns), batch[payload_columns]],
            ignore_index=True,
        )
        cand = cand.sort_values(sort_cols, ascending=sort_asc, kind="stable")
        new_top = cand.head(n).to_dict("records")

        out: list[dict[str, Any]] = []
        for place in range(1, max(len(prev_top), len(new_top)) + 1):
            old = prev_top[place - 1] if place <= len(prev_top) else None
            new = new_top[place - 1] if place <= len(new_top) else None
            if old is None and new is not None:
                out.append({op_column: Op.APPEND, place_column: place, **new})
            elif old is not None and new is None:
                out.append({op_column: Op.RETRACT, place_column: place, **old})
            elif not _tuples_equal(
                tuple(old[c] for c in payload_columns),
                tuple(new[c] for c in payload_columns),
            ):
                out.append({op_column: Op.CORRECT_FROM, place_column: place, **old})
                out.append({op_column: Op.CORRECT_TO, place_column: place, **new})

        state.update((_encode(new_top),))

        if not out:
            yield pd.DataFrame(columns=out_cols)
            return
        df = pd.DataFrame(out)
        for i, c in enumerate(group_cols):
            df[c] = key[i]
        for c in ts_cols:
            df[c] = pd.to_datetime(df[c])
        for c in date_cols:
            df[c] = [
                None if pd.isna(x) else pd.Timestamp(x).date() for x in df[c]
            ]
        yield df[out_cols]

    # Stateless per-Arrow-batch pre-shrink BEFORE the shuffle: on an
    # append-only stream, a row outside its batch's local (per-key)
    # top-N can never enter the maintained top-N, so the state task
    # receives at most n rows per key per input partition — the global
    # (single-group) leaderboard stays safe under a million-row
    # catch-up micro-batch instead of concentrating it on one task.
    shrink_cols = list(dict.fromkeys(group_cols + payload_columns))

    def _local_topn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if len(pdf) == 0:
                yield pdf
                continue
            s = pdf.sort_values(sort_cols, ascending=sort_asc, kind="stable")
            # dropna=False: Spark's groupBy treats null as a real group,
            # so a null partition key must survive the pre-shrink or the
            # leaderboard silently loses those rows vs the batch path
            yield (
                s.groupby(group_cols, sort=False, dropna=False).head(n)
                if group_cols
                else s.head(n)
            )

    shrink_schema = ", ".join(_ddl(c) for c in shrink_cols)
    stream = stream.select(*shrink_cols).mapInPandas(_local_topn, shrink_schema)

    # a GLOBAL leaderboard still needs a grouping key for the state
    # store — materialize a constant column (grouping by a bare lit()
    # expression doesn't resolve inside FlatMapGroupsInPandasWithState)
    grouped = (
        stream.groupBy(*group_cols)
        if group_cols
        else stream.withColumn("__g", F.lit(0)).groupBy("__g")
    )
    return grouped.applyInPandasWithState(
        handle,
        outputStructType=out_schema,
        stateStructType="state string",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
