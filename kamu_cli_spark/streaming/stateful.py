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
