"""Golden-table tests for the CDC merge strategies.

Fixtures mirror the reference's operator unit tests
(src/infra/ingest-datafusion/tests/tests/test_merge_strategy_*.rs and
the SQL specs embedded in merge_strategies/*.rs; see FIXTURES.md F1-F4).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kamu_cli_spark.operators import (
    MergeStrategyAppend,
    MergeStrategyChangelogStream,
    MergeStrategyLedger,
    MergeStrategySnapshot,
    MergeStrategyUpsertStream,
    project_changelog,
)
from kamu_cli_spark.vocab import OperationType as Op

from tests.conftest import rows


LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("offset", T.LongType(), False),
        T.StructField("op", T.IntegerType(), False),
        T.StructField("city", T.StringType(), False),
        T.StructField("population", T.IntegerType(), False),
    ]
)


def test_project_changelog_golden(spark):
    # FIXTURES.md F3 / reference changelog.rs:26-60
    ledger = spark.createDataFrame(
        [
            (0, Op.APPEND, "a", 1000),
            (1, Op.APPEND, "b", 2000),
            (2, Op.APPEND, "c", 3000),
            (3, Op.CORRECT_FROM, "b", 2000),
            (4, Op.CORRECT_TO, "b", 2500),
            (5, Op.CORRECT_FROM, "a", 1000),
            (6, Op.CORRECT_TO, "a", 1500),
            (7, Op.RETRACT, "a", 1500),
        ],
        LEDGER_SCHEMA,
    )
    state = project_changelog(ledger, ["city"])
    assert state.columns == ["offset", "op", "city", "population"]
    assert rows(state, "city") == [
        (4, Op.CORRECT_TO, "b", 2500),
        (2, Op.APPEND, "c", 3000),
    ]


def test_append_strategy(spark):
    new = spark.createDataFrame([("x", 1)], "event_time string, v int")
    out = MergeStrategyAppend().merge(None, new)
    assert out.columns == ["op", "event_time", "v"]
    assert rows(out) == [(Op.APPEND, "x", 1)]


def test_ledger_strategy_dedup(spark):
    # FIXTURES.md F2: overlapping polls append only unseen PKs
    prev = spark.createDataFrame(
        [(0, Op.APPEND, "vancouver", 1), (1, Op.APPEND, "seattle", 2)],
        LEDGER_SCHEMA,
    )
    new = spark.createDataFrame(
        [("seattle", 2), ("kyiv", 3)], "city string, population int"
    )
    out = MergeStrategyLedger(["city"]).merge(prev, new)
    assert out.columns == ["op", "city", "population"]
    assert rows(out, "city") == [(Op.APPEND, "kyiv", 3)]


def test_ledger_strategy_no_prev(spark):
    new = spark.createDataFrame([("kyiv", 3)], "city string, population int")
    out = MergeStrategyLedger(["city"]).merge(None, new)
    assert rows(out) == [(Op.APPEND, "kyiv", 3)]


def test_snapshot_strategy_first_poll(spark):
    new = spark.createDataFrame(
        [(2020, "vancouver", 1)], "year int, city string, population int"
    )
    out = MergeStrategySnapshot(["city"]).merge(None, new)
    assert rows(out) == [(Op.APPEND, 2020, "vancouver", 1)]


def test_snapshot_strategy_cdc_golden(spark):
    """FIXTURES.md F1 / snapshot.rs:146-215 SQL spec golden output.

    poll1 = {(2020,vancouver,1),(2020,seattle,2),(2020,kyiv,3)}
    poll2 = {(null,seattle,2),(null,kyiv,4),(null,odessa,5)}
    → +A odessa, -R vancouver, -C/+C kyiv (year is event-time-ish:
    null in new must not count as change on its own).
    """
    prev_schema = T.StructType(
        [
            T.StructField("offset", T.LongType(), False),
            T.StructField("op", T.IntegerType(), False),
            T.StructField("year", T.IntegerType(), True),
            T.StructField("city", T.StringType(), False),
            T.StructField("population", T.IntegerType(), False),
        ]
    )
    prev = spark.createDataFrame(
        [
            (0, Op.APPEND, 2020, "vancouver", 1),
            (1, Op.APPEND, 2020, "seattle", 2),
            (2, Op.APPEND, 2020, "kyiv", 3),
        ],
        prev_schema,
    )
    new = spark.createDataFrame(
        [(None, "seattle", 2), (None, "kyiv", 4), (None, "odessa", 5)],
        "year int, city string, population int",
    )
    strat = MergeStrategySnapshot(["city"], None, vocab_event_time_is_year())
    out = strat.merge(prev, new)
    assert out.columns == ["op", "year", "city", "population"]
    got = rows(out, "city", "op")
    assert got == [
        (Op.CORRECT_FROM, 2020, "kyiv", 3),
        (Op.CORRECT_TO, None, "kyiv", 4),
        (Op.APPEND, None, "odessa", 5),
        (Op.RETRACT, 2020, "vancouver", 1),
    ]


def vocab_event_time_is_year():
    from kamu_cli_spark.vocab import DatasetVocabulary

    return DatasetVocabulary(event_time_column="year")


# Reuse constructor signature: MergeStrategySnapshot(pk, compare_columns, vocab)
def test_snapshot_event_time_null_tolerance(spark):
    """A row identical except a NULL new event_time is NOT a change."""
    prev = spark.createDataFrame(
        [(0, Op.APPEND, 2020, "seattle", 2)],
        T.StructType(
            [
                T.StructField("offset", T.LongType(), False),
                T.StructField("op", T.IntegerType(), False),
                T.StructField("year", T.IntegerType(), True),
                T.StructField("city", T.StringType(), False),
                T.StructField("population", T.IntegerType(), False),
            ]
        ),
    )
    new = spark.createDataFrame(
        [(None, "seattle", 2)], "year int, city string, population int"
    )
    out = MergeStrategySnapshot(
        ["city"], None, vocab_event_time_is_year()
    ).merge(prev, new)
    assert rows(out) == []


def test_changelog_stream_passthrough(spark):
    new = spark.createDataFrame(
        [(Op.APPEND, "kyiv", 3), (Op.RETRACT, "kyiv", 3)],
        "op int, city string, population int",
    )
    out = MergeStrategyChangelogStream(["city"]).merge(None, new)
    assert rows(out, "op") == [(Op.APPEND, "kyiv", 3), (Op.RETRACT, "kyiv", 3)]


def test_upsert_stream_golden(spark):
    """upsert_stream.rs:209-349 SQL spec golden output."""
    prev_schema = T.StructType(
        [
            T.StructField("offset", T.LongType(), False),
            T.StructField("op", T.IntegerType(), False),
            T.StructField("year", T.IntegerType(), True),
            T.StructField("city", T.StringType(), False),
            T.StructField("population", T.IntegerType(), True),
        ]
    )
    prev = spark.createDataFrame(
        [
            (0, Op.APPEND, 2020, "vancouver", 1),
            (1, Op.APPEND, 2020, "seattle", 2),
            (2, Op.APPEND, 2020, "kyiv", 3),
            (3, Op.APPEND, 2020, "bakhmut", 4),
            (4, Op.RETRACT, 2020, "bakhmut", 4),
            (5, Op.CORRECT_FROM, 2020, "kyiv", 3),
            (6, Op.CORRECT_TO, 2020, "kyiv", 4),
        ],
        prev_schema,
    )
    new = spark.createDataFrame(
        [
            (Op.APPEND, 2020, "odessa", 5),  # append
            (Op.APPEND, 2020, "kyiv", 4),  # no-op
            (Op.APPEND, 2021, "vancouver", 2),  # correction
            (Op.APPEND, 2021, "bakhmut", 1),  # append after retract
            (Op.RETRACT, 2020, "seattle", 2),  # retract
        ],
        "op int, year int, city string, population int",
    )
    out = MergeStrategyUpsertStream(["city"]).merge(prev, new)
    assert out.columns == ["op", "year", "city", "population"]
    got = rows(out, "city", "op")
    assert got == [
        (Op.APPEND, 2021, "bakhmut", 1),
        (Op.APPEND, 2020, "odessa", 5),
        (Op.RETRACT, 2020, "seattle", 2),
        (Op.CORRECT_FROM, 2020, "vancouver", 1),
        (Op.CORRECT_TO, 2021, "vancouver", 2),
    ]


def test_upsert_intra_batch_dedup(spark):
    """Only the last upsert per PK within a batch survives."""
    new = spark.createDataFrame(
        [
            (Op.APPEND, "kyiv", 1),
            (Op.APPEND, "kyiv", 2),
            (Op.APPEND, "kyiv", 3),
        ],
        "op int, city string, population int",
    ).coalesce(1)
    out = MergeStrategyUpsertStream(["city"]).merge(None, new)
    assert rows(out) == [(Op.APPEND, "kyiv", 3)]


def test_upsert_retract_of_unseen_key_dropped(spark):
    prev = spark.createDataFrame(
        [(0, Op.APPEND, 2020, "kyiv", 3)],
        T.StructType(
            [
                T.StructField("offset", T.LongType(), False),
                T.StructField("op", T.IntegerType(), False),
                T.StructField("year", T.IntegerType(), True),
                T.StructField("city", T.StringType(), False),
                T.StructField("population", T.IntegerType(), True),
            ]
        ),
    )
    new = spark.createDataFrame(
        [(Op.RETRACT, 2020, "odessa", 9)], "op int, year int, city string, population int"
    )
    out = MergeStrategyUpsertStream(["city"]).merge(prev, new)
    assert rows(out) == []


def test_snapshot_null_pk_classification(spark):
    """A PK that is literally NULL must still classify correctly: the
    sides join with eqNullSafe, so presence is NOT derivable from
    `pk IS NOT NULL` (regression: ADVICE r1/r2 — matched null-PK rows
    were misclassified as +A with stale values / dropped -R)."""
    prev = spark.createDataFrame(
        [
            (0, Op.APPEND, "x", 10),
            (1, Op.APPEND, "a", 1),
            (2, Op.APPEND, "b", 9),
        ],
        LEDGER_SCHEMA,
    ).withColumn("city", F.when(F.col("city") == "x", None).otherwise(F.col("city")))
    # new poll: null-PK row changed, "a" gone, "b" unchanged
    new = spark.createDataFrame(
        [("x", 20), ("b", 9)], "city string, population int"
    ).withColumn("city", F.when(F.col("city") == "x", None).otherwise(F.col("city")))
    out = MergeStrategySnapshot(["city"]).merge(prev, new)
    got = rows(out, "city", "op")
    assert got == [
        (Op.CORRECT_FROM, None, 10),
        (Op.CORRECT_TO, None, 20),
        (Op.RETRACT, "a", 1),
    ]


def test_upsert_null_pk_retract_and_correct(spark):
    """UpsertStream: retraction and correction of a NULL primary key
    must not be dropped (same presence-marker regression)."""
    prev = spark.createDataFrame(
        [(0, Op.APPEND, None, 10), (1, Op.APPEND, "a", 1)],
        T.StructType(
            [
                T.StructField("offset", T.LongType(), False),
                T.StructField("op", T.IntegerType(), False),
                T.StructField("city", T.StringType(), True),
                T.StructField("population", T.IntegerType(), False),
            ]
        ),
    )
    batch = spark.createDataFrame(
        [(Op.RETRACT, None, 0), (Op.APPEND, "a", 5)],
        T.StructType(
            [
                T.StructField("op", T.IntegerType(), False),
                T.StructField("city", T.StringType(), True),
                T.StructField("population", T.IntegerType(), False),
            ]
        ),
    )
    out = MergeStrategyUpsertStream(["city"]).merge(prev, batch)
    got = rows(out, "city", "op")
    assert got == [
        (Op.RETRACT, None, 10),        # old values, not dropped
        (Op.CORRECT_FROM, "a", 1),
        (Op.CORRECT_TO, "a", 5),
    ]


def test_snapshot_pk_covers_all_columns_set_semantics(spark):
    """Round-12 regression: when the PK covers EVERY column (a pure
    set-membership table — e.g. a KMV sketch keyed (source, u)), there
    are no compare columns; appends and retractions must classify by
    PRESENCE. The old filter reduced to literal false and silently
    dropped every event."""
    prev = spark.createDataFrame(
        [(0, int(Op.APPEND), "a", 1), (1, int(Op.APPEND), "a", 2)],
        "offset long, op int, s string, u long",
    )
    new = spark.createDataFrame([("a", 2), ("a", 3)], "s string, u long")
    out = MergeStrategySnapshot(["s", "u"]).merge(prev, new)
    got = rows(out, "u", "op")
    assert got == [
        (Op.RETRACT, "a", 1),  # (a,1) vanished from the poll
        (Op.APPEND, "a", 3),  # (a,3) is new; (a,2) unchanged -> silent
    ]


def test_snapshot_append_with_all_null_compare_values(spark):
    """Round-12 regression sibling: a NEW key whose every compare
    column is NULL must still append — presence, not value change,
    classifies one-sided rows."""
    prev = spark.createDataFrame(
        [(0, int(Op.APPEND), "k1", 7)], "offset long, op int, k string, v int"
    )
    new = spark.createDataFrame(
        [("k1", 7), ("k2", None)], "k string, v int"
    )
    out = MergeStrategySnapshot(["k"]).merge(prev, new)
    got = rows(out, "k", "op")
    assert got == [(Op.APPEND, "k2", None)]
