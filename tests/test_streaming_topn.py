"""Streaming top-N leaderboard: the continuous path must emit the same
changelog the batch StatefulTransformExecutor commits for the
reference's leaderboard example (examples/leaderboard/leaderboard.yaml,
RisingWave `row_number() over (order by score desc) <= 2`) — the last
§2.6 pattern without a Structured-Streaming twin."""

from __future__ import annotations

import os
from datetime import datetime, timezone

import yaml
from pyspark.sql import functions as F

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyChangelogStream, MergeStrategyLedger
from kamu_cli_spark.streaming import read_dataset_stream, stream_ingest
from kamu_cli_spark.streaming.stateful import streaming_topn_to_changelog
from kamu_cli_spark.transform import set_transform
from kamu_cli_spark.vocab import OperationType as Op
from kamu_cli_spark.writer import DataWriter

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")

SCHEMA = "match_time timestamp, match_id long, player_id string, score long"
PAYLOAD = ["score", "player_id", "match_id", "match_time"]


def _d(day):
    return datetime(2024, 1, day, tzinfo=timezone.utc)


#: (commit day, rows) — slice 1: alice leads, bob second; slice 2:
#: charlie takes first (both places shift); slice 3: dave displaces
#: alice from place 2, eve too low to place
SLICES = [
    (2, [(_d(1), 1, "alice", 100), (_d(1), 1, "bob", 80)]),
    (4, [(_d(3), 2, "charlie", 120)]),
    (6, [(_d(5), 3, "dave", 110), (_d(5), 3, "eve", 10)]),
]


def _mk_scores(spark, ws, on_slice=None):
    """Write the score slices; `on_slice(day)` runs after each commit
    (the batch executor's incremental pulls interleave here)."""
    scores = Dataset.create(ws, "player-scores", system_time=_d(1).isoformat())
    w = DataWriter(scores, MergeStrategyLedger(["match_id", "player_id"]))
    for day, rows in SLICES:
        w.write(spark, spark.createDataFrame(rows, SCHEMA), system_time=_d(day))
        if on_slice is not None:
            on_slice(day)
    return scores, _d


def _batch_board(spark, ws, scores, d):
    """The batch gold path: the example manifest's stateful executor."""
    from kamu_cli_spark.transform import (
        StatefulTransformExecutor,
        make_transform_executor,
    )

    m = yaml.safe_load(open(f"{EXAMPLES}/leaderboard/leaderboard.yaml"))
    board = Dataset.create(
        ws, "board-batch", kind="Derivative", system_time=d(1).isoformat()
    )
    set_transform(
        board,
        {a: scores.path for a in m["inputs"]},
        m["queries"],
        system_time=d(1).isoformat(),
        executor=m.get("executor"),
    )
    ex = make_transform_executor(board)
    assert isinstance(ex, StatefulTransformExecutor)
    return board, ex


def test_streaming_topn_equals_batch_stateful(spark, tmp_path):
    """3 slices → 3 micro-batches; per batch, the streaming changelog's
    ops must equal the batch executor's committed slice for the same
    increment (op + place + payload)."""
    ws = str(tmp_path)
    scores = Dataset.create(ws, "player-scores", system_time=_d(1).isoformat())
    board, ex = _batch_board(spark, ws, scores, _d)
    w = DataWriter(scores, MergeStrategyLedger(["match_id", "player_id"]))

    # batch side: write slice → incremental pull → committed changelog
    batch_slices = []
    n_before = 0
    for day, rows_in in SLICES:
        w.write(spark, spark.createDataFrame(rows_in, SCHEMA), system_time=_d(day))
        ex.execute(spark, system_time=_d(day))
        df = board.read(spark)
        rows = [
            (int(r["op"]), int(r["place"]), r["player_id"], int(r["score"]))
            for r in df.filter(f"offset >= {n_before}").collect()
        ]
        n_before += len(rows)
        batch_slices.append(sorted(rows))

    # streaming side: same three slices as micro-batches
    stream = read_dataset_stream(spark, scores, max_files_per_trigger=1).select(
        "match_time", "match_id", "player_id", "score"
    )
    changelog = streaming_topn_to_changelog(
        stream, order_column="score", n=2, payload_columns=PAYLOAD,
        tie_breakers=["match_id", "player_id"],
    )
    q = (
        changelog.writeStream.format("memory")
        .queryName("topn_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = [
        (int(r["op"]), int(r["place"]), r["player_id"], int(r["score"]))
        for r in spark.sql("select * from topn_out").collect()
    ]

    # batch 1: two appends; batch 2: two -C/+C pairs; batch 3: place-2
    # correction only (dave displaces alice; charlie keeps place 1)
    assert sorted(got) == sorted(sum(batch_slices, []))
    assert batch_slices[0] == sorted(
        [
            (int(Op.APPEND), 1, "alice", 100),
            (int(Op.APPEND), 2, "bob", 80),
        ]
    )
    assert batch_slices[2] == sorted(
        [
            (int(Op.CORRECT_FROM), 2, "alice", 100),
            (int(Op.CORRECT_TO), 2, "dave", 110),
        ]
    )


def test_streaming_topn_sink_roundtrip(spark, tmp_path):
    """The changelog stream commits through the ordinary foreachBatch
    writer with ChangelogStream, and the projected state equals the
    batch leaderboard's final state."""
    from kamu_cli_spark.operators.merge import project_changelog

    ws = str(tmp_path)
    scores, d = _mk_scores(spark, ws)

    stream = read_dataset_stream(spark, scores).select(
        "match_time", "match_id", "player_id", "score"
    )
    changelog = streaming_topn_to_changelog(
        stream, order_column="score", n=2, payload_columns=PAYLOAD,
        tie_breakers=["match_id", "player_id"],
    ).withColumn("event_time", F.col("match_time"))
    sink = Dataset.create(ws, "board-stream", system_time=d(1).isoformat())
    q = stream_ingest(
        changelog,
        sink,
        MergeStrategyChangelogStream(["place"]),
        checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q.awaitTermination(180)

    state = {
        (int(r["place"]), r["player_id"], int(r["score"]))
        for r in project_changelog(
            Dataset(sink.path).read(spark), ["place"]
        ).collect()
    }
    assert state == {(1, "charlie", 120), (2, "dave", 110)}


def test_streaming_topn_partitioned(spark, tmp_path):
    """Per-key leaderboards: partition_columns routes each key to its
    own state; places are maintained independently."""
    d = lambda day: datetime(2024, 1, day, tzinfo=timezone.utc)  # noqa: E731
    ws = str(tmp_path)
    scores = Dataset.create(ws, "scores-p", system_time=d(1).isoformat())
    w = DataWriter(scores, MergeStrategyLedger(["match_id", "player_id"]))
    w.write(
        spark,
        spark.createDataFrame(
            [
                (d(1), 1, "alice", 100),
                (d(1), 1, "bob", 80),
                (d(1), 2, "carol", 50),
                (d(1), 2, "dan", 70),
            ],
            SCHEMA,
        ),
        system_time=d(2),
    )
    stream = read_dataset_stream(spark, scores).select(
        "match_time", "match_id", "player_id", "score"
    )
    out = streaming_topn_to_changelog(
        stream,
        order_column="score",
        n=1,
        payload_columns=["score", "player_id", "match_time"],
        partition_columns=["match_id"],
    )
    q = (
        out.writeStream.format("memory")
        .queryName("topn_part")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (int(r["match_id"]), int(r["op"]), int(r["place"]), r["player_id"])
        for r in spark.sql("select * from topn_part").collect()
    }
    assert got == {
        (1, int(Op.APPEND), 1, "alice"),
        (2, int(Op.APPEND), 1, "dan"),
    }


def test_streaming_topn_tie_break_matches_batch(spark, tmp_path):
    """Round-8 review #5: equal scores must rank by the SAME tie order
    as the batch query's ORDER BY tail (match_id, player_id) — the
    default (payload order, player_id first) diverged on ties."""
    d = lambda day: datetime(2024, 1, day, tzinfo=timezone.utc)  # noqa: E731
    ws = str(tmp_path)
    scores = Dataset.create(ws, "scores-t", system_time=d(1).isoformat())
    w = DataWriter(scores, MergeStrategyLedger(["match_id", "player_id"]))
    # tie on score: match_id order must win over player_id order
    w.write(
        spark,
        spark.createDataFrame(
            [(d(1), 1, "zed", 100), (d(1), 2, "amy", 100)], SCHEMA
        ),
        system_time=d(2),
    )
    stream = read_dataset_stream(spark, scores).select(
        "match_time", "match_id", "player_id", "score"
    )
    out = streaming_topn_to_changelog(
        stream,
        order_column="score",
        n=2,
        payload_columns=PAYLOAD,
        tie_breakers=["match_id", "player_id"],
    )
    q = (
        out.writeStream.format("memory")
        .queryName("topn_tie")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (int(r["place"]), r["player_id"])
        for r in spark.sql("select * from topn_tie").collect()
    }
    assert got == {(1, "zed"), (2, "amy")}  # match_id 1 beats match_id 2


def test_streaming_topn_null_timestamp_survives(spark, tmp_path):
    """Round-8 review #1: a null timestamp payload (NaT) entering the
    top-N must encode as JSON null, not kill the query."""
    d = lambda day: datetime(2024, 1, day, tzinfo=timezone.utc)  # noqa: E731
    ws = str(tmp_path)
    scores = Dataset.create(ws, "scores-n", system_time=d(1).isoformat())
    w = DataWriter(scores, MergeStrategyLedger(["match_id", "player_id"]))
    w.write(
        spark,
        spark.createDataFrame(
            [(None, 1, "alice", 100), (d(1), 1, "bob", 80)],
            "match_time timestamp, match_id long, player_id string, score long",
        ),
        system_time=d(2),
    )
    # second slice forces a state decode of the null-timestamp row
    w.write(
        spark,
        spark.createDataFrame([(d(3), 2, "carol", 90)], SCHEMA),
        system_time=d(4),
    )
    stream = read_dataset_stream(spark, scores, max_files_per_trigger=1).select(
        "match_time", "match_id", "player_id", "score"
    )
    out = streaming_topn_to_changelog(
        stream,
        order_column="score",
        n=2,
        payload_columns=PAYLOAD,
        tie_breakers=["match_id", "player_id"],
    )
    q = (
        out.writeStream.format("memory")
        .queryName("topn_null")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from topn_null").collect()
    alice = [r for r in rows if r["player_id"] == "alice"]
    assert alice and all(r["match_time"] is None for r in alice)
    # final state: alice 100, carol 90 (bob displaced)
    by_place = {}
    for r in rows:
        if int(r["op"]) in (0, 3):
            by_place[int(r["place"])] = r["player_id"]
        elif int(r["op"]) == 1 and by_place.get(int(r["place"])) == r["player_id"]:
            del by_place[int(r["place"])]
    assert by_place == {1: "alice", 2: "carol"}


def test_streaming_topn_null_partition_key_survives(spark, tmp_path):
    """Round-8 advice: the stateless pre-shrink's pandas groupby must
    use dropna=False — Spark's groupBy treats a null partition key as a
    real group, so null-keyed rows must reach the state task and form
    their own leaderboard instead of being silently discarded."""
    d = lambda day: datetime(2024, 1, day, tzinfo=timezone.utc)  # noqa: E731
    ws = str(tmp_path)
    scores = Dataset.create(ws, "scores-nk", system_time=d(1).isoformat())
    w = DataWriter(scores, MergeStrategyLedger(["player_id"]))
    w.write(
        spark,
        spark.createDataFrame(
            [
                (d(1), None, "alice", 100),
                (d(1), None, "bob", 80),
                (d(1), 2, "carol", 50),
            ],
            SCHEMA,
        ),
        system_time=d(2),
    )
    stream = read_dataset_stream(spark, scores).select(
        "match_time", "match_id", "player_id", "score"
    )
    out = streaming_topn_to_changelog(
        stream,
        order_column="score",
        n=1,
        payload_columns=["score", "player_id", "match_time"],
        partition_columns=["match_id"],
    )
    q = (
        out.writeStream.format("memory")
        .queryName("topn_nullkey")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_nk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (
            None if r["match_id"] is None else int(r["match_id"]),
            int(r["op"]),
            int(r["place"]),
            r["player_id"],
        )
        for r in spark.sql("select * from topn_nullkey").collect()
    }
    assert got == {
        (None, int(Op.APPEND), 1, "alice"),
        (2, int(Op.APPEND), 1, "carol"),
    }
