"""asof_join_broadcast (operators/asof.py): the bounded-right-side
as-of variant must be bit-identical to the union+window asof_join on
every semantic axis — inclusive/strict, no-match nulls, suffixing,
multi-column keys, keys present on only one side — plus numeric time
columns and streaming legality (the window path is batch-only)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from kamu_cli_spark.operators.asof import asof_join, asof_join_broadcast


def _t(d, h=0):
    return datetime(2024, 1, d, h, tzinfo=timezone.utc)


def _both_equal(left, right, **kw):
    a = asof_join(left, right, **kw)
    b = asof_join_broadcast(left, right, **kw)
    assert a.schema == b.schema
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    return b


def test_matches_window_path_basic(spark):
    left = spark.createDataFrame(
        [(1, _t(5), "a"), (1, _t(2), "b"), (2, _t(4), "c"), (3, _t(9), "d")],
        "k int, t timestamp, lv string",
    )
    right = spark.createDataFrame(
        [(1, _t(1), 10), (1, _t(5), 50), (2, _t(6), 60), (9, _t(1), 90)],
        "k int, rt timestamp, v int",
    )
    out = _both_equal(left, right, on=["k"], left_time="t", right_time="rt")
    got = {(r["k"], r["t"].day): r["v"] for r in out.collect()}
    # k=1 @5 matches rt==5 inclusively; k=1 @2 falls back to rt=1;
    # k=2 @4 precedes every right row; k=3 has no right rows at all
    assert got == {(1, 5): 50, (1, 2): 10, (2, 4): None, (3, 9): None}


def test_strict_excludes_equal_time(spark):
    left = spark.createDataFrame([(1, _t(5))], "k int, t timestamp")
    right = spark.createDataFrame(
        [(1, _t(5), 100), (1, _t(3), 50)], "k int, rt timestamp, v int"
    )
    _both_equal(left, right, on=["k"], left_time="t", right_time="rt")
    s = asof_join_broadcast(
        left, right, on=["k"], left_time="t", right_time="rt", strict=True
    )
    assert s.collect()[0]["v"] == 50
    ws = asof_join(
        left, right, on=["k"], left_time="t", right_time="rt", strict=True
    )
    assert ws.collect()[0]["v"] == 50


def test_suffix_on_name_clash(spark):
    left = spark.createDataFrame(
        [(1, _t(2), "L")], "k int, t timestamp, v string"
    )
    right = spark.createDataFrame([(1, _t(1), 7)], "k int, rt timestamp, v int")
    out = asof_join_broadcast(
        left, right, on=["k"], left_time="t", right_time="rt", suffix="_r"
    )
    row = out.collect()[0]
    assert row["v"] == "L" and row["v_r"] == 7


def test_multi_column_key(spark):
    left = spark.createDataFrame(
        [(1, "x", _t(5)), (1, "y", _t(5))], "k int, s string, t timestamp"
    )
    right = spark.createDataFrame(
        [(1, "x", _t(3), 30), (1, "y", _t(4), 40), (1, "x", _t(9), 90)],
        "k int, s string, rt timestamp, v int",
    )
    out = _both_equal(
        left, right, on=["k", "s"], left_time="t", right_time="rt"
    )
    got = {(r["k"], r["s"]): r["v"] for r in out.collect()}
    assert got == {(1, "x"): 30, (1, "y"): 40}


def test_numeric_time_column(spark):
    left = spark.createDataFrame([(1, 50), (1, 5)], "k int, t long")
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 49, "b")], "k int, rt long, v string"
    )
    out = asof_join_broadcast(
        left, right, on=["k"], left_time="t", right_time="rt"
    )
    got = {r["t"]: r["v"] for r in out.collect()}
    assert got == {50: "b", 5: None}


def test_streaming_left_side(spark, tmp_path):
    # the broadcast variant's left scan may be a stream — the right
    # side is a fitted bounded artifact (the window path cannot do
    # this: its union+window is not stream-legal without watermarks)
    src = str(tmp_path / "in")
    spark.createDataFrame(
        [(1, _t(5)), (2, _t(2))], "k int, t timestamp"
    ).write.parquet(src)
    right = spark.createDataFrame(
        [(1, _t(3), 30), (2, _t(3), 99)], "k int, rt timestamp, v int"
    )
    stream = spark.readStream.schema("k int, t timestamp").parquet(src)
    out = asof_join_broadcast(
        stream, right, on=["k"], left_time="t", right_time="rt"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("asof_bcast_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["k"]: r["v"] for r in spark.sql(
        "SELECT * FROM asof_bcast_stream"
    ).collect()}
    assert rows == {1: 30, 2: None}


def test_prune_right_by_left_keys_equivalent(spark):
    # right side keyed by many entities, left uses only two keys: the
    # prune must not change results, only shrink the collected artifact
    left = spark.createDataFrame(
        [(0, _t(5)), (1, _t(7))], "k int, t timestamp"
    )
    right = spark.createDataFrame(
        [(k, _t(1 + k % 9), k * 10) for k in range(500)],
        "k int, rt timestamp, v int",
    )
    a = asof_join_broadcast(
        left, right, on=["k"], left_time="t", right_time="rt"
    )
    b = asof_join_broadcast(
        left,
        right,
        on=["k"],
        left_time="t",
        right_time="rt",
        prune_right_by_left_keys=True,
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_unbounded_right_guard_raises(spark):
    left = spark.createDataFrame([(1, _t(5))], "k int, t timestamp")
    right = spark.createDataFrame(
        [(1, _t(1 + i % 20), i) for i in range(50)],
        "k int, rt timestamp, v int",
    )
    import pytest

    with pytest.raises(ValueError, match="max_right_rows"):
        asof_join_broadcast(
            left,
            right,
            on=["k"],
            left_time="t",
            right_time="rt",
            max_right_rows=10,
        )


def test_adaptive_picks_by_size_and_matches(spark, tmp_path):
    from kamu_cli_spark.operators import asof as asof_mod
    from kamu_cli_spark.operators.asof import asof_join_adaptive

    # parquet-backed left: the file source carries a REAL (KB-sized)
    # stats estimate, unlike in-memory relations whose unknown (huge)
    # estimate always selects the kernel path
    src = str(tmp_path / "left")
    spark.createDataFrame(
        [(i % 3, _t(1 + i % 20)) for i in range(300)], "k int, t timestamp"
    ).write.parquet(src)
    left = spark.read.parquet(src)
    right = spark.createDataFrame(
        [(0, _t(1), 1), (1, _t(2), 2), (2, _t(3), 3)],
        "k int, rt timestamp, v int",
    )
    kw = dict(on=["k"], left_time="t", right_time="rt")
    small = asof_join_adaptive(left, right, **kw)
    # KB-sized left -> window path
    assert "Window" in small._jdf.queryExecution().executedPlan().toString()
    old = asof_mod._ADAPTIVE_LEFT_BYTES
    try:
        asof_mod._ADAPTIVE_LEFT_BYTES = 1  # force the kernel path
        big = asof_join_adaptive(left, right, **kw)
        assert "Window" not in big._jdf.queryExecution().executedPlan().toString()
        assert sorted(map(tuple, small.collect())) == sorted(
            map(tuple, big.collect())
        )
    finally:
        asof_mod._ADAPTIVE_LEFT_BYTES = old


def test_plan_is_shuffle_free(spark):
    left = spark.createDataFrame(
        [(i % 3, _t(1 + i % 20)) for i in range(200)], "k int, t timestamp"
    )
    right = spark.createDataFrame(
        [(0, _t(1), 1), (1, _t(2), 2)], "k int, rt timestamp, v int"
    )
    out = asof_join_broadcast(
        left, right, on=["k"], left_time="t", right_time="rt"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # no join, no aggregate, no sort — one Arrow map over the left
    for forbidden in ("Join", "HashAggregate", "Sort "):
        assert forbidden not in plan, plan


def test_adaptive_streaming_left_defaults(spark, tmp_path):
    # regression (ADVICE r12): the adaptive wrapper used to default
    # prune_right_by_left_keys=True, routing streaming lefts into a
    # collect over a plan containing a streaming source
    # (AnalysisException). With defaults it must now resolve the prune
    # to False and produce the broadcast-kernel result.
    from kamu_cli_spark.operators.asof import asof_join_adaptive

    src = str(tmp_path / "in_adaptive")
    spark.createDataFrame(
        [(1, _t(5)), (2, _t(2))], "k int, t timestamp"
    ).write.parquet(src)
    right = spark.createDataFrame(
        [(1, _t(3), 30), (2, _t(3), 99)], "k int, rt timestamp, v int"
    )
    stream = spark.readStream.schema("k int, t timestamp").parquet(src)
    out = asof_join_adaptive(
        stream, right, on=["k"], left_time="t", right_time="rt"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("asof_adaptive_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["k"]: r["v"] for r in spark.sql(
        "SELECT * FROM asof_adaptive_stream"
    ).collect()}
    assert rows == {1: 30, 2: None}

    import pytest

    with pytest.raises(ValueError, match="not stream-legal"):
        asof_join_adaptive(
            stream, right, on=["k"], left_time="t", right_time="rt",
            prune_right_by_left_keys=True,
        )


def test_null_right_time_matches_window_path(spark):
    # regression (ADVICE r12): na_position default 'last' put NaT rows
    # at the END of the per-key array while _times64 mapped NaT to
    # int64 min — an unsorted array that corrupted every searchsorted
    # lookup for the key. Both paths must agree: a null right_time row
    # acts as the EARLIEST fallback (asc_nulls_first).
    left = spark.createDataFrame(
        [(1, _t(5)), (1, _t(2)), (2, _t(4)), (1, _t(1))],
        "k int, t timestamp",
    )
    right = spark.createDataFrame(
        [(1, None, 77), (1, _t(3), 30), (2, None, 88), (1, _t(4), 40)],
        "k int, rt timestamp, v int",
    )
    out = _both_equal(left, right, on=["k"], left_time="t", right_time="rt")
    got = {(r["k"], r["t"].day): r["v"] for r in out.collect()}
    # k=1 @5 -> rt=4; @2 -> null-time fallback 77; @1 -> 77 too;
    # k=2 @4 -> its only right row has null time -> 88
    assert got == {(1, 5): 40, (1, 2): 77, (1, 1): 77, (2, 4): 88}


def test_null_right_time_strict(spark):
    left = spark.createDataFrame([(1, _t(5))], "k int, t timestamp")
    right = spark.createDataFrame(
        [(1, None, 7)], "k int, rt timestamp, v int"
    )
    out = _both_equal(
        left, right, on=["k"], left_time="t", right_time="rt", strict=True
    )
    assert out.collect()[0]["v"] == 7


def test_real_nan_time_rejected_both_sides(spark):
    # ADVICE r13: pandas folds SQL NULL and real float NaN into the
    # same NaN, but the window path orders them oppositely (null
    # first, NaN last) — real NaN in a double time column is now
    # rejected JVM-side instead of silently diverging between paths
    import pytest

    nan = float("nan")
    left_ok = spark.createDataFrame([(1, 5.0)], "k int, t double")
    right_nan = spark.createDataFrame(
        [(1, nan, 7), (1, 1.0, 1)], "k int, rt double, v int"
    )
    with pytest.raises(ValueError, match="NaN"):
        asof_join_broadcast(
            left_ok, right_nan, on=["k"], left_time="t", right_time="rt"
        )
    left_nan = spark.createDataFrame([(1, nan), (1, 5.0)], "k int, t double")
    right_ok = spark.createDataFrame([(1, 1.0, 1)], "k int, rt double, v int")
    with pytest.raises(Exception, match="NaN"):
        asof_join_broadcast(
            left_nan, right_ok, on=["k"], left_time="t", right_time="rt"
        ).collect()
    # SQL NULL double times stay fine and both paths agree
    left_null = spark.createDataFrame(
        [(1, None), (1, 5.0)], "k int, t double"
    )
    right_null = spark.createDataFrame(
        [(1, None, 9), (1, 1.0, 1)], "k int, rt double, v int"
    )
    _both_equal(
        left_null, right_null, on=["k"], left_time="t", right_time="rt"
    )


def test_nullable_bigint_time_past_2p53_rejected(spark):
    # ADVICE r13: a null in an integer time column forces the pandas
    # int64->float64 round-trip, lossy past 2^53 — rejected up front
    import pytest

    big = (1 << 53) + 3
    left = spark.createDataFrame([(1, 5)], "k int, t bigint")
    right = spark.createDataFrame(
        [(1, None, 0), (1, big, 1)], "k int, rt bigint, v int"
    )
    with pytest.raises(ValueError, match="2\\^53"):
        asof_join_broadcast(
            left, right, on=["k"], left_time="t", right_time="rt"
        )
    # the left-side check is per Arrow batch — the lossy float64
    # conversion only happens in batches that contain BOTH a null and
    # a big value, so interleave enough of each that every partition
    # sees both after spread()'s round-robin repartition
    left_bad = spark.createDataFrame(
        [(1, None if i % 2 else big) for i in range(2000)], "k int, t bigint"
    )
    right_ok = spark.createDataFrame([(1, 1, 1)], "k int, rt bigint, v int")
    with pytest.raises(Exception, match="2\\^53"):
        asof_join_broadcast(
            left_bad, right_ok, on=["k"], left_time="t", right_time="rt"
        ).collect()
    # nulls with magnitudes inside 2^53 remain fine and bit-identical
    left_ok = spark.createDataFrame([(1, None), (1, 5)], "k int, t bigint")
    right_small = spark.createDataFrame(
        [(1, None, 9), (1, 1, 1)], "k int, rt bigint, v int"
    )
    _both_equal(
        left_ok, right_small, on=["k"], left_time="t", right_time="rt"
    )
