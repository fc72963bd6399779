"""Regression tests for the round-7 code-review findings:

1. asof_join must accept non-identifier column names (the simpleString
   DDL cast regression).
2. geom_centroid must subtract holes regardless of ring winding.
3. a streaming-marked batch that would split into multiple slices
   fails loudly instead of breaking the exactly-once contract.
4. text_metrics' inline SQL must stay equivalent to the module's
   Column factories (fingerprint/quality/lang duplicates tied down).
"""

from __future__ import annotations

import json
from datetime import datetime, timedelta, timezone

import pytest

from pyspark.sql import functions as F

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.functions.geo import geom_centroid
from kamu_cli_spark.operators import MergeStrategyAppend
from kamu_cli_spark.operators.asof import asof_join
from kamu_cli_spark.operators.text import (
    fingerprint,
    lang_id,
    quality_score,
    text_metrics,
    token_count,
)
from kamu_cli_spark.writer import DataWriter, WriterError

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def H(h):
    return T0 + timedelta(hours=h)


def test_asof_join_handles_non_identifier_column_names(spark):
    left = spark.createDataFrame(
        [("usd", H(1), 10.0)], "`the key` string, `t x` timestamp, `pay load` double"
    )
    right = spark.createDataFrame(
        [("usd", H(0), 1.3), ("usd", H(2), 1.4)],
        "`the key` string, `r t` timestamp, `rate x` double",
    )
    out = asof_join(left, right, ["the key"], "t x", "r t").collect()
    assert len(out) == 1
    assert out[0]["rate x"] == 1.3
    assert out[0]["pay load"] == 10.0


def test_centroid_subtracts_same_winding_hole(spark):
    def sq(x, y, r):
        return [
            [x - r, y - r], [x + r, y - r], [x + r, y + r], [x - r, y + r], [x - r, y - r]
        ]

    # shell [0,4]^2 with an off-center CCW hole (same winding as shell)
    # around (3,2): the centroid must move AWAY from the hole (x < 2)
    geom = json.dumps(
        {"type": "Polygon", "coordinates": [sq(2, 2, 2), sq(3, 2, 0.5)]}
    )
    df = spark.createDataFrame([(geom,)], "geometry string")
    c = df.select(geom_centroid(F.col("geometry")).alias("c")).collect()[0]["c"]
    # exact: shell area 16 at (2,2), hole area 1 at (3,2) ->
    # (16*2 - 1*3) / (16 - 1) = 29/15
    assert abs(c[0] - 29.0 / 15.0) < 1e-9
    assert abs(c[1] - 2.0) < 1e-9
    assert c[0] < 2.0  # pulled away from, not toward, the hole


def test_streaming_batch_refuses_multi_slice_commit(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "x", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyAppend(), max_slice_records=2)
    with pytest.raises(WriterError, match="single slice"):
        w.write(
            spark,
            spark.createDataFrame([(i,) for i in range(5)], "k int"),
            system_time=T0,
            extra_event={"streaming_batch": {"source": "s", "id": 0}},
        )
    # without the marker, slicing is fine
    w2 = DataWriter(ds, MergeStrategyAppend(), max_slice_records=2)
    w2.write(spark, spark.createDataFrame([(i,) for i in range(5)], "k int"),
             system_time=T0)
    assert ds.read(spark).count() == 5


def test_text_metrics_matches_column_factories(spark):
    """The string-SQL metrics and the standalone Column factories are
    duplicate implementations of the same semantics — this tie test
    fails if either copy drifts (e.g. the fingerprint's
    collapse-before-trim invariant)."""
    rows = [
        (1, "The cat and the hat. Is it fun? el la que es"),
        (2, "    spaced   out   "),  # U+00A0 edges
        (3, ""),
        (4, "der die und das ist!!!"),
        (5, "的 是 了 在 我"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r for r in text_metrics(df).collect()}
    ref = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            token_count(F.col("text")).alias("n_tokens"),
            quality_score(F.col("text")).alias("quality"),
            lang_id(F.col("text")).alias("lang_pred"),
            fingerprint(F.col("text")).alias("fingerprint"),
        ).collect()
    }
    for k in ref:
        for col in ("n_tokens", "quality", "lang_pred", "fingerprint"):
            assert got[k][col] == ref[k][col], (k, col)
