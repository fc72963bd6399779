"""BM25 corpus stats on the ledger (VERDICT r11 #6): the one fitted
artifact still returned as a transient Python dict becomes a
snapshot-CDC dataset keyed by term. Save/load must score
bit-identically (everything is exact integers), a refit must emit the
CDC alphabet, and a STREAMING scorer must accept a ledger-loaded
artifact."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.model_store import (
    load_bm25_stats,
    save_bm25_stats,
)
from kamu_cli_spark.operators.retrieval import bm25_corpus_stats, bm25_score

QUERIES = [(1, ["the", "data"]), (2, ["pipeline", "quality", "the"])]


def _d(day):
    return datetime(2024, 3, day, tzinfo=timezone.utc)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def test_round_trip_scores_bit_identically(spark, tmp_path):
    docs = _docs(spark)
    stats = bm25_corpus_stats(docs, QUERIES)
    ds = Dataset.create(str(tmp_path), "bm25", system_time=_d(1).isoformat())
    save_bm25_stats(spark, ds, stats, system_time=_d(2), source_event_time=_d(2))
    loaded = load_bm25_stats(spark, ds)
    assert loaded == stats  # exact ints: the dict round-trips verbatim

    a = bm25_score(docs, QUERIES, stats).collect()
    b = bm25_score(docs, QUERIES, loaded).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_refit_emits_cdc_alphabet(spark, tmp_path):
    docs = _docs(spark)
    ds = Dataset.create(str(tmp_path), "bm25", system_time=_d(1).isoformat())
    s1 = bm25_corpus_stats(docs, [(1, ["the", "data"])])
    save_bm25_stats(spark, ds, s1, system_time=_d(2), source_event_time=_d(2))
    # refit on a different corpus slice with one term dropped, one added
    s2 = bm25_corpus_stats(
        docs.filter(F.col("doc_id") % 2 == 0), [(1, ["the", "model"])]
    )
    save_bm25_stats(spark, ds, s2, system_time=_d(3), source_event_time=_d(3))
    rows = ds.read(spark).filter(
        F.col("term").isin("data", "model", "the")
    ).collect()
    ops = {(r["term"], r["op"]) for r in rows if r["system_time"].day == 3}
    # ODF op codes: 0 = +A append, 1 = -R retract, 2 = -C, 3 = +C
    assert ("model", 0) in ops  # "model" appended
    assert ("data", 1) in ops  # "data" retracted
    assert {("the", 2), ("the", 3)} <= ops  # "the" re-counted
    assert load_bm25_stats(spark, ds) == s2


def test_empty_stats_refused(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "bm25", system_time=_d(1).isoformat())
    with pytest.raises(ValueError, match="empty"):
        save_bm25_stats(
            spark, ds, {"n_docs": 1, "s_tokens": 1, "dfreq": {}},
            system_time=_d(2), source_event_time=_d(2),
        )


def test_streaming_scorer_from_ledger(spark, tmp_path):
    # the live-crawl gate: fit+commit offline, then a streaming scorer
    # loads the artifact from the ledger and must equal the batch run
    docs = _docs(spark).limit(200).select("doc_id", "text")
    stats = bm25_corpus_stats(docs, QUERIES)
    ds = Dataset.create(str(tmp_path), "bm25", system_time=_d(1).isoformat())
    save_bm25_stats(spark, ds, stats, system_time=_d(2), source_event_time=_d(2))
    loaded = load_bm25_stats(spark, ds)

    src = str(tmp_path / "stream_src")
    docs.write.parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    out = bm25_score(stream, QUERIES, loaded)
    q = (
        out.writeStream.format("memory")
        .queryName("bm25_ledger_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM bm25_ledger_stream").collect())
    )
    want = sorted(map(tuple, bm25_score(docs, QUERIES, stats).collect()))
    assert got == want and len(got) > 0
