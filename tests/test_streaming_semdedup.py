"""Streaming SemDeDup twin (clustering.py:semantic_dedup_against):
a live crawl deduped against a curated corpus — assignment to fixed
centroids is a pure map, the drop is a stream-static left-anti join on
(cluster, cosine ≥ t). Equivalence contract vs the batch flagship:
with centroids fit on corpus ∪ slices, corpus ids below slice ids, and
no slice-internal near-dups, the streaming survivors equal the batch
semantic_dedup's kept slice ids exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from kamu_cli_spark.operators.clustering import (
    kmeans_fit,
    semantic_dedup,
    semantic_dedup_against,
)

DIM = 8
THRESH = 0.9


def _vec(hot: int, eps: float = 0.0, eps_dim: int | None = None) -> list:
    v = [0.0] * DIM
    v[hot] = 1.0
    if eps:
        v[eps_dim if eps_dim is not None else (hot + 1) % DIM] = eps
    return v


def _fixture(spark):
    # corpus: 4 mutually orthogonal directions (no internal near-dups)
    corpus_rows = [(i, _vec(i % 4)) for i in range(8)]
    # slice 1: two near-dups of corpus dirs 0/1 (drop), one novel (keep)
    s1 = [
        (100, _vec(0, 0.01)),
        (101, _vec(1, 0.01)),
        (102, _vec(5)),
    ]
    # slice 2: one near-dup of dir 2 (drop), two novel (keep), all
    # orthogonal to every slice-1 row so no slice-internal near-dups
    s2 = [
        (200, _vec(2, 0.01)),
        (201, _vec(6)),
        (202, _vec(7)),
    ]
    schema = "vec_id bigint, embedding array<double>"
    return (
        spark.createDataFrame(corpus_rows, schema),
        spark.createDataFrame(s1, schema),
        spark.createDataFrame(s2, schema),
    )


def _batch_kept_slice_ids(corpus, s1, s2):
    union = corpus.unionByName(s1).unionByName(s2)
    out = semantic_dedup(union, k=2, n_updates=2, threshold=THRESH)
    return {
        r["vec_id"]
        for r in out.filter((F.col("vec_id") >= 100) & F.col("kept")).collect()
    }


def test_batch_mode_matches_flagship(spark):
    corpus, s1, s2 = _fixture(spark)
    union = corpus.unionByName(s1).unionByName(s2)
    cents = kmeans_fit(union, k=2, n_updates=2)
    got = {
        r["vec_id"]
        for r in semantic_dedup_against(
            s1.unionByName(s2), corpus, cents, threshold=THRESH
        ).collect()
    }
    assert got == _batch_kept_slice_ids(corpus, s1, s2)
    assert got == {102, 201, 202}  # near-dups of corpus dirs dropped


def test_streaming_mode_matches_batch(spark, tmp_path):
    corpus, s1, s2 = _fixture(spark)
    union = corpus.unionByName(s1).unionByName(s2)
    cents = kmeans_fit(union, k=2, n_updates=2)

    src = tmp_path / "crawl"
    src.mkdir()
    s1.coalesce(1).write.mode("append").parquet(str(src))
    s2.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(s1.schema).parquet(str(src))
    out = semantic_dedup_against(stream, corpus, cents, threshold=THRESH)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sem_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        assert q.awaitTermination(120), "stream did not finish in 120s"
    finally:
        q.stop()
    got = {
        r["vec_id"] for r in spark.sql("SELECT vec_id FROM sem_stream").collect()
    }
    assert got == _batch_kept_slice_ids(corpus, s1, s2) == {102, 201, 202}


def test_empty_centroids_keep_everything(spark):
    corpus, s1, _ = _fixture(spark)
    out = semantic_dedup_against(s1, corpus, [], threshold=THRESH)
    assert out.count() == 3
    assert {r["cluster"] for r in out.collect()} == {None}
