"""kmeans_apply runs UNCHANGED in Structured Streaming: scoring
against a fitted model is a pure map (literal expressions below the
cell budget, a stateless Arrow pass above), so the same centroids that
cluster the curated batch corpus classify a live embedding stream —
fit offline, apply online, one codebase."""

from __future__ import annotations

from pyspark.sql import functions as F

from kamu_cli_spark.operators.clustering import kmeans_apply, kmeans_fit


def _run_stream(spark, df, name, ckpt):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    try:
        # awaitTermination returns False on timeout WITHOUT raising —
        # fail loudly instead of asserting against a half-filled sink
        assert q.awaitTermination(120), "stream did not finish in 120s"
    finally:
        q.stop()


def test_streaming_apply_matches_batch(spark, tmp_path):
    src = tmp_path / "vecs"
    src.mkdir()
    batch = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # fit on the batch corpus; both halves of the "stream" reuse it
    cents = kmeans_fit(batch, k=4, n_updates=2)
    assert len(cents) >= 1
    half = batch.filter(F.col("vec_id") % 2 == 0)
    rest = batch.filter(F.col("vec_id") % 2 == 1)
    half.coalesce(1).write.mode("append").parquet(str(src))
    rest.coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    scored = kmeans_apply(stream, cents)
    assert scored.isStreaming
    _run_stream(spark, scored, "kmeans_stream", tmp_path / "ckpt")

    got = {
        (r.vec_id, r.cluster, r.dist_e12)
        for r in spark.sql("SELECT * FROM kmeans_stream").collect()
    }
    want = {
        (r.vec_id, r.cluster, r.dist_e12)
        for r in kmeans_apply(batch, cents).collect()
    }
    assert got == want


def test_streaming_apply_large_model_arrow_path(spark, tmp_path):
    # force the Arrow scorer (k*dim > MAX_LITERAL_CELLS) on a stream
    src = tmp_path / "vecs"
    src.mkdir()
    batch = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = kmeans_fit(batch, k=32, n_updates=1)  # 32*64 = 2048 cells
    from kamu_cli_spark.operators.clustering import MAX_LITERAL_CELLS

    # the point of this test is the ARROW scorer on a stream: prove the
    # fitted model is still big enough to select it
    assert len(cents) * len(cents[0][1]) > MAX_LITERAL_CELLS
    batch.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    scored = kmeans_apply(stream, cents)
    _run_stream(spark, scored, "kmeans_stream_arrow", tmp_path / "ckpt")
    got = {
        (r.vec_id, r.cluster, r.dist_e12)
        for r in spark.sql("SELECT * FROM kmeans_stream_arrow").collect()
    }
    want = {
        (r.vec_id, r.cluster, r.dist_e12)
        for r in kmeans_apply(batch, cents).collect()
    }
    assert got == want


def test_streaming_apply_hierarchical_path(spark, tmp_path):
    # round-9: k >= HIER_MIN_K routes the Arrow scorer through the
    # bound-pruned groups; the prune is exact, so a stream scored with
    # the big model must match the batch assignment bit-for-bit
    src = tmp_path / "vecs"
    src.mkdir()
    batch = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = kmeans_fit(batch, k=64, n_updates=1)
    from kamu_cli_spark.operators.clustering import HIER_MIN_K

    assert len(cents) >= HIER_MIN_K
    batch.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    scored = kmeans_apply(stream, cents)
    _run_stream(spark, scored, "kmeans_stream_hier", tmp_path / "ckpt")
    got = {
        (r.vec_id, r.cluster, r.dist_e12)
        for r in spark.sql("SELECT * FROM kmeans_stream_hier").collect()
    }
    want = {
        (r.vec_id, r.cluster, r.dist_e12)
        for r in kmeans_apply(batch, cents).collect()
    }
    assert got == want
