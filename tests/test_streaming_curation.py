"""The curation operators run UNCHANGED in Structured Streaming: the
Arrow kernels (quality filter, PII scrub) are stateless narrow maps and
the sampling decision is a pure expression, so the same functions that
curate a 100 TB batch corpus curate a live stream — the property that
makes the batch/streaming split an execution detail, not two codebases.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kamu_cli_spark.operators.curation import (
    domain_keep,
    pii_scrub,
    quality_filter,
)


def _write_batches(spark, src):
    prose = (
        "the cat sat on the mat and it was a fine day for all of us "
        "to walk in that old park with a friend"
    )
    spark.createDataFrame(
        [(1, prose, "web"), (2, "short", "web")],
        "doc_id long, text string, source string",
    ).coalesce(1).write.mode("append").parquet(str(src))
    spark.createDataFrame(
        [(3, prose + " again today", "wiki"),
         (4, "mail bob@example.com now " + prose, "wiki")],
        "doc_id long, text string, source string",
    ).coalesce(1).write.mode("append").parquet(str(src))


def _run_stream(spark, df, name, ckpt):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_streaming_quality_filter_matches_batch(spark, tmp_path):
    src = tmp_path / "docs"
    src.mkdir()
    _write_batches(spark, src)

    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    _run_stream(
        spark, quality_filter(stream), "stream_qf", tmp_path / "ckpt_qf"
    )
    got = {
        (r["doc_id"], r["keep"], r["fail_reason"])
        for r in spark.sql("SELECT * FROM stream_qf").collect()
    }
    want = {
        (r["doc_id"], r["keep"], r["fail_reason"])
        for r in quality_filter(spark.read.parquet(str(src))).collect()
    }
    assert got == want and len(got) == 4
    assert (2, False, "too_short") in got


def test_streaming_pii_scrub_and_domain_sampling(spark, tmp_path):
    src = tmp_path / "docs2"
    src.mkdir()
    _write_batches(spark, src)

    stream = (
        spark.readStream.schema("doc_id long, text string, source string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    # scrub then keep-decide, in one streaming plan
    curated = pii_scrub(stream).withColumn(
        "keep",
        domain_keep(F.col("doc_id"), F.lit("web"), {"web": 1.0}),
    )
    _run_stream(spark, curated, "stream_pii", tmp_path / "ckpt_pii")
    rows = {r["doc_id"]: r for r in spark.sql("SELECT * FROM stream_pii").collect()}
    assert len(rows) == 4
    assert rows[4]["n_email"] == 1 and rows[1]["n_email"] == 0
    assert all(r["keep"] for r in rows.values())  # rate 1.0 keeps all
    # streaming scrub fingerprints equal the batch operator's
    batch = {r["doc_id"]: r for r in pii_scrub(spark.read.parquet(str(src))).collect()}
    assert all(
        rows[i]["scrubbed_md5"] == batch[i]["scrubbed_md5"] for i in rows
    )
