"""Span-level dedup against a STATIC corpus
(dedup.py:spans_against_corpus / strip_spans_against_corpus) — the
round-10 stream twin VERDICT r9 asked for (Next round #4): the corpus
window-key set stays distributed (no driver cap, unlike
contaminated_spans), prefiltered by a broadcast Bloom and confirmed by
an exact stream-static LEFT SEMI join. Tests: planted-span positions,
prefilter on/off identity, streaming == batch for both audit and strip,
and every-doc emission on strip."""

from __future__ import annotations

from kamu_cli_spark.operators.dedup import (
    spans_against_corpus,
    strip_spans_against_corpus,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _uniq(tag: str, n: int) -> str:
    return " ".join(f"{tag}{i}" for i in range(n))


SHARED = "the quick brown fox jumps over the lazy dog tonight"  # 10 tokens


def _fx(spark):
    corpus = _docs(
        spark,
        [
            (100, f"{_uniq('k', 4)} {SHARED} {_uniq('m', 4)}"),
            (101, _uniq("n", 20)),
        ],
    )
    crawl = _docs(
        spark,
        [
            (1, f"{_uniq('a', 5)} {SHARED} {_uniq('b', 5)}"),  # hit at 5..14
            (2, _uniq("c", 15)),                               # clean
            (3, ""),                                           # zero-token
        ],
    )
    return crawl, corpus


class TestBatch:
    def test_spans_found_with_positions(self, spark):
        crawl, corpus = _fx(spark)
        got = {
            (r["doc_id"], r["span_start"], r["span_end"], r["span_tokens"])
            for r in spans_against_corpus(
                crawl, corpus, "doc_id", min_len=8
            ).collect()
        }
        assert got == {(1, 5, 14, 10)}

    def test_prefilter_off_identical(self, spark):
        crawl, corpus = _fx(spark)
        on = spans_against_corpus(crawl, corpus, "doc_id", min_len=8)
        off = spans_against_corpus(
            crawl, corpus, "doc_id", min_len=8, prefilter=False
        )
        assert {tuple(r) for r in on.collect()} == {
            tuple(r) for r in off.collect()
        }

    def test_strip_emits_every_doc(self, spark):
        crawl, corpus = _fx(spark)
        out = {
            r["doc_id"]: r
            for r in strip_spans_against_corpus(
                crawl, corpus, "doc_id", min_len=8
            ).collect()
        }
        assert set(out) == {1, 2, 3}
        assert out[1]["clean_text"] == f"{_uniq('a', 5)} {_uniq('b', 5)}"
        assert out[1]["removed_tokens"] == 10
        assert out[2]["removed_tokens"] == 0 and out[2]["kept_tokens"] == 15
        assert out[3]["clean_text"] == "" and out[3]["kept_tokens"] == 0

    def test_within_crawl_repeats_not_flagged(self, spark):
        # a span repeated INSIDE the crawl but absent from the corpus is
        # not this operator's business (that's duplicate_spans)
        crawl = _docs(
            spark,
            [(1, f"{SHARED} {_uniq('a', 4)}"), (2, f"{SHARED} {_uniq('b', 4)}")],
        )
        corpus = _docs(spark, [(100, _uniq("z", 30))])
        assert spans_against_corpus(
            crawl, corpus, "doc_id", min_len=8
        ).count() == 0


class TestDistributedPathIdentity:
    """collect_max_keys=0 forces the distributed Bloom + semi-join
    path (the 100 TB shape); it must produce byte-identical results to
    the bounded-corpus kernel fast path that small corpora take."""

    def test_audit_paths_identical(self, spark):
        crawl, corpus = _fx(spark)
        fast = spans_against_corpus(crawl, corpus, "doc_id", min_len=8)
        dist = spans_against_corpus(
            crawl, corpus, "doc_id", min_len=8, collect_max_keys=0
        )
        assert (
            {tuple(r) for r in fast.collect()}
            == {tuple(r) for r in dist.collect()}
            == {(1, 5, 14, 10)}
        )

    def test_strip_paths_identical(self, spark):
        crawl, corpus = _fx(spark)
        fast = strip_spans_against_corpus(crawl, corpus, "doc_id", min_len=8)
        dist = strip_spans_against_corpus(
            crawl, corpus, "doc_id", min_len=8, collect_max_keys=0
        )
        got_f = {tuple(r) for r in fast.collect()}
        got_d = {tuple(r) for r in dist.collect()}
        assert got_f == got_d and len(got_d) == 3


class TestStreaming:
    def _run_stream(self, spark, tmp_path, crawl, op):
        src = tmp_path / "crawl"
        src.mkdir()
        crawl.coalesce(1).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema(crawl.schema).parquet(str(src))
        out = op(stream)
        assert out.isStreaming
        name = f"sac_{abs(hash(str(tmp_path))) % 10**9}"
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(180)
        finally:
            q.stop()
        return {tuple(r) for r in spark.sql(f"select * from {name}").collect()}

    def test_streaming_audit_matches_batch(self, spark, tmp_path):
        crawl, corpus = _fx(spark)
        got = self._run_stream(
            spark, tmp_path, crawl,
            lambda s: spans_against_corpus(s, corpus, "doc_id", min_len=8),
        )
        want = {
            tuple(r)
            for r in spans_against_corpus(
                crawl, corpus, "doc_id", min_len=8
            ).collect()
        }
        assert got == want == {(1, 5, 14, 10)}

    def test_streaming_distributed_audit_matches_batch(
        self, spark, tmp_path
    ):
        # the stream-static semi join + applyInPandasWithState island
        # merge (forced via collect_max_keys=0) — the at-scale stream
        # shape the bounded fast path bypasses
        crawl, corpus = _fx(spark)
        got = self._run_stream(
            spark, tmp_path, crawl,
            lambda s: spans_against_corpus(
                s, corpus, "doc_id", min_len=8, collect_max_keys=0
            ),
        )
        assert got == {(1, 5, 14, 10)}

    def test_streaming_distributed_strip_matches_batch(
        self, spark, tmp_path
    ):
        crawl, corpus = _fx(spark)
        got = self._run_stream(
            spark, tmp_path, crawl,
            lambda s: strip_spans_against_corpus(
                s, corpus, "doc_id", min_len=8, collect_max_keys=0
            ),
        )
        want = {
            tuple(r)
            for r in strip_spans_against_corpus(
                crawl, corpus, "doc_id", min_len=8
            ).collect()
        }
        assert got == want and len(got) == 3

    def test_streaming_strip_matches_batch(self, spark, tmp_path):
        crawl, corpus = _fx(spark)
        got = self._run_stream(
            spark, tmp_path, crawl,
            lambda s: strip_spans_against_corpus(
                s, corpus, "doc_id", min_len=8
            ),
        )
        want = {
            tuple(r)
            for r in strip_spans_against_corpus(
                crawl, corpus, "doc_id", min_len=8
            ).collect()
        }
        assert got == want
        assert len(got) == 3  # every crawl doc emitted, stream included
