"""Distributed Bloom-filter cross-corpus dedup (dedup.py).

The reference's corpus-refresh workflow dedupes a new crawl against
the existing training set; at 100 TB the anti-join's shuffle of the
full crawl is the bottleneck, and the standard fix is a broadcast
Bloom filter over the reference keys. These tests pin the three
properties the design rests on: no false negatives (ever), exact
survivor equality with the plain anti-join (even under forced false
positives), and a shuffle-free membership plan.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kamu_cli_spark.operators.dedup import (
    _BLOOM_WORD_BITS,
    bloom_bit_words,
    bloom_membership,
    dedup_against,
    dedup_against_bloom,
)


def _corpora(spark):
    """A crawl with genuine overlaps against a reference corpus:
    3 exact dups (one differing only in case/whitespace — the
    fingerprint normalizes both), 3 fresh docs."""
    reference = spark.createDataFrame(
        [(i, t) for i, t in enumerate(
            ["alpha beta gamma", "delta epsilon", "zeta eta theta",
             "iota kappa", "lambda mu nu"]
        )],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (100, "alpha beta gamma"),       # exact dup
            (101, "  Delta   EPSILON "),     # dup after normalization
            (102, "zeta eta theta"),         # exact dup
            (103, "fresh one"),
            (104, "fresh two"),
            (105, "fresh three"),
        ],
        ["doc_id", "text"],
    )
    return corpus, reference


def _ids(df):
    return sorted(r.doc_id for r in df.select("doc_id").collect())


class TestBloomDedup:
    def test_survivors_equal_plain_anti_join(self, spark):
        corpus, reference = _corpora(spark)
        plain = _ids(dedup_against(corpus, reference))
        bloom = _ids(dedup_against_bloom(corpus, reference))
        assert plain == bloom == [103, 104, 105]

    def test_no_false_negatives_even_with_tiny_filter(self, spark):
        # n_bits=64 forces heavy bit collisions (many false positives);
        # survivors must STILL equal the plain anti-join because every
        # bloom-positive row is re-verified exactly. Both physical
        # strategies must agree.
        corpus, reference = _corpora(spark)
        plain = _ids(dedup_against(corpus, reference))
        for ss in (True, False):
            bloom = _ids(
                dedup_against_bloom(corpus, reference, n_bits=64, single_scan=ss)
            )
            assert plain == bloom

    def test_members_always_hit(self, spark):
        # Bloom property: a member of the indexed set NEVER misses.
        _, reference = _corpora(spark)
        for n_bits in (64, 1 << 10, 1 << 20):
            words = bloom_bit_words(reference, n_bits=n_bits)
            m = bloom_membership(reference, words, n_bits=n_bits)
            assert m.filter(~F.col("bloom_hit")).count() == 0

    def test_mismatched_params_would_miss(self, spark):
        # Guard against the classic deployment bug: filter built with
        # one (n_bits, n_hashes), probed with another. With a different
        # n_bits the positions diverge and members start missing —
        # which is why dedup_against_bloom threads ONE set of params.
        _, reference = _corpora(spark)
        words = bloom_bit_words(reference, n_bits=1 << 20)
        m = bloom_membership(reference, words, n_bits=1 << 10)
        assert m.filter(~F.col("bloom_hit")).count() > 0

    def test_word_table_bounded_by_n_bits(self, spark):
        _, reference = _corpora(spark)
        n_bits = 256
        words = bloom_bit_words(reference, n_bits=n_bits).collect()
        assert len(words) <= math.ceil(n_bits / _BLOOM_WORD_BITS)
        assert all(0 <= r.word_idx < math.ceil(n_bits / _BLOOM_WORD_BITS)
                   for r in words)

    def test_membership_plan_is_shuffle_free(self, spark):
        # The whole point at 100 TB: testing the crawl must not move it.
        # Feed PRE-MATERIALIZED words (no build lineage) so any Exchange
        # in the plan could only come from the probe side.
        corpus, reference = _corpora(spark)
        words = spark.createDataFrame(
            bloom_bit_words(reference).collect(), "word_idx bigint, word bigint"
        )
        plan = (
            bloom_membership(corpus, words)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        assert "SortMergeJoin" not in plan

    def test_param_validation(self, spark):
        corpus, reference = _corpora(spark)
        with pytest.raises(ValueError):
            bloom_bit_words(reference, n_bits=0)
        with pytest.raises(ValueError):
            bloom_membership(corpus, bloom_bit_words(reference), n_hashes=0)

    def test_derived_n_bits_sizing(self, spark):
        from kamu_cli_spark.operators.dedup import _derive_n_bits

        _, reference = _corpora(spark)
        bits = _derive_n_bits(reference)  # 5 docs -> floor of 2^20
        assert bits == 1 << 20
        # derived sizing yields the same survivors as any explicit size
        corpus, _ = _corpora(spark)
        assert _ids(dedup_against_bloom(corpus, reference)) == _ids(
            dedup_against_bloom(corpus, reference, n_bits=64)
        )


class TestGramNovelty:
    def _corpora(self, spark):
        reference = spark.createDataFrame(
            [(0, "the quick brown fox jumps over the lazy dog"),
             (10, "pack my box with five dozen liquor jugs")],
            ["doc_id", "text"],
        )
        corpus = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog"),  # verbatim copy
             (2, "completely novel sentence about spark bloom filters"),
             (3, "the quick brown fox went somewhere entirely else today"),  # partial
             (4, "ab")],  # < 3 tokens -> no grams -> absent
            ["doc_id", "text"],
        )
        return corpus, reference

    def test_novelty_extremes_and_absence(self, spark):
        from kamu_cli_spark.operators.dedup import gram_novelty

        corpus, reference = self._corpora(spark)
        out = {r["doc_id"]: r for r in gram_novelty(corpus, reference, "doc_id").collect()}
        assert out[1]["novelty_e6"] == 0          # every gram known
        assert out[2]["novelty_e6"] == 1_000_000  # nothing known
        assert 0 < out[3]["novelty_e6"] < 1_000_000
        assert out[3]["n_novel"] < out[3]["n_grams"]
        assert 4 not in out                       # too short for a shingle

    def test_deterministic(self, spark):
        from kamu_cli_spark.operators.dedup import gram_novelty

        corpus, reference = self._corpora(spark)
        a = sorted(map(tuple, gram_novelty(corpus, reference, "doc_id").collect()))
        b = sorted(map(tuple, gram_novelty(corpus, reference, "doc_id").collect()))
        assert a == b


def test_bloom_membership_runs_on_streams(spark, tmp_path):
    """The membership test is k broadcast joins + a projection — a
    stream-static join pattern, so the same bitmap that filters a
    batch crawl filters a live one (fit the bitmap offline, test the
    stream as it arrives)."""
    from kamu_cli_spark.operators.dedup import bloom_bit_words, bloom_membership

    reference = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "delta epsilon")], ["doc_id", "text"]
    )
    crawl_rows = [(100, "alpha beta gamma"), (101, "definitely new text")]
    src = tmp_path / "crawl"
    src.mkdir()
    batch_crawl = spark.createDataFrame(crawl_rows, ["doc_id", "text"])
    batch_crawl.coalesce(1).write.mode("append").parquet(str(src))

    words = bloom_bit_words(reference)
    stream = spark.readStream.schema(batch_crawl.schema).parquet(str(src))
    flagged = bloom_membership(stream, words).select("doc_id", "bloom_hit")
    assert flagged.isStreaming
    q = (
        flagged.writeStream.format("memory")
        .queryName("bloom_stream")
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
        (r.doc_id, r.bloom_hit)
        for r in spark.sql("SELECT * FROM bloom_stream").collect()
    }
    want = {
        (r.doc_id, r.bloom_hit)
        for r in bloom_membership(batch_crawl, words)
        .select("doc_id", "bloom_hit").collect()
    }
    assert got == want and (100, True) in got and (101, False) in got
