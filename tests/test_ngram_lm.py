"""Exact-integer bigram LM (text.py:ngram_lm_fit / ngram_lm_score) —
the CCNet-style LM-perplexity quality-filter axis, rational instead of
log-float so scores are engine-portable. Hand-computed fixtures + the
ordering property the filter relies on (in-domain text scores above
gibberish)."""

from __future__ import annotations

import pytest

from kamu_cli_spark.operators.text import ngram_lm_fit, ngram_lm_score


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_fit_conditional_counts_exact(spark):
    corpus = _docs(spark, [
        (1, "the cat sat"),
        (2, "the cat ran"),
        (3, "the dog sat"),
    ])
    m = {(r["w1"], r["w2"]): (r["pair_n"], r["ctx_n"], r["cond_e6"])
         for r in ngram_lm_fit(corpus).collect()}
    # "the": 3 contexts -> cat 2/3, dog 1/3
    assert m[("the", "cat")] == (2, 3, 666666)
    assert m[("the", "dog")] == (1, 3, 333333)
    # "cat": sat 1/2, ran 1/2
    assert m[("cat", "sat")] == (1, 2, 500000)
    assert m[("cat", "ran")] == (1, 2, 500000)
    assert len(m) == 5  # + ("dog","sat")
    assert m[("dog", "sat")] == (1, 1, 1000000)


def test_score_mean_and_unseen_and_empty(spark):
    corpus = _docs(spark, [(1, "the cat sat"), (2, "the cat ran")])
    m = ngram_lm_fit(corpus)
    docs = _docs(spark, [
        (10, "the cat sat"),      # bigrams: (the,cat)=1e6, (cat,sat)=5e5
        (11, "zz qq"),            # one unseen bigram -> 0
        (12, "the"),              # zero bigrams
        (13, ""),                 # zero tokens
    ])
    out = {r["doc_id"]: r for r in ngram_lm_score(docs, m).collect()}
    assert set(out) == {10, 11, 12, 13}
    assert out[10]["n_bigrams"] == 2 and out[10]["seen_bigrams"] == 2
    assert out[10]["familiarity_e6"] == (1_000_000 + 500_000) // 2
    assert out[11]["n_bigrams"] == 1 and out[11]["seen_bigrams"] == 0
    assert out[11]["familiarity_e6"] == 0
    for i in (12, 13):
        assert out[i]["n_bigrams"] == 0 and out[i]["familiarity_e6"] == 0


def test_in_domain_scores_above_gibberish(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    model = ngram_lm_fit(docs)
    probe = _docs(spark, [
        # splice of real corpus style vs token soup
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "qxv zzk jjw pplm aa0x 9qq7 zoiw"),
    ])
    out = {r["doc_id"]: r["familiarity_e6"]
           for r in ngram_lm_score(probe, model).collect()}
    assert out[2] == 0 or out[1] > out[2]


def test_pipeline_lm_gate_drops_gibberish(spark):
    import sys

    sys.path.insert(0, "/root/repo/examples/pretrain_pipeline")
    from pipeline import run_pipeline

    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ref = real.limit(40)
    # crawl: real-style docs + one token-soup doc that passes length
    # rules but has zero familiar bigrams
    soup = _docs(spark, [(999_999, "qxv zzk jjw pplm xx0q 9qq7 zoiw "
                                   "vvkp qlm0 zzt9 wq1x p0o9 kkj3 qp2z "
                                   "aav4 bbn5 ccm6 ddl7 eek8 ffj9 zzz0 "
                                   "yyx1 wwv2 uut3 ssr4 qqp5 oon6 mml7")])
    # repartition flattens the union lineage: AQE's stage zip chokes
    # on the two-child union's unequal partition counts deep inside
    # the pipeline (Spark-internal ZippedPartitionsRDD assert), which
    # is an input-shape quirk, not an operator property
    crawl = (
        real.limit(20).select("doc_id", "text").unionByName(soup)
        .repartition(8)
    )

    gated = run_pipeline(spark, crawl, lm_reference=ref, vocab_k=50)
    ungated = run_pipeline(spark, crawl, vocab_k=50)
    kept_gated = {r["doc_id"] for r in gated.kept.select("doc_id").collect()}
    kept_ungated = {r["doc_id"] for r in ungated.kept.select("doc_id").collect()}
    assert 999_999 not in kept_gated
    # the gate only ever removes docs, never adds
    assert kept_gated <= kept_ungated


class TestStreaming:
    """Round-11: the live-crawl LM gate — ngram_lm_score on a streaming
    DataFrame is a stateless map against the collected model (bounded
    by the reference vocabulary) and must score bit-identically to the
    batch path, emitting one row per input doc in append mode."""

    def _run_stream(self, spark, tmp_path, docs, op):
        src = tmp_path / "crawl"
        src.mkdir()
        docs.coalesce(1).write.mode("append").parquet(str(src))
        stream = spark.readStream.schema(docs.schema).parquet(str(src))
        out = op(stream)
        assert out.isStreaming
        name = f"lm_{abs(hash(str(tmp_path))) % 10**9}"
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

    def test_streaming_matches_batch(self, spark, tmp_path):
        ref = _docs(spark, [
            (1, "the cat sat on the mat"),
            (2, "the cat ran to the mat"),
        ])
        crawl = _docs(spark, [
            (10, "the cat sat"),        # fully in-domain
            (11, "zx qv bn"),           # gibberish: 0 seen
            (12, "the cat sat xx the"), # mixed
            (13, ""),                   # zero-token doc still emitted
            (14, "one"),                # single token: 0 bigrams
        ])
        model = ngram_lm_fit(ref)
        got = self._run_stream(
            spark, tmp_path, crawl, lambda s: ngram_lm_score(s, model)
        )
        want = {tuple(r) for r in ngram_lm_score(crawl, model).collect()}
        assert got == want
        assert {r[0] for r in got} == {10, 11, 12, 13, 14}


class TestDsirWeights:
    """Round-11: DSIR-style importance weights — the target/raw LM
    contrast must rank target-domain docs above pool-typical docs, and
    the arithmetic is the exact familiarity difference."""

    def test_contrast_ranks_target_domain_up(self, spark):
        from kamu_cli_spark.operators.text import dsir_weights

        target = _docs(spark, [
            (1, "the cat sat on the mat"),
            (2, "the cat ran on the mat"),
        ])
        # crawl pool: one target-ish doc, several pool-typical docs
        crawl = _docs(spark, [
            (10, "the cat sat on the mat"),
            (11, "buy pills now cheap deal"),
            (12, "buy pills now cheap deal"),
            (13, "buy pills now cheap deal"),
            (14, ""),
        ])
        rows = {r["doc_id"]: r for r in dsir_weights(crawl, target).collect()}
        # every input doc emitted, weight = target - raw exactly
        assert set(rows) == {10, 11, 12, 13, 14}
        for r in rows.values():
            assert r["dsir_weight_e6"] == r["target_fam_e6"] - r["raw_fam_e6"]
        # the target-domain doc outranks the pool-typical spam
        assert rows[10]["dsir_weight_e6"] > rows[11]["dsir_weight_e6"]
        # spam is POOL-typical: raw familiarity high, target zero
        assert rows[11]["target_fam_e6"] == 0
        assert rows[11]["raw_fam_e6"] > 0
        # zero-bigram doc scores zeros
        assert tuple(rows[14])[1:] == (0, 0, 0, 0)

    def test_raw_corpus_override(self, spark):
        from kamu_cli_spark.operators.text import dsir_weights

        target = _docs(spark, [(1, "a b a b")])
        crawl = _docs(spark, [(10, "a b"), (11, "c d")])
        other = _docs(spark, [(20, "c d c d")])
        rows = {
            r["doc_id"]: r
            for r in dsir_weights(crawl, target, raw_corpus=other).collect()
        }
        # raw LM from `other`: (c,d) familiar, (a,b) not
        assert rows[10]["raw_fam_e6"] == 0 and rows[10]["target_fam_e6"] > 0
        assert rows[11]["raw_fam_e6"] > 0 and rows[11]["target_fam_e6"] == 0


class TestFamiliarityBuckets:
    """Round-11: CCNet head/middle/tail buckets — exact bounded-domain
    quantiles (value-histogram CDF, never a global sort)."""

    def test_terciles_exact_and_tie_stable(self, spark):
        from kamu_cli_spark.operators.text import (
            lm_familiarity_buckets,
            ngram_lm_fit,
        )

        ref = _docs(spark, [(1, "the cat sat on the mat")])
        model = ngram_lm_fit(ref)
        # engineered familiarity spread: exact-copy docs (high), partial
        # (middle), gibberish (zero) — plus a tie pair
        crawl = _docs(spark, [
            (10, "the cat sat on the mat"),   # all bigrams seen
            (11, "the cat sat on the mat"),   # tie with 10
            (12, "the cat sat xx yy zz"),     # partial
            (13, "aa bb cc dd"),              # zero
            (14, "ee ff gg hh"),              # zero
            (15, "ii jj kk ll"),              # zero
        ])
        rows = {
            r["doc_id"]: r
            for r in lm_familiarity_buckets(crawl, model).collect()
        }
        assert set(rows) == {10, 11, 12, 13, 14, 15}
        # every bucket in range; ties share a bucket
        for r in rows.values():
            assert 1 <= r["bucket"] <= 3
        assert rows[10]["bucket"] == rows[11]["bucket"] == 3
        # zero-familiarity docs: n_less=0 -> bucket 1
        assert rows[13]["bucket"] == rows[14]["bucket"] == rows[15]["bucket"] == 1
        # the partial doc sits strictly between: n_less=3, N=6 -> 2
        assert rows[12]["bucket"] == 2
        # monotone: higher familiarity never gets a lower bucket
        fam_bucket = sorted(
            (r["familiarity_e6"], r["bucket"]) for r in rows.values()
        )
        for (f1, b1), (f2, b2) in zip(fam_bucket, fam_bucket[1:]):
            assert b1 <= b2

    def test_validation(self, spark):
        from kamu_cli_spark.operators.text import (
            lm_familiarity_buckets,
            ngram_lm_fit,
        )

        docs = _docs(spark, [(1, "a b")])
        with pytest.raises(ValueError):
            lm_familiarity_buckets(docs, ngram_lm_fit(docs), n_buckets=0)
