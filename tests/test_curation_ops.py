"""Corpus-curation operators: quality-rule battery, PII scrub,
domain-mix sampling, length-curriculum binning
(kamu_cli_spark/operators/curation.py)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kamu_cli_spark.operators.curation import (
    domain_keep,
    domain_mix_summary,
    length_curriculum,
    pii_scrub,
    quality_filter,
)

from tests.conftest import rows


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestQualityFilter:
    def test_rule_battery_flags_first_failure(self, spark):
        prose = (
            "the cat sat on the mat and it was a fine day for all of us "
            "to walk in that old park"
        )
        out = {
            r[0]: r
            for r in rows(
                quality_filter(
                    _docs(
                        spark,
                        [
                            prose,  # keeps
                            "short",  # too_short
                            "a " * 40,  # word_len_low (mean len 1)
                            ("Supercalifragilistic " * 30),  # few stopwords, long words
                            ("123 456 789 1011 1213 1415 " * 4),  # low_alpha
                        ],
                    )
                ),
                "doc_id",
            )
        }
        # (doc_id, n_tokens, mean_word_len, alpha_frac, stop_hits, keep, fail_reason)
        assert out[0][5] is True and out[0][6] is None
        assert out[1][6] == "too_short"
        assert out[2][6] == "word_len_low"
        assert out[3][6] in ("word_len_high", "few_stopwords")
        assert out[4][6] == "low_alpha"

    def test_empty_text(self, spark):
        (r,) = rows(quality_filter(_docs(spark, [""])))
        assert r[1] == 0 and r[5] is False and r[6] == "too_short"

    def test_keep_is_pushdown_safe_filter(self, spark):
        df = quality_filter(
            _docs(spark, ["the a of to is that it in for and more words here ok"])
        ).where(F.col("keep"))
        assert df.count() == 1


class TestPiiScrub:
    def test_counts_and_redaction(self, spark):
        text = (
            "contact bob.smith+1@example.co.uk or 10.0.255.1 "
            "or call +4915123456789 twice: alice@test.io 192.168.1.1"
        )
        (r,) = rows(pii_scrub(_docs(spark, [text])))
        doc_id, n_email, n_ipv4, n_phone, scrubbed_len, scrubbed_md5 = r
        assert (n_email, n_ipv4, n_phone) == (2, 2, 1)
        expected = (
            "contact <PII> or <PII> or call <PII> twice: <PII> <PII>"
        )
        assert scrubbed_len == len(expected)
        assert scrubbed_md5 == hashlib.md5(expected.encode()).hexdigest()

    def test_clean_text_untouched(self, spark):
        text = "no personal data here at all"
        (r,) = rows(pii_scrub(_docs(spark, [text])))
        assert r[1:4] == (0, 0, 0)
        assert r[4] == len(text)
        assert r[5] == hashlib.md5(text.encode()).hexdigest()


class TestDomainMix:
    def _df(self, spark, n=2000):
        return spark.createDataFrame(
            [(i, ["web", "wiki", "code"][i % 3]) for i in range(n)],
            "doc_id long, source string",
        )

    def test_rates_are_approximately_hit(self, spark):
        out = {
            r[0]: r
            for r in rows(
                domain_mix_summary(
                    self._df(spark),
                    "doc_id",
                    "source",
                    rates={"web": 0.25, "wiki": 1.0},
                    default_rate=0.5,
                )
            )
        }
        assert out["wiki"][3] == 1.0
        assert abs(out["web"][3] - 0.25) < 0.1
        assert abs(out["code"][3] - 0.5) < 0.1  # default rate

    def test_keep_matches_reference_md5(self, spark):
        df = self._df(spark, 200).withColumn(
            "keep",
            domain_keep(
                F.col("doc_id"), F.col("source"), {"web": 0.3}, 0.9, salt="s"
            ),
        )
        for doc_id, source, keep in rows(df):
            h = hashlib.md5(f"{doc_id}s".encode()).hexdigest()[:4]
            rate = 0.3 if source == "web" else 0.9
            assert keep == (h < format(int(rate * 16**4), "04x")), (doc_id, source)

    def test_deterministic_across_runs(self, spark):
        a = rows(
            domain_mix_summary(self._df(spark), "doc_id", "source", {"web": 0.5}),
            "domain",
        )
        b = rows(
            domain_mix_summary(self._df(spark), "doc_id", "source", {"web": 0.5}),
            "domain",
        )
        assert a == b


class TestLengthCurriculum:
    def test_bit_length_bins(self, spark):
        # 1 token -> bin 1; 2-3 -> 2; 4-7 -> 3; 8-15 -> 4
        texts = ["w"] + ["w w w"] + ["w " * 7] + ["w " * 8]
        out = {r[0]: r for r in rows(length_curriculum(_docs(spark, texts)))}
        assert out[1][1:] == (1, 1, 1, 1)
        assert out[2][1:] == (1, 3, 3, 3)
        assert out[3][1:] == (1, 7, 7, 7)
        assert out[4][1:] == (1, 8, 8, 8)

    def test_power_of_two_boundary_is_exact(self, spark):
        # 2^k token docs must land in bin k+1, never k (float-log2 hazard)
        texts = ["w " * (2**k) for k in (1, 2, 3, 4, 5, 6)]
        out = rows(length_curriculum(_docs(spark, texts)), "len_bin")
        assert [(r[0], r[2]) for r in out] == [
            (k + 1, 2**k) for k in (1, 2, 3, 4, 5, 6)
        ]


class TestGlobalShuffle:
    def test_manifest_invariants(self, spark):
        from kamu_cli_spark.operators.sampling import global_shuffle_manifest

        df = spark.createDataFrame(
            [(i,) for i in range(3000)], "doc_id long"
        )
        out = rows(global_shuffle_manifest(df, "doc_id"))
        assert len(out) == 3000
        # positions within each shard are exactly 1..n with no gaps
        by_shard: dict[str, list[int]] = {}
        for _, shard, pos in out:
            by_shard.setdefault(shard, []).append(pos)
        for shard, ps in by_shard.items():
            assert sorted(ps) == list(range(1, len(ps) + 1)), shard
        # md5 keys spread docs across many shards (256 possible)
        assert len(by_shard) > 200
        # uniform-ish occupancy: no shard hoards the corpus
        assert max(len(p) for p in by_shard.values()) < 3000 / 256 * 4

    def test_deterministic_and_salt_sensitive(self, spark):
        from kamu_cli_spark.operators.sampling import global_shuffle_manifest

        df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
        a = sorted(rows(global_shuffle_manifest(df, "doc_id")))
        b = sorted(rows(global_shuffle_manifest(df, "doc_id")))
        c = sorted(rows(global_shuffle_manifest(df, "doc_id", salt="other")))
        assert a == b
        assert a != c


class TestChunkDocuments:
    def test_windows_cover_all_tokens_no_subset_tail(self, spark):
        from kamu_cli_spark.operators.text import chunk_documents

        df = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(70))),  # 3 chunks
             (2, "a b c"),                                # 1 chunk (n<=overlap? no: n=3<=8 -> 1)
             (3, ""),                                     # 0 chunks
             (4, "   "),                                  # 0 chunks (whitespace only)
             (5, " ".join(f"x{i}" for i in range(32)))],  # exactly one window
            ["doc_id", "text"],
        )
        out = chunk_documents(df, chunk_tokens=32, overlap_tokens=8)
        collected = out.collect()
        rows = {r["doc_id"]: [] for r in collected}
        for r in collected:
            rows[r["doc_id"]].append(r)
        # doc 1: n=70, step=24 -> chunks at 0,24,48 (48+8 < 70); covered
        c1 = sorted(rows[1], key=lambda r: r["chunk_id"])
        assert [r["chunk_id"] for r in c1] == [0, 1, 2]
        assert all(r["n_chunks"] == 3 for r in c1)
        assert c1[0]["chunk_text"].split()[0] == "t0"
        assert c1[2]["chunk_text"].split()[-1] == "t69"  # tail token covered
        assert c1[2]["n_chunk_tokens"] == 70 - 48
        assert 3 not in rows and 4 not in rows
        assert len(rows[2]) == 1 and rows[2][0]["n_chunk_tokens"] == 3
        assert len(rows[5]) == 1 and rows[5][0]["n_chunk_tokens"] == 32
        # fingerprints are md5 of the joined window
        import hashlib

        r0 = c1[0]
        assert r0["chunk_fingerprint"] == hashlib.md5(
            r0["chunk_text"].encode()
        ).hexdigest()

    def test_overlap_validation(self, spark):
        import pytest

        from kamu_cli_spark.operators.text import chunk_documents

        df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=8, overlap_tokens=8)
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=8, overlap_tokens=-1)
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=0, overlap_tokens=0)

    def test_no_shuffle_no_python(self, spark):
        from kamu_cli_spark.operators.text import chunk_documents

        df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        plan = chunk_documents(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "MapInPandas" not in plan


class TestStratifiedSample:
    def _docs(self, spark):
        return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    def test_cap_and_rank(self, spark):
        from kamu_cli_spark.operators.sampling import stratified_sample

        out = stratified_sample(self._docs(spark), "doc_id", ["lang"], 5)
        per = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert per and all(n <= 5 for n in per.values())
        assert out.filter((F.col("srank") < 1) | (F.col("srank") > 5)).count() == 0

    def test_stratum_independence(self, spark):
        # adding rows to OTHER strata must not change a stratum's picks
        from kamu_cli_spark.operators.sampling import stratified_sample

        docs = self._docs(spark)
        one_lang = docs.filter(F.col("lang") == "en")
        alone = {r["doc_id"] for r in stratified_sample(one_lang, "doc_id", ["lang"], 5)
                 .filter(F.col("lang") == "en").select("doc_id").collect()}
        together = {r["doc_id"] for r in stratified_sample(docs, "doc_id", ["lang"], 5)
                    .filter(F.col("lang") == "en").select("doc_id").collect()}
        assert alone == together

    def test_salt_gives_independent_draw(self, spark):
        from kamu_cli_spark.operators.sampling import stratified_sample

        docs = self._docs(spark)
        a = {r["doc_id"] for r in stratified_sample(docs, "doc_id", ["lang"], 5).collect()}
        b = {r["doc_id"] for r in stratified_sample(docs, "doc_id", ["lang"], 5, salt="x").collect()}
        assert a != b  # overwhelmingly likely with md5

    def test_group_limit_pushed(self, spark):
        from kamu_cli_spark.operators.sampling import stratified_sample

        plan = stratified_sample(self._docs(spark), "doc_id", ["lang"], 5) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan

    def test_validation(self, spark):
        import pytest
        from kamu_cli_spark.operators.sampling import stratified_sample

        with pytest.raises(ValueError):
            stratified_sample(self._docs(spark), "doc_id", ["lang"], 0)
