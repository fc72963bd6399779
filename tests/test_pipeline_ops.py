"""Semantic tests for the training-data pipeline operators added in
round 5: deterministic stratified splitting, repetition metrics, and
int8 embedding quantization. Expectations are hand-computed on tiny
inputs (the driver's DuckDB oracle separately cross-checks the same
operators at sf0.01)."""

from __future__ import annotations

import hashlib
import math

import pytest

from kamu_cli_spark.operators.quantize import quantize_int8
from kamu_cli_spark.operators.sampling import (
    split_assignment,
    split_thresholds,
    stratified_split_summary,
)
from kamu_cli_spark.operators.text import repetition_metrics

from tests.conftest import rows


def _expected_split(key: str, salt: str = "") -> str:
    h = hashlib.md5((key + salt).encode()).hexdigest()[:4]
    if h < "cccc":
        return "train"
    if h < "e666":
        return "val"
    return "test"


class TestSplitAssignment:
    def test_thresholds_exact_hex_bounds(self):
        t = split_thresholds({"train": 0.8, "val": 0.1, "test": 0.1})
        assert t == [("train", "cccc"), ("val", "e666"), ("test", "10000")]

    def test_fractions_must_sum_to_one(self):
        with pytest.raises(ValueError):
            split_thresholds({"a": 0.5, "b": 0.2})

    def test_matches_reference_md5_assignment(self, spark):
        df = spark.range(0, 200).withColumnRenamed("id", "k")
        got = {
            r["k"]: r["split"]
            for r in df.select(
                "k", split_assignment(df["k"]).alias("split")
            ).collect()
        }
        assert got == {i: _expected_split(str(i)) for i in range(200)}

    def test_salt_changes_assignment_deterministically(self, spark):
        df = spark.range(0, 300).withColumnRenamed("id", "k")
        a = df.select("k", split_assignment(df["k"], salt="a").alias("s"))
        b = df.select("k", split_assignment(df["k"], salt="b").alias("s"))
        ra, rb = dict(rows(a)), dict(rows(b))
        assert ra == {i: _expected_split(str(i), "a") for i in range(300)}
        assert ra != rb  # independent draws differ somewhere

    def test_stratified_summary_counts(self, spark):
        data = [(i, "en" if i % 2 == 0 else "de", 10 * i) for i in range(100)]
        df = spark.createDataFrame(data, ["doc_id", "lang", "n_chars"])
        out = rows(
            stratified_split_summary(df, "doc_id", "lang", "n_chars"),
            "split",
            "lang",
        )
        expected = {}
        for i, lang, size in data:
            s = _expected_split(str(i))
            k = (s, lang)
            n, tot = expected.get(k, (0, 0))
            expected[k] = (n + 1, tot + size)
        assert {(s, l): (n, t) for s, l, n, t in out} == expected


class TestRepetitionMetrics:
    def _run(self, spark, text):
        df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
        [r] = repetition_metrics(df).collect()
        return r

    def test_uniform_repetition(self, spark):
        # "a a a a": top word 4/4, distinct 1/4, top bigram "a a" 3/3.
        r = self._run(spark, "a a a a")
        assert (r["n_words"], r["n_distinct_words"]) == (4, 1)
        assert r["top_word_frac_e6"] == 1_000_000
        assert r["distinct_ratio_e6"] == 250_000
        assert r["top_bigram_frac_e6"] == 1_000_000

    def test_all_distinct(self, spark):
        r = self._run(spark, "w x y z")
        assert (r["n_words"], r["n_distinct_words"]) == (4, 4)
        assert r["top_word_frac_e6"] == 250_000
        assert r["distinct_ratio_e6"] == 1_000_000
        # bigrams "w x","x y","y z" all distinct -> 1/3
        assert r["top_bigram_frac_e6"] == math.floor(1e6 / 3)

    def test_single_word_doc_has_no_bigrams(self, spark):
        r = self._run(spark, "  solo ")
        assert (r["n_words"], r["top_bigram_frac_e6"]) == (1, 0)

    def test_empty_doc_produces_no_row(self, spark):
        df = spark.createDataFrame([(1, "   "), (2, "ok ok")], ["doc_id", "text"])
        out = rows(repetition_metrics(df), "doc_id")
        assert [r[0] for r in out] == [2]

    def test_boilerplate_ranks_worse_than_prose(self, spark):
        df = spark.createDataFrame(
            [
                (1, "click here click here click here click here"),
                (2, "the quick brown fox jumps over the lazy dog"),
            ],
            ["doc_id", "text"],
        )
        out = {r[0]: r for r in rows(repetition_metrics(df), "doc_id")}
        assert out[1][3] > out[2][3]  # top_word_frac_e6
        assert out[1][5] > out[2][5]  # top_bigram_frac_e6


class TestQuantizeInt8:
    def test_known_vector(self, spark):
        df = spark.createDataFrame(
            [(1, 0, [1.0, -2.0, 4.0, 0.5])], ["vec_id", "label", "embedding"]
        )
        [r] = quantize_int8(df).collect()
        scale = 127.0 / 4.0  # 31.75
        q = [math.floor(x * scale + 0.5) for x in [1.0, -2.0, 4.0, 0.5]]
        assert q == [32, -63, 127, 16]  # -63: floor(-63.5+0.5) = -63
        assert r["scale_e6"] == math.floor(scale * 1e6)
        assert r["q_sum"] == sum(q)
        assert r["q_norm"] == sum(x * x for x in q)
        err = max(abs(qi / scale - x) for qi, x in zip(q, [1.0, -2.0, 4.0, 0.5]))
        assert r["max_err_e9"] == math.floor(err * 1e9)

    def test_error_bounded_by_half_step(self, spark):
        import random

        rng = random.Random(7)
        data = [
            (i, 0, [rng.uniform(-3, 3) for _ in range(16)]) for i in range(50)
        ]
        df = spark.createDataFrame(data, ["vec_id", "label", "embedding"])
        out = quantize_int8(df).collect()
        assert len(out) == 50
        scales = {r["vec_id"]: r["scale_e6"] / 1e6 for r in out}
        for r in out:
            # |dequant - x| <= 1/(2*scale) (+ float32 storage rounding slop)
            bound = 1.0 / (2.0 * scales[r["vec_id"]]) * 1.001 + 1e-6
            assert r["max_err_e9"] / 1e9 <= bound

    def test_zero_vector_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, 0, [0.0, 0.0]), (2, 0, [1.0, 0.0])],
            ["vec_id", "label", "embedding"],
        )
        assert [r["vec_id"] for r in quantize_int8(df).collect()] == [2]


# ---------------------------------------------------------------------------
# Differential property tests: hypothesis-generated inputs through BOTH
# the Spark operator and the DuckDB oracle formulation must agree
# bit-exactly — including Unicode whitespace (U+00A0 is NOT a token
# separator for Java/RE2 \s) and adversarial float magnitudes.

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

DIFF_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

O_REPETITION_ON_DF = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS ws
  FROM docs_pd
),
grams AS (
  SELECT doc_id, 1 AS k, unnest(ws) AS g FROM toks
  UNION ALL
  SELECT doc_id, 2 AS k,
         unnest(list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i + 1])) AS g
  FROM toks
),
c AS (SELECT doc_id, k, g, count(*) AS cnt FROM grams GROUP BY doc_id, k, g)
SELECT doc_id,
  CAST(sum(CASE WHEN k = 1 THEN cnt END) AS BIGINT) AS n_words,
  CAST(count(CASE WHEN k = 1 THEN 1 END) AS BIGINT) AS n_distinct_words,
  CAST(floor(1e6 * max(CASE WHEN k = 1 THEN cnt END) / sum(CASE WHEN k = 1 THEN cnt END)) AS BIGINT) AS top_word_frac_e6,
  CAST(floor(1e6 * count(CASE WHEN k = 1 THEN 1 END) / sum(CASE WHEN k = 1 THEN cnt END)) AS BIGINT) AS distinct_ratio_e6,
  CAST(CASE WHEN coalesce(sum(CASE WHEN k = 2 THEN cnt END), 0) > 0
       THEN floor(1e6 * max(CASE WHEN k = 2 THEN cnt END) / sum(CASE WHEN k = 2 THEN cnt END))
       ELSE 0 END AS BIGINT) AS top_bigram_frac_e6
FROM c GROUP BY doc_id ORDER BY doc_id
"""

TEXTS = st.lists(
    st.text(alphabet="ab .\t !", max_size=24), min_size=1, max_size=5
)


@given(texts=TEXTS)
@DIFF_SETTINGS
def test_repetition_matches_duckdb(spark, texts):
    docs = [(i, t) for i, t in enumerate(texts)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(tuple(r) for r in repetition_metrics(sdf).collect())

    con = duckdb.connect()
    docs_pd = pd.DataFrame(docs, columns=["doc_id", "text"])
    con.register("docs_pd", docs_pd)
    want = [tuple(r) for r in con.execute(O_REPETITION_ON_DF).fetchall()]
    assert got == want


VEC_ELEMS = st.integers(min_value=-8000, max_value=8000).map(
    lambda i: i * 0.125  # exact binary fractions; |v| <= 1000
)


@given(
    vecs=st.lists(
        st.lists(VEC_ELEMS, min_size=1, max_size=5), min_size=1, max_size=6
    )
)
@DIFF_SETTINGS
def test_quantize_matches_duckdb(spark, vecs):
    rows = [(i, 0, v) for i, v in enumerate(vecs)]
    sdf = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>"
    )
    got = sorted(tuple(r) for r in quantize_int8(sdf).collect())

    con = duckdb.connect()
    emb_pd = pd.DataFrame(rows, columns=["vec_id", "label", "embedding"])
    con.register("embeddings", emb_pd)
    from __spark_entry__ import O_QUANTIZE

    want = sorted(
        tuple(r) for r in con.execute(O_QUANTIZE).fetchall()
    )
    assert got == want


@given(
    keys=st.lists(st.integers(min_value=0, max_value=10**9), unique=True, min_size=1, max_size=40),
)
@DIFF_SETTINGS
def test_split_assignment_matches_duckdb(spark, keys):
    sdf = spark.createDataFrame([(k,) for k in keys], "k long")
    got = dict(
        (r["k"], r["s"])
        for r in sdf.select("k", split_assignment(sdf["k"]).alias("s")).collect()
    )
    con = duckdb.connect()
    keys_pd = pd.DataFrame({"k": keys})
    con.register("keys_pd", keys_pd)
    want = dict(
        con.execute(
            """
            SELECT k,
                   CASE WHEN substr(md5(CAST(k AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
                        WHEN substr(md5(CAST(k AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
                        ELSE 'test' END
            FROM keys_pd
            """
        ).fetchall()
    )
    assert got == want


# Differential property tests for the sketch operators: the entry
# oracles run verbatim on a hypothesis-generated `documents` view while
# the operators run on the same rows in Spark — any tokenizer, hash, or
# banding disagreement on adversarial text (Unicode whitespace,
# repeated tokens, short docs) surfaces as a mismatch.

DOCS = st.lists(
    st.text(alphabet="abc .\t! ", max_size=30), min_size=1, max_size=6
)


def _docs_duckdb(texts):
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(
            [(i, t) for i, t in enumerate(texts)], columns=["doc_id", "text"]
        ),
    )
    return con


def _docs_spark(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


@given(texts=DOCS)
@DIFF_SETTINGS
def test_minhash_lsh_pairs_match_duckdb(spark, texts):
    import __spark_entry__ as entry
    from kamu_cli_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )

    sig = minhash_signature(_docs_spark(spark, texts), "doc_id", num_hashes=16, shingle_n=3)
    got = sorted(
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            sig, "doc_id", num_hashes=16, bands=4, max_bucket_size=64
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in _docs_duckdb(texts)
        .execute(entry.oracle_sql()["documents_minhash_lsh"])
        .fetchall()
    )
    assert got == want


@given(texts=DOCS)
@DIFF_SETTINGS
def test_winnow_matches_duckdb(spark, texts):
    import __spark_entry__ as entry
    from kamu_cli_spark.operators.dedup import winnow_fingerprints

    got = sorted(
        (r["id"], r["fp"])
        for r in winnow_fingerprints(
            _docs_spark(spark, texts), "doc_id", shingle_n=3, window=4
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in _docs_duckdb(texts)
        .execute(entry.oracle_sql()["documents_winnow"])
        .fetchall()
    )
    assert got == want


@given(texts=DOCS)
@DIFF_SETTINGS
def test_simhash_matches_duckdb(spark, texts):
    import __spark_entry__ as entry
    from kamu_cli_spark.operators.dedup import simhash

    got = sorted(
        (r["doc_id"], r["simhash"])
        for r in simhash(_docs_spark(spark, texts), "doc_id").collect()
    )
    want = sorted(
        tuple(r)
        for r in _docs_duckdb(texts)
        .execute(entry.oracle_sql()["documents_simhash"])
        .fetchall()
    )
    assert got == want


class TestContamination:
    def test_known_overlap(self, spark):
        from kamu_cli_spark.operators.dedup import contamination_check

        train = spark.createDataFrame(
            [
                (1, "a b c d"),      # grams: "a b c","b c d" -> 1 of 2 hit
                (2, "x y z w"),      # no overlap
                (3, "a b c"),        # 1 of 1 hit
            ],
            "doc_id long, text string",
        )
        ev = spark.createDataFrame([(100, "q a b c q")], "doc_id long, text string")
        out = {
            r["doc_id"]: (r["n_grams"], r["contaminated"], r["contamination_e6"])
            for r in contamination_check(train, ev, "doc_id").collect()
        }
        assert out[1] == (2, 1, 500_000)
        assert out[2] == (2, 0, 0)
        assert out[3] == (1, 1, 1_000_000)

    def test_short_docs_excluded(self, spark):
        from kamu_cli_spark.operators.dedup import contamination_check

        train = spark.createDataFrame(
            [(1, "a b"), (2, "a b c")], "doc_id long, text string"
        )
        ev = spark.createDataFrame([(9, "zz zz zz")], "doc_id long, text string")
        ids = [r["doc_id"] for r in contamination_check(train, ev, "doc_id").collect()]
        assert ids == [2]  # <3 tokens -> no 3-grams -> no row


@given(texts=st.lists(st.text(alphabet="ab c", max_size=25), min_size=2, max_size=8))
@DIFF_SETTINGS
def test_contamination_matches_duckdb(spark, texts):
    import __spark_entry__ as entry
    from kamu_cli_spark.operators.dedup import contamination_check
    from pyspark.sql import functions as F

    sdf = _docs_spark(spark, texts)
    got = sorted(
        tuple(r)
        for r in contamination_check(
            sdf.where(F.col("doc_id") % 97 != 0),
            sdf.where(F.col("doc_id") % 97 == 0),
            "doc_id",
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in _docs_duckdb(texts)
        .execute(entry.oracle_sql()["documents_contamination"])
        .fetchall()
    )
    assert got == want


class TestPackSequences:
    def test_contiguous_fill(self, spark):
        from kamu_cli_spark.operators.sampling import pack_sequences

        # one bucket; budget 5 tokens; docs of 3/3/4 tokens pack as:
        # doc0 starts at cum 0 -> seq 0; doc1 starts at 3 -> seq 0;
        # doc2 starts at 6 -> seq 1
        df = spark.createDataFrame(
            [(0, "a b c"), (1, "d e f"), (2, "g h i j")],
            "doc_id long, text string",
        )
        out = {
            (r["bucket"], r["seq_in_bucket"]): (
                r["n_docs"],
                r["n_tokens"],
                r["first_doc"],
                r["last_doc"],
            )
            for r in pack_sequences(
                df, "doc_id", seq_len=5, buckets=1
            ).collect()
        }
        assert out == {(0, 0): (2, 6, 0, 1), (0, 1): (1, 4, 2, 2)}

    def test_buckets_pack_independently(self, spark):
        from kamu_cli_spark.operators.sampling import pack_sequences

        df = spark.createDataFrame(
            [(i, "w " * 10) for i in range(20)], "doc_id long, text string"
        )
        rows = pack_sequences(df, "doc_id", seq_len=25, buckets=2).collect()
        # 10 docs x 10 tokens per bucket -> sequences of sizes 30,30,30,10?
        # docs start at cum 0,10,20,30.. -> seq = start//25: 0,0,0,1,1,2,2,3,3,3
        per_bucket = {}
        for r in rows:
            per_bucket.setdefault(r["bucket"], []).append(r["n_docs"])
        assert set(per_bucket) == {0, 1}
        for counts in per_bucket.values():
            assert sorted(counts) == [2, 2, 3, 3]

    def test_total_tokens_preserved(self, spark):
        from kamu_cli_spark.operators.sampling import pack_sequences
        from kamu_cli_spark.operators.text import token_count
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(i, "tok " * (i % 7 + 1)) for i in range(50)],
            "doc_id long, text string",
        )
        packed = pack_sequences(df, "doc_id", seq_len=8, buckets=4)
        total_packed = packed.agg(F.sum("n_tokens")).collect()[0][0]
        total_direct = df.select(
            F.sum(token_count(F.col("text")))
        ).collect()[0][0]
        assert total_packed == total_direct
        assert packed.agg(F.sum("n_docs")).collect()[0][0] == 50


def test_dedup_against_drops_reference_matches(spark):
    """Cross-corpus exact dedup: crawl docs whose normalized text
    appears in the reference are dropped; whitespace/case variants
    still match (fingerprint normalization)."""
    from kamu_cli_spark.operators.dedup import dedup_against

    corpus = spark.createDataFrame(
        [(1, "Hello  World"), (2, "unique crawl doc"), (3, "another one")],
        "doc_id int, text string",
    )
    reference = spark.createDataFrame(
        [(100, "hello world"), (101, "another  ONE ")],
        "doc_id int, text string",
    )
    kept = sorted(
        r["doc_id"] for r in dedup_against(corpus, reference).collect()
    )
    assert kept == [2]


def test_lsh_cross_candidates_finds_near_dups_across_corpora(spark):
    from kamu_cli_spark.operators.dedup import (
        lsh_cross_candidates,
        minhash_signature,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    corpus = spark.createDataFrame(
        [(1, base + " extra"), (2, "completely different text about spark sql")],
        "doc_id int, text string",
    )
    reference = spark.createDataFrame(
        [(100, base), (101, "nothing like the others at all here")],
        "doc_id int, text string",
    )
    sig_c = minhash_signature(corpus, "doc_id", num_hashes=16, shingle_n=3)
    sig_r = minhash_signature(reference, "doc_id", num_hashes=16, shingle_n=3)
    pairs = {
        (r["corpus_id"], r["ref_id"])
        for r in lsh_cross_candidates(sig_c, sig_r, "doc_id").collect()
    }
    assert (1, 100) in pairs          # near-dup across corpora
    assert all(p[0] != 2 for p in pairs)  # unrelated doc pairs with nothing


def test_embedding_cross_neardup_finds_planted_pair(spark):
    """A crawl vector nearly identical to a reference vector must
    surface through the shared LSH buckets; orthogonal vectors must
    not."""
    from kamu_cli_spark.operators.similarity import embedding_cross_neardup

    dim = 64
    base = [1.0 if i % 3 == 0 else 0.5 for i in range(dim)]
    near = list(base)
    near[0] += 0.01  # cosine ~ 0.99998
    ortho = [(-1.0) ** i * (1.0 + i / dim) for i in range(dim)]
    crawl = spark.createDataFrame(
        [(1, near), (2, ortho)], "vec_id int, embedding array<double>"
    )
    ref = spark.createDataFrame(
        [(100, base)], "vec_id int, embedding array<double>"
    )
    got = {
        (r["crawl_id"], r["ref_id"])
        for r in embedding_cross_neardup(
            crawl, ref, "vec_id", threshold=0.95, num_planes=4
        ).collect()
    }
    assert got == {(1, 100)}
