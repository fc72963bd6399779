"""BM25 retrieval (operators/retrieval.py): exact-integer scoring
pinned against a pure-Python reference, edge validation, and the
plan-shape contract (no cartesian product, no per-doc explode for tf,
no Python row UDF)."""

from __future__ import annotations

import pytest

from kamu_cli_spark.operators.retrieval import bm25_topk

DOCS = [
    (0, "spark fast spark join table"),
    (1, "hash join hash join hash"),
    (2, "window stream batch window"),
    (3, "slow table scan slow slow"),
    (4, "spark spark spark spark spark"),
    (5, "the a the a the"),
    (6, ""),
    (7, "join"),
]
QUERIES = [(0, ["spark", "join"]), (1, ["slow"]), (2, ["window", "batch"])]


def _ref_bm25(docs, queries, k):
    toks = {i: t.lower().split() for i, t in docs}
    dls = {i: len(w) for i, w in toks.items()}
    n = len(docs)
    s = sum(dls.values())
    vocab = sorted({t for _, ts in queries for t in ts})
    tf = {
        (i, t): sum(1 for x in w if x == t)
        for i, w in toks.items()
        for t in vocab
    }
    df = {t: sum(1 for i, _ in docs if tf[(i, t)] > 0) for t in vocab}
    out = []
    for qid, terms in queries:
        scores = {}
        hits = {}
        for i, _ in docs:
            sc = 0
            h = 0
            for t in terms:
                f = tf[(i, t)]
                if f == 0:
                    continue
                h += 1
                idf = (1000 * (2 * n - 2 * df[t] + 1)) // (2 * df[t] + 1)
                t2 = (9 * dls[i] * n) // s
                sc += idf * ((22 * f * 1000000) // (10 * f + 3 + t2))
            if h:
                scores[i] = sc
                hits[i] = h
        ranked = sorted(scores, key=lambda i: (-scores[i], i))[:k]
        out.extend(
            (qid, i, r + 1, hits[i], scores[i]) for r, i in enumerate(ranked)
        )
    return sorted(out)


def test_bm25_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in bm25_topk(df, QUERIES, k=3).collect()
    )
    assert got == _ref_bm25(DOCS, QUERIES, 3)


def test_bm25_rank_ties_break_by_doc_id(spark):
    # identical docs -> identical scores; ranks must follow doc_id
    df = spark.createDataFrame(
        [(i, "spark table") for i in range(5)], "doc_id long, text string"
    )
    got = bm25_topk(df, [(0, ["spark"])], k=5).orderBy("rank").collect()
    assert [r["doc_id"] for r in got] == [0, 1, 2, 3, 4]
    assert len({r["score_e9"] for r in got}) == 1


def test_bm25_empty_queries_raises(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, [])


def test_bm25_plan_shape(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        bm25_topk(df, QUERIES, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan  # Arrow kernel, not a row UDF
    # scoring is closure-side: no exploded token stream, no data-sized
    # join, no score shuffle — the only exchange feeds the top-k window
    assert "Generate explode" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert plan.count("Exchange") <= 2  # window partition (+AQE read)


def _run_stream(spark, tmp_path, docs, op, name):
    src = tmp_path / "crawl"
    src.mkdir()
    docs.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(docs.schema).parquet(str(src))
    out = op(stream)
    assert out.isStreaming
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


def test_bm25_score_streams_match_batch(spark, tmp_path):
    """The live-crawl relevance gate: bm25_score against a FIXED
    corpus-stats artifact is a stateless Arrow map and must score a
    streaming crawl bit-identically to the batch path."""
    from kamu_cli_spark.operators.retrieval import (
        bm25_corpus_stats,
        bm25_score,
    )

    corpus = spark.createDataFrame(DOCS, "doc_id long, text string")
    stats = bm25_corpus_stats(corpus, QUERIES)
    crawl = spark.createDataFrame(
        [(100, "spark join window"), (101, "slow batch"), (102, "the a")],
        "doc_id long, text string",
    )
    got = _run_stream(
        spark,
        tmp_path,
        crawl,
        lambda s: bm25_score(s, QUERIES, stats),
        f"bm25_{abs(hash(str(tmp_path))) % 10**9}",
    )
    want = {tuple(r) for r in bm25_score(crawl, QUERIES, stats).collect()}
    assert got == want and len(got) > 0


def _ref_bm25_ln(docs, queries, k):
    import math

    toks = {i: t.lower().split() for i, t in docs}
    dls = {i: len(w) for i, w in toks.items()}
    n = len(docs)
    s = sum(dls.values())
    vocab = sorted({t for _, ts in queries for t in ts})
    tf = {
        (i, t): sum(1 for x in w if x == t)
        for i, w in toks.items()
        for t in vocab
    }
    df = {t: sum(1 for i, _ in docs if tf[(i, t)] > 0) for t in vocab}
    out = []
    for qid, terms in queries:
        scores, hits = {}, {}
        for i, _ in docs:
            sc, h = 0.0, 0
            for t in terms:
                f = tf[(i, t)]
                if f == 0:
                    continue
                h += 1
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                denom = f + 1.2 * 0.25 + 1.2 * 0.75 * n / s * dls[i]
                sc += idf * (f * 2.2 / denom)
            if h:
                scores[i], hits[i] = sc, h
        ranked = sorted(scores, key=lambda i: (-scores[i], i))[:k]
        out.extend(
            (qid, i, r + 1, hits[i], scores[i]) for r, i in enumerate(ranked)
        )
    return sorted(out)


def test_bm25_ln_mode_matches_reference(spark):
    got = sorted(
        tuple(r)
        for r in bm25_topk(
            spark.createDataFrame(DOCS, "doc_id long, text string"),
            QUERIES,
            k=3,
            idf_mode="ln",
        ).collect()
    )
    want = _ref_bm25_ln(DOCS, QUERIES, 3)
    assert [g[:4] for g in got] == [w[:4] for w in want]
    for g, w in zip(got, want):
        assert g[4] == pytest.approx(w[4], rel=1e-12)


def test_bm25_ln_single_term_ranking_matches_exact_mode(spark):
    # the rational surrogate is monotone in df/tf, so SINGLE-term
    # rankings must agree between modes (the documented equivalence)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    q = [(0, ["spark"]), (1, ["join"])]
    a = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in bm25_topk(df, q, k=4).collect()
    }
    b = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in bm25_topk(df, q, k=4, idf_mode="ln").collect()
    }
    assert a == b


def test_bm25_ln_matches_duckdb_oracle(spark):
    """Cross-engine float-tolerance pin (the eigh/covariance
    precedent): the ln mode over REAL testdata must match a DuckDB
    ln() oracle computing the identical Lucene-smoothed formula."""
    import duckdb

    queries = [(0, ["the", "model"]), (1, ["data", "training", "with"])]
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        (r["query_id"], r["doc_id"]): (r["rank"], r["n_terms_hit"], r["score"])
        for r in bm25_topk(docs, queries, k=10, idf_mode="ln").collect()
    }
    vals = ", ".join(
        f"({qid}, '{t}')" for qid, ts in queries for t in ts
    )
    sql = rf"""
WITH q(query_id, term) AS (VALUES {vals}),
d AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS w
  FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
),
dl AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS dl FROM d),
st AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS s FROM dl
),
tf AS (
  SELECT dl.doc_id, dl.dl, v.term,
         CAST(len(list_filter(dl.w, x -> x = v.term)) AS BIGINT) AS tf
  FROM dl CROSS JOIN (SELECT DISTINCT term FROM q) v
),
tfp AS (SELECT * FROM tf WHERE tf > 0),
dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfp GROUP BY 1),
sc AS (
  SELECT qq.query_id, p.doc_id,
         CAST(count(*) AS BIGINT) AS n_terms_hit,
         sum(
           ln(1 + (st.n - c.df + 0.5) / (c.df + 0.5))
           * (p.tf * 2.2 / (p.tf + 1.2 * 0.25 + 1.2 * 0.75 * st.n / st.s * p.dl))
         ) AS score
  FROM tfp p JOIN dfc c USING (term) JOIN q qq USING (term)
  CROSS JOIN st
  GROUP BY 1, 2
)
SELECT query_id, doc_id, rn AS rank, n_terms_hit, score
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, doc_id
  ) AS rn FROM sc
)
WHERE rn <= 10
"""
    want = {
        (int(q), int(d)): (int(rn), int(h), float(s))
        for q, d, rn, h, s in duckdb.connect().execute(sql).fetchall()
    }
    assert set(got) == set(want)
    for key, (rn, h, s) in want.items():
        grn, gh, gs = got[key]
        assert (grn, gh) == (rn, h), (key, got[key], want[key])
        assert gs == pytest.approx(s, rel=1e-9)


def test_bm25_ln_empty_corpus_stats_raises(spark):
    from kamu_cli_spark.operators.retrieval import bm25_score
    # ADVICE r13: idf_mode='ln' computes avgdl eagerly at the driver;
    # stats fitted on an all-empty-text corpus (s_tokens == 0) must
    # raise a clear ValueError, not ZeroDivisionError
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    stats = {"n_docs": 3, "s_tokens": 0, "dfreq": {"x": 1}}
    with pytest.raises(ValueError, match="s_tokens"):
        bm25_score(df, [(0, ["x"])], stats, idf_mode="ln")
    # the exact_int path only divides lazily for docs with tokens and
    # keeps working (empty-text docs emit nothing)
    assert (
        bm25_score(
            spark.createDataFrame([(0, "")], "doc_id long, text string"),
            [(0, ["x"])],
            stats,
        ).count()
        == 0
    )
