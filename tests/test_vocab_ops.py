"""Vocabulary induction, coverage/OOV scoring, and integer-exact
tf-idf (operators/text.py) — semantics + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kamu_cli_spark.operators.text import tfidf_topk, vocab_coverage, vocabulary


def _docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "quantum flux capacitor"),
        (4, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_vocabulary_ranks_by_count_then_token(spark):
    v = vocabulary(_docs(spark), top_k=3)
    got = [(r["token"], r["n"], r["rank"]) for r in v.orderBy("rank").collect()]
    assert got == [("the", 4, 1), ("on", 2, 2), ("sat", 2, 3)]  # tie: on < sat


def test_vocab_coverage_exact_integers(spark):
    d = _docs(spark)
    v = vocabulary(d, top_k=3)  # {the, on, sat}
    cov = {r["doc_id"]: r for r in vocab_coverage(d, v).collect()}
    assert (cov[1]["n_tokens"], cov[1]["in_vocab"]) == (6, 4)
    assert cov[1]["coverage_e6"] == (1_000_000 * 4) // 6
    assert (cov[3]["in_vocab"], cov[3]["coverage_e6"]) == (0, 0)
    assert (cov[4]["n_tokens"], cov[4]["coverage_e6"]) == (0, 0)  # empty doc


def test_tfidf_prefers_rare_terms(spark):
    out = tfidf_topk(_docs(spark), k=2)
    per_doc = {}
    for r in out.collect():
        per_doc.setdefault(r["doc_id"], []).append((r["rank"], r["term"], r["weight_e6"]))
    # doc 3's terms are unique in the corpus: idf_e6 = floor(1e6*(4-1)/4)
    top3 = sorted(per_doc[3])
    assert [t for _, t, _ in top3] == ["capacitor", "flux"]  # tie -> term asc
    assert all(w == 750_000 for _, _, w in top3)
    # 'the' (df=2, tf=2) loses to rarer tf=1 terms in doc 1? weight the:
    # 2*floor(1e6*2/4)=1_000_000 vs cat: 1*750_000 -> 'the' ranks first
    assert per_doc[1][0][1] == "the" if per_doc[1][0][0] == 1 else True
    ranks = sorted(r for r, _, _ in per_doc[1])
    assert ranks == [1, 2]


def test_vocab_plan_shapes(spark):
    """top-k = TakeOrderedAndProject (no global sort of the counts);
    coverage probe broadcasts the vocab."""
    d = _docs(spark)
    v = vocabulary(d, top_k=3)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    cov_plan = (
        vocab_coverage(d, v)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Broadcast" in cov_plan
