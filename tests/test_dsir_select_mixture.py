"""dsir_select (operators/text.py) and mixture_rebalance
(operators/sampling.py): selection semantics pinned against pure-Python
replays, tie handling, budget isolation between strata, and input
validation."""

from __future__ import annotations

import hashlib

import pytest

from kamu_cli_spark.operators.sampling import mixture_rebalance
from kamu_cli_spark.operators.text import dsir_select, dsir_weights

CRAWL = [
    (1, "spark fast table join query"),
    (2, "slow scan slow scan slow scan"),
    (4, "spark fast join query spark fast"),
    (5, "the a the a the a the"),
    (7, "window stream batch window stream"),
    (8, "spark fast query join table window"),
]
TARGET = [
    (100, "spark fast join query"),
    (101, "spark fast table join"),
    (102, "query join spark fast"),
]


def test_dsir_select_is_tie_inclusive_threshold(spark):
    crawl = spark.createDataFrame(CRAWL, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    w = {
        r["doc_id"]: r["dsir_weight_e6"]
        for r in dsir_weights(crawl, target).collect()
    }
    got = dsir_select(crawl, target, keep_num=1, keep_den=3).collect()
    n_keep = (len(w) * 1 + 3 - 1) // 3
    threshold = sorted(w.values(), reverse=True)[n_keep - 1]
    expect = {i for i, v in w.items() if v >= threshold}
    assert {r["doc_id"] for r in got} == expect
    assert all(r["threshold_e6"] == threshold for r in got)
    assert len(got) >= n_keep  # ties only ever ADD members


def test_dsir_select_keep_all(spark):
    crawl = spark.createDataFrame(CRAWL, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    got = dsir_select(crawl, target, keep_num=1, keep_den=1).collect()
    assert len(got) == len(CRAWL)


def test_dsir_select_validates_fraction(spark):
    crawl = spark.createDataFrame(CRAWL, "doc_id long, text string")
    target = spark.createDataFrame(TARGET, "doc_id long, text string")
    with pytest.raises(ValueError):
        dsir_select(crawl, target, keep_num=3, keep_den=2)
    with pytest.raises(ValueError):
        dsir_select(crawl, target, keep_num=0, keep_den=4)


def _mix_docs(n=400, sources=4):
    # doc i: source round-robin, i%7+1 tokens
    return [
        (i, f"s{i % sources}", " ".join(f"w{j}" for j in range(i % 7 + 1)))
        for i in range(n)
    ]


def _ref_mixture(docs, weights, num, den):
    wt = sum(weights.values())
    rows = [
        (i, s, len(t.split()), hashlib.md5(str(i).encode()).hexdigest())
        for i, s, t in docs
        if s in weights
    ]
    total = sum(r[2] for r in rows)
    budget = (total * num) // den
    kept = set()
    for s, w in weights.items():
        bs = (budget * w) // wt
        cum = 0
        for i, src, tok, _h in sorted(
            (r for r in rows if r[1] == s), key=lambda r: (r[3], r[0])
        ):
            if cum < bs:
                kept.add(i)
            cum += tok
    return kept


def test_mixture_matches_pure_python_greedy(spark):
    docs = _mix_docs()
    weights = {"s0": 3, "s1": 1, "s2": 1}  # s3 out of mix
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = mixture_rebalance(df, weights, budget_num=1, budget_den=2).collect()
    assert {r["doc_id"] for r in got} == _ref_mixture(docs, weights, 1, 2)
    assert all(r["source"] != "s3" for r in got)


def test_mixture_strata_are_isolated(spark):
    # adding documents to one stratum must not change another's picks
    weights = {"s0": 1, "s1": 1}
    base = [(i, "s0", "a b c") for i in range(50)] + [
        (100 + i, "s1", "a b c d") for i in range(50)
    ]
    grown = base + [(1000 + i, "s1", "x y") for i in range(200)]
    df_a = spark.createDataFrame(base, "doc_id long, source string, text string")
    df_b = spark.createDataFrame(grown, "doc_id long, source string, text string")
    s0_a = {
        r["doc_id"]
        for r in mixture_rebalance(df_a, weights, 1, 4).collect()
        if r["source"] == "s0"
    }
    # NOTE: the GLOBAL budget grows with s1's tokens, so exact
    # isolation holds for the ORDER of picks, not the count — replay
    # the reference on the grown corpus instead
    got_b = {
        r["doc_id"]
        for r in mixture_rebalance(df_b, weights, 1, 4).collect()
    }
    assert got_b == _ref_mixture(
        [(i, s, t) for i, s, t in grown], weights, 1, 4
    )
    assert s0_a == _ref_mixture(base, weights, 1, 4) & {
        i for i, s, _ in base if s == "s0"
    }


def test_mixture_validates_inputs(spark):
    df = spark.createDataFrame(
        _mix_docs(20), "doc_id long, source string, text string"
    )
    with pytest.raises(ValueError):
        mixture_rebalance(df, {}, 1, 2)
    with pytest.raises(ValueError):
        mixture_rebalance(df, {"s0": 0}, 1, 2)
    with pytest.raises(ValueError):
        mixture_rebalance(df, {"s0": 1}, 3, 2)


def test_mixture_edge_bucket_only_sort(spark):
    # plan contract: the data-sized window runs only on the edge
    # bucket; the kept-whole path has no Window at all
    docs = _mix_docs(200, sources=2)
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    # materialize=False keeps the full lineage visible to the asserts
    plan = (
        mixture_rebalance(df, {"s0": 1, "s1": 1}, 1, 2, materialize=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    # the per-doc window partitions on (stratum, BUCKET) — the local
    # 1/65536-of-a-stratum sort, never a stratum-sized one
    specs = [
        seg.split(")")[0]
        for seg in plan.split("windowspecdefinition(")[1:]
    ]
    assert any("source#" in s and "__b#" in s for s in specs), specs


def _ref_influence(docs):
    from collections import Counter

    bs = Counter()
    nd = Counter()
    for _i, s, t in docs:
        nd[s] += 1
        w = t.lower().split()
        for a, b in zip(w, w[1:]):
            bs[(s, a, b)] += 1
    tot = Counter()
    tsrc = Counter()
    for (s, a, b), c in bs.items():
        tot[(a, b)] += c
        tsrc[(s, a)] += c
    tglob = Counter()
    for (s, a), c in tsrc.items():
        tglob[a] += c
    out = {}
    for s in nd:
        nb = ws = wl = 0
        for (s2, a, b), c in bs.items():
            if s2 != s:
                continue
            nb += c
            ws += c * ((1000000 * c) // tsrc[(s, a)])
            loo_t = tglob[a] - tsrc[(s, a)]
            if loo_t > 0:
                wl += c * ((1000000 * (tot[(a, b)] - c)) // loo_t)
        out[s] = (
            nd[s],
            nb,
            ws // nb if nb else 0,
            wl // nb if nb else 0,
            (ws // nb - wl // nb) if nb else 0,
        )
    return out


def test_source_influence_matches_reference_and_ranks_unique_idiom(spark):
    from kamu_cli_spark.operators.text import source_lm_influence

    docs = (
        # sA and sB share idiom; sC is unique gibberish
        [(i, "sA", "the cat sat on the mat again and again") for i in range(4)]
        + [(10 + i, "sB", "the cat sat on the red mat") for i in range(4)]
        + [(20 + i, "sC", f"zq{i} xv{i} qq{i} zq{i} xv{i}") for i in range(3)]
        + [(30, "sD", "one")]  # no bigrams at all
    )
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = {
        r["source"]: (
            r["n_docs"],
            r["n_bigrams"],
            r["self_fam_e6"],
            r["loo_fam_e6"],
            r["influence_e6"],
        )
        for r in source_lm_influence(df).collect()
    }
    assert got == _ref_influence(docs)
    # the rest of the corpus predicts shared idiom, not unique idiom
    assert got["sC"][3] < got["sA"][3]
    assert got["sC"][3] < got["sB"][3]
    # zero-bigram source still emits a row with zeroed LM columns
    assert got["sD"] == (1, 0, 0, 0, 0)


def test_gram_saturation_matches_reference_and_decays(spark):
    """gram_saturation: first-seen attribution per id-decile pinned
    against a pure-Python replay; a corpus whose tail repeats the
    head's text must show novelty collapsing toward zero."""
    from kamu_cli_spark.operators.dedup import gram_saturation

    import pytest as _pytest

    # 40 docs: ids 0-9 unique text, 10-39 repeat doc (id%10)'s text
    base = [f"u{i}a u{i}b u{i}c u{i}d u{i}e" for i in range(10)]
    docs = [(i, base[i % 10]) for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["bucket"]: (r["n_windows"], r["n_new_grams"], r["novelty_e6"])
        for r in gram_saturation(df, n_buckets=4, shingle_n=3).collect()
    }

    # pure-Python replay
    first = {}
    wins = {}
    news = {}
    denom = 40
    for i, t in docs:
        w = t.lower().split()
        b = (i * 4) // denom
        for j in range(len(w) - 2):
            gram = " ".join(w[j : j + 3])
            wins[b] = wins.get(b, 0) + 1
            if gram not in first:
                first[gram] = i
    for gram, fid in first.items():
        b = (fid * 4) // denom
        news[b] = news.get(b, 0) + 1
    want = {
        b: (wins[b], news.get(b, 0), (1000000 * news.get(b, 0)) // wins[b])
        for b in wins
    }
    assert got == want
    # all grams first-seen in bucket 0; later buckets pure repeats
    assert got[0][2] == 1_000_000
    assert got[1][2] == got[2][2] == got[3][2] == 0

    with _pytest.raises(ValueError):
        gram_saturation(df.filter("doc_id < 0"))
