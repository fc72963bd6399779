"""PMI collocation mining (text.py:collocations): pinned against a
pure-Python reference, min-count floor, deterministic tie-break, and
the all-JVM plan shape (no Python eval anywhere)."""

from __future__ import annotations

from collections import Counter

from kamu_cli_spark.operators.text import collocations

DOCS = [
    (0, "new york is big and new york is loud"),
    (1, "san francisco and new york"),
    (2, "the bay near san francisco"),
    (3, "york new york new"),
    (4, ""),
    (5, "solo"),
]


def _ref(docs, min_count, top_k):
    uni: Counter = Counter()
    pairs: Counter = Counter()
    for _, t in docs:
        w = t.lower().split()
        uni.update(w)
        pairs.update(zip(w, w[1:]))
    n = sum(uni.values())
    out = []
    for (w1, w2), np_ in pairs.items():
        if np_ < min_count:
            continue
        out.append(
            (
                w1, w2, np_, uni[w1], uni[w2],
                (np_ * n * 1_000_000) // (uni[w1] * uni[w2]),
            )
        )
    out.sort(key=lambda r: (-r[5], r[0], r[1]))
    return out[:top_k]


def _mk(spark, docs=DOCS):
    return spark.createDataFrame(docs, "doc_id long, text string")


def test_matches_reference(spark):
    got = [
        tuple(r) for r in collocations(_mk(spark), min_count=2, top_k=10).collect()
    ]
    assert got == _ref(DOCS, 2, 10)


def test_min_count_floors_hapax_pairs(spark):
    # min_count=1 admits single-occurrence pairs; the default floor
    # drops them (PMI's hapax pathology)
    low = collocations(_mk(spark), min_count=1, top_k=100).collect()
    high = collocations(_mk(spark), min_count=2, top_k=100).collect()
    assert len(low) > len(high)
    assert all(r["n_pair"] >= 2 for r in high)


def test_high_pmi_pair_ranks_first(spark):
    # "san francisco" always co-occurs (2 of 2 for both words) while
    # "new york" words also appear apart -> san francisco ranks higher
    got = collocations(_mk(spark), min_count=2, top_k=3).collect()
    assert (got[0]["w1"], got[0]["w2"]) == ("san", "francisco")


def test_plan_is_all_jvm(spark):
    plan = (
        collocations(_mk(spark), min_count=2, top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for forbidden in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas",
                      "CartesianProduct"):
        assert forbidden not in plan, forbidden
    assert "TakeOrderedAndProject" in plan
