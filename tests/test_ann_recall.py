"""Recall floors for the ANN family (round-9 VERDICT #4): the graded
probe budgets' recall@5 vs exact brute-force cosine is measured in
BENCH_NOTES (depth-3 0.41 at sf0.1) but nothing asserted it — a perf
tweak could silently trade recall for speed. Floors sit ~30% under the
values measured at round-9 close (sf0.001 / sf0.01: ivf_ann 0.27/0.30,
ivf_ann3 0.63/0.73, ann_lsh 0.15/0.08), so they trip on structural
regressions, not noise (everything here is deterministic — the only
'noise' is data-shape drift between SFs)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _recall_at_5(spark, sf_dir: str, ann_name: str) -> float:
    import __spark_entry__ as entry

    qs = entry.queries()
    exact = qs["embeddings_cosine_topk"](spark, sf_dir).collect()
    ann = qs[ann_name](spark, sf_dir).collect()

    def by_query(rows):
        d: dict = {}
        for r in rows:
            d.setdefault(r["qid"], set()).add(r["cid"])
        return d

    ex, an = by_query(exact), by_query(ann)
    hits = sum(len(ex[q] & an.get(q, set())) for q in ex)
    return hits / sum(len(ex[q]) for q in ex)


# (query, floor): deterministic pipelines, so a miss means the
# operator's candidate generation changed shape, not a flaky run
FLOORS = [
    ("embeddings_ivf_ann", 0.18),
    ("embeddings_ivf_ann3", 0.45),
    ("embeddings_ann_lsh", 0.05),
]


@pytest.mark.parametrize("name,floor", FLOORS)
@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
def test_ann_recall_floor(spark, sf_dir, name, floor):
    r = _recall_at_5(spark, sf_dir, name)
    assert r >= floor, f"{name} recall@5={r:.3f} < floor {floor} at {sf_dir}"
