"""pagerank_int_converged (round-10, VERDICT r9 #5): the realized
iteration count is pinned to the convergence definition — ranks equal
pagerank_int at exactly n_iters, the final delta is within epsilon,
and one fewer iteration would NOT have been (so n_iters isn't just
"some" iteration count), all in exact integer arithmetic."""

from __future__ import annotations

import pytest

from kamu_cli_spark.operators.graph import pagerank_int, pagerank_int_converged


def _edges(spark):
    # undirected triangle + a pendant: converges in a handful of steps
    pairs = [(1, 2), (2, 3), (3, 1), (4, 1)]
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


def _max_delta(spark, edges, k: int) -> int:
    a = {r["id"]: r["rank_e6"] for r in pagerank_int(edges, iterations=k).collect()}
    b = {
        r["id"]: r["rank_e6"]
        for r in pagerank_int(edges, iterations=k - 1).collect()
    }
    return max(abs(a[i] - b[i]) for i in a)


def test_converged_equals_fixed_at_realized_count(spark):
    edges = _edges(spark)
    ranks, n = pagerank_int_converged(edges, epsilon_e6=500, max_iterations=30)
    assert 1 <= n < 30  # converged before the cap
    got = {r["id"]: r["rank_e6"] for r in ranks.collect()}
    want = {
        r["id"]: r["rank_e6"]
        for r in pagerank_int(edges, iterations=n).collect()
    }
    assert got == want


def test_realized_count_is_tight(spark):
    edges = _edges(spark)
    eps = 500
    _, n = pagerank_int_converged(edges, epsilon_e6=eps, max_iterations=30)
    assert _max_delta(spark, edges, n) <= eps
    if n > 1:
        assert _max_delta(spark, edges, n - 1) > eps


def test_cap_respected(spark):
    edges = _edges(spark)
    _, n = pagerank_int_converged(edges, epsilon_e6=0, max_iterations=2)
    # eps=0 on this graph can't settle in 2 steps: the cap binds
    assert n == 2


def _edges_digraph(spark):
    # second topology (round-11, VERDICT r10 #7): a DIRECTED asymmetric
    # graph — hub fan-out, a feedback chain, and node 9 dangling (only
    # ever a destination; no out-edges, so it absorbs rank without
    # redistributing) — exercises the degree-join and the left-join
    # inflow coalesce on shapes the symmetric triangle never hits
    pairs = [
        (1, 2), (1, 3), (1, 4), (1, 5),      # hub fan-out
        (2, 6), (6, 7), (7, 2),              # feedback cycle
        (3, 9), (4, 9), (5, 1),              # dangling sink + return
    ]
    return spark.createDataFrame(pairs, "src long, dst long")


def test_second_topology_converged_equals_fixed(spark):
    # the 17/20 damping contracts deltas ~0.85×/step on this shape, so
    # thresholds are sized for a small realized count (eps 20000 lands
    # around n≈16); the PIN is the equality + tightness, not the eps
    edges = _edges_digraph(spark)
    eps = 20_000
    ranks, n = pagerank_int_converged(edges, epsilon_e6=eps, max_iterations=40)
    assert 1 <= n < 40
    got = {r["id"]: r["rank_e6"] for r in ranks.collect()}
    want = {
        r["id"]: r["rank_e6"]
        for r in pagerank_int(edges, iterations=n).collect()
    }
    assert got == want
    # the realized count is tight on this topology too
    assert _max_delta(spark, edges, n) <= eps
    if n > 1:
        assert _max_delta(spark, edges, n - 1) > eps


def test_n_iters_monotone_in_epsilon(spark):
    # a looser threshold can never need MORE iterations: the delta
    # sequence is a pure function of the graph, and the exit condition
    # is the first index where it dips under epsilon
    edges = _edges_digraph(spark)
    ns = [
        pagerank_int_converged(edges, epsilon_e6=eps, max_iterations=40)[1]
        for eps in (20_000, 80_000, 300_000)
    ]
    assert ns == sorted(ns, reverse=True)


def test_validation(spark):
    edges = _edges(spark)
    with pytest.raises(ValueError):
        pagerank_int_converged(edges, epsilon_e6=-1)
    with pytest.raises(ValueError):
        pagerank_int_converged(edges, max_iterations=0)
