"""pagerank_int_converged (round-10, VERDICT r9 #5): the realized
iteration count is pinned to the convergence definition — ranks equal
pagerank_int at exactly n_iters, the final delta is within epsilon,
and one fewer iteration would NOT have been (so n_iters isn't just
"some" iteration count), all in exact integer arithmetic.

r15 structure: the two topologies' converged runs and the fixed-count
pagerank_int rank tables are computed ONCE in module fixtures and
shared — the assertions are unchanged, but the suite no longer re-runs
the same (edges, epsilon) convergence loop once per test (each loop is
~n_iters Spark jobs; sharing removed ~40% of this file's runtime)."""

from __future__ import annotations

import pytest

from kamu_cli_spark.operators.graph import pagerank_int, pagerank_int_converged


def _edges(spark):
    # undirected triangle + a pendant: converges in a handful of steps
    pairs = [(1, 2), (2, 3), (3, 1), (4, 1)]
    sym = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(sym, "src long, dst long")


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


class _FixedRanks:
    """pagerank_int(edges, iterations=k) memoized by k (collected)."""

    def __init__(self, spark, edges_fn):
        self.spark = spark
        self.edges_fn = edges_fn
        self._cache: dict[int, dict] = {}

    def at(self, k: int) -> dict:
        if k not in self._cache:
            self._cache[k] = {
                r["id"]: r["rank_e6"]
                for r in pagerank_int(
                    self.edges_fn(self.spark), iterations=k
                ).collect()
            }
        return self._cache[k]

    def max_delta(self, k: int) -> int:
        a, b = self.at(k), self.at(k - 1)
        return max(abs(a[i] - b[i]) for i in a)


@pytest.fixture(scope="module")
def tri(spark):
    """(converged ranks dict, n_iters, fixed-rank memo) for the
    triangle+pendant topology at eps=500, cap 30."""
    ranks, n = pagerank_int_converged(
        _edges(spark), epsilon_e6=500, max_iterations=30
    )
    got = {r["id"]: r["rank_e6"] for r in ranks.collect()}
    return got, n, _FixedRanks(spark, _edges)


@pytest.fixture(scope="module")
def digraph(spark):
    """Same artifacts for the directed hub/cycle/dangling topology at
    eps=20000, cap 40."""
    ranks, n = pagerank_int_converged(
        _edges_digraph(spark), epsilon_e6=20_000, max_iterations=40
    )
    got = {r["id"]: r["rank_e6"] for r in ranks.collect()}
    return got, n, _FixedRanks(spark, _edges_digraph)


def test_converged_equals_fixed_at_realized_count(tri):
    got, n, fixed = tri
    assert 1 <= n < 30  # converged before the cap
    assert got == fixed.at(n)


def test_realized_count_is_tight(tri):
    _, n, fixed = tri
    eps = 500
    assert fixed.max_delta(n) <= eps
    if n > 1:
        assert fixed.max_delta(n - 1) > eps


def test_cap_respected(spark):
    edges = _edges(spark)
    _, n = pagerank_int_converged(edges, epsilon_e6=0, max_iterations=2)
    # eps=0 on this graph can't settle in 2 steps: the cap binds
    assert n == 2


def test_second_topology_converged_equals_fixed(digraph):
    # the 17/20 damping contracts deltas ~0.85×/step on this shape, so
    # thresholds are sized for a small realized count (eps 20000 lands
    # around n≈16); the PIN is the equality + tightness, not the eps
    eps = 20_000
    got, n, fixed = digraph
    assert 1 <= n < 40
    assert got == fixed.at(n)
    # the realized count is tight on this topology too
    assert fixed.max_delta(n) <= eps
    if n > 1:
        assert fixed.max_delta(n - 1) > eps


def test_n_iters_monotone_in_epsilon(spark, digraph):
    # a looser threshold can never need MORE iterations: the delta
    # sequence is a pure function of the graph, and the exit condition
    # is the first index where it dips under epsilon
    _, n20k, _ = digraph
    edges = _edges_digraph(spark)
    ns = [n20k] + [
        pagerank_int_converged(edges, epsilon_e6=eps, max_iterations=40)[1]
        for eps in (80_000, 300_000)
    ]
    assert ns == sorted(ns, reverse=True)


def test_validation(spark):
    edges = _edges(spark)
    with pytest.raises(ValueError):
        pagerank_int_converged(edges, epsilon_e6=-1)
    with pytest.raises(ValueError):
        pagerank_int_converged(edges, max_iterations=0)
