"""Exact-int64 PageRank (operators/graph.py): hand-computed ranks on
tiny graphs, dangling-inflow base case, and determinism."""

from __future__ import annotations

import pytest

from kamu_cli_spark.operators.graph import BASE_E6, E6, pagerank_int


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_two_cycle_stays_uniform(spark):
    # a <-> b: every iteration each node receives the other's full
    # rank, so 150000 + 17*1000000//20 = 1000000 forever
    out = {
        r["id"]: r["rank_e6"]
        for r in pagerank_int(_edges(spark, [(1, 2), (2, 1)])).collect()
    }
    assert out == {1: E6, 2: E6}


def test_star_matches_hand_computation(spark):
    # 1->3, 2->3, 3->1 (directed). deg: 1:1, 2:1, 3:1.
    # it1: inflow(3)=r1+r2=2e6; inflow(1)=r3=1e6; inflow(2)=0
    #   r(3)=150000+17*2000000//20=1850000; r(1)=1000000; r(2)=150000
    # it2: inflow(3)=r1+r2=1150000 -> 150000+977500=1127500
    #      inflow(1)=r3=1850000 -> 150000+1572500=1722500; r(2)=150000
    # it3: inflow(3)=1722500+150000=1872500 -> 150000+1591625=1741625
    #      inflow(1)=1127500 -> 150000+958375=1108375; r(2)=150000
    out = {
        r["id"]: r["rank_e6"]
        for r in pagerank_int(
            _edges(spark, [(1, 3), (2, 3), (3, 1)]), iterations=3
        ).collect()
    }
    assert out == {1: 1108375, 2: BASE_E6, 3: 1741625}


def test_zero_iterations_is_uniform_start(spark):
    out = {
        r["id"]: r["rank_e6"]
        for r in pagerank_int(
            _edges(spark, [(1, 2), (3, 2)]), iterations=0
        ).collect()
    }
    assert out == {1: E6, 2: E6, 3: E6}


def test_duplicate_edges_collapse(spark):
    # the edge list is DISTINCT'd: a repeated edge must not double
    # either the degree or the inflow
    once = pagerank_int(_edges(spark, [(1, 2), (2, 1)]), iterations=2)
    dup = pagerank_int(
        _edges(spark, [(1, 2), (1, 2), (2, 1)]), iterations=2
    )
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in dup.collect()}


def test_validation(spark):
    with pytest.raises(ValueError):
        pagerank_int(_edges(spark, [(1, 2)]), iterations=-1)
