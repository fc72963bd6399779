"""Greedy k-center selection (clustering.py:kcenter_select): pinned
against a from-scratch numpy farthest-point traversal, deterministic
under repartitioning, coverage-radius monotonicity, and the k > n /
empty edges."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kamu_cli_spark.operators.clustering import kcenter_select

_SCALE = 1_000_000


def _mk(spark, n=80, d=6, seed=11):
    rng = np.random.default_rng(seed)
    V = rng.normal(0, 0.4, size=(n, d))
    rows = [(i, [float(x) for x in V[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        V,
    )


def _reference(V, k):
    Q = np.floor(V * _SCALE + 0.5).astype(np.int64)
    sel = [(1, 0, 0)]  # seed = min id
    md = ((Q - Q[0]) ** 2).sum(axis=1)
    for rank in range(2, k + 1):
        # argmax of md, ties to lowest id
        best = int(np.lexsort((np.arange(len(md)), -md))[0])
        sel.append((rank, best, int(md[best])))
        md = np.minimum(md, ((Q - Q[best]) ** 2).sum(axis=1))
    return sel


def test_matches_numpy_reference(spark):
    df, V = _mk(spark)
    got = [
        (r["rank"], r["vec_id"], r["dist_e12"])
        for r in kcenter_select(df, k=10).orderBy("rank").collect()
    ]
    assert got == _reference(V, 10)


def test_partitioning_invariant(spark):
    df, _ = _mk(spark, n=120)
    a = [tuple(r) for r in kcenter_select(df, k=8).orderBy("rank").collect()]
    b = [
        tuple(r)
        for r in kcenter_select(df.repartition(17), k=8).orderBy("rank").collect()
    ]
    assert a == b


def test_radius_curve_monotone_nonincreasing(spark):
    df, _ = _mk(spark, n=100)
    d = [r["dist_e12"] for r in kcenter_select(df, k=9).orderBy("rank").collect()]
    assert all(d[i] >= d[i + 1] for i in range(1, len(d) - 1))


def test_k_exceeding_n_selects_everything(spark):
    df, _ = _mk(spark, n=5)
    out = kcenter_select(df, k=50).collect()
    # after n selections every md is 0 but rows keep emitting with
    # dist 0 — selection still terminates at k and stays deterministic
    assert len(out) == 50 or len(out) == 5
    ranks = sorted(r["rank"] for r in out)
    assert ranks == list(range(1, len(out) + 1))


def test_empty_input_raises(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        kcenter_select(df, k=3)


def test_batch_variant_bit_identical_small_k(spark):
    from kamu_cli_spark.operators.clustering import kcenter_select_batch

    df, _ = _mk(spark, n=120)
    a = [tuple(r) for r in kcenter_select(df, k=8).orderBy("rank").collect()]
    b = [
        tuple(r)
        for r in kcenter_select_batch(df, k=8).orderBy("rank").collect()
    ]
    assert a == b


def test_batch_variant_bit_identical_large_k_small_ell(spark):
    # tiny ell forces MANY passes and exercises the threshold logic
    # (accept-until-md_ell) and the always-accept-first fallback
    from kamu_cli_spark.operators.clustering import kcenter_select_batch

    df, V = _mk(spark, n=150, d=5, seed=23)
    want = _reference(V, 40)
    got = [
        (r["rank"], r["vec_id"], r["dist_e12"])
        for r in kcenter_select_batch(df, k=40, ell=8)
        .orderBy("rank")
        .collect()
    ]
    assert got == want


def test_batch_variant_arrow_update_path(spark):
    # ell large enough that one pass accepts > MAX_LITERAL_CELLS/dim
    # centers, driving the Arrow md-update kernel; still bit-identical
    from kamu_cli_spark.operators.clustering import (
        MAX_LITERAL_CELLS,
        kcenter_select_batch,
    )

    d = 6
    k = MAX_LITERAL_CELLS // d + 10  # > literal budget in one pass
    df, V = _mk(spark, n=400, d=d, seed=7)
    want = _reference(V, k)
    got = [
        (r["rank"], r["vec_id"], r["dist_e12"])
        for r in kcenter_select_batch(df, k=k, ell=1024)
        .orderBy("rank")
        .collect()
    ]
    assert got == want


def test_batch_variant_k_exceeding_n(spark):
    from kamu_cli_spark.operators.clustering import kcenter_select_batch

    df, _ = _mk(spark, n=5)
    a = [tuple(r) for r in kcenter_select(df, k=12).orderBy("rank").collect()]
    b = [
        tuple(r)
        for r in kcenter_select_batch(df, k=12, ell=4).orderBy("rank").collect()
    ]
    assert a == b


def test_batch_variant_invalid_ell_raises(spark):
    from kamu_cli_spark.operators.clustering import kcenter_select_batch

    df, _ = _mk(spark, n=10)
    with pytest.raises(ValueError, match="ell"):
        kcenter_select_batch(df, k=3, ell=0)
