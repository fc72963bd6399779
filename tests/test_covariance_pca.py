"""Covariance moments + PCA (operators/vector_stats.py): exact-int
second moments pinned against numpy, eigenvector stability contract,
projection round-trip, and the bounded-shuffle plan shape."""

from __future__ import annotations

import numpy as np

from kamu_cli_spark.operators.vector_stats import (
    covariance_moments,
    pca_components,
    pca_project,
)

_SCALE = 1_000_000


def _mk(spark, n=60, d=5, seed=7):
    rng = np.random.default_rng(seed)
    V = rng.normal(0, 0.3, size=(n, d))
    rows = [(i, [float(x) for x in V[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        V,
    )


def test_moments_match_numpy_exactly(spark):
    df, V = _mk(spark)
    got = {
        (r["i"], r["j"]): r for r in covariance_moments(df).collect()
    }
    Ve6 = np.floor(V * _SCALE + 0.5).astype(np.int64)
    G = Ve6.T @ Ve6
    S = Ve6.sum(axis=0)
    d = V.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            r = got[(i, j)]
            assert r["n"] == len(V)
            assert r["sum_i"] == S[i]
            assert r["sum_j"] == S[j]
            assert r["sxy_e12"] == G[i, j]


def test_moments_partitioning_invariant(spark):
    # exact integers: the result must not depend on batch/partition
    # boundaries (the float-sum formulation would fail this)
    df, _ = _mk(spark, n=97)
    a = sorted(tuple(r) for r in covariance_moments(df).collect())
    b = sorted(
        tuple(r) for r in covariance_moments(df.repartition(13)).collect()
    )
    assert a == b


def test_moments_flush_invariant(spark):
    # the per-partition int64 accumulator flushes every _FLUSH_ROWS so
    # arbitrarily large partitions cannot wrap before the DECIMAL
    # merge; a tiny flush threshold (many flushes per partition) must
    # be bit-identical to the default single-flush path
    import inspect

    import kamu_cli_spark.operators.vector_stats as m

    df, _ = _mk(spark, n=97)
    src = inspect.getsource(m.covariance_moments).replace(
        "_FLUSH_ROWS = 1_000_000", "_FLUSH_ROWS = 10"
    )
    assert src != inspect.getsource(m.covariance_moments)
    ns = dict(m.__dict__)
    exec(src, ns)  # noqa: S102 — re-exec our own source with tiny flush
    a = sorted(tuple(r) for r in covariance_moments(df).collect())
    b = sorted(tuple(r) for r in ns["covariance_moments"](df).collect())
    assert a == b


def test_pca_components_match_numpy(spark):
    df, V = _mk(spark, n=200, d=6)
    m = covariance_moments(df)
    comps = pca_components(m, 3)
    Ve6 = np.floor(V * _SCALE + 0.5).astype(np.int64)
    n = len(V)
    cov = (Ve6.T @ Ve6) / n / _SCALE**2 - np.outer(
        Ve6.sum(0) / n / _SCALE, Ve6.sum(0) / n / _SCALE
    )
    w, vecs = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:3]
    for k, idx in enumerate(order):
        ref = vecs[:, idx]
        if ref[np.argmax(np.abs(ref))] < 0:
            ref = -ref
        assert np.allclose(comps[k], ref, atol=1e-9)


def test_pca_project_is_dot_product(spark):
    df, V = _mk(spark, n=40, d=4)
    comps = pca_components(covariance_moments(df), 2)
    got = {
        r["vec_id"]: r["proj"]
        for r in pca_project(df, comps).collect()
    }
    M = np.asarray(comps).T
    for i in range(len(V)):
        assert np.allclose(got[i], V[i] @ M, atol=1e-12)


def test_moments_plan_shape(spark):
    df, _ = _mk(spark)
    plan = (
        covariance_moments(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan  # Arrow map, not a row UDF
    assert "CartesianProduct" not in plan
    # the merge aggregates partial rows (map-side combine present)
    assert "partial" in plan.lower() or "HashAggregate" in plan


def test_pca_project_streams_match_batch(spark, tmp_path):
    """pca_project against fixed axes is a stateless Arrow map — a
    live embedding stream projects bit-identically to the batch path."""
    df, _ = _mk(spark, n=30, d=4)
    comps = pca_components(covariance_moments(df), 2)

    src = tmp_path / "vecs"
    src.mkdir()
    df.coalesce(1).write.mode("append").parquet(str(src))
    stream = spark.readStream.schema(df.schema).parquet(str(src))
    out = pca_project(stream, comps)
    assert out.isStreaming
    name = f"pca_{abs(hash(str(tmp_path))) % 10**9}"
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
    got = {
        (r["vec_id"], tuple(r["proj"]))
        for r in spark.sql(f"select * from {name}").collect()
    }
    want = {
        (r["vec_id"], tuple(r["proj"]))
        for r in pca_project(df, comps).collect()
    }
    assert got == want
