"""connected_components: the distributed min-label-propagation path
(driver_threshold=0 forces it) must produce exactly the driver-side
union-find's clustering — including long paths that need multiple
propagation rounds and the convergence early-exit."""

from __future__ import annotations

from pyspark.sql import functions as F

from kamu_cli_spark.operators.dedup import (
    connected_components,
    lsh_candidate_pairs,
    minhash_signature,
)


def _clusters(df):
    rows = [(r["id"], r["component"]) for r in df.collect()]
    comp: dict = {}
    for node, c in rows:
        comp.setdefault(c, set()).add(node)
    # sort by min member: frozensets compare by subset relation, which
    # is a PARTIAL order — plain sorted() over them is unstable
    return sorted((frozenset(s) for s in comp.values()), key=min)


def test_distributed_equals_driver_union_find(spark):
    # chain 0-1-2-3-4 (diameter > 1 iteration), clique {10,11,12},
    # pair {20,21}, star 30-{31,32,33}
    edges = (
        [(i, i + 1) for i in range(4)]
        + [(10, 11), (11, 12), (10, 12)]
        + [(20, 21)]
        + [(30, 31), (30, 32), (30, 33)]
    )
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    driver = connected_components(pairs)  # small → union-find
    dist = connected_components(pairs, driver_threshold=0)  # force distributed
    want = [
        frozenset({0, 1, 2, 3, 4}),
        frozenset({10, 11, 12}),
        frozenset({20, 21}),
        frozenset({30, 31, 32, 33}),
    ]
    assert _clusters(driver) == sorted(want, key=min)
    assert _clusters(dist) == sorted(want, key=min)


def test_distributed_path_on_real_lsh_pairs(spark):
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sig = minhash_signature(d, "doc_id", num_hashes=16, shingle_n=3)
    pairs = lsh_candidate_pairs(
        sig, "doc_id", num_hashes=16, bands=4, max_bucket_size=64
    )
    driver = _clusters(connected_components(pairs))
    dist = _clusters(connected_components(pairs, driver_threshold=0))
    assert driver == dist and len(driver) > 0


def test_long_path_converges_within_iteration_bound(spark):
    # a 60-node path: worst case for min-label propagation (label 0
    # must travel the full diameter); doubling-free propagation needs
    # ~diameter rounds — must still converge under max_iterations
    n = 60
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    out = connected_components(pairs, driver_threshold=0, max_iterations=100)
    comps = {r["component"] for r in out.collect()}
    assert comps == {0}
