"""corpus_drift (operators/drift.py): TV identity on identical
snapshots, symmetry, full-drift on disjoint strata, the exact value on
a hand-computed fixture, and partitioning invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from kamu_cli_spark.operators.drift import corpus_drift


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


def _m(df):
    return {r["source"]: tuple(r)[1:] for r in df.collect()}


def test_identical_snapshots_zero_drift(spark):
    d = _docs(spark)
    out = _m(corpus_drift(d, d))
    assert out and all(v[-1] == 0 for v in out.values())


def test_symmetry(spark):
    d = _docs(spark)
    a = d.filter(F.col("doc_id") % 3 != 0)
    b = d.filter(F.col("doc_id") % 3 != 1)
    ab = _m(corpus_drift(a, b))
    ba = _m(corpus_drift(b, a))
    assert set(ab) == set(ba)
    for s in ab:
        na, nb, bins, tv = ab[s]
        nb2, na2, bins2, tv2 = ba[s]
        assert (na, nb, bins, tv) == (na2, nb2, bins2, tv2)


def test_stratum_missing_from_one_side_is_full_drift(spark):
    a = spark.createDataFrame(
        [(1, "x", "one two three")], "doc_id long, source string, text string"
    )
    b = spark.createDataFrame(
        [(2, "y", "one two three")], "doc_id long, source string, text string"
    )
    out = _m(corpus_drift(a, b))
    assert out["x"] == (1, 0, 1, 1_000_000)
    assert out["y"] == (0, 1, 1, 1_000_000)


def test_hand_computed_fixture(spark):
    # A: 3 docs in bin2 (2-3 tokens), 1 doc in bin3 (4-7 tokens)
    # B: 1 doc in bin2, 1 doc in bin3
    # p = (3/4, 1/4), q = (1/2, 1/2); TV = 0.5*(|3/4-1/2|+|1/4-1/2|) = 1/4
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, source string, text string"
    )
    a = mk([(i, "s", "w w") for i in range(3)] + [(9, "s", "w w w w")])
    b = mk([(1, "s", "w w"), (2, "s", "w w w w")])
    out = _m(corpus_drift(a, b))
    assert out["s"] == (4, 2, 2, 250_000)


def test_partitioning_invariant(spark):
    d = _docs(spark)
    a = d.filter(F.col("doc_id") % 2 == 0)
    b = d.filter(F.col("doc_id") % 2 == 1)
    x = sorted(map(tuple, corpus_drift(a, b).collect()))
    y = sorted(
        map(
            tuple,
            corpus_drift(a.repartition(13), b.repartition(7)).collect(),
        )
    )
    assert x == y
