"""leakage_safe_split (operators/sampling.py): near-dup clusters can
never straddle the eval boundary (the property, asserted directly),
singletons hash exactly like the plain per-doc split, and the
assignment is deterministic / salt-sensitive."""

from __future__ import annotations

from pyspark.sql import functions as F

from kamu_cli_spark.operators.sampling import (
    leakage_safe_split,
    split_assignment,
)


def _docs(spark, n=500):
    return spark.createDataFrame(
        [(i, f"text {i}") for i in range(n)], "doc_id long, text string"
    )


def _clusters(spark):
    # components: {0,1,2} -> 0, {10,11} -> 10
    return spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (10, 10), (11, 10)],
        "id long, component long",
    )


def test_no_cluster_straddles_boundary(spark):
    out = leakage_safe_split(_docs(spark), _clusters(spark))
    leaked = (
        out.groupBy("__component")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert leaked == 0
    # all of cluster 0 shares one split, all of cluster 10 shares one
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert rows[0] == rows[1] == rows[2]
    assert rows[10] == rows[11]


def test_singletons_match_plain_split(spark):
    docs = _docs(spark)
    out = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, _clusters(spark)).collect()
    }
    plain = {
        r["doc_id"]: r["plain"]
        for r in docs.withColumn(
            "plain", split_assignment(F.col("doc_id"))
        ).collect()
    }
    clustered = {0, 1, 2, 10, 11}
    for i, s in plain.items():
        if i not in clustered:
            assert out[i] == s  # singleton: identical to per-doc hash


def test_deterministic_and_salt_sensitive(spark):
    docs = _docs(spark, 300)
    cl = _clusters(spark)
    a = sorted(map(tuple, leakage_safe_split(docs, cl).collect()))
    b = sorted(map(tuple, leakage_safe_split(docs, cl).collect()))
    assert a == b
    c = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, cl, salt="exp2").collect()
    }
    base = {
        r["doc_id"]: r["split"]
        for r in leakage_safe_split(docs, cl).collect()
    }
    diff = sum(1 for i in c if c[i] != base[i])
    assert 0 < diff < len(c)  # a different but correlated-size draw
