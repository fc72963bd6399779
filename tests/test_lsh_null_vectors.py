"""ADVICE r13 regression: _with_buckets' fused norm+bucket kernel
(operators/similarity.py) crashed np.stack on a null embedding row,
where the JVM expressions it replaced propagated null. Null vectors
must now emit a null-fielded struct and drop out of candidate
generation, leaving the non-null results bit-identical."""

from __future__ import annotations

from pyspark.sql import functions as F

from kamu_cli_spark.operators.similarity import lsh_bucketed_ann_self


def _emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")


def _run(df):
    return sorted(
        tuple(r)
        for r in lsh_bucketed_ann_self(
            df,
            "vec_id",
            lambda c: c % 25 == 0,
            num_planes=4,
            num_tables=8,
            k=3,
        ).collect()
    )


def test_null_embedding_rows_flow_through(spark):
    base = _emb(spark)
    with_null = base.unionByName(
        spark.createDataFrame(
            [(10_000_000, None)], base.schema
        )
    )
    got = _run(with_null)  # crashed before the fix
    assert got == _run(base)  # null row joined nothing, changed nothing
    assert all(r[0] != 10_000_000 and r[1] != 10_000_000 for r in got)
