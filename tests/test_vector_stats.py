"""Distributed centroid/dispersion aggregate
(kamu_cli_spark/operators/vector_stats.py)."""

from __future__ import annotations

import math

import numpy as np

from kamu_cli_spark.operators.vector_stats import label_centroid_stats

from tests.conftest import rows


def _df(spark, data):
    return spark.createDataFrame(
        [(i, v, l) for i, (v, l) in enumerate(data)],
        "vec_id long, embedding array<float>, label int",
    )


class TestCentroidStats:
    def test_hand_computed_two_groups(self, spark):
        out = {
            r[0]: r
            for r in rows(
                label_centroid_stats(
                    _df(
                        spark,
                        [
                            ([3.0, 4.0], 0),
                            ([3.0, 4.0], 0),  # centroid (3,4), norm 5
                            ([1.0, 0.0], 1),
                            ([0.0, 1.0], 1),  # centroid (.5,.5), norm ~.7071068
                        ],
                    )
                )
            )
        }
        label0 = out[0]
        assert label0[1] == 2
        assert label0[2] == 5_000_000  # centroid norm 5.0 in micro-units
        assert label0[3] == 5_000_000  # every row norm is 5.0
        assert label0[4] == 25_000_000_000_000  # avg sq norm 25 in e12
        label1 = out[1]
        assert label1[1] == 2
        assert label1[2] == 707_107  # ||(.5,.5)|| = 0.7071068
        assert label1[3] == 1_000_000  # each row has norm 1
        assert label1[4] == 1_000_000_000_000

    def test_matches_numpy_on_real_embeddings(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        got = {r[0]: r for r in rows(label_centroid_stats(df))}
        pdf = df.toPandas()
        for label, grp in pdf.groupby("label"):
            V = np.floor(
                np.stack([np.asarray(v, dtype=np.float64) for v in grp.embedding])
                * 1e6
                + 0.5
            )
            n = len(grp)
            mean_e6 = np.floor(V.sum(axis=0) / n + 0.5)
            cent = int(math.floor(math.sqrt(float((mean_e6**2).sum())) + 0.5))
            sq = (V**2).sum(axis=1)
            avg_sq = int(math.floor(float(sq.sum()) / n + 0.5))
            norm_sum = sum(int(math.floor(math.sqrt(float(s)) + 0.5)) for s in sq)
            avg_norm = int(math.floor(norm_sum / n + 0.5))
            assert got[label][1:] == (n, cent, avg_norm, avg_sq), label

    def test_dispersion_identity_nonnegative(self, spark):
        # avg_sq_norm - centroid_norm^2 >= 0 (within-group variance)
        df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        for r in rows(label_centroid_stats(df)):
            assert r[4] - r[2] ** 2 >= 0
