"""kmeans_assign (operators/clustering.py): Lloyd's over quantized
int64 embeddings — planted-cluster recovery, monotone improvement,
determinism, empty-cluster rule, and the map-only assignment plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kamu_cli_spark.operators.clustering import (
    _round_half_up,
    kmeans_assign,
    semantic_dedup,
)


def _planted(spark, per=20, d=8):
    """Three well-separated blobs around (0..), (10..), (-10..) with a
    deterministic small per-point offset."""
    rows = []
    for b, base in enumerate([0.0, 10.0, -10.0]):
        for i in range(per):
            vid = b * per + i
            vec = [base + ((vid * 7 + j * 3) % 5) * 0.01 for j in range(d)]
            rows.append((vid, vec))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


class TestKMeans:
    def test_recovers_planted_clusters(self, spark):
        df = _planted(spark)
        out = kmeans_assign(df, k=3, n_updates=2).collect()
        by_blob = {}
        for r in out:
            by_blob.setdefault(r.vec_id // 20, set()).add(r.cluster)
        # each blob maps to exactly one cluster, and blobs don't merge
        assert all(len(s) == 1 for s in by_blob.values())
        assert len({next(iter(s)) for s in by_blob.values()}) == 3

    def test_updates_never_worsen_total_distance(self, spark):
        df = _planted(spark)
        totals = [
            kmeans_assign(df, k=3, n_updates=n)
            .agg(F.sum("dist_e12").alias("t"))
            .collect()[0]["t"]
            for n in (0, 1, 2)
        ]
        # Lloyd monotonicity (exact arithmetic, so no float wobble;
        # centroid rounding is ±0.5e-6 per dim — far below blob spacing)
        assert totals[0] >= totals[1] >= totals[2]

    def test_deterministic(self, spark):
        df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        a = sorted(map(tuple, kmeans_assign(df, k=4).collect()))
        b = sorted(map(tuple, kmeans_assign(df, k=4).collect()))
        assert a == b

    def test_k_exceeding_rows_keeps_all_points_assigned(self, spark):
        df = _planted(spark, per=2)  # 6 points, k=8 seeds capped at 6
        out = kmeans_assign(df, k=8, n_updates=1)
        assert out.count() == 6
        assert out.filter(F.col("cluster").isNull()).count() == 0

    def test_param_validation(self, spark):
        df = _planted(spark, per=2)
        with pytest.raises(ValueError):
            kmeans_assign(df, k=0)
        with pytest.raises(ValueError):
            kmeans_assign(df, n_updates=-1)

    def test_round_half_up_matches_oracle_formula(self):
        import math

        for s in range(-50, 51):
            for c in (1, 2, 3, 7):
                assert _round_half_up(s, c) == math.floor(s / c + 0.5)

    def test_semantic_dedup_keeps_min_id_of_duplicates(self, spark):
        # One-hot basis vectors: pairwise cosine exactly 0 between
        # distinct rows, exactly 1 for the appended copies. Duplicates
        # always share a cluster; only the lowest id survives.
        base = spark.createDataFrame(
            [(i, [1.0 if j == i else 0.0 for j in range(8)]) for i in range(6)],
            "vec_id bigint, embedding array<double>",
        )
        dups = base.filter(F.col("vec_id").isin(0, 3)).select(
            (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
        )
        out = {
            r.vec_id: r.kept
            for r in semantic_dedup(
                base.unionByName(dups), k=2, threshold=0.5
            ).collect()
        }
        assert out[0] and out[3]
        assert not out[1000] and not out[1003]
        assert all(out[i] for i in range(6))  # orthogonal rows all survive

    def test_assignment_is_map_only(self, spark):
        # After fitting, the final assignment must add no Exchange on
        # the data side: distances are literal expressions, argmin is
        # per-row — the 100 TB path scans and scores in one stage.
        df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        out = kmeans_assign(df, k=4, n_updates=1)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan


class TestHierarchicalAssignment:
    """Round-9: bound-pruned two-level assignment (O(n·√k)) must be
    bit-identical to the flat argmin — it is a triangle-inequality
    pruning, not an approximate router, so oracle parity is by
    construction."""

    def test_pruned_argmin_matches_flat_including_ties(self):
        import numpy as np

        from kamu_cli_spark.operators.clustering import (
            _argmin_block,
            _build_pruning_groups,
        )

        rng = np.random.default_rng(7)
        k, dim, n = 300, 16, 4000
        C = rng.integers(-4_000_000, 4_000_000, (k, dim)).astype(np.float64)
        # duplicate centroids force exact distance ties across groups
        C[50] = C[10]
        C[299] = C[0]
        X = rng.integers(-4_000_000, 4_000_000, (n, dim)).astype(np.float64)
        X[:20] = C[10]  # rows AT tied centroids: dist 0, two winners
        X[20:40] = C[0]
        x_sq = (X * X).sum(axis=1)
        c_sq = (C * C).sum(axis=1)
        grp = _build_pruning_groups(C)
        assert grp is not None
        assert sum(m.size for m in grp[3]) == k
        bi_f, bd_f = _argmin_block(X, x_sq, C, c_sq, None)
        bi_p, bd_p = _argmin_block(X, x_sq, C, c_sq, grp)
        assert (bd_f == bd_p).all()
        assert (bi_f == bi_p).all()
        # the tie rows resolved to the LOWEST index of the duplicates
        assert (bi_p[:20] == 10).all() and (bi_p[20:40] == 0).all()
        assert (bd_p[:40] == 0).all()

    def test_kmeans_assign_hier_path_matches_flat(self, spark, monkeypatch):
        """k=64 triggers the hierarchy (HIER_MIN_K); forcing the flat
        scan via the threshold must give the identical assignment."""
        import kamu_cli_spark.operators.clustering as cl

        df = _planted(spark, per=40, d=8)
        assert cl.HIER_MIN_K <= 64
        hier = {
            (r["vec_id"], r["cluster"], r["dist_e12"])
            for r in kmeans_assign(df, k=64, n_updates=2).collect()
        }
        monkeypatch.setattr(cl, "HIER_MIN_K", 10**9)
        flat = {
            (r["vec_id"], r["cluster"], r["dist_e12"])
            for r in kmeans_assign(df, k=64, n_updates=2).collect()
        }
        assert hier == flat


class TestSemDeDupDeskew:
    """Round-9: block-pair splitting of oversized clusters must change
    scheduling only — identical drop set — and must actually fan a
    mega-cluster out over >1 task."""

    def _skewed(self, spark):
        # one blob holds 60% of rows (the mega-cluster), plus planted
        # near-duplicates inside it so drops exist on both paths
        rows = []
        for i in range(120):
            base = 1.0 + (i % 7) * 0.001
            rows.append((i, [base] * 8))  # mutual near-dups, same blob
        for i in range(120, 200):
            rows.append((i, [10.0 + (i % 5), -3.0, float(i % 11), 1.0,
                             0.5, -1.0, 2.0, 0.25]))
        return spark.createDataFrame(
            rows, "vec_id bigint, embedding array<double>"
        )

    def test_block_pairs_cover_every_pair_exactly_once(self, spark):
        import itertools

        from kamu_cli_spark.operators.clustering import _block_pair_tasks

        df = spark.createDataFrame(
            [(i, i % 3, [float(i)], 1.0) for i in range(40)],
            "vec_id bigint, cluster int, __ve array<double>, __nrm double",
        )
        out = _block_pair_tasks(df, "vec_id", block_budget=5).collect()
        # group rows per task, then count pair coverage per cluster
        by_task: dict = {}
        for r in out:
            by_task.setdefault(
                (r["cluster"], r["__ta"], r["__tb"]), []
            ).append((r["vec_id"], r["__blk"]))
        seen: dict = {}
        for (c, a, b), members in by_task.items():
            assert a <= b
            ids_a = [i for i, blk in members if blk == a]
            ids_b = [i for i, blk in members if blk == b]
            it = (
                itertools.combinations(sorted(ids_a), 2)
                if a == b
                else ((min(x, y), max(x, y)) for x in ids_a for y in ids_b)
            )
            for p in it:
                key = (c, p)
                seen[key] = seen.get(key, 0) + 1
        by_cluster: dict = {}
        for r in out:
            by_cluster.setdefault(r["cluster"], set()).add(r["vec_id"])
        import itertools as it2

        for c, ids in by_cluster.items():
            for p in it2.combinations(sorted(ids), 2):
                assert seen.get((c, p)) == 1, (c, p, seen.get((c, p)))

    def test_small_cluster_is_single_task_no_replication(self, spark):
        from kamu_cli_spark.operators.clustering import _block_pair_tasks

        df = spark.createDataFrame(
            [(i, 0, [float(i)], 1.0) for i in range(10)],
            "vec_id bigint, cluster int, __ve array<double>, __nrm double",
        )
        out = _block_pair_tasks(df, "vec_id", block_budget=16384).collect()
        assert len(out) == 10  # no replication
        assert {(r["__ta"], r["__tb"]) for r in out} == {(0, 0)}

    def test_skewed_fixture_same_drops_multiple_tasks(self, spark):
        from kamu_cli_spark.operators.clustering import _block_pair_tasks

        df = self._skewed(spark)
        kw = dict(k=2, n_updates=2, threshold=0.9)
        split = {
            (r["vec_id"], r["cluster"], r["kept"])
            for r in semantic_dedup(df, block_budget=16, **kw).collect()
        }
        single = {
            (r["vec_id"], r["cluster"], r["kept"])
            for r in semantic_dedup(df, block_budget=10**9, **kw).collect()
        }
        assert split == single
        assert any(not kept for _, _, kept in split)  # drops exist
        # the mega-cluster really fans out: >1 task key for it
        from kamu_cli_spark.operators.clustering import kmeans_assign
        from pyspark.sql import functions as FF

        assign = kmeans_assign(df, k=2, n_updates=2).select(
            "vec_id", "cluster"
        )
        v = df.select(
            "vec_id",
            FF.transform("embedding", lambda x: x.cast("double")).alias("__ve"),
            FF.lit(1.0).alias("__nrm"),
        ).join(assign, "vec_id")
        tasks = (
            _block_pair_tasks(v, "vec_id", block_budget=16)
            .select("cluster", "__ta", "__tb")
            .distinct()
        )
        per_cluster = {
            r["cluster"]: r["n"]
            for r in tasks.groupBy("cluster").agg(FF.count("*").alias("n")).collect()
        }
        assert max(per_cluster.values()) > 1


class TestClusterQuality:
    """cluster_quality (late round 11): radius/separation/Dunn on a
    designed two-blob fixture, model-artifact path, empty guard."""

    def _blobs(self, spark):
        # two tight blobs far apart: cluster radius tiny vs separation
        rows = []
        for i in range(10):
            rows.append((i, [0.001 * i, 0.0]))
        for i in range(10):
            rows.append((100 + i, [1.0 + 0.001 * i, 0.0]))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_two_blobs_are_tight_and_separated(self, spark):
        from kamu_cli_spark.operators.clustering import (
            cluster_quality,
            kmeans_fit,
        )

        df = self._blobs(spark)
        out = {
            r["cluster"]: r
            for r in cluster_quality(df, k=2, n_updates=3).collect()
        }
        assert len(out) == 2
        for r in out.values():
            assert r["n_vecs"] == 10
            # blob spread ~0.009 => radius ~ (4500e6/1e6)^2-scale; the
            # inter-blob gap ~1.0 dominates by orders of magnitude
            assert r["sep_e12"] > 100 * r["radius_e12"] > 0
            assert r["dunn_e3"] > 100_000

        # auditing the fitted model as an artifact gives the same rows
        cents = kmeans_fit(df, k=2, n_updates=3)
        via_model = {
            r["cluster"]: tuple(r)
            for r in cluster_quality(df, centroids=cents).collect()
        }
        assert via_model == {c: tuple(r) for c, r in out.items()}

    def test_empty_model_refused(self, spark):
        from kamu_cli_spark.operators.clustering import cluster_quality

        df = self._blobs(spark)
        with pytest.raises(ValueError):
            cluster_quality(df, centroids=[])

    def test_singleton_cluster_radius_zero_dunn_zero(self, spark):
        from kamu_cli_spark.operators.clustering import cluster_quality

        df = spark.createDataFrame(
            [(0, [0.0, 0.0]), (1, [1.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        out = {r["cluster"]: r for r in cluster_quality(df, k=2, n_updates=1).collect()}
        for r in out.values():
            assert r["n_vecs"] == 1
            assert r["radius_e12"] == 0 and r["dunn_e3"] == 0
            assert r["sep_e12"] > 0
