"""Regression tests for the round-9 ADVICE findings:

1. pagerank_int's damping multiply must not pre-scale inflow by 17
   (int64 wrap for extreme hubs) — the bounded split-division form
   must equal floor(17x/20) everywhere and survive near-max inflows.
2. semantic_dedup's rectangle tasks must tolerate an EMPTY hash block
   (rows emit task keys for every block; an empty selection used to
   np.vstack([]) and fail the stage).
(3. strip_duplicate_spans zero-token emission is covered in
   tests/test_substring_deskew.py.)
"""

from __future__ import annotations

from pyspark.sql import functions as F


class TestPagerankBoundedDamping:
    def test_split_division_equals_naive_floor(self, spark):
        """17*div(x,20) + div(17*pmod(x,20),20) == floor(17x/20) on a
        sweep including values where the naive 17*x wraps int64."""
        big = 9_223_372_036_854_775_807  # int64 max
        xs = list(range(0, 100)) + [
            10**6, 10**12, 5 * 10**17,          # naive form still fine
            big // 17 + 1, big // 2, big - 19,  # naive 17*x would wrap
        ]
        df = spark.createDataFrame([(x,) for x in xs], "x long").select(
            "x",
            F.expr("17 * div(x, 20) + div(17 * pmod(x, 20), 20)").alias("got"),
        )
        for r in df.collect():
            assert r["got"] == (17 * r["x"]) // 20, r["x"]

    def test_small_graph_ranks_unchanged(self, spark):
        from kamu_cli_spark.operators.graph import pagerank_int

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long"
        )
        got = {r["id"]: r["rank_e6"] for r in pagerank_int(
            edges, iterations=2
        ).collect()}

        # python replay of the exact-integer recurrence
        deg = {1: 1, 2: 1, 3: 1, 4: 1}
        ranks = {n: 1_000_000 for n in (1, 2, 3, 4)}
        for _ in range(2):
            inflow = {n: 0 for n in ranks}
            for s, d in [(1, 2), (2, 3), (3, 1), (4, 1)]:
                inflow[d] += ranks[s] // deg[s]
            ranks = {n: 150_000 + (17 * inflow[n]) // 20 for n in ranks}
        assert got == ranks


class TestSemanticDedupEmptyBlock:
    def test_rectangle_task_with_empty_block(self, spark):
        """Force a 2-block fan-out where block 1 is EMPTY: pick ids
        whose xxhash64 all land in block 0 (blocking is
        pmod(xxhash64(id), m) — deterministic), with cluster size over
        the budget so m = 2. The (0, 1) rectangle task then sees zero
        rows on one side and must degrade to a no-op, not ValueError."""
        from kamu_cli_spark.operators.clustering import semantic_dedup

        cand = spark.range(400).select(
            "id", F.pmod(F.xxhash64("id"), F.lit(2)).alias("b")
        )
        ids = [r["id"] for r in cand.filter("b = 0").limit(6).collect()]
        assert len(ids) == 6

        vec = [1.0, 0.0, 0.0, 0.0]
        df = spark.createDataFrame(
            [(i, vec) for i in ids], "vec_id long, embedding array<double>"
        )
        out = semantic_dedup(
            df, k=1, n_updates=1, threshold=0.25, block_budget=4
        )
        rows = {r["vec_id"]: r["kept"] for r in out.collect()}
        # identical vectors: only the lowest id survives
        assert rows[min(ids)] is True
        assert sum(rows.values()) == 1 and len(rows) == 6
