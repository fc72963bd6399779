"""Graph centrality over distributed edge lists — exact-integer
PageRank, the iterative-algorithm pattern alongside k-means.

Engine-portable determinism (the DuckDB oracle replays every
iteration as a chained CTE, like the k-means twin):

- ranks live in e6 micro-units as int64 (r0 = 1_000_000 per node);
- each node's per-edge contribution is integer floor division
  ``rank // out_degree`` (Spark ``div``, DuckDB ``//`` — identical on
  non-negative ints);
- damping 0.85 is the exact rational 17/20:
  ``r' = 150_000 + (17 * inflow) // 20`` — no float ever enters, so
  there is no summation-order or rounding drift between engines;
- dangling inflow (a node with out-edges only) coalesces to 0, giving
  the standard ``(1-d)`` base rank.

Scale shape (100 TB): per iteration one shuffle of contributions
keyed by destination (map-side combined sum) plus one join back to
the node list; edges and degrees are computed once and persisted.
Driver traffic is zero — ranks stay distributed (unlike k-means,
whose model is small by construction). Companion to
``connected_components`` (operators/dedup.py); no reference
counterpart (kamu-cli has no graph operators).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

E6 = 1_000_000
BASE_E6 = 150_000  # (1 - 17/20) · 1e6


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
) -> DataFrame:
    """Exact-int64 PageRank over a DIRECTED edge list (symmetrize
    upstream for undirected graphs): returns (id, rank_e6) for every
    node appearing as source or destination, after `iterations` steps
    from the uniform e6 start. Deterministic bit-for-bit across
    engines — see the module docstring for the integer formulation."""
    if iterations < 0:
        raise ValueError("iterations must be non-negative")
    e = edges.select(
        F.col(src).cast("long").alias("__s"), F.col(dst).cast("long").alias("__d")
    ).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    try:
        deg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
        nodes = (
            e.select(F.col("__s").alias("id"))
            .unionByName(e.select(F.col("__d").alias("id")))
            .distinct()
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        ranks = nodes.withColumn("rank_e6", F.lit(E6).cast("long"))
        for _ in range(iterations):
            contrib = (
                ranks.join(deg, ranks["id"] == deg["__s"])
                .join(e, "__s")
                .select(
                    F.col("__d").alias("id"),
                    F.expr("div(rank_e6, __deg)").alias("__c"),
                )
                .groupBy("id")
                .agg(F.sum("__c").alias("__inflow"))
            )
            # floor(17·x/20) with BOUNDED intermediates:
            # x = 20q + r  =>  17q + floor(17r/20), r < 20 so the
            # products never exceed x itself. The naive 17*x pre-scales
            # by 17 and would wrap int64 (silently, in non-ANSI Spark;
            # DuckDB raises) for hub inflows above ~5.4e17 e6-units —
            # reachable only past ~5.4e11 nodes of total rank mass, but
            # the bounded form costs nothing and keeps the bit-exact
            # cross-engine claim unconditional (identical values to the
            # oracle's 17*x//20 wherever the latter doesn't overflow).
            ranks = nodes.join(contrib, "id", "left").select(
                "id",
                (
                    F.lit(BASE_E6)
                    + F.expr(
                        "17 * div(coalesce(__inflow, 0L), 20)"
                        " + div(17 * pmod(coalesce(__inflow, 0L), 20), 20)"
                    )
                ).cast("long").alias("rank_e6"),
            )
        # materialize (16 B/row) BEFORE releasing the caches: it
        # truncates the iterations-deep unrolled-join lineage AND keeps
        # the returned frame valid after the unpersists below
        out = ranks.localCheckpoint()
        nodes.unpersist()
        return out
    finally:
        e.unpersist()
