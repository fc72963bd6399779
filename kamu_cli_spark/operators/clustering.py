"""Distributed k-means over embedding columns (Lloyd's algorithm).

The iterative-ML pattern the LLM-data pipeline needs for IVF index
training and SemDeDup-style semantic dedup: cluster the corpus
embeddings, then curate within clusters. No reference counterpart
(kamu-cli has no ML operators); the design follows Spark MLlib's
KMeans shape — broadcast centroids, map-side assignment, one
map-side-combined shuffle per update whose reduce side is k·dim rows.

Engine-portable determinism (the DuckDB oracle reproduces every bit):

- embeddings quantize ONCE to int64 micro-units (floor(x·1e6 + 0.5),
  the same e6 idiom as vector_stats) — all distances and centroid
  updates are exact integer arithmetic, so there is no float-summation
  order to drift between engines;
- seeds are the k smallest ids' vectors; ties in assignment break to
  the lowest centroid id (strictly ordered (dist, cid));
- centroid update is floor(sum/count + 0.5) per dimension — sums stay
  below 2^53, so even the double division is exact;
- a cluster that goes empty simply stops competing (no re-seeding),
  the same rule the SQL twin gets for free.

Scale audit (100 TB): per update, assignment is a pure map (k·dim
literal expression, no join); the update shuffle carries only the
map-side-combined (cluster, dim) partial sums — k·dim rows per map
task. The only driver traffic is k·dim centroid values per iteration
(bounded by construction, never by data). The quantized projection is
persisted across iterations so the source scans once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

E6 = 1_000_000


def quantize_e6(vec_col: str) -> "F.Column":
    """array<float> -> array<bigint> in exact e6 micro-units
    (floor(x·1e6 + 0.5), round-half-up — identical in DuckDB)."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * E6 + F.lit(0.5)).cast("bigint"),
    )


def _sq_dist_e12(qe_col: str, centroid: list[int]) -> "F.Column":
    """Exact squared L2 distance (e12 units) between the quantized
    vector column and one literal centroid. dim·(2·4e6)² ≈ 4e15 per
    64-dim vector — far inside int64."""
    lit_c = F.array(*[F.lit(int(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(F.col(qe_col), lit_c, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _assign(qdf: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """Add (cluster, dist_e12): argmin of exact distances over the
    live centroids, ties to the lowest cid (cents is cid-ascending, and
    array_position returns the FIRST match)."""
    dists = F.array(*[_sq_dist_e12("__qe", c) for _, c in cents])
    cids = F.array(*[F.lit(int(cid)) for cid, _ in cents])
    idx = F.array_position(dists, F.array_min(dists))
    return qdf.withColumn("dist_e12", F.array_min(dists)).withColumn(
        "cluster", F.element_at(cids, idx.cast("int"))
    )


def kmeans_assign(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_updates: int = 2,
) -> DataFrame:
    """Run `n_updates` Lloyd updates from the k-smallest-id seeds and
    return the final assignment: (id, cluster, dist_e12) — all exact
    int64, reproducible bit-for-bit across engines."""
    if k < 1:
        raise ValueError("k must be positive")
    if n_updates < 0:
        raise ValueError("n_updates must be non-negative")
    qdf = df.select(F.col(id_col), quantize_e6(vec_col).alias("__qe")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    try:
        seed_rows = qdf.orderBy(id_col).limit(k).collect()  # bounded: k rows
        cents = [(i, list(r["__qe"])) for i, r in enumerate(seed_rows)]
        for _ in range(n_updates):
            assigned = _assign(qdf, cents)
            # ONE map-side-combined shuffle; reduce side is <= k*dim rows
            parts = (
                assigned.select("cluster", F.posexplode("__qe").alias("pos", "v"))
                .groupBy("cluster", "pos")
                .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
                .collect()  # bounded: k*dim rows
            )
            by_cid: dict[int, dict[int, int]] = {}
            for r in parts:
                by_cid.setdefault(r["cluster"], {})[r["pos"]] = _round_half_up(
                    int(r["s"]), int(r["c"])
                )
            cents = [
                (cid, [dims[p] for p in sorted(dims)])
                for cid, dims in sorted(by_cid.items())
            ]
        return _assign(qdf, cents).select(
            id_col, "cluster", "dist_e12"
        )
    finally:
        qdf.unpersist()


def _round_half_up(s: int, c: int) -> int:
    """floor(s/c + 0.5) with exact integer math (matches the oracle's
    floor(s*1.0/c + 0.5) while staying exact beyond 2^53)."""
    # floor(s/c + 1/2) = floor((2s + c) / (2c)) for c > 0
    return (2 * s + c) // (2 * c)


def semantic_dedup(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    n_updates: int = 2,
    threshold: float = 0.25,
    round_digits: int = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means cluster
    the embedding corpus, then drop every row whose cosine similarity
    to a LOWER-id member of the SAME cluster clears `threshold`.
    Returns (id, cluster, kept).

    Scale design: pairwise cosine runs within clusters only —
    O(Σ n_c²), never O(n²) — so `k` is the knob that bounds cluster
    size (size k ≈ n / target_cluster_size; the paper uses n/100-ish).
    The within-cluster self-join shuffles on the cluster id, so small
    k at huge n concentrates partitions — grow k with the corpus.
    Cosine is rounded to `round_digits` before the threshold compare,
    the same engine-parity idiom as embedding_near_dup_pairs."""
    from kamu_cli_spark.operators.similarity import norm, pair_dot

    assign = kmeans_assign(df, vec_col, id_col, k, n_updates).select(
        id_col, "cluster"
    )
    v = df.select(
        F.col(id_col),
        F.col(vec_col).alias("__ve"),
        norm(F.col(vec_col)).alias("__nrm"),
    ).join(assign, id_col)
    a = v.select(
        F.col(id_col).alias("__ida"),
        F.col("cluster").alias("__cla"),
        F.col("__ve").alias("__va"),
        F.col("__nrm").alias("__na"),
    )
    b = v.select(
        F.col(id_col).alias("__idb"),
        F.col("cluster").alias("__clb"),
        F.col("__ve").alias("__vb"),
        F.col("__nrm").alias("__nb"),
    )
    drops = (
        a.join(b, (F.col("__cla") == F.col("__clb")) & (F.col("__ida") < F.col("__idb")))
        .filter(
            F.round(
                pair_dot(F.col("__va"), F.col("__vb"))
                / (F.col("__na") * F.col("__nb")),
                round_digits,
            )
            >= threshold
        )
        .select(F.col("__idb").alias(id_col))
        .distinct()
    )
    dropped = drops.withColumn("__dropped", F.lit(True))
    return (
        v.join(dropped, id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(~F.col("__dropped"), F.lit(True)).alias("kept"),
        )
    )
