"""Similarity search over embedding columns (`array<float>`).

Brute-force cosine top-k is the exact baseline (cross join — fine for
query batches against moderate corpora, and the correctness oracle for
everything else). The scale path buckets the corpus with cosine-LSH
(random hyperplanes) so each query probes only its bucket — shuffles
on the bucket key instead of materializing |Q|×|C| pairs.

All arithmetic is `F.zip_with` / `F.aggregate` over doubles — JVM
expressions, deterministic left-to-right summation (reproducible and
matching any engine that sums in list order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kamu_cli_spark.operators.util import spread as _spread


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine similarity.

    Deterministic: ties broken by corpus id. Score rounded for
    cross-engine comparability. The corpus side is broadcast when small
    (AQE decides); otherwise this is the exact-but-quadratic baseline —
    use :func:`lsh_bucketed_ann` at scale.
    """
    # precompute norms once per side — the naive per-pair cosine would
    # recompute |q| and |c| for every one of the |Q|×|C| pairs
    queries = _spread(queries)
    corpus = _spread(corpus)
    q = queries.select(
        F.col(query_id).alias("qid"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("cid"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    pairs = q.crossJoin(c).filter(F.col("qid") != F.col("cid"))
    scored = pairs.select(
        "qid",
        "cid",
        F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), round_digits
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str = "embedding",
    threshold: float = 0.98,
    round_digits: int = 6,
) -> DataFrame:
    """All pairs with cosine ≥ threshold (near-duplicate detection)."""
    df = _spread(df)
    a = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("na"),
    )
    b = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("nb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                round_digits,
            ).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random hyperplane from md5 — reproducible
    across runs/engines without RNG state."""
    import hashlib

    vals = []
    for d in range(dim):
        h = hashlib.md5(f"plane{plane_idx}|{d}".encode()).hexdigest()[:8]
        vals.append((int(h, 16) / 0xFFFFFFFF) * 2.0 - 1.0)
    return vals


def lsh_bucketed_ann(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = 8,
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: sign-of-dot-product LSH bucketing.

    Each vector maps to a `num_planes`-bit bucket (sign pattern against
    deterministic hyperplanes); queries only score candidates in their
    bucket. At 100 TB: corpus bucketing is one narrow pass, the join
    shuffles on the bucket id, and per-bucket work is |bucket| — tune
    `num_planes` so buckets fit executor memory. Recall < 1.0 by
    construction; the exact baseline above is the oracle.
    """
    planes = [_hyperplane(dim, p) for p in range(num_planes)]

    def bucket(vec: Column) -> Column:
        bits = []
        for p_idx, p in enumerate(planes):
            arr = F.array(*[F.lit(x) for x in p])
            bits.append(
                F.when(dot(vec, arr) >= 0, F.lit(1 << p_idx)).otherwise(F.lit(0))
            )
        out = bits[0]
        for x in bits[1:]:
            out = out + x
        return out

    q = queries.select(
        F.col(query_id).alias("qid"), F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    c = corpus.select(
        F.col(corpus_id).alias("cid"), F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
        bucket(F.col(vec_col)).alias("bucket"),
    )
    pairs = q.join(c, "bucket").filter(F.col("qid") != F.col("cid"))
    scored = pairs.select(
        "qid",
        "cid",
        F.round(
            dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")), round_digits
        ).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("cid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cosine", "rank")
    )
