"""Distributed vector aggregation: per-group embedding centroids and
dispersion statistics.

This is the aggregate building block behind IVF/KMeans index training
(operators/similarity.py consumes centroids; this operator *produces*
them at corpus scale): element-wise means across millions of vectors
without ever collecting a vector to the driver.

Plan shape (scale-first):
    posexplode(embedding)                 -- narrow map, 64x rows
    groupBy(label, pos) partial-agg sum   -- map-side combine; the
                                             shuffle carries |labels| x
                                             dim rows of (sum, count),
                                             i.e. KB at any corpus size
    groupBy(label) fold of per-dim means  -- tiny
plus one row-level aggregate for norm statistics. No driver collect,
no single-partition stage; survives a 100 TB corpus because the only
shuffles are keyed on (label, pos) / (label,) with group counts
independent of row count.

Determinism contract: floats are snapped to exact integer micro-units
(``floor(x * 1e6 + 0.5)`` — one IEEE double multiply + floor, bit-
identical in Spark and DuckDB) *before* any aggregation, and every sum
runs over BIGINT/DECIMAL, so results are independent of partitioning
and summation order — the same trick operators/plans/skew.py uses for
the salted aggregate, extended to vector components. A float-sum
formulation would hash-mismatch the oracle on reordering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SCALE = 1_000_000  # micro-units: 6 fractional digits survive the snap


def _e6(x: Column) -> Column:
    """Exact integer micro-units of a float column (engine-portable
    round-half-up: one double multiply + floor, no decimal-cast ties)."""
    return F.floor(x.cast("double") * _SCALE + F.lit(0.5)).cast("long")


def label_centroid_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
) -> DataFrame:
    """Per-label centroid + dispersion summary:

    - ``n_vecs``: vectors in the group
    - ``centroid_norm_e6``: ||mean vector|| in micro-units
    - ``avg_norm_e6``: mean of per-vector norms in micro-units
    - ``avg_sq_norm_e12``: mean squared norm in micro^2-units

    ``avg_sq_norm - centroid_norm^2`` is the total within-group
    variance (the KMeans objective contribution), so this one pass
    audits both cluster location and spread.
    """
    # --- per-dimension component sums (the centroid) -----------------
    ex = df.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    ).select("label", "pos", _e6(F.col("val")).alias("v_e6"))
    dim_sums = ex.groupBy("label", "pos").agg(
        F.sum("v_e6").alias("s"), F.count(F.lit(1)).alias("c")
    )
    # per-dim mean snapped back to exact micro-units, then an exact
    # DECIMAL sum of squares -> ||centroid||^2 with no float-order term
    mean_e6 = F.floor(F.col("s").cast("double") / F.col("c") + F.lit(0.5)).cast(
        "decimal(18,0)"
    )
    cent = dim_sums.select(
        "label", (mean_e6 * mean_e6).alias("m2")
    ).groupBy("label").agg(F.sum("m2").alias("msq"))
    centroid_norm = F.floor(
        F.sqrt(F.col("msq").cast("double")) + F.lit(0.5)
    ).cast("long")

    # --- row-level norm statistics (exact integer accumulation) ------
    sq_e12 = F.aggregate(
        F.col(vec_col),
        F.lit(0).cast("long"),
        lambda acc, x: acc + _e6(x) * _e6(x),
    )
    per_row = df.select(
        F.col(label_col).alias("label"),
        sq_e12.alias("sq"),
    ).select(
        "label",
        F.col("sq").cast("decimal(38,0)").alias("sq"),
        F.floor(F.sqrt(F.col("sq").cast("double")) + F.lit(0.5))
        .cast("long")
        .alias("norm_e6"),
    )
    norms = per_row.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("sq").alias("sq_sum"),
        F.sum("norm_e6").alias("norm_sum"),
    )

    out = norms.join(cent, "label")
    return out.select(
        "label",
        "n_vecs",
        centroid_norm.alias("centroid_norm_e6"),
        F.floor(F.col("norm_sum").cast("double") / F.col("n_vecs") + F.lit(0.5))
        .cast("long")
        .alias("avg_norm_e6"),
        F.floor(F.col("sq_sum").cast("double") / F.col("n_vecs") + F.lit(0.5))
        .cast("long")
        .alias("avg_sq_norm_e12"),
    )
