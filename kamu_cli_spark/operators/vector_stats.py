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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# micro-units: floor(x * 1e6 + 0.5) — one IEEE double multiply + floor,
# bit-identical in numpy, Spark SQL, and DuckDB; 6 fractional digits
# survive the snap
_SCALE = 1_000_000


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
    # --- Arrow map-side combine: per-(batch, label) integer partials -
    # Each Arrow batch emits one row per label it contains: component
    # sums (array<long>), row count, squared-norm sum, norm sum — all
    # exact int64 after the e6 snap, so partials merge associatively in
    # any order. The naive posexplode plan pushed |rows| × dim exploded
    # rows through codegen (320M at sf10, 3.8 s vs DuckDB 0.76 s); the
    # partial-sum pass scans once in numpy and the JVM only merges
    # |batches| × |labels| partial rows. Per-batch int64 headroom: a
    # 10k-row Arrow batch (Spark's default cap) stays ~35× under
    # overflow even at |v_e6| ~ 2e6 per component.
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from kamu_cli_spark.operators.util import spread

    part_schema = "label long, n long, comp_sums array<long>, sq_sum long, norm_sum long"

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            Ve6 = np.floor(V * _SCALE + 0.5).astype(np.int64)
            sq_rows = (Ve6 * Ve6).sum(axis=1)  # int64, exact
            norm_rows = np.floor(np.sqrt(sq_rows.astype(np.float64)) + 0.5).astype(
                np.int64
            )
            labels = pdf[label_col].to_numpy()
            out = []
            for lab in np.unique(labels):
                m = labels == lab
                out.append(
                    (
                        int(lab),
                        int(m.sum()),
                        [int(x) for x in Ve6[m].sum(axis=0)],
                        int(sq_rows[m].sum()),
                        int(norm_rows[m].sum()),
                    )
                )
            yield pd.DataFrame(
                out, columns=["label", "n", "comp_sums", "sq_sum", "norm_sum"]
            )

    p = spread(df.select(F.col(label_col), F.col(vec_col))).mapInPandas(
        partials, part_schema
    )

    norms = p.groupBy("label").agg(
        F.sum("n").alias("n_vecs"),
        F.sum(F.col("sq_sum").cast("decimal(38,0)")).alias("sq_sum"),
        F.sum("norm_sum").alias("norm_sum"),
    )
    # element-wise merge of per-batch component sums: the explode here
    # is |batches| x |labels| x dim rows — KB at any corpus size
    dim_sums = (
        p.select("label", F.posexplode("comp_sums").alias("pos", "s_part"))
        .groupBy("label", "pos")
        .agg(F.sum("s_part").alias("s"))
        .join(norms.select("label", "n_vecs"), "label")
    )
    # per-dim mean snapped back to exact micro-units, then an exact
    # DECIMAL sum of squares -> ||centroid||^2 with no float-order term
    mean_e6 = F.floor(
        F.col("s").cast("double") / F.col("n_vecs") + F.lit(0.5)
    ).cast("decimal(18,0)")
    cent = dim_sums.select(
        "label", (mean_e6 * mean_e6).alias("m2")
    ).groupBy("label").agg(F.sum("m2").alias("msq"))
    centroid_norm = F.floor(
        F.sqrt(F.col("msq").cast("double")) + F.lit(0.5)
    ).cast("long")

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
