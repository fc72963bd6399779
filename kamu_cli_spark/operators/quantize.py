"""Embedding quantization for large-scale vector pipelines.

Symmetric per-vector int8 quantization — the standard memory/IO
reduction before ANN index build or training export (4× smaller than
float32, dot products stay rank-faithful). Emitted per vector:
the scale, the quantized checksums, and the max reconstruction error,
all as exact integers so cross-engine verification is bit-stable.

Plan shape (scale audit): pure per-row expressions over the vector
column — no shuffle, no UDF, no driver collection; linear in
|corpus| × dim and trivially partition-parallel. The arithmetic is
pinned to double-precision IEEE ops in a fixed order (amax → scale →
floor(x*scale + 0.5)) so DuckDB/Trino replicate it exactly;
`floor(+0.5)` is used instead of round() because engines disagree on
half-even vs half-away ties.

Reference parity: kamu-cli has no vector surface; this extends the
training-data operator set alongside operators/similarity.py (which
documents the Arrow/numpy path for when per-element expression
evaluation ever dominates a profile).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    keep_cols: tuple[str, ...] = ("vec_id", "label"),
) -> DataFrame:
    """Per-vector symmetric int8 quantization summary.

    Columns: scale_e6 (floor of 1e6 × (127/amax)), q_sum and q_norm
    (sum and sum-of-squares of the int8 codes — the checksums a
    downstream consumer revalidates after transport), max_err_e9
    (floor of 1e9 × max |dequantized − original|, bounded by
    1/(2·scale) when the math is right — the self-test of the codec).
    Zero vectors (amax = 0) are not quantizable and are dropped.
    """
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    staged = (
        df.where(amax > 0)
        .select(
            *keep_cols,
            v.alias("__v"),
            (F.lit(127.0) / amax).alias("__scale"),
        )
        .select(
            *keep_cols,
            "__v",
            "__scale",
            F.transform(
                F.col("__v"),
                lambda x: F.floor(x * F.col("__scale") + F.lit(0.5)).cast("int"),
            ).alias("__q"),
        )
    )
    q = F.col("__q")
    scale = F.col("__scale")
    err = F.array_max(
        F.zip_with(q, F.col("__v"), lambda qi, x: F.abs(qi / scale - x))
    )
    return staged.select(
        *keep_cols,
        F.floor(scale * 1000000.0).cast("long").alias("scale_e6"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x).alias("q_sum"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + x * x).alias(
            "q_norm"
        ),
        F.floor(err * 1000000000.0).cast("long").alias("max_err_e9"),
    )
