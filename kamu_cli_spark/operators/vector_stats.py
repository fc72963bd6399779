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


def covariance_moments(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact-integer second-moment matrix of an embedding column — the
    distributed primitive behind PCA / whitening / decorrelation in an
    embedding-curation pipeline (the reference exposes no linear
    algebra at all; this is Spark-first new ground like k-means).

    One corpus scan. Each Arrow batch snaps vectors to micro-units
    (``floor(x * 1e6 + 0.5)``, the shared determinism contract) and
    accumulates the d x d Gram matrix ``Ve6.T @ Ve6`` plus component
    sums IN NUMPY INT64 (exact: |e6| <= ~2e6 so pair products <= 4e12),
    flushing the partial every 1e6 accumulated rows so a partition of
    ANY size stays >=2x under int64 wrap before handing the unbounded
    summation to the shuffle merge. The only shuffle merges
    d(d+1)/2 rows per flush — KB at any corpus size; the
    merge runs over DECIMAL(38,0) so even a 100 TB corpus cannot
    overflow mid-sum, and the final values are cast back to BIGINT
    (valid while n * max|e6|^2 < 2^63 — ~2.5e6 vectors per 1e12 pair
    magnitude; raise the output to decimal if a corpus exceeds it).

    Output: one row per (i, j), i <= j, 0-based — ``n``, ``sum_i``,
    ``sum_j`` (micro-units), ``sxy_e12`` (micro^2-units). Covariance
    and correlation derive exactly: cov = sxy/n - (sum_i/n)(sum_j/n).
    """
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from kamu_cli_spark.operators.util import spread

    part_schema = (
        "i int, j int, n_part long, si_part long, sj_part long, sxy_part long"
    )

    # int64 Gram entries grow ~1e12 per max-magnitude row, so a single
    # partition accumulating >~2.3e6 such rows would wrap SILENTLY in
    # numpy. Flush the partial every _FLUSH_ROWS accumulated rows —
    # the unbounded summing then happens in the widened DECIMAL(38,0)
    # shuffle merge, never in int64. The flush costs d(d+1)/2 extra
    # shuffle rows per _FLUSH_ROWS inputs (KB-sized; negligible).
    _FLUSH_ROWS = 1_000_000

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = None
        sums = None
        n = 0

        def flush():
            d = gram.shape[0]
            iu, ju = np.triu_indices(d)
            return pd.DataFrame(
                {
                    "i": iu.astype(np.int32),
                    "j": ju.astype(np.int32),
                    "n_part": np.full(len(iu), n, dtype=np.int64),
                    "si_part": sums[iu],
                    "sj_part": sums[ju],
                    "sxy_part": gram[iu, ju],
                }
            )

        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            Ve6 = np.floor(V * _SCALE + 0.5).astype(np.int64)
            g = Ve6.T @ Ve6  # int64-exact (no BLAS dispatch on ints)
            s = Ve6.sum(axis=0)
            if gram is None:
                gram, sums = g, s
            else:
                gram += g
                sums += s
            n += len(pdf)
            if n >= _FLUSH_ROWS:
                yield flush()
                gram = None
                sums = None
                n = 0
        if gram is None:
            return
        yield flush()

    p = spread(df.select(F.col(vec_col))).mapInPandas(partials, part_schema)
    return (
        p.groupBy("i", "j")
        .agg(
            F.sum("n_part").alias("n"),
            F.sum("si_part").alias("sum_i"),
            F.sum("sj_part").alias("sum_j"),
            F.sum(F.col("sxy_part").cast("decimal(38,0)"))
            .cast("long")
            .alias("sxy_e12"),
        )
        .select("i", "j", "n", "sum_i", "sum_j", "sxy_e12")
    )


def pca_components(moments: DataFrame, k: int) -> "list[list[float]]":
    """Top-k principal axes from a :func:`covariance_moments` frame.

    The moments frame is d(d+1)/2 rows BY CONSTRUCTION (never
    data-sized), so collecting it is a bounded driver artifact — the
    same contract as k-means centroid collection. Eigendecomposition of
    the d x d covariance runs in numpy on the driver; ties in the
    (float) eigenvalues are broken by fixing each eigenvector's sign so
    its largest-|.|-component is positive, making the output stable
    across LAPACK builds up to genuine eigenvalue degeneracy.
    """
    import numpy as np

    rows = moments.collect()  # bounded: d(d+1)/2 rows
    d = max(r["j"] for r in rows) + 1
    n = rows[0]["n"]
    cov = np.zeros((d, d))
    for r in rows:
        c = r["sxy_e12"] / n / _SCALE**2 - (
            r["sum_i"] / n / _SCALE
        ) * (r["sum_j"] / n / _SCALE)
        cov[r["i"], r["j"]] = c
        cov[r["j"], r["i"]] = c
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = []
    for idx in order:
        vec = v[:, idx]
        if vec[np.argmax(np.abs(vec))] < 0:
            vec = -vec
        comps.append([float(x) for x in vec])
    return comps


def pca_project(
    df: DataFrame,
    components: "list[list[float]]",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "proj",
) -> DataFrame:
    """Project vectors onto fixed principal axes (from
    :func:`pca_components` — an offline model artifact broadcast in the
    closure, so this is a stateless Arrow map: zero shuffles, streams
    unchanged).

    The dot products accumulate dimension-by-dimension in a FIXED
    order rather than via ``V @ M``: BLAS dgemm picks its SIMD
    accumulation order from the operands' memory layout, and the same
    vectors arriving via an Arrow scan vs an in-memory relation
    project with last-ulp drift — which breaks the stream == batch
    bit-identity contract every stateless kernel here carries. The
    sequential form is layout-independent and still vectorized over
    the batch (d elementwise fused-multiply passes)."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    C = [list(map(float, c)) for c in components]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        M = np.asarray(C, dtype=np.float64).T  # d x k
        d, k = M.shape
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            P = np.zeros((len(V), k))
            for i in range(d):  # fixed-order accumulation, see above
                P += V[:, i : i + 1] * M[i]
            yield pd.DataFrame(
                {id_col: pdf[id_col], out_col: [list(r) for r in P]}
            )

    schema = f"{id_col} long, {out_col} array<double>"
    return df.select(id_col, vec_col).mapInPandas(run, schema)
