"""Corpus drift telemetry — exact total-variation distance between two
corpus snapshots, per stratum, over deterministic bit-length bins.

A refreshed crawl, a re-run pipeline stage, or a new source mix can
silently shift a corpus's composition; the standing QA question is
"how far did the per-source length/quality distribution move between
snapshot A and snapshot B?". This operator answers it with the total
variation distance TV = 0.5 * sum_b |p_b - q_b| over power-of-two
token-count bins — the same exact-integer bit-length binning as
length_curriculum (``length(bin(n))``: no float log2 edge cases,
identical in Python, Spark, and DuckDB), so the whole report is
integer-exact and engine-portable.

Exact arithmetic under a 100 TB corpus: with P = |A_s| and Q = |B_s|
per stratum, TV_e6 = (1e6 * sum_b |p_b*Q - q_b*P|) // (2*P*Q). The
cross products reach ~1e20 at 1e10-document corpora, so the sums run
in DECIMAL(38,0) (exact to 1e38 — room for 1e19 docs) and only the
final e6 ratio narrows back to BIGINT.

Plan shape (scale audit): one Arrow token-count pass per snapshot
(scan-bound), two |strata| x |bins| aggregates (bins <= 64 by
construction — a token count's bit length), a full-outer equi join of
those bounded tables, and a |strata|-row fold. No data-sized shuffle
beyond the two map-side-combined counts.

No reference counterpart (kamu-cli has no statistical telemetry);
Spark-first new ground like the KMV sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bin_counts(df: DataFrame, strata_col: str, text_col: str) -> DataFrame:
    """(stratum, bin, c) — docs per power-of-two token-count bin; the
    Arrow split kernel + a map-side-combined bounded aggregate."""
    import re as _re
    from collections.abc import Iterator

    import pandas as pd

    from kamu_cli_spark.operators.util import spread

    ws = _re.compile(r"\s+", _re.ASCII)
    schema = f"{strata_col} string, bin int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            strata, bins = [], []
            for s, txt in zip(pdf[strata_col], pdf[text_col]):
                if s is None:
                    continue
                n = len([t for t in ws.split((txt or "").lower()) if t])
                strata.append(s)
                # length(bin(n)) semantics: bin(0) = '0' has length 1
                bins.append(n.bit_length() if n else 1)
            yield pd.DataFrame({strata_col: strata, "bin": bins})

    return (
        spread(df.select(strata_col, text_col))
        .mapInPandas(kernel, schema)
        .groupBy(strata_col, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def corpus_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    strata_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-stratum drift report between snapshot A and snapshot B:
    (stratum, n_a, n_b, n_bins, tv_e6). tv_e6 in [0, 1e6]; 0 = the
    binned distributions are identical, 1e6 = disjoint. Strata present
    in only one snapshot score the full 1e6 (everything moved). Null
    strata are excluded (the source_lm_influence convention)."""
    a = _bin_counts(df_a, strata_col, text_col)
    b = _bin_counts(df_b, strata_col, text_col)
    j = (
        a.withColumnRenamed("c", "pc")
        .join(
            b.withColumnRenamed("c", "qc"),
            [strata_col, "bin"],
            "full_outer",
        )
        .fillna(0, subset=["pc", "qc"])
    )
    ta = a.groupBy(strata_col).agg(F.sum("c").alias("n_a"))
    tb = b.groupBy(strata_col).agg(F.sum("c").alias("n_b"))
    tot = ta.join(tb, strata_col, "full_outer").fillna(
        0, subset=["n_a", "n_b"]
    )
    dec = "decimal(38,0)"
    folded = (
        j.join(tot, strata_col)
        .withColumn(
            "__term",
            F.abs(
                F.col("pc").cast(dec) * F.col("n_b").cast(dec)
                - F.col("qc").cast(dec) * F.col("n_a").cast(dec)
            ),
        )
        .groupBy(strata_col)
        .agg(
            F.first("n_a").alias("n_a"),
            F.first("n_b").alias("n_b"),
            F.count(F.lit(1)).alias("n_bins"),
            F.sum("__term").alias("__l1"),
        )
    )
    # integral DIV, not decimal '/': division rounding modes differ
    # across engines, floor division on non-negative ints does not
    tv = (
        "CASE WHEN n_a > 0 AND n_b > 0 THEN CAST("
        "(CAST(1000000 AS DECIMAL(38,0)) * `__l1`) DIV "
        "(CAST(2 AS DECIMAL(38,0)) * CAST(n_a AS DECIMAL(38,0))"
        " * CAST(n_b AS DECIMAL(38,0))) AS BIGINT) "
        "ELSE CAST(1000000 AS BIGINT) END"
    )
    return folded.selectExpr(
        f"`{strata_col}`",
        "CAST(n_a AS BIGINT) AS n_a",
        "CAST(n_b AS BIGINT) AS n_b",
        "CAST(n_bins AS BIGINT) AS n_bins",
        f"{tv} AS tv_e6",
    )
