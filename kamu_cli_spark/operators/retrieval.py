"""BM25 retrieval scoring over a document corpus — the relevance
primitive behind retrieval-based data selection (pick the crawl docs
most similar to a trusted query/eval set, the retrieval cousin of the
DSIR importance weights in text.py).

Exact-integer variant (house determinism contract): the classic BM25
idf ``ln((N - df + 0.5) / (df + 0.5))`` is replaced by the rational
argument itself in milli-units — natural-log libms differ across
engines in the last ulp (the same reason tfidf_topk's idf is rational),
and ln is monotone so per-term ordering is preserved. With
k1 = 6/5 and b = 3/4 the term weight

    tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

clears denominators exactly (avgdl = S / N, S = total corpus tokens):

    weight_e6 = (22 * tf * 1e6)  div  (10*tf + 3 + (9 * dl * N) div S)
    idf_e3    = (1000 * (2N - 2*df + 1))  div  (2*df + 1)
    score_e9  = sum over matched terms of idf_e3 * weight_e6

Every quantity is an int and every division is integer floor division,
so Spark, the Arrow kernel (Python ints), and any ANSI engine agree
bit-for-bit. Headroom: idf_e3 * weight_e6 < 2^63 while N < ~6e9
documents — comfortably past a 100 TB corpus.

Plan shape (scale-first, two scans + one bounded shuffle):
    pass 1: ONE aggregate scan            -- N, S, and df per query
                                             term via array_contains
                                             sums; collected as 2+|V|
                                             bounded scalars
    pass 2: ONE Arrow kernel scan         -- tokenizes each doc once
                                             and emits the FINAL
                                             (query, doc, hits, score)
                                             row per matching doc; the
                                             corpus constants ride in
                                             the closure, so there is
                                             NO data-sized join or
                                             aggregation anywhere
    WindowGroupLimit top-k per query      -- rank <= k prunes map-side

The first cut of this operator computed per-term tf as |V| JVM array
filters and derived df by re-aggregating that frame — Catalyst cannot
share the un-materialized tf subtree between the df build and the
probe, so the 17 s (sf10) tf stage ran TWICE (43.7 s total vs DuckDB
12.3 s). Folding df into pass 1 and the scoring into pass 2 deletes
both evaluations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kamu_cli_spark.operators.text import tokens


def bm25_corpus_stats(
    df: DataFrame,
    queries: list[tuple[int, list[str]]],
    text_col: str = "text",
) -> dict:
    """The bounded corpus artifact BM25 scoring needs — N, total
    tokens S, and per-query-term document frequencies — from ONE
    aggregate scan (array_contains sums; 2 + |vocab| values to the
    driver, the same bounded-artifact contract as tfidf_topk's
    cached_count). Fit offline on the corpus snapshot, persist or
    broadcast, and a live crawl scores against it statelessly."""
    if not queries:
        raise ValueError("bm25: queries list is empty")
    toks = df.select(
        tokens(F.lower(F.col(text_col))).alias("__toks")
    ).withColumn("dl", F.size("__toks"))
    vocab = sorted({t for _, ts in queries for t in ts})
    row = toks.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dl").alias("s"),
        *[
            F.sum(
                F.array_contains("__toks", term).cast("long")
            ).alias(f"__df_{i}")
            for i, term in enumerate(vocab)
        ],
    ).collect()[0]
    n_docs, s_tokens = int(row["n"]), int(row["s"] or 0)
    if n_docs == 0 or s_tokens == 0:
        raise ValueError("bm25: empty corpus")
    return {
        "n_docs": n_docs,
        "s_tokens": s_tokens,
        "dfreq": {t: int(row[f"__df_{i}"]) for i, t in enumerate(vocab)},
    }


def bm25_score(
    df: DataFrame,
    queries: list[tuple[int, list[str]]],
    stats: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
    idf_mode: str = "exact_int",
) -> DataFrame:
    """Per-(query, doc) BM25 scores as ONE stateless Arrow kernel with
    the :func:`bm25_corpus_stats` artifact in the closure — no
    data-sized join or aggregation, so it runs UNCHANGED on a
    streaming DataFrame (the live-crawl relevance gate; stream ==
    batch pinned in tests/test_retrieval_bm25.py). The tokenizer
    mirrors tokens() (split on \\s+ runs, drop empties, ASCII
    lowercase — the corpus contract shared with the oracles). Docs
    matching no query term emit nothing.

    ``idf_mode``:

    - ``"exact_int"`` (default): the deterministic rational-idf
      surrogate in exact Python-int arithmetic — bit-identical across
      Spark / Arrow / any ANSI engine; emits ``score_e9 long``.
    - ``"ln"``: standard BM25 with the Lucene-smoothed log idf
      ``ln(1 + (N - df + 0.5) / (df + 0.5))`` (always positive) and
      float ``k1 = 1.2, b = 0.75`` term normalization; emits
      ``score double``. Multi-term rankings match standard BM25;
      cross-engine equality is to float tolerance, not bitwise
      (tolerance-pinned vs a DuckDB ln() oracle in tests)."""
    import math
    import re

    from collections.abc import Iterator

    import pandas as pd

    if idf_mode not in ("exact_int", "ln"):
        raise ValueError(f"bm25: unknown idf_mode {idf_mode!r}")
    use_ln = idf_mode == "ln"
    n_docs, s_tokens = int(stats["n_docs"]), int(stats["s_tokens"])
    if use_ln and s_tokens == 0:
        # a stats artifact fitted on an empty / all-empty-text corpus:
        # avgdl is undefined (the exact_int path only divides lazily
        # for docs that have tokens, so it never trips this)
        raise ValueError(
            "bm25: idf_mode='ln' needs corpus stats with s_tokens > 0 "
            "(avgdl undefined on an empty or all-empty-text corpus)"
        )
    if use_ln:
        idf = {
            t: math.log(1.0 + (n_docs - d + 0.5) / (d + 0.5))
            for t, d in stats["dfreq"].items()
        }
        # k1*(1 - b) and k1*b/avgdl with k1=1.2, b=0.75, avgdl=S/N
        k1_one_minus_b = 1.2 * 0.25
        k1_b_over_avgdl = 1.2 * 0.75 * n_docs / s_tokens
    else:
        idf = {
            t: (1000 * (2 * n_docs - 2 * d + 1)) // (2 * d + 1)
            for t, d in stats["dfreq"].items()
        }
    qlist = [(int(qid), list(ts)) for qid, ts in queries]
    # re.ASCII for Java/RE2 parity (same as bpe_apply and the dedup
    # shinglers): Python \s otherwise matches Unicode whitespace
    # (\xa0,  , ...), diverging from pass-1 bm25_corpus_stats
    # (Spark split) and the DuckDB oracle on such text — tf>0 with
    # df=0 would maximally inflate idf.
    ws = re.compile(r"\s+", re.ASCII)

    score_col = "score" if use_ln else "score_e9"
    out_schema = (
        f"query_id long, doc_id long, n_terms_hit long, "
        f"{score_col} {'double' if use_ln else 'long'}"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                w = [x for x in ws.split((text or "").lower().strip()) if x]
                dl = len(w)
                if dl == 0:
                    continue
                counts: dict[str, int] = {}
                for x in w:
                    if x in idf:
                        counts[x] = counts.get(x, 0) + 1
                if not counts:
                    continue
                if use_ln:
                    denom_base = k1_one_minus_b + k1_b_over_avgdl * dl
                else:
                    t2 = (9 * dl * n_docs) // s_tokens
                for qid, ts in qlist:
                    sc = 0.0 if use_ln else 0
                    hits = 0
                    for t in ts:
                        tf = counts.get(t, 0)
                        if tf == 0:
                            continue
                        hits += 1
                        if use_ln:
                            sc += idf[t] * (tf * 2.2 / (tf + denom_base))
                        else:
                            sc += idf[t] * (
                                (22 * tf * 1000000) // (10 * tf + 3 + t2)
                            )
                    if hits:
                        rows.append((qid, int(doc_id), hits, sc))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["query_id", "doc_id", "n_terms_hit", score_col],
                )

    return df.select(F.col(id_col), F.col(text_col)).mapInPandas(
        run, out_schema
    )


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[int, list[str]]],
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    idf_mode: str = "exact_int",
) -> DataFrame:
    """Top-k documents per query by exact-integer BM25:
    :func:`bm25_corpus_stats` (pass 1) + :func:`bm25_score` (pass 2) +
    a WindowGroupLimit rank.

    `queries`: [(query_id, [term, ...]), ...] — a small trusted query
    set (an eval suite, a seed corpus's characteristic terms); it is a
    bounded offline artifact shipped in the kernel closure, never
    data-sized.

    Returns (query_id, doc_id, rank, n_terms_hit, score_e9), rank 1..k
    per query, ties broken by doc_id ascending.

    CAVEAT — the default ``idf_mode="exact_int"`` is a BM25 surrogate,
    not ln-BM25-equivalent for multi-term queries: the rational idf
    substitute is monotone in df, so SINGLE-term rankings match true
    BM25 exactly, but the sum over terms reweights rare terms
    ~exponentially vs ``ln`` idf, and multi-term top-k can differ
    materially from standard BM25. It is internally consistent,
    deterministic across engines, and oracle-matched — choose it for
    reproducibility. For standard multi-term BM25 rankings pass
    ``idf_mode="ln"`` (Lucene-smoothed log idf, float scores in a
    ``score`` column, cross-engine to float tolerance — see
    :func:`bm25_score`).
    """
    stats = bm25_corpus_stats(df, queries, text_col=text_col)
    scored = bm25_score(
        df, queries, stats, id_col=id_col, text_col=text_col,
        idf_mode=idf_mode,
    )
    score_col = "score" if idf_mode == "ln" else "score_e9"
    w = Window.partitionBy("query_id").orderBy(
        F.desc(score_col), F.asc("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("doc_id").alias(id_col),
            F.col("rank").cast("long").alias("rank"),
            "n_terms_hit",
            score_col,
        )
    )
