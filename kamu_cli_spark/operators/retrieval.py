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

Every quantity is a BIGINT and every division is integer floor
division, so Spark and any ANSI engine agree bit-for-bit. Headroom:
idf_e3 * weight_e6 < 2^63 while N < ~6e9 documents — comfortably past
a 100 TB corpus; (9 * dl * N) stays under 2^63 while dl * N < 1e18.

Plan shape (scale-first):
    per-term tf via array filter        -- narrow map over the token
                                           array, NO explode/shuffle;
                                           the query vocabulary is a
                                           broadcast literal
    groupBy(term) df                    -- |query vocab| rows, map-side
                                           combined, broadcast back
    broadcast join terms->queries       -- tiny literal dim
    groupBy(query_id, doc_id) sum       -- the one data-sized shuffle,
                                           keyed on (query, doc): only
                                           docs matching >= 1 term ship
    WindowGroupLimit top-k per query    -- rank <= k prunes map-side

No cartesian product, no Python UDF, no driver collect beyond the two
corpus scalars (N, S) — the same bounded-artifact contract as
tfidf_topk's cached_count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kamu_cli_spark.operators.text import tokens


def bm25_topk(
    df: DataFrame,
    queries: list[tuple[int, list[str]]],
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents per query by exact-integer BM25.

    `queries`: [(query_id, [term, ...]), ...] — a small trusted query
    set (an eval suite, a seed corpus's characteristic terms); it is a
    bounded offline artifact broadcast in the plan, never data-sized.

    Returns (query_id, doc_id, rank, n_terms_hit, score_e9), rank 1..k
    per query, ties broken by doc_id ascending.
    """
    if not queries:
        raise ValueError("bm25_topk: queries list is empty")
    spark = df.sparkSession

    toks = df.select(
        F.col(id_col),
        tokens(F.lower(F.col(text_col))).alias("__toks"),
    ).withColumn("dl", F.size("__toks"))

    # corpus scalars: one bounded 1-row aggregate (N docs, S tokens)
    stats = toks.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    n_docs, s_tokens = int(stats["n"]), int(stats["s"])
    if n_docs == 0:
        raise ValueError("bm25_topk: empty corpus")

    vocab = sorted({t for _, ts in queries for t in ts})
    # per-term tf as |vocab| array-filter columns, unpivoted via stack:
    # a narrow map — tf never shuffles document rows
    def _tf(term: str):
        # closure, not a default arg: a 2-parameter lambda would make
        # F.filter bind the second parameter to the ELEMENT INDEX
        return F.size(F.filter("__toks", lambda x: x == F.lit(term)))

    tf_cols = [_tf(term).alias(f"__tf_{i}") for i, term in enumerate(vocab)]
    stack_expr = "stack({n}, {pairs}) as (term, tf)".format(
        n=len(vocab),
        pairs=", ".join(
            f"'{t}', __tf_{i}" for i, t in enumerate(vocab)
        ),
    )
    tf = (
        toks.select(F.col(id_col), F.col("dl"), *tf_cols)
        .select(F.col(id_col), F.col("dl"), F.expr(stack_expr))
        .filter(F.col("tf") > 0)
        # int -> long BEFORE the arithmetic: 22 * tf * 1e6 and
        # 9 * dl * N overflow int32 at realistic lengths
        .withColumn("tf", F.col("tf").cast("long"))
        .withColumn("dl", F.col("dl").cast("long"))
    )

    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qmap = spark.createDataFrame(
        [(qid, t) for qid, ts in queries for t in ts],
        "query_id int, term string",
    )

    idf_e3 = F.expr(
        f"(1000 * (2 * {n_docs} - 2 * df + 1)) div (2 * df + 1)"
    )
    scored = (
        tf.join(
            F.broadcast(dfreq.select("term", idf_e3.alias("idf_e3"))), "term"
        )
        .join(F.broadcast(qmap), "term")
        .withColumn(
            "__t2", F.expr(f"(9 * dl * {n_docs}) div {s_tokens}")
        )
        .withColumn(
            "contrib",
            F.expr("idf_e3 * ((22 * tf * 1000000) div (10 * tf + 3 + __t2))"),
        )
    )
    agg = scored.groupBy("query_id", id_col).agg(
        F.count(F.lit(1)).alias("n_terms_hit"),
        F.sum("contrib").alias("score_e9"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_e9"), F.asc(id_col)
    )
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            F.col("rank").cast("long").alias("rank"),
            F.col("n_terms_hit").cast("long").alias("n_terms_hit"),
            F.col("score_e9").cast("long").alias("score_e9"),
        )
    )
