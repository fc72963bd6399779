"""BPE tokenizer induction over a corpus — exact, distributed.

Byte-pair encoding (Sennrich et al. 2016, arXiv:1508.07909) learns a
subword vocabulary by repeatedly merging the most frequent adjacent
symbol pair; it is the tokenizer-training step of every modern
pretraining pipeline, so an engine that curates training data should
also be able to induce the tokenizer from the curated corpus. No
reference counterpart (kamu-cli has no ML/tokenizer operators);
LLM-pipeline surface like the dedup/LM families.

Scale design (100 TB): the corpus is scanned ONCE, to build the
word-frequency vocabulary (one map-side-combined groupBy — the same
exchange shape as every counting operator here). Everything after runs
on the VOCABULARY table, which is bounded by the language, not the
data: pair counting per iteration is one explode over adjacent symbol
slices weighted by word count (arrays_zip of offset slices — the
ngram_lm shape, no per-pair lambda) + one map-side-combined sum;
picking the winning pair collects exactly ONE row per iteration (the
pagerank-converged pattern: a scalar action per step, never data);
applying the merge is a stateless Arrow map over the vocab. Per-merge
cost is therefore O(|vocab|), and the vocab frame is DISK_ONLY
localCheckpoint-ed each iteration so the N-merge lineage never
replays (the pagerank lesson).

Exactness: the winning pair is (max weight, then lexicographically
smallest (left, right)) — a total order, so the merge sequence is a
pure function of the corpus. Merge application is the standard greedy
left-to-right non-overlapping pass; for self-pairs (l == r) inside a
run of equal symbols that means every other occurrence merges
("aaaa" + (a,a) -> "aa aa"). The DuckDB oracle (O_BPE in
__spark_entry__.py) replays the identical iterations as chained CTEs
with the greedy pass expressed via run-grouped window functions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.storagelevel import StorageLevel

from kamu_cli_spark.operators.text import tokens


def _word_vocab(corpus: DataFrame, text_col: str, lowercase: bool) -> DataFrame:
    t = F.col(text_col)
    toks = tokens(F.lower(t) if lowercase else t)
    return (
        corpus.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _merge_syms(left: str, right: str):
    """Greedy left-to-right non-overlapping merge of (left, right) in a
    symbol list — the canonical BPE application pass."""
    def apply(syms: list[str]) -> list[str]:
        out = []
        i, n = 0, len(syms)
        while i < n:
            if i + 1 < n and syms[i] == left and syms[i + 1] == right:
                out.append(left + right)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    return apply


def _apply_merge_arrow(vocab: DataFrame, left: str, right: str) -> DataFrame:
    """One merge applied to every word's symbol list — stateless Arrow
    map over the (word, cnt, syms) vocab frame."""
    from collections.abc import Iterator

    import pandas as pd

    apply = _merge_syms(left, right)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "cnt": pdf["cnt"],
                    "syms": [apply(list(s)) for s in pdf["syms"]],
                }
            )

    return vocab.mapInPandas(run, "word string, cnt long, syms array<string>")


def bpe_fit(
    corpus: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    lowercase: bool = True,
) -> DataFrame:
    """Learn `n_merges` BPE merges over the corpus; returns the merge
    table (rank, left, right, pair_count) with rank 1 = first merge and
    pair_count = the corpus-weighted adjacency count that won that
    round. Stops early (fewer rows) if no adjacent pair remains.

    The returned frame is a plain small DataFrame (built from the
    per-iteration single-row collects), so it composes with the model
    store exactly like the k-means centroid table."""
    if n_merges < 1:
        raise ValueError("n_merges must be positive")
    spark = corpus.sparkSession
    vocab = _word_vocab(corpus, text_col, lowercase).select(
        "word",
        "cnt",
        F.split(F.col("word"), "").alias("syms"),
    ).localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)

    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            pairs = vocab.filter(F.size("syms") >= 2).select(
                "cnt",
                F.explode(
                    F.arrays_zip(
                        F.expr("slice(syms, 1, size(syms) - 1)").alias("l"),
                        F.expr("slice(syms, 2, size(syms) - 1)").alias("r"),
                    )
                ).alias("__p"),
            ).select("cnt", "__p.l", "__p.r")
            best = (
                pairs.groupBy("l", "r")
                .agg(F.sum("cnt").alias("w"))
                .orderBy(F.desc("w"), F.asc("l"), F.asc("r"))
                .limit(1)
                .collect()  # bounded: ONE row per iteration
            )
            if not best:
                break
            left, right, w = best[0]["l"], best[0]["r"], int(best[0]["w"])
            merges.append((rank, left, right, w))
            new_vocab = _apply_merge_arrow(vocab, left, right).localCheckpoint(
                eager=True, storageLevel=StorageLevel.DISK_ONLY
            )
            vocab.unpersist()
            vocab = new_vocab
    finally:
        vocab.unpersist()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def bpe_apply(
    df: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Tokenize documents with a learned merge table: (id, n_words,
    n_chars, n_bpe_tokens, compression_e6) where n_bpe_tokens is the
    symbol count after applying every merge in rank order to each word
    and compression_e6 = floor(1e6 · n_bpe_tokens / n_chars) (1e6 =
    no compression; 0-char docs score 0) — the "how many tokens will
    this corpus cost" signal a pretraining budget needs, computed with
    the induced tokenizer instead of the whitespace/BPE-ish proxies in
    operators/text.py.

    One stateless Arrow map (stream-legal): the merge table collects
    to a broadcast list (bounded by n_merges, never the data) and each
    distinct word's tokenization memoizes per task."""
    import re
    from collections.abc import Iterator

    import pandas as pd

    ranked = [
        (r["left"], r["right"])
        for r in merges.orderBy("rank").collect()  # bounded: n_merges rows
    ]
    appliers = [_merge_syms(lf, rt) for lf, rt in ranked]
    ws = re.compile(r"\s+", re.ASCII)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def n_syms(word: str) -> int:
            v = memo.get(word)
            if v is None:
                syms = list(word)
                for ap in appliers:
                    syms = ap(syms)
                v = len(syms)
                memo[word] = v
            return v

        for pdf in batches:
            ids, nw, nc, nb, comp = [], [], [], [], []
            for i, txt in zip(pdf[id_col], pdf[text_col]):
                s = (txt or "")
                if lowercase:
                    s = s.lower()
                toks = [t for t in ws.split(s) if t]
                chars = sum(len(t) for t in toks)
                bpe = sum(n_syms(t) for t in toks)
                ids.append(int(i))
                nw.append(len(toks))
                nc.append(chars)
                nb.append(bpe)
                comp.append(1_000_000 * bpe // chars if chars else 0)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "n_words": pd.Series(nw, dtype="int64"),
                    "n_chars": pd.Series(nc, dtype="int64"),
                    "n_bpe_tokens": pd.Series(nb, dtype="int64"),
                    "compression_e6": pd.Series(comp, dtype="int64"),
                }
            )

    from kamu_cli_spark.operators.util import spread

    out = df.select(F.col(id_col), F.col(text_col))
    if not df.isStreaming:
        out = spread(out)
    return out.mapInPandas(
        run,
        f"`{id_col}` long, n_words long, n_chars long, n_bpe_tokens long, "
        "compression_e6 long",
    )


def bpe_fertility(
    df: DataFrame,
    merges: DataFrame,
    strata_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    lowercase: bool = True,
) -> DataFrame:
    """Per-stratum tokenizer-fertility audit — the fairness signal a
    multi-domain (or multi-lingual) corpus needs before committing to
    an induced tokenizer: a stratum whose text costs many more BPE
    tokens per word than the rest is under-served by the merge table
    (its idiom never won merges), which silently taxes its effective
    context length at training time.

    Output per stratum: n_docs, n_words, n_bpe_tokens,
    ``fertility_e6 = div(1e6 * n_bpe_tokens, n_words)`` (tokens per
    word; 0 for a wordless stratum) and ``compression_e6 =
    div(1e6 * n_bpe_tokens, n_chars)``. Exact integers throughout
    (< 2^63 while the corpus stays under ~9e12 BPE tokens).

    Plan: :func:`bpe_apply`'s stateless Arrow map (merge table in the
    closure) + one map-side-combined groupBy(stratum) — |strata| rows
    out; the id-equi-join attaches the stratum before the fold."""
    per = bpe_apply(
        df, merges, id_col=id_col, text_col=text_col, lowercase=lowercase
    )
    j = df.select(F.col(id_col), F.col(strata_col)).join(per, id_col)
    return (
        j.groupBy(strata_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("nw"),
            F.sum("n_bpe_tokens").alias("nb"),
            F.sum("n_chars").alias("nc"),
        )
        .select(
            strata_col,
            "n_docs",
            F.col("nw").cast("long").alias("n_words"),
            F.col("nb").cast("long").alias("n_bpe_tokens"),
            F.expr(
                "CASE WHEN nw > 0 THEN div(1000000 * nb, nw) ELSE 0 END"
            ).cast("long").alias("fertility_e6"),
            F.expr(
                "CASE WHEN nc > 0 THEN div(1000000 * nb, nc) ELSE 0 END"
            ).cast("long").alias("compression_e6"),
        )
    )
