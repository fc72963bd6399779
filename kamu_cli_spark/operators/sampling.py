"""Deterministic dataset splitting / sampling for training-data
pipelines.

A large-scale corpus pipeline needs train/val/test assignment that is
(a) deterministic — re-running the pipeline or adding late data must
never move a document between splits, (b) driver-free — no global
shuffle or random() state, and (c) stratifiable — composition audits
per language/source.

The assignment here hashes the stable record key with md5 and compares
a fixed-width hex prefix against precomputed thresholds. Lexicographic
order of lowercase hex equals numeric order, so the comparison is a
pure codegen'd string compare: no UDF, no shuffle, filter-pushdown
safe. Any engine with md5() (DuckDB, Trino, Spark) computes the exact
same assignment, which is also what makes the split auditable across
systems.

Reference parity: kamu-cli has no built-in splitter (splits are
user-SQL there); this is part of the training-data extension surface
alongside operators/dedup.py and operators/text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Width of the hex prefix used for bucketing: 4 hex chars = 65536
# buckets, plenty of resolution for percent-level split fractions while
# keeping the comparison a short string compare.
_HEX_WIDTH = 4
_BUCKETS = 16 ** _HEX_WIDTH


def _salted_key(key: Column, salt: str) -> Column:
    """THE salted-md5 key every sampler in this module ranks by — one
    copy, because the cross-engine auditability of splits/shuffles/
    stratified picks depends on all of them computing the identical
    expression (md5(cast(key AS string) || salt), no separator)."""
    return F.md5(F.concat(key.cast("string"), F.lit(salt)))


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, str]]:
    """[(split_name, upper_hex_bound_exclusive)] in declaration order;
    the last split takes the remainder. Fractions must sum to ~1."""
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions sum to {total}, expected 1.0")
    out: list[tuple[str, str]] = []
    acc = 0.0
    for name, frac in fractions.items():
        acc += frac
        bound = min(_BUCKETS, int(acc * _BUCKETS))
        out.append((name, format(bound, f"0{_HEX_WIDTH}x")))
    return out


def split_assignment(
    key: Column,
    fractions: dict[str, float] | None = None,
    salt: str = "",
) -> Column:
    """Deterministic split label for a record key.

    `salt` lets independent experiments draw independent splits from
    the same keys (different salt → uncorrelated assignment).
    """
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    h = F.substring(_salted_key(key, salt), 1, _HEX_WIDTH)
    thresholds = split_thresholds(fractions)
    expr = F.lit(thresholds[-1][0])  # remainder split
    for name, bound in reversed(thresholds[:-1]):
        expr = F.when(h < F.lit(bound), F.lit(name)).otherwise(expr)
    return expr


def stratified_split_summary(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    size_col: str | None = None,
    fractions: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Split composition audit: per (split, stratum) document counts
    and total payload size. One hash-aggregate over (split, stratum) —
    a few hundred groups regardless of corpus size, so the shuffle is
    bytes, not data."""
    assigned = df.withColumn(
        "split", split_assignment(F.col(key_col), fractions, salt)
    )
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if size_col is not None:
        aggs.append(F.sum(F.col(size_col)).alias("total_size"))
    return assigned.groupBy("split", strata_col).agg(*aggs)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_cols: list[str],
    n_per_stratum: int,
    salt: str = "",
) -> DataFrame:
    """Deterministic per-stratum cap — the domain/language balancing
    step: keep at most `n_per_stratum` rows per stratum, chosen by
    md5-rank of the stable key (salted for independent draws), with
    the id as the total-order tiebreak. Adding rows to OTHER strata
    never changes a stratum's selection, and the same rows are picked
    by any md5-capable engine.

    Returns the surviving rows plus ``srank`` (1-based rank within the
    stratum). One window shuffle on the strata key; Spark's
    WindowGroupLimit pushes the rank<=n filter map-side, so hot strata
    don't materialize beyond the cap per task."""
    if n_per_stratum < 1:
        raise ValueError("n_per_stratum must be positive")
    if not strata_cols:
        # an empty partitionBy degenerates to ONE task globally sorting
        # the corpus — never what a balancing step means
        raise ValueError("strata_cols must name at least one column")
    from pyspark.sql import Window

    h = _salted_key(F.col(id_col), salt)
    w = (
        Window.partitionBy(*[F.col(c) for c in strata_cols])
        .orderBy(h, F.col(id_col))
    )
    return (
        df.withColumn("srank", F.row_number().over(w))
        .filter(F.col("srank") <= n_per_stratum)
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    seq_len: int = 2048,
    buckets: int = 32,
) -> DataFrame:
    """Deterministic sequence packing for training export: documents
    fill fixed-token-budget sequences in id order, and each document is
    assigned the sequence where its span STARTS (contiguous-fill
    packing — the deterministic, shuffle-friendly variant of the greedy
    bin packing used to batch LLM training data).

    Scale design: packing is inherently sequential, so a single global
    order would mean a single-partition sort. Instead documents hash
    into `buckets` independent packing streams (one window per bucket —
    the shuffle is keyed on the bucket, sorts are per-bucket) and each
    bucket packs its own id-ordered stream. At 100 TB, `buckets` scales
    with the cluster while every sequence stays deterministic.

    Returns per-sequence stats: (bucket, seq_in_bucket, n_docs,
    n_tokens, first_doc, last_doc) — the manifest a downstream exporter
    materializes sequences from.
    """
    from pyspark.sql import Window

    from kamu_cli_spark.operators.text import token_count

    d = df.select(
        F.col(id_col),
        token_count(F.col(text_col)).alias("n_tokens"),
        (F.col(id_col) % buckets).alias("bucket"),
    )
    w = Window.partitionBy("bucket").orderBy(id_col)
    cum = F.sum("n_tokens").over(w)
    seq = F.floor((cum - F.col("n_tokens")) / F.lit(float(seq_len))).cast("long")
    return (
        d.select("bucket", F.col(id_col), "n_tokens", seq.alias("seq_in_bucket"))
        .groupBy("bucket", "seq_in_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
    )


def global_shuffle_manifest(
    df: DataFrame,
    key_col: str,
    salt: str = "shuffle",
    shard_hex_chars: int = 2,
) -> DataFrame:
    """Deterministic global corpus shuffle + sharding for training
    export: every record gets a pseudo-random sort key (md5 of its
    stable key), a shard (the key's leading hex chars — 16^n shards),
    and its exact position within the shard.

    This is the "shuffle the corpus before training" step as a
    reproducible manifest: re-running the pipeline, on any engine,
    yields byte-identical shard files, and adding late data shifts
    positions only within the shards the new keys land in.

    Scale design: the plan is one shuffle keyed on `shard` plus a
    per-shard sort (the distributed sort-by-generated-key shape —
    terasort). No global order, no single-partition window; shard
    count (16^`shard_hex_chars`) is chosen to match the cluster, and
    md5 keys are uniform so shards stay balanced regardless of input
    skew.
    """
    from pyspark.sql import Window

    skey = _salted_key(F.col(key_col), salt)
    a = df.select(F.col(key_col), skey.alias("__skey"))
    shard = F.substring(F.col("__skey"), 1, shard_hex_chars)
    w = Window.partitionBy("shard").orderBy("__skey", key_col)
    return (
        a.select(key_col, shard.alias("shard"), "__skey")
        .select(
            key_col,
            "shard",
            F.row_number().over(w).alias("pos_in_shard"),
        )
    )


def mixture_rebalance(
    df: DataFrame,
    weights: dict[str, int],
    budget_num: int = 1,
    budget_den: int = 2,
    id_col: str = "doc_id",
    strata_col: str = "source",
    text_col: str = "text",
    salt: str = "",
    materialize: bool = True,
) -> DataFrame:
    """Token-budget mixture rebalancing — the data-mixing stage of a
    pretraining pipeline: given integer mixture weights per stratum
    (e.g. {"wiki": 3, "web": 1}) and a global token budget
    ``B = div(T * budget_num, budget_den)`` (T = total tokens across
    the in-mix strata), keep each stratum's greedy salted-md5-ordered
    prefix of documents while the cumulative token count BEFORE the
    doc is < ``B_s = div(B * w_s, sum(w))``. Deterministic: the same
    rows are picked by any md5-capable engine, adding docs to one
    stratum never changes another's selection, and the boundary doc
    overshoots by < one document (the only order-free greedy).

    Scale design — NO stratum-sized sort: a naive per-stratum
    cumulative window would range-sort every stratum into one task
    each. Instead the md5 keyspace is bucketed on the first 4 hex
    chars (the module's _HEX_WIDTH convention): per-(stratum, bucket)
    token sums are a map-side-combined shuffle to <= |strata| * 65536
    rows, the bucket-level cumulative runs over that BOUNDED frame and
    broadcasts back, and the exact per-doc cumulative is ONE window
    partitioned by (stratum, bucket) — each partition is ~1/65536 of
    its stratum, so the sort is local and parallel at any corpus size
    (the global per-stratum order (md5, id) decomposes exactly into
    bucket order + within-bucket order because the bucket is a prefix
    of the md5). One corpus scan, one tokenize, one data-sized
    shuffle. Returns the kept rows as (id, stratum, n_tokens).

    The histogram pass and the selection pass both read the tokenized
    (id, stratum, n_tokens, md5) projection; ``materialize`` (default)
    localCheckpoints it DISK_ONLY — ~60 B/doc serialized, the
    materialize_occurrences trade from dedup.duplicate_spans — so the
    corpus is scanned and tokenized ONCE instead of once per pass
    (measured 11.2 s → 7 s at sf10). The checkpoint is released by the
    ContextCleaner when the returned plan is dropped; pass False for a
    pure-lazy plan (streaming composition, plan-shape tests).
    """
    if budget_num < 1 or budget_den < budget_num:
        raise ValueError("budget fraction must satisfy 0 < num/den <= 1")
    if not weights or any(w < 1 for w in weights.values()):
        raise ValueError("weights must be a non-empty map of ints >= 1")
    from kamu_cli_spark.operators.text import token_count

    spark = df.sparkSession
    w_total = sum(weights.values())
    wmap = spark.createDataFrame(
        sorted(weights.items()), f"{strata_col} string, __w long"
    )

    h = _salted_key(F.col(id_col), salt)
    base = (
        df.select(
            F.col(id_col),
            F.col(strata_col),
            token_count(F.col(text_col)).cast("long").alias("n_tokens"),
        )
        .join(F.broadcast(wmap), strata_col)  # drops out-of-mix strata
        .withColumn("__h", h)
        .withColumn("__b", F.substring("__h", 1, _HEX_WIDTH))
    )
    if materialize:
        from pyspark import StorageLevel

        base = base.localCheckpoint(
            eager=True, storageLevel=StorageLevel.DISK_ONLY
        )

    # bounded histogram: per-(stratum, bucket) token sums
    hist = base.groupBy(strata_col, "__w", "__b").agg(
        F.sum("n_tokens").alias("__bt")
    )
    total = hist.agg(F.sum("__bt").alias("__t"))
    win = Window.partitionBy(strata_col).orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # per-stratum budget and per-bucket cumulative-before, all exact
    buckets = (
        hist.crossJoin(F.broadcast(total))
        .withColumn(
            "__bs",
            F.expr(
                f"div(div(__t * {budget_num}, {budget_den}) * __w, {w_total})"
            ),
        )
        .withColumn(
            "__cb", F.coalesce(F.sum("__bt").over(win), F.lit(0))
        )
        # buckets fully past the budget never ship their docs at all
        .filter(F.col("__cb") < F.col("__bs"))
        .select(strata_col, "__b", "__cb", "__bs")
    )
    # exact per-doc cumulative: bucket base + within-bucket prefix sum;
    # the window partitions on (stratum, BUCKET), so each sort task
    # holds ~1/65536 of a stratum — never the stratum itself
    doc_w = Window.partitionBy(strata_col, "__b").orderBy(
        "__h", F.col(id_col)
    ).rowsBetween(Window.unboundedPreceding, -1)
    return (
        base.join(F.broadcast(buckets), [strata_col, "__b"])
        .withColumn(
            "__doc_cb",
            F.col("__cb")
            + F.coalesce(F.sum("n_tokens").over(doc_w), F.lit(0)),
        )
        .filter(F.col("__doc_cb") < F.col("__bs"))
        .select(F.col(id_col), F.col(strata_col), F.col("n_tokens"))
    )


def leakage_safe_split(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    fractions: dict[str, float] | None = None,
    salt: str = "",
) -> DataFrame:
    """Split assignment that can NEVER leak near-duplicates across the
    train/eval boundary: the hash is taken over the document's
    near-dup CLUSTER representative, not the document itself, so an
    entire duplicate cluster lands in one split by construction — the
    standard eval-integrity requirement plain per-doc splitting
    violates (a train doc's near-twin in test inflates eval scores).

    `clusters`: (id, component) pairs from
    :func:`~kamu_cli_spark.operators.dedup.connected_components` over
    the near-dup pair graph (LSH/Jaccard/SemDeDup — any). Docs absent
    from it are singletons: their component is their own id, so they
    hash exactly like the plain per-doc split.

    Plan shape: one broadcast-or-shuffle left join against the
    cluster table (candidate graphs are corpus-fraction-sized — LSH's
    point) + the stateless md5 assignment; no new shuffle class. Same
    md5-threshold contract as every sampler here, so any ANSI engine
    reproduces the assignment bit-for-bit."""
    comp = clusters.select(
        F.col(clusters.columns[0]).alias(id_col),
        F.col(clusters.columns[1]).alias("__component"),
    )
    rep = F.coalesce(F.col("__component"), F.col(id_col))
    return (
        df.join(comp, id_col, "left")
        .withColumn(
            "split", split_assignment(rep, fractions, salt)
        )
        .withColumn("__component", rep)
    )
