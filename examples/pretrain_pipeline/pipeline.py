"""End-to-end pretraining-data pipeline — the composition story.

Every stage exists as an individually oracle-gated operator; this
example wires them into the pipeline a training-data team actually
runs, in the canonical order:

    raw documents
      └─ 1. quality filter   (Gopher-style rule battery, keep/drop)
      └─ 1b. LM quality gate  (optional: CCNet-style bigram-LM
                              familiarity vs a curated reference;
                              drops gibberish the rules can't see)
      └─ 1c. DSIR selection  (optional: keep the top fraction by
                              target-vs-pool LM contrast — Xie et al.
                              importance resampling, tie-inclusive
                              exact threshold)
      └─ 2. PII scrub audit  (emails/IPs/phones counted + fingerprint)
      └─ 3. exact dedup      (normalized-text fingerprint, min-id wins)
      └─ 3b. substring dedup (optional: Lee et al. ExactSubstr —
                              strip every token span ≥ L repeated
                              verbatim anywhere in the corpus)
      └─ 3c. decontamination (optional: strip every token span ≥ L
                              appearing verbatim in the held-out
                              eval/benchmark set — GPT-3 App. C)
      └─ 4. near-dup dedup   (MinHash → LSH bands → connected
                              components; cluster min-id wins)
      └─ 4b. semantic dedup  (optional, needs embeddings: k-means
                              clusters → within-cluster cosine
                              near-dups dropped, SemDeDup-style)
      └─ 5. vocabulary + OOV coverage (corpus-fit quality signal)
      └─ 5b. mixture rebalance (optional: per-source token budgets in
                               mixture-weight proportion — greedy
                               salted-md5 prefixes, bucket-local sorts)
      └─ 6. train/val/test split (deterministic md5 thresholds)
      └─ 7. sequence packing  (train split only; bucketed
                               contiguous-fill manifest)
      └─ 8. global shuffle    (deterministic shard + position manifest)

Everything is deterministic end to end: re-running the pipeline on the
same input yields byte-identical manifests (asserted by the test), so
the training corpus is reproducible from the ledger alone — the same
property the ODF chain gives ingest (no reference twin; this surface
is the LLM-pipeline extension of it).

Scale shape: stages 1-3 and 5-6 are scan + one keyed shuffle each;
stage 4 is the sub-quadratic sketch path (shingle/minhash Arrow
kernels, single-shuffle LSH banding, adaptive connected components);
stages 7-8 are bucketed windows / terasort shards — no stage holds a
global sort or an unbounded driver collect.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamu_cli_spark.operators.curation import pii_scrub, quality_filter
from kamu_cli_spark.operators.dedup import (
    connected_components,
    dedup_against,
    dedup_exact,
    lsh_candidate_pairs,
    minhash_signature,
    strip_contaminated_spans,
    strip_duplicate_spans,
)
from kamu_cli_spark.operators.clustering import semantic_dedup
from kamu_cli_spark.operators.sampling import (
    global_shuffle_manifest,
    mixture_rebalance,
    pack_sequences,
    split_assignment,
)
from kamu_cli_spark.operators.text import (
    dsir_select,
    ngram_lm_fit,
    ngram_lm_score,
    vocab_coverage,
    vocabulary,
)


@dataclass
class PipelineResult:
    kept: DataFrame            # surviving documents (doc_id, text, split)
    quality: DataFrame         # per-doc rule audit
    pii: DataFrame             # per-doc scrub audit
    exact_groups: DataFrame    # exact-dup groups
    near_clusters: DataFrame   # near-dup components (id, component)
    semantic: DataFrame | None  # SemDeDup audit (id, cluster, kept), if embeddings given
    dsir: DataFrame | None     # DSIR-kept docs (id, weight, threshold), if target given
    mixture: DataFrame | None  # mixture-kept rows (id, stratum, tokens), if weights given
    vocab: DataFrame           # induced vocabulary
    coverage: DataFrame        # per-doc OOV coverage
    split_sizes: DataFrame     # (split, n_docs)
    packed: DataFrame          # train-split packing manifest
    shuffle: DataFrame         # global shuffle/shard manifest


def run_pipeline(
    spark: SparkSession,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = 500,
    minhash_hashes: int = 16,
    lsh_bands: int = 4,
    seq_len: int = 512,
    fractions: dict[str, float] | None = None,
    existing_corpus: DataFrame | None = None,
    lm_reference: DataFrame | None = None,
    lm_model: DataFrame | None = None,
    lm_min_familiarity_e6: int = 10_000,
    embeddings: DataFrame | None = None,
    vec_col: str = "embedding",
    sem_k: int = 8,
    sem_threshold: float = 0.35,
    semantic_centroids: list | None = None,
    substring_min_len: int | None = None,
    eval_set: DataFrame | None = None,
    decontam_min_len: int = 8,
    dsir_target: DataFrame | None = None,
    dsir_keep: tuple[int, int] = (1, 4),
    mixture_weights: dict[str, int] | None = None,
    mixture_budget: tuple[int, int] = (1, 2),
    strata_col: str = "source",
) -> PipelineResult:
    """Run the full curation pipeline over `docs`; outputs are
    unmaterialized DataFrames so a caller can sink each stage into a
    dataset (DataWriter) or export shards directly — EXCEPT when
    `embeddings` is passed: stage 4b's k-means fit runs eagerly (seed
    collect + update jobs) and the assignment is localCheckpoint-ed
    before this function returns.

    `existing_corpus`: the already-curated training set a REFRESH run
    dedupes against (step 0) — exact cross-corpus anti-join on the
    normalized fingerprint before any self-corpus work, so re-crawled
    documents never re-enter."""
    # 0. cross-corpus dedup against the existing training set
    if existing_corpus is not None:
        docs = dedup_against(docs, existing_corpus, text_col=text_col)

    # 1. quality gate
    quality = quality_filter(docs, text_col=text_col, id_col=id_col)
    good_ids = quality.filter(F.col("keep")).select(id_col)
    good = docs.join(good_ids, id_col, "left_semi")

    # 1b. optional LM quality gate (CCNet): score familiarity against
    # a bigram model fit on the curated reference; drop docs below the
    # threshold — the perplexity-filter axis the rule battery can't
    # see (gibberish with good lengths/ratios). Pass `lm_model` (a
    # model_store.load_ngram_lm_model frame) to score against a FIXED
    # ledger artifact instead of refitting — the run is then as-of
    # reproducible, mirroring semantic_centroids for stage 4b.
    if lm_model is not None or lm_reference is not None:
        lm = (
            lm_model
            if lm_model is not None
            else ngram_lm_fit(lm_reference, text_col=text_col)
        )
        fam = ngram_lm_score(good, lm, id_col=id_col, text_col=text_col)
        good = good.join(
            fam.filter(
                F.col("familiarity_e6") >= lm_min_familiarity_e6
            ).select(id_col),
            id_col,
            "left_semi",
        )

    # 1c. optional DSIR selection: keep the top dsir_keep fraction by
    # target-vs-pool LM contrast (tie-inclusive exact threshold via
    # the bounded weight histogram) — the importance-resampling cousin
    # of the 1b absolute-familiarity gate
    dsir = None
    if dsir_target is not None:
        dsir = dsir_select(
            good, dsir_target,
            keep_num=dsir_keep[0], keep_den=dsir_keep[1],
            id_col=id_col, text_col=text_col,
        )
        good = good.join(dsir.select(id_col), id_col, "left_semi")

    # 2. PII audit rides alongside (the scrubbed corpus is derivable;
    # the audit is what reviewers consume)
    pii = pii_scrub(good, text_col=text_col, id_col=id_col)

    # 3. exact dedup: keep fingerprint-canonical docs
    exact = dedup_exact(good, id_col, text_col=text_col)
    exact_survivors = exact.filter(F.col("is_canonical")).select(id_col)
    uniq = good.join(exact_survivors, id_col, "left_semi")

    # 3b. optional substring-level dedup (round-9): strip every token
    # span ≥ substring_min_len repeated verbatim anywhere in the
    # surviving corpus (boilerplate removal); downstream stages see the
    # stripped text, so near-dup/semantic stages stop matching docs on
    # shared boilerplate alone
    if substring_min_len is not None:
        stripped = strip_duplicate_spans(
            uniq, id_col, text_col=text_col, min_len=substring_min_len
        )
        uniq = uniq.drop(text_col).join(
            stripped.select(id_col, F.col("clean_text").alias(text_col)),
            id_col,
        )

    # 3c. optional span-level decontamination against the held-out
    # eval/benchmark set: covered tokens stripped in one stateless
    # Arrow map (the same kernel a live crawl intake runs)
    if eval_set is not None:
        scrubbed = strip_contaminated_spans(
            uniq, eval_set, id_col, text_col=text_col,
            min_len=decontam_min_len,
        )
        uniq = uniq.drop(text_col).join(
            scrubbed.select(id_col, F.col("clean_text").alias(text_col)),
            id_col,
        )

    # 4. near-dup dedup: LSH candidates -> components -> min-id wins
    sig = minhash_signature(
        uniq, id_col, num_hashes=minhash_hashes, shingle_n=3, text_col=text_col
    )
    pairs = lsh_candidate_pairs(
        sig, id_col, num_hashes=minhash_hashes, bands=lsh_bands
    )
    clusters = connected_components(pairs, "id_a", "id_b")
    near_losers = clusters.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    kept_docs = uniq.join(near_losers, id_col, "left_anti")

    # 4b. optional semantic dedup: embeddings keyed by id_col; only
    # embeddings of still-surviving docs compete, so a doc never loses
    # to one already dropped upstream
    semantic = None
    if embeddings is not None:
        # semantic_centroids (e.g. model_store.load_kmeans_model output)
        # pins stage 4b to a LEDGER artifact instead of an in-run fit,
        # making the whole pipeline as-of reproducible from the chain
        semantic = semantic_dedup(
            embeddings.join(kept_docs.select(id_col), id_col, "left_semi"),
            vec_col=vec_col,
            id_col=id_col,
            k=sem_k,
            threshold=sem_threshold,
            centroids=semantic_centroids,
        )
        sem_losers = semantic.filter(~F.col("kept")).select(id_col)
        kept_docs = kept_docs.join(sem_losers, id_col, "left_anti")

    # 5. corpus fit: vocabulary over the SURVIVING corpus + coverage
    vocab = vocabulary(kept_docs, text_col=text_col, top_k=vocab_k)
    coverage = vocab_coverage(
        kept_docs, vocab, id_col=id_col, text_col=text_col
    )

    # 5b. optional mixture rebalance: trim each stratum to its
    # mixture-weighted share of the token budget (greedy salted-md5
    # prefixes; the vocab/coverage signals above are computed on the
    # PRE-mix corpus, the export stages below on the mixed one)
    mixture = None
    if mixture_weights is not None:
        mixture = mixture_rebalance(
            kept_docs, mixture_weights,
            budget_num=mixture_budget[0], budget_den=mixture_budget[1],
            id_col=id_col, strata_col=strata_col, text_col=text_col,
        )
        kept_docs = kept_docs.join(mixture.select(id_col), id_col, "left_semi")

    # 6. deterministic split
    kept = kept_docs.withColumn(
        "split", split_assignment(F.col(id_col), fractions)
    )
    split_sizes = kept.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))

    # 7. pack the train split into fixed-budget sequences
    train = kept.filter(F.col("split") == "train")
    packed = pack_sequences(train, id_col, text_col=text_col, seq_len=seq_len)

    # 8. shuffled shard manifest for the exporter
    shuffle = global_shuffle_manifest(train, id_col)

    return PipelineResult(
        kept=kept,
        quality=quality,
        pii=pii,
        exact_groups=exact,
        near_clusters=clusters,
        semantic=semantic,
        dsir=dsir,
        mixture=mixture,
        vocab=vocab,
        coverage=coverage,
        split_sizes=split_sizes,
        packed=packed,
        shuffle=shuffle,
    )
