"""End-to-end pretraining-data pipeline (examples/pretrain_pipeline):
stage invariants on real testdata + byte-identical determinism across
re-runs."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "examples", "pretrain_pipeline"
    ),
)

from pipeline import run_pipeline  # noqa: E402

import dataclasses

import pytest

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet"))


def _pin(result):
    """Materialize every frame of a PipelineResult once (lazy
    localCheckpoint). The pipeline returns LAZY frames, so every
    action in a test otherwise re-executes the full multi-stage
    lineage — pinning changes no value, only how often the pipeline
    runs. Used by the shared module fixture below."""
    reps = {
        f.name: getattr(result, f.name).localCheckpoint(eager=False)
        for f in dataclasses.fields(result)
        if getattr(result, f.name) is not None
    }
    return dataclasses.replace(result, **reps)


@pytest.fixture(scope="module")
def base_run(spark):
    """ONE canonical seq_len=256 pipeline run shared by the
    stage-invariant, determinism (side a), and refresh (first run)
    tests — they all consume the identical call; sharing it cuts two
    full pipeline executions and pins the frames so each assertion
    reads materialized data instead of replaying the whole lineage."""
    return _pin(run_pipeline(spark, _docs(spark), seq_len=256))


def test_pipeline_stage_invariants(spark, base_run):
    docs = _docs(spark)
    n_raw = docs.count()
    r = base_run

    n_good = r.quality.filter(F.col("keep")).count()
    assert 0 < n_good <= n_raw

    kept = r.kept.cache()
    n_kept = kept.count()
    assert 0 < n_kept <= n_good  # dedup only removes

    # every kept doc survived BOTH dedup stages: it is its exact-group
    # canonical and not a near-dup cluster loser
    exact_losers = r.exact_groups.filter(~F.col("is_canonical")).select("doc_id")
    assert kept.join(exact_losers, "doc_id", "left_semi").count() == 0
    near_losers = r.near_clusters.filter(F.col("id") != F.col("component"))
    assert (
        kept.join(
            near_losers.select(F.col("id").alias("doc_id")), "doc_id", "left_semi"
        ).count()
        == 0
    )

    # split partitions the kept corpus exactly
    sizes = {row["split"]: row["n_docs"] for row in r.split_sizes.collect()}
    assert sum(sizes.values()) == n_kept
    assert set(sizes) <= {"train", "val", "test"}

    # packing conserves tokens over the train split
    train = kept.filter(F.col("split") == "train")
    from kamu_cli_spark.operators.text import token_count

    total_tokens = train.select(
        F.sum(token_count(F.col("text"))).alias("t")
    ).collect()[0]["t"]
    packed_tokens = r.packed.agg(F.sum("n_tokens")).collect()[0][0]
    assert packed_tokens == total_tokens
    assert r.packed.agg(F.sum("n_docs")).collect()[0][0] == train.count()

    # shuffle manifest covers the train split once, positions dense
    sh = r.shuffle
    assert sh.count() == train.count()
    per_shard = sh.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("pos_in_shard").alias("mx"), F.min("pos_in_shard").alias("mn")
    )
    for row in per_shard.collect():
        assert (row["mn"], row["mx"]) == (1, row["n"]) or (
            (row["mn"], row["mx"]) == (0, row["n"] - 1)
        )

    # coverage rows exist for every kept doc and are sane
    cov = r.coverage
    assert cov.count() == n_kept
    bad = cov.filter(
        (F.col("coverage_e6") < 0) | (F.col("coverage_e6") > 1_000_000)
    ).count()
    assert bad == 0
    kept.unpersist()


def test_pipeline_is_deterministic(spark, base_run):
    docs = _docs(spark)
    a = base_run  # identical call to a fresh run_pipeline(…, 256)
    b = run_pipeline(spark, docs, seq_len=256)

    def canon(df, cols):
        return sorted(tuple(r) for r in df.select(*cols).collect())

    assert canon(a.kept, ["doc_id", "split"]) == canon(b.kept, ["doc_id", "split"])
    assert canon(a.packed, a.packed.columns) == canon(b.packed, b.packed.columns)
    assert canon(a.shuffle, a.shuffle.columns) == canon(b.shuffle, b.shuffle.columns)
    assert canon(a.vocab, a.vocab.columns) == canon(b.vocab, b.vocab.columns)


def test_refresh_run_dedupes_against_existing_corpus(spark, base_run):
    """A refresh run (existing_corpus passed) must drop re-crawled
    documents before any self-corpus stage — the kept set of a refresh
    over (old ∪ new) equals the kept set of new-only input."""
    docs = _docs(spark)
    first = base_run  # identical call to a fresh run_pipeline(…, 256)
    # the 'new crawl': everything again (all re-crawls) plus one new doc
    new_doc = (
        docs.limit(1)
        .withColumn("doc_id", F.lit(9_999).cast("long"))
        .withColumn(
            "text", F.lit("a genuinely new document about spark joins " * 30)
        )
    )
    crawl = docs.unionByName(new_doc)
    refresh = run_pipeline(
        spark, crawl, seq_len=256, existing_corpus=docs
    )
    kept_ids = {r["doc_id"] for r in refresh.kept.collect()}
    assert 9_999 in kept_ids
    first_ids = {r["doc_id"] for r in first.kept.collect()}
    assert kept_ids.isdisjoint(first_ids)  # every re-crawl was dropped


def test_semantic_stage_drops_embedding_neardups(spark):
    """With embeddings supplied, stage 4b drops within-cluster cosine
    near-dups of surviving docs: a duplicated embedding's higher-id doc
    disappears from kept, and the audit records the drop."""
    docs = _docs(spark)
    emb = (
        spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
        .withColumnRenamed("vec_id", "doc_id")
        .select("doc_id", "embedding")
    )
    base = _pin(run_pipeline(spark, docs, seq_len=256, embeddings=emb))
    assert base.semantic is not None
    audit = {r["doc_id"]: r["kept"] for r in base.semantic.collect()}
    kept_ids = {r["doc_id"] for r in base.kept.collect()}
    dropped = {i for i, keep in audit.items() if not keep}
    # every semantic loser is absent from the final corpus; survivors
    # that reached stage 4b and kept their flag stay in
    assert dropped.isdisjoint(kept_ids)
    # only docs that survived stages 1-4 compete in the audit
    assert set(audit).isdisjoint(
        {r["doc_id"] for r in base.near_clusters.filter(
            F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")).collect()}
    )
    # determinism of the composed run
    again = run_pipeline(spark, docs, seq_len=256, embeddings=emb)
    assert kept_ids == {r["doc_id"] for r in again.kept.collect()}


def test_substring_stage_strips_shared_boilerplate(spark):
    """Round-9 stage 3b: a long boilerplate footer shared by otherwise
    distinct docs is stripped before near-dup/semantic stages, and the
    docs survive with their unique bodies."""
    from examples.pretrain_pipeline.pipeline import run_pipeline

    # bodies pass the quality gate: stopwords present, sane word lengths
    footer = "the terms of use for legal" + " " + " ".join(
        f"law{i}" for i in range(6)
    )  # 12 tokens
    bodies = [
        "the data in row " + " ".join(f"word{i}{j}" for j in range(26))
        for i in range(3)
    ]
    docs = spark.createDataFrame(
        [(i, f"{bodies[i]} {footer}") for i in range(3)],
        "doc_id bigint, text string",
    )
    res = run_pipeline(spark, docs, substring_min_len=8, vocab_k=50)
    kept = {r["doc_id"]: r["text"] for r in res.kept.collect()}
    assert set(kept) == {0, 1, 2}  # all three survive (bodies distinct)
    for i in range(3):
        assert "legal0" not in kept[i]
        assert kept[i] == bodies[i]


def test_decontamination_stage_scrubs_eval_spans(spark):
    """Round-9 stage 3c: an 8+-token span lifted verbatim from the
    eval set is stripped before downstream stages; clean docs pass
    through untouched."""
    from examples.pretrain_pipeline.pipeline import run_pipeline

    bench = "what is the capital of france paris is the answer here"
    eval_set = spark.createDataFrame(
        [(9000, bench)], "doc_id bigint, text string"
    )
    body = "the data in row " + " ".join(f"tok{j}" for j in range(26))
    docs = spark.createDataFrame(
        [
            (1, f"{body} {bench}"),   # leaked benchmark text
            (2, body.replace("tok", "oth")),  # clean
        ],
        "doc_id bigint, text string",
    )
    res = run_pipeline(spark, docs, eval_set=eval_set, vocab_k=50)
    kept = {r["doc_id"]: r["text"] for r in res.kept.collect()}
    assert set(kept) == {1, 2}
    assert "capital" not in kept[1] and kept[1] == body
    assert kept[2] == body.replace("tok", "oth")


def test_dsir_and_mixture_stages(spark):
    """Stage 1c keeps exactly the tie-inclusive DSIR top fraction of
    the quality-surviving pool; stage 5b trims each source to its
    budgeted token prefix — both audits must agree with the kept set."""
    docs = _docs(spark)
    target = docs.filter(F.col("doc_id") % 5 == 0)
    weights = {f"src{i}": 1 for i in range(20)}
    r = run_pipeline(
        spark,
        docs,
        seq_len=256,
        dsir_target=target,
        dsir_keep=(1, 2),
        mixture_weights=weights,
        mixture_budget=(3, 4),
    )
    assert r.dsir is not None and r.mixture is not None

    kept = r.kept.cache()
    # every kept doc passed the DSIR gate and the mixture budget
    assert kept.join(r.dsir.select("doc_id"), "doc_id", "left_anti").count() == 0
    assert (
        kept.join(r.mixture.select("doc_id"), "doc_id", "left_anti").count()
        == 0
    )
    # the DSIR audit carries one global tie-inclusive threshold
    th = r.dsir.select("threshold_e6").distinct().collect()
    assert len(th) == 1
    assert r.dsir.filter(
        F.col("dsir_weight_e6") < th[0]["threshold_e6"]
    ).count() == 0
    # mixture only ever removes; at 3/4 budget something must go
    n_mix = r.mixture.count()
    assert 0 < n_mix
    assert kept.count() <= n_mix
