"""Round-11 model-store extension (VERDICT r10 #4): the bigram LM —
the one curation-stage artifact (pipeline stage 1b) that wasn't yet a
ledger dataset — persisted with snapshot-CDC semantics keyed (w1, w2).
Save/load round-trips must score bit-identically (the model is exact
integers), refits must emit the CDC alphabet, and the pipeline's LM
gate must accept a ledger-loaded model."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.model_store import (
    load_ngram_lm_model,
    save_ngram_lm_model,
)
from kamu_cli_spark.operators.text import ngram_lm_fit, ngram_lm_score


def _d(day):
    return datetime(2024, 3, day, tzinfo=timezone.utc)


def _docs(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


class TestNgramLmModel:
    def test_round_trip_scores_identically(self, spark, tmp_path):
        docs = _docs(spark)
        ref = docs.filter(F.col("doc_id") % 3 == 0)
        crawl = docs.filter(F.col("doc_id") % 3 != 0)
        model = ngram_lm_fit(ref)

        ds = Dataset.create(str(tmp_path), "lm", system_time=_d(1).isoformat())
        save_ngram_lm_model(
            spark, ds, model, system_time=_d(2), source_event_time=_d(2)
        )
        loaded = load_ngram_lm_model(spark, ds)
        assert loaded is not None

        # the model itself round-trips exactly
        assert model.exceptAll(loaded).count() == 0
        assert loaded.exceptAll(model).count() == 0

        # and scoring against the loaded artifact is bit-identical
        want = {tuple(r) for r in ngram_lm_score(crawl, model).collect()}
        got = {tuple(r) for r in ngram_lm_score(crawl, loaded).collect()}
        assert got == want and len(got) > 0

    def test_refit_emits_cdc_alphabet(self, spark, tmp_path):
        docs = _docs(spark)
        ds = Dataset.create(str(tmp_path), "lm", system_time=_d(1).isoformat())
        m1 = ngram_lm_fit(docs.filter(F.col("doc_id") % 3 == 0))
        save_ngram_lm_model(
            spark, ds, m1, system_time=_d(2), source_event_time=_d(2)
        )
        head_v1 = ds.chain.head().block_hash
        # refit on a different slice: some bigrams persist with new
        # counts (corrections), some vanish (retractions), some appear
        m2 = ngram_lm_fit(docs.filter(F.col("doc_id") % 2 == 0))
        save_ngram_lm_model(
            spark, ds, m2, system_time=_d(3), source_event_time=_d(3)
        )
        ops = {
            r["op"]: r["n"]
            for r in ds.read(spark)
            .groupBy("op")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # ODF op codes: 0 = +A, 1 = -R, 2 = -C, 3 = +C
        assert ops.get(0, 0) > 0  # first poll appends
        # second poll produced changes in at least two CDC kinds
        assert sum(1 for k in (1, 2, 3) if ops.get(k, 0) > 0) >= 2

        # latest state == the refit model exactly
        loaded = load_ngram_lm_model(spark, ds)
        assert m2.exceptAll(loaded).count() == 0
        assert loaded.exceptAll(m2).count() == 0

        # as-of the first poll's head == the first model exactly
        pinned = load_ngram_lm_model(spark, ds, as_of=head_v1)
        assert m1.exceptAll(pinned).count() == 0
        assert pinned.exceptAll(m1).count() == 0

    def test_refuses_empty_or_misshapen(self, spark, tmp_path):
        ds = Dataset.create(str(tmp_path), "lm", system_time=_d(1).isoformat())
        docs = _docs(spark)
        with pytest.raises(ValueError, match="empty"):
            save_ngram_lm_model(
                spark, ds, ngram_lm_fit(docs.filter(F.lit(False)))
            )
        with pytest.raises(ValueError, match="expected ngram_lm_fit"):
            save_ngram_lm_model(spark, ds, docs.select("doc_id"))

    def test_pipeline_consumes_ledger_lm(self, spark, tmp_path):
        from examples.pretrain_pipeline.pipeline import run_pipeline

        docs = _docs(spark)
        ref = docs.filter(F.col("doc_id") % 3 == 0)
        ds = Dataset.create(str(tmp_path), "lm", system_time=_d(1).isoformat())
        save_ngram_lm_model(
            spark, ds, ngram_lm_fit(ref),
            system_time=_d(2), source_event_time=_d(2),
        )
        loaded = load_ngram_lm_model(spark, ds)

        via_model = run_pipeline(spark, docs, lm_model=loaded)
        via_refit = run_pipeline(spark, docs, lm_reference=ref)
        got = {r["doc_id"] for r in via_model.kept.select("doc_id").collect()}
        want = {r["doc_id"] for r in via_refit.kept.select("doc_id").collect()}
        assert got == want and len(got) > 0


class TestBpeModel:
    def test_round_trip_tokenizes_identically(self, spark, tmp_path):
        from kamu_cli_spark.model_store import load_bpe_model, save_bpe_model
        from kamu_cli_spark.operators.bpe import bpe_apply, bpe_fit

        docs = _docs(spark)
        ref = docs.filter(F.col("doc_id") % 3 == 0)
        crawl = docs.filter(F.col("doc_id") % 3 != 0)
        merges = bpe_fit(ref, n_merges=6)

        ds = Dataset.create(str(tmp_path), "bpe", system_time=_d(1).isoformat())
        save_bpe_model(
            spark, ds, merges, system_time=_d(2), source_event_time=_d(2)
        )
        loaded = load_bpe_model(spark, ds)
        assert loaded is not None
        assert merges.exceptAll(loaded).count() == 0
        assert loaded.exceptAll(merges).count() == 0

        want = {tuple(r) for r in bpe_apply(crawl, merges).collect()}
        got = {tuple(r) for r in bpe_apply(crawl, loaded).collect()}
        assert got == want and len(got) > 0

    def test_refuses_empty_or_misshapen(self, spark, tmp_path):
        from kamu_cli_spark.model_store import save_bpe_model
        from kamu_cli_spark.operators.bpe import bpe_fit

        ds = Dataset.create(str(tmp_path), "bpe", system_time=_d(1).isoformat())
        docs = _docs(spark)
        with pytest.raises(ValueError, match="empty"):
            save_bpe_model(spark, ds, bpe_fit(docs.filter(F.lit(False))))
        with pytest.raises(ValueError, match="expected bpe_fit"):
            save_bpe_model(spark, ds, docs.select("doc_id"))


class TestPcaModel:
    """PCA axes as a ledger artifact (late round 11): save/load must
    project bit-identically, refits emit CDC corrections per rotated
    axis, and an empty model is refused like the other stores."""

    def _fit(self, spark, n=80, d=5, seed=3):
        import numpy as np

        from kamu_cli_spark.operators.vector_stats import (
            covariance_moments,
            pca_components,
        )

        rng = np.random.default_rng(seed)
        V = rng.normal(0, 0.3, size=(n, d))
        df = spark.createDataFrame(
            [(i, [float(x) for x in V[i]]) for i in range(n)],
            "vec_id long, embedding array<double>",
        )
        return df, pca_components(covariance_moments(df), 3)

    def test_round_trip_projects_identically(self, spark, tmp_path):
        from kamu_cli_spark.model_store import load_pca_model, save_pca_model
        from kamu_cli_spark.operators.vector_stats import pca_project

        df, comps = self._fit(spark)
        ds = Dataset.create(
            str(tmp_path), "pca", system_time=_d(1).isoformat()
        )
        save_pca_model(spark, ds, comps, system_time=_d(2), source_event_time=_d(2))
        loaded = load_pca_model(spark, ds)
        assert loaded == comps  # float64 exact through parquet

        want = {
            (r["vec_id"], tuple(r["proj"]))
            for r in pca_project(df, comps).collect()
        }
        got = {
            (r["vec_id"], tuple(r["proj"]))
            for r in pca_project(df, loaded).collect()
        }
        assert got == want

    def test_refit_emits_corrections(self, spark, tmp_path):
        from kamu_cli_spark.model_store import save_pca_model

        _, comps = self._fit(spark, seed=3)
        _, comps2 = self._fit(spark, seed=4)
        ds = Dataset.create(
            str(tmp_path), "pca", system_time=_d(1).isoformat()
        )
        save_pca_model(spark, ds, comps, system_time=_d(2), source_event_time=_d(2))
        save_pca_model(spark, ds, comps2, system_time=_d(3), source_event_time=_d(3))
        from kamu_cli_spark.vocab import OperationType

        ops = {
            r["op"]
            for r in ds.read(spark).select("op").distinct().collect()
        }
        # axes rotated, keys kept -> -C/+C corrections
        assert OperationType.CORRECT_TO in ops
        assert OperationType.CORRECT_FROM in ops

    def test_empty_model_refused(self, spark, tmp_path):
        from kamu_cli_spark.model_store import save_pca_model

        ds = Dataset.create(
            str(tmp_path), "pca", system_time=_d(1).isoformat()
        )
        with pytest.raises(ValueError):
            save_pca_model(spark, ds, [])
