"""Round-10 model-store extensions (VERDICT r9 #6): Bloom bitmaps and
IVF cell models persisted as snapshot-CDC datasets — save/load round
trips prove bit-identical scoring, and a pipeline stage consumes a
ledger-loaded k-means artifact."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.model_store import (
    load_bloom_model,
    load_ivf_model,
    load_kmeans_model,
    save_bloom_model,
    save_ivf_model,
    save_kmeans_model,
)


def _d(day):
    return datetime(2024, 2, day, tzinfo=timezone.utc)


class TestBloomModel:
    N_BITS = 1 << 14
    N_HASHES = 5

    def test_round_trip_membership_identical(self, spark, tmp_path):
        from kamu_cli_spark.operators.dedup import (
            bloom_bit_words,
            bloom_membership,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        ref = docs.filter(F.col("doc_id") % 10 == 0)
        crawl = docs.filter(F.col("doc_id") % 10 != 0)
        words = bloom_bit_words(ref, n_bits=self.N_BITS, n_hashes=self.N_HASHES)

        ds = Dataset.create(str(tmp_path), "bloom", system_time=_d(1).isoformat())
        save_bloom_model(
            spark, ds, words, self.N_BITS, self.N_HASHES,
            system_time=_d(2), source_event_time=_d(2),
        )
        loaded, n_bits, n_hashes = load_bloom_model(spark, ds)
        assert (n_bits, n_hashes) == (self.N_BITS, self.N_HASHES)

        want = {
            (r["doc_id"], r["bloom_hit"])
            for r in bloom_membership(
                crawl, words, n_bits=self.N_BITS, n_hashes=self.N_HASHES
            ).select("doc_id", "bloom_hit").collect()
        }
        got = {
            (r["doc_id"], r["bloom_hit"])
            for r in bloom_membership(
                crawl, loaded, n_bits=n_bits, n_hashes=n_hashes
            ).select("doc_id", "bloom_hit").collect()
        }
        assert got == want
        ds.chain.verify()

    def test_refit_emits_cdc_and_time_travels(self, spark, tmp_path):
        from kamu_cli_spark.operators.dedup import bloom_bit_words

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        w1 = bloom_bit_words(
            docs.filter(F.col("doc_id") % 10 == 0),
            n_bits=self.N_BITS, n_hashes=self.N_HASHES,
        )
        w2 = bloom_bit_words(
            docs.filter(F.col("doc_id") % 10 == 1),
            n_bits=self.N_BITS, n_hashes=self.N_HASHES,
        )
        ds = Dataset.create(str(tmp_path), "bloom2", system_time=_d(1).isoformat())
        save_bloom_model(spark, ds, w1, self.N_BITS, self.N_HASHES,
                         system_time=_d(2), source_event_time=_d(2))
        head_v1 = ds.chain.head().block_hash
        save_bloom_model(spark, ds, w2, self.N_BITS, self.N_HASHES,
                         system_time=_d(3), source_event_time=_d(3))

        def words_set(df):
            return {(r["word_idx"], r["word"]) for r in df.collect()}

        latest, _, _ = load_bloom_model(spark, ds)
        pinned, _, _ = load_bloom_model(spark, ds, as_of=head_v1)
        assert words_set(pinned) == {
            (r["word_idx"], r["word"]) for r in w1.collect()
        }
        assert words_set(latest) == {
            (r["word_idx"], r["word"]) for r in w2.collect()
        }

    def test_rejects_wrong_shape(self, spark, tmp_path):
        import pytest

        ds = Dataset.create(str(tmp_path), "bloom3", system_time=_d(1).isoformat())
        bad = spark.createDataFrame([(1, 2, 3)], "a int, b int, c int")
        with pytest.raises(ValueError, match="bloom_bit_words"):
            save_bloom_model(spark, ds, bad, 1024, 3)


class TestIvfModel:
    def test_round_trip_ann_bit_identical(self, spark, tmp_path):
        from kamu_cli_spark.operators.similarity import ivf_ann_seeded

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        queries = emb.filter(F.col("vec_id") % 10 == 0)
        corpus = emb.filter(F.col("vec_id") % 10 != 0)

        # derive the seeds exactly as ivf_ann_seeded does, then persist
        n_centroids = 16
        seeds = (
            corpus.select(
                "embedding", F.md5(F.col("vec_id").cast("string")).alias("h")
            )
            .orderBy("h")
            .limit(n_centroids)
            .collect()
        )
        level0 = [
            [float(x) for x in r["embedding"]]
            for r in sorted(seeds, key=lambda r: r["h"])
        ]

        ds = Dataset.create(str(tmp_path), "ivf", system_time=_d(1).isoformat())
        save_ivf_model(spark, ds, [level0], system_time=_d(2),
                       source_event_time=_d(2))
        loaded = load_ivf_model(spark, ds)
        assert len(loaded) == 1 and loaded[0] == level0  # float64 exact

        want = {
            tuple(r)
            for r in ivf_ann_seeded(
                queries, corpus, "vec_id", "vec_id",
                n_centroids=n_centroids, k=3,
            ).collect()
        }
        got = {
            tuple(r)
            for r in ivf_ann_seeded(
                queries, corpus, "vec_id", "vec_id",
                k=3, seed_vectors=loaded[0],
            ).collect()
        }
        assert got == want and got
        ds.chain.verify()

    def test_empty_model_rejected(self, spark, tmp_path):
        import pytest

        ds = Dataset.create(str(tmp_path), "ivf2", system_time=_d(1).isoformat())
        with pytest.raises(ValueError, match="empty"):
            save_ivf_model(spark, ds, [])


class TestPipelineConsumesLedgerModel:
    def test_semantic_stage_from_ledger_equals_in_run_fit(self, spark, tmp_path):
        import sys

        sys.path.insert(0, "/root/repo/examples/pretrain_pipeline")
        from pipeline import run_pipeline

        from kamu_cli_spark.operators.clustering import kmeans_fit

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(120)
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).withColumnRenamed("vec_id", "doc_id")

        # fit once, commit to the ledger, reload — the pipeline's 4b
        # stage must behave exactly as with its own in-run fit of the
        # same (k, n_updates)
        sem_emb = emb.join(docs.select("doc_id"), "doc_id", "left_semi")
        m = kmeans_fit(sem_emb, id_col="doc_id", k=4, n_updates=2)
        ds = Dataset.create(str(tmp_path), "sem", system_time=_d(1).isoformat())
        save_kmeans_model(spark, ds, m, system_time=_d(2),
                          source_event_time=_d(2))
        loaded = load_kmeans_model(spark, ds)

        base = run_pipeline(spark, docs, embeddings=emb, sem_k=4,
                            vocab_k=50)
        ledgered = run_pipeline(spark, docs, embeddings=emb, sem_k=4,
                                vocab_k=50, semantic_centroids=loaded)
        # NOTE: base's internal fit uses n_updates=2 (semantic_dedup
        # default) over the SAME surviving-doc embedding set only if
        # stages 1-4 drop nothing from `docs`... so compare the
        # semantic audits directly instead of assuming:
        b = {tuple(r) for r in base.semantic.collect()}
        l = {tuple(r) for r in ledgered.semantic.collect()}
        if b != l:
            # stages 1-4 dropped docs → the in-run fit saw a different
            # set; re-fit on exactly the survivors and re-check
            surv = base.semantic.select("doc_id")
            m2 = kmeans_fit(
                emb.join(surv, "doc_id", "left_semi"),
                id_col="doc_id", k=4, n_updates=2,
            )
            ds2 = Dataset.create(
                str(tmp_path / "v2"), "sem2", system_time=_d(3).isoformat()
            )
            save_kmeans_model(spark, ds2, m2, system_time=_d(4),
                              source_event_time=_d(4))
            ledgered2 = run_pipeline(
                spark, docs, embeddings=emb, sem_k=4, vocab_k=50,
                semantic_centroids=load_kmeans_model(spark, ds2),
            )
            l = {tuple(r) for r in ledgered2.semantic.collect()}
        assert b == l
