"""Model-as-dataset lifecycle (model_store.py): a fitted k-means model
committed via snapshot CDC — exact round trip, version time travel,
chain verification, and scoring parity with the in-memory model."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.model_store import (
    load_kmeans_model,
    save_kmeans_model,
)
from kamu_cli_spark.operators.clustering import kmeans_apply, kmeans_fit


def _d(day):
    return datetime(2024, 1, day, tzinfo=timezone.utc)


def test_model_round_trip_and_time_travel(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    m1 = kmeans_fit(emb, k=4, n_updates=1)
    m2 = kmeans_fit(emb, k=4, n_updates=3)
    assert m1 != m2  # different iteration counts → different centroids

    ds = Dataset.create(str(tmp_path), "kmeans-model", system_time=_d(1).isoformat())
    save_kmeans_model(spark, ds, m1, system_time=_d(2), source_event_time=_d(2))
    head_v1 = ds.chain.head().block_hash
    save_kmeans_model(spark, ds, m2, system_time=_d(3), source_event_time=_d(3))

    # latest state = the refit, exact round trip
    assert load_kmeans_model(spark, ds) == sorted(m2)
    # time travel: pin to the first commit's head → the original model
    assert load_kmeans_model(spark, ds, as_of=head_v1) == sorted(m1)
    # the model chain verifies like any dataset
    ds.chain.verify()


def test_loaded_model_scores_identically(spark, tmp_path):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    m = kmeans_fit(emb, k=4, n_updates=2)
    ds = Dataset.create(str(tmp_path), "m", system_time=_d(1).isoformat())
    save_kmeans_model(spark, ds, m, system_time=_d(2), source_event_time=_d(2))
    loaded = load_kmeans_model(spark, ds)
    got = {
        (r["vec_id"], r["cluster"], r["dist_e12"])
        for r in kmeans_apply(emb, loaded).collect()
    }
    want = {
        (r["vec_id"], r["cluster"], r["dist_e12"])
        for r in kmeans_apply(emb, m).collect()
    }
    assert got == want


def test_retired_centroid_is_retracted(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "m2", system_time=_d(1).isoformat())
    save_kmeans_model(
        spark, ds, [(0, [1, 2]), (1, [3, 4])],
        system_time=_d(2), source_event_time=_d(2),
    )
    # refit loses centroid 1 and moves centroid 0
    save_kmeans_model(
        spark, ds, [(0, [9, 9])],
        system_time=_d(3), source_event_time=_d(3),
    )
    assert load_kmeans_model(spark, ds) == [(0, [9, 9])]


def test_empty_model_refused(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "m3", system_time=_d(1).isoformat())
    with pytest.raises(ValueError, match="empty model"):
        save_kmeans_model(spark, ds, [])
    assert load_kmeans_model(spark, ds) == []
