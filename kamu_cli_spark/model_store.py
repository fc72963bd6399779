"""Fitted-model lifecycle on the ODF ledger — models are DATA.

A fitted k-means model (the centroid table from
:func:`~kamu_cli_spark.operators.clustering.kmeans_fit`) is committed
to a dataset with snapshot-CDC semantics keyed on the centroid id:
each refit is one poll, so version history, Merkle verification,
provenance and as-of time travel all apply to MODELS exactly as to any
other dataset — "which model scored this batch" is reproducible from
the ledger alone, the same property ingest gets from the chain. No
reference counterpart (kamu-cli has no ML operators); this composes
the writer/CDC machinery (writer.py, operators/merge.py) with the
clustering family. Centroids are e6-quantized int64 vectors, so the
round trip is EXACT — a loaded model scores bit-identically to the
in-memory one (asserted in tests/test_model_store.py).

Scale note: a model is k·dim int64 cells — bounded by construction,
never by data — so the collect in :func:`load_kmeans_model` is the
same bounded driver traffic kmeans_fit already carries per iteration.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators.merge import MergeStrategySnapshot, project_changelog
from kamu_cli_spark.writer import DataWriter

MODEL_SCHEMA = "cid int, centroid array<bigint>"


def kmeans_model_df(
    spark: SparkSession, centroids: list[tuple[int, list[int]]]
) -> DataFrame:
    """Centroid list -> (cid, centroid) frame in the model schema."""
    return spark.createDataFrame(
        [(int(cid), [int(v) for v in vec]) for cid, vec in centroids],
        MODEL_SCHEMA,
    )


def save_kmeans_model(
    spark: SparkSession,
    dataset: Dataset,
    centroids: list[tuple[int, list[int]]],
    system_time: Any = None,
    source_event_time: Any = None,
) -> dict:
    """Commit a fitted model as one snapshot poll of `dataset` (PK =
    cid): new centroids append, moved centroids emit -C/+C corrections,
    centroids absent from the refit emit -R retractions — the standard
    CDC alphabet, so every downstream CDC consumer (projections,
    streams, as-of readers) works on models unchanged."""
    if not centroids:
        raise ValueError("refusing to commit an empty model")
    w = DataWriter(dataset, MergeStrategySnapshot(["cid"]))
    return w.write(
        spark,
        kmeans_model_df(spark, centroids),
        system_time=system_time,
        source_event_time=source_event_time,
    )


def load_kmeans_model(
    spark: SparkSession,
    dataset: Dataset,
    as_of: str | None = None,
) -> list[tuple[int, list[int]]]:
    """Load the model's LATEST state (or the state as of a pinned block
    hash — time travel over model versions): changelog → state by cid,
    retractions dropped, corrections superseding — then collected as
    the (cid, vector) list kmeans_apply/semantic_dedup_against consume.
    The collect is k·dim ints, bounded by the model, never the data."""
    df = dataset.read(spark, as_of)
    if df is None:
        return []
    state = project_changelog(df, ["cid"], dataset.vocab)
    rows = state.select("cid", "centroid").collect()  # bounded: k rows
    return [(int(r["cid"]), list(r["centroid"])) for r in sorted(rows, key=lambda r: r["cid"])]
