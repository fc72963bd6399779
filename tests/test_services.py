"""Readers, prep, export, compaction, verification, watermark, asserts,
multimodal plumbing tests."""

from __future__ import annotations

import gzip
import json
import os
import zipfile
from datetime import datetime, timezone

import pytest

from kamu_cli_spark.compaction import compact, plan_compaction, reset_keep_metadata_only
from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.export import export
from kamu_cli_spark.functions import assert_not_null
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.operators.multimodal import attach_binary_column, extract_features
from kamu_cli_spark.sources.readers import (
    prep_decompress,
    read_csv,
    read_format,
    read_geojson,
    read_json,
    read_ndjson,
)
from kamu_cli_spark.verification import (
    VerificationError,
    logical_hash,
    verify_dataset,
    verify_transform_replay,
)
from kamu_cli_spark.watermark import set_watermark
from kamu_cli_spark.writer import DataWriter


T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
T1 = datetime(2024, 1, 2, tzinfo=timezone.utc)


def test_read_csv(spark, tmp_path):
    p = tmp_path / "data.csv"
    p.write_text("city,population\nkyiv,3\nlviv,7\n")
    df = read_csv(spark, str(p))
    assert df.columns == ["city", "population"]
    assert df.count() == 2
    assert dict(df.dtypes)["population"] == "int"


def test_read_csv_explicit_schema_no_header(spark, tmp_path):
    p = tmp_path / "raw.csv"
    p.write_text("kyiv;3\nlviv;7\n")
    df = read_csv(
        spark, str(p), schema="city string, population long", separator=";", header=False
    )
    assert df.collect()[0]["population"] == 3


def test_read_json_sub_path(spark, tmp_path):
    p = tmp_path / "doc.json"
    p.write_text(json.dumps({"result": {"rows": [{"a": 1}, {"a": 2}]}}))
    df = read_json(spark, str(p), sub_path="result.rows")
    assert sorted(r["a"] for r in df.collect()) == [1, 2]


def test_read_ndjson(spark, tmp_path):
    p = tmp_path / "data.ndjson"
    p.write_text('{"a": 1}\n{"a": 2}\n')
    assert read_ndjson(spark, str(p)).count() == 2


def test_read_geojson(spark, tmp_path):
    p = tmp_path / "geo.json"
    p.write_text(
        json.dumps(
            {
                "type": "FeatureCollection",
                "features": [
                    {
                        "type": "Feature",
                        "geometry": {"type": "Point", "coordinates": [1.0, 2.0]},
                        "properties": {"name": "kyiv"},
                    }
                ],
            }
        )
    )
    df = read_geojson(spark, str(p))
    row = df.collect()[0]
    assert row["name"] == "kyiv"
    assert json.loads(row["geometry"])["type"] == "Point"


def test_read_format_registry_and_media_types(spark, tmp_path):
    p = tmp_path / "x.csv"
    p.write_text("a\n1\n")
    assert read_format(spark, "text/csv", str(p)).count() == 1
    with pytest.raises(Exception):
        read_format(spark, "unknown/type", str(p))


def test_prep_decompress_gzip_and_zip(tmp_path):
    gz = tmp_path / "x.csv.gz"
    with gzip.open(gz, "wb") as f:
        f.write(b"a\n1\n")
    out = prep_decompress(str(gz))
    assert open(out).read() == "a\n1\n"

    zp = tmp_path / "x.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.writestr("inner/data.csv", "b\n2\n")
    out = prep_decompress(str(zp), sub_path="*.csv")
    assert open(out).read() == "b\n2\n"


def test_export_records_per_file(spark, tmp_path):
    df = spark.range(100).toDF("v")
    n = export(df, str(tmp_path / "out"), "parquet", records_per_file=30)
    assert n == 100
    files = [f for f in os.listdir(tmp_path / "out") if f.endswith(".parquet")]
    assert len(files) >= 4  # 100/30 → at least 4 files

    n2 = export(df, str(tmp_path / "out_csv"), "csv")
    assert n2 == 100


def _mk_multi_slice_ds(spark, ws):
    ds = Dataset.create(ws, "m", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyLedger(["k"]), compute_logical_hash=True)
    for i in range(4):
        w.write(
            spark,
            spark.createDataFrame([(f"k{i}a", i), (f"k{i}b", i)], "k string, v int"),
            system_time=T0,
        )
    return ds


def test_verification_roundtrip_and_tamper(spark, tmp_path):
    ds = _mk_multi_slice_ds(spark, str(tmp_path))
    res = verify_dataset(spark, ds)
    assert res["slices"] == 4

    # tamper with a slice file → physical hash mismatch
    victim = ds.slice_paths()[0]
    with open(victim, "ab") as f:
        f.write(b"garbage")
    with pytest.raises(VerificationError, match="physical"):
        verify_dataset(spark, ds)


def test_compaction(spark, tmp_path):
    ds = _mk_multi_slice_ds(spark, str(tmp_path))
    assert len(plan_compaction(ds)) == 1  # all 4 fit one batch
    res = compact(spark, ds)
    assert res["compacted"] and res["slices_after"] == 1
    df = ds.read(spark)
    assert df.count() == 8
    assert [r["offset"] for r in df.orderBy("offset").collect()] == list(range(8))
    ds.chain.verify()
    # physical hashes of the new slices aren't recorded — verify still OK
    verify_dataset(spark, ds, check_logical=False)


def test_reset_keep_metadata_only(spark, tmp_path):
    ds = _mk_multi_slice_ds(spark, str(tmp_path))
    reset_keep_metadata_only(ds)
    assert ds.read(spark) is None
    assert ds.chain.blocks()[0].event["kind"] == "Seed"


def test_set_watermark(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "wm", system_time=T0.isoformat())
    set_watermark(ds, T1, system_time=T1)
    assert ds.chain.current_watermark().startswith("2024-01-02")
    with pytest.raises(Exception, match="regression"):
        set_watermark(ds, T0, system_time=T1)


def test_transform_replay_determinism(spark, tmp_path):
    from kamu_cli_spark.transform import TransformExecutor, set_transform

    ws = str(tmp_path)
    root = Dataset.create(ws, "r", system_time=T0.isoformat())
    w = DataWriter(root, MergeStrategyLedger(["k"]))
    w.write(spark, spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int"), system_time=T0)

    deriv = Dataset.create(ws, "d", kind="Derivative", system_time=T0.isoformat())
    set_transform(
        deriv, {"r_in": root.path}, "select event_time, k, v * 10 as v10 from r_in",
        system_time=T0.isoformat(),
    )
    TransformExecutor(deriv).execute(spark, system_time=T1)
    assert verify_transform_replay(spark, deriv) is True


def test_assert_not_null(spark):
    df = spark.createDataFrame([(1,), (None,)], "v int")
    ok = df.filter("v is not null").select(assert_not_null("v"))
    assert ok.collect()[0][0] == 1
    with pytest.raises(Exception):
        df.select(assert_not_null("v")).collect()


def test_logical_hash_order_sensitivity(spark):
    a = spark.createDataFrame([(0, "x"), (1, "y")], "offset long, v string")
    b = spark.createDataFrame([(0, "y"), (1, "x")], "offset long, v string")
    assert logical_hash(a) != logical_hash(b)
    assert logical_hash(a) == logical_hash(a)


def test_multimodal_plumbing(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "spark engine")], "doc_id long, text string"
    )
    media = attach_binary_column(docs, "text", "doc_id", mime="text/plain")
    assert dict(media.dtypes)["content"] == "binary"
    feats = extract_features(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert rows[1]["n_bytes"] == len(b"hello world")
    assert len(rows[1]["feature"]) == 8
    # deterministic stub: same payload → same feature
    feats2 = {r["media_id"]: r for r in extract_features(media).collect()}
    assert rows[1]["feature"] == feats2[1]["feature"]


def test_compaction_rejects_derivative(spark, tmp_path):
    """Root-only guard (reference: compaction_planner_impl.rs:211) —
    compacting a Derivative would rewrite ExecuteTransform blocks as
    AddData and lose query_inputs."""
    from kamu_cli_spark.compaction import CompactionError

    deriv = Dataset.create(
        str(tmp_path), "drv", kind="Derivative", system_time=T0.isoformat()
    )
    with pytest.raises(CompactionError, match="Root"):
        compact(spark, deriv)


def test_compaction_preserves_source_state(spark, tmp_path):
    """The latest source_state from dropped AddData blocks must ride on
    the last compacted block so a files_glob re-poll ingests nothing
    (reference: compaction_executor_impl.rs:124-126)."""
    from kamu_cli_spark.sources.fetch import _last_source_state, ingest_files_glob

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    for i in range(4):
        (inbox / f"f{i}.csv").write_text(f"k,v\nk{i},{i}\n")

    ds = Dataset.create(str(tmp_path), "gsrc", system_time=T0.isoformat())
    strat = MergeStrategyLedger(["k"])
    evs = ingest_files_glob(spark, ds, strat, str(inbox / "*.csv"))
    assert len(evs) == 4

    res = compact(spark, ds)
    assert res["compacted"] and res["slices_after"] == 1
    st = _last_source_state(ds)
    assert st is not None and st["last_file"] == "f3.csv"

    # re-poll after compaction: nothing ingested, no rows duplicated
    assert ingest_files_glob(spark, ds, strat, str(inbox / "*.csv")) == []
    assert ds.read(spark).count() == 4
    ds.chain.verify()


def test_compaction_per_batch_source_state(spark, tmp_path):
    """Each compacted batch carries the latest source_state among the
    blocks it absorbed (reference: compaction_executor_impl.rs:124-158),
    so an as-of read pinned at an intermediate compacted block sees the
    same resume state the uncompacted chain had at that offset."""
    from kamu_cli_spark.sources.fetch import _last_source_state, ingest_files_glob

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    for i in range(4):
        (inbox / f"f{i}.csv").write_text(f"k,v\nk{i},{i}\n")

    ds = Dataset.create(str(tmp_path), "gsrc2", system_time=T0.isoformat())
    strat = MergeStrategyLedger(["k"])
    ingest_files_glob(spark, ds, strat, str(inbox / "*.csv"))

    res = compact(spark, ds, max_slice_records=2)
    assert res["compacted"] and res["slices_after"] == 2

    data_blocks = [
        b for b in ds.chain.blocks() if b.event.get("kind") == "AddData"
    ]
    assert [b.event["source_state"]["last_file"] for b in data_blocks] == [
        "f1.csv",  # batch 1 absorbed f0+f1
        "f3.csv",  # batch 2 absorbed f2+f3
    ]
    # overall resume unchanged; re-poll is a no-op
    assert _last_source_state(ds)["last_file"] == "f3.csv"
    assert ingest_files_glob(spark, ds, strat, str(inbox / "*.csv")) == []
    ds.chain.verify()
