"""ObjectLink column verification (linked external objects)."""

from __future__ import annotations

import os
from datetime import datetime, timezone

import pytest

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.writer import DataWriter, WriterError

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)


def test_object_links_verified_and_summed(spark, tmp_path):
    ds = Dataset.create(str(tmp_path), "media", system_time=T0.isoformat())
    obj_dir = os.path.join(ds.path, "objects")
    os.makedirs(obj_dir)
    open(os.path.join(obj_dir, "hashA"), "wb").write(b"x" * 100)
    open(os.path.join(obj_dir, "hashB"), "wb").write(b"y" * 50)

    w = DataWriter(
        ds, MergeStrategyLedger(["k"]), object_link_columns=["blob"]
    )
    ev = w.write(
        spark,
        spark.createDataFrame(
            [("a", "hashA"), ("b", "hashB"), ("c", "hashA"), ("d", None)],
            "k string, blob string",
        ),
        system_time=T0,
    )
    # distinct links counted once; nulls skipped
    assert ev["linked_objects"] == {"count": 2, "total_size": 150}

    # dangling reference → rejected before commit
    with pytest.raises(WriterError, match="does not resolve"):
        w.write(
            spark,
            spark.createDataFrame([("e", "hashMissing")], "k string, blob string"),
            system_time=T0,
        )
    assert len(ds.chain.data_files()) == 1  # nothing extra committed
