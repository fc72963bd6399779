"""Regression tests for the round-8 code-review findings (the storm
sweep over this round's diff):

#2 oracle caps — covered by the sf100 oracle run recorded in
   BENCH_NOTES (generate_series caps now 64/level).
#1/#5/#7 streaming top-N (NaT encode, tie-breakers, quoted DDL) —
   tests/test_streaming_topn.py.
#3 compaction dropped watermark-only AddData stamps.
#4 reset_keep_metadata_only blanket-swept data/ outside the lock.
#6 global top-N pre-shrink before the shuffle.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from kamu_cli_spark.compaction import compact, reset_keep_metadata_only
from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyAppend
from kamu_cli_spark.watermark import set_watermark
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
T5 = datetime(2024, 1, 5, tzinfo=timezone.utc)


def test_compact_preserves_explicit_watermark(spark, tmp_path):
    """set_watermark() commits a DATA-LESS AddData block; the rebuild
    drops it, so the stamped watermark must ride on the last compacted
    batch or the dataset watermark silently regresses."""
    ds = Dataset.create(str(tmp_path), "wm", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyAppend())
    for i in range(2):
        w.write(
            spark,
            spark.createDataFrame(
                [(i, T0)], "k int, event_time timestamp"
            ),
            system_time=T0,
        )
    set_watermark(ds, T5)
    assert ds.chain.current_watermark() == T5.isoformat()

    out = compact(spark, ds, max_slice_records=1_000)
    assert out["compacted"] is True
    fresh = Dataset(ds.path)
    fresh.chain.verify()
    assert fresh.chain.current_watermark() == T5.isoformat()
    # and a later append cannot regress below the stamp
    import pytest

    from kamu_cli_spark.ledger.chain import ChainIntegrityError

    with pytest.raises(ChainIntegrityError, match="watermark regression"):
        fresh.chain.append(
            {
                "kind": "AddData",
                "new_data": None,
                "new_watermark": datetime(
                    2024, 1, 3, tzinfo=timezone.utc
                ).isoformat(),
            },
            system_time=datetime.now(timezone.utc).isoformat(),
        )


def test_reset_keep_metadata_only_spares_unreferenced_files(spark, tmp_path):
    """The sweep must delete exactly the slices the dropped blocks
    referenced — a staged parquet another writer just landed (not yet
    committed) is NOT the reset's to delete."""
    ds = Dataset.create(str(tmp_path), "rk", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyAppend())
    w.write(
        spark,
        spark.createDataFrame([(1, T0)], "k int, event_time timestamp"),
        system_time=T0,
    )
    staged = os.path.join(ds.path, "data", "000099-5-5-deadbeef.parquet")
    with open(staged, "wb") as f:
        f.write(b"PAR1 concurrent writer's staged slice")

    reset_keep_metadata_only(Dataset(ds.path))

    fresh = Dataset(ds.path)
    fresh.chain.verify()
    assert fresh.chain.data_files() == []
    # committed slice gone, staged foreign file untouched
    left = set(os.listdir(os.path.join(ds.path, "data")))
    assert left == {"000099-5-5-deadbeef.parquet"}


def test_topn_local_preshrink_in_plan(spark, tmp_path):
    """#6: the global top-N must pre-shrink per Arrow batch BEFORE the
    single-group shuffle (MapInPandas upstream of the stateful op)."""
    from kamu_cli_spark.operators import MergeStrategyLedger
    from kamu_cli_spark.streaming import read_dataset_stream
    from kamu_cli_spark.streaming.stateful import streaming_topn_to_changelog

    ds = Dataset.create(str(tmp_path), "pp", system_time=T0.isoformat())
    DataWriter(ds, MergeStrategyLedger(["k"])).write(
        spark,
        spark.createDataFrame(
            [(i, i * 1.0, T0) for i in range(10)],
            "k long, score double, event_time timestamp",
        ),
        system_time=T0,
    )
    stream = read_dataset_stream(spark, ds).select("k", "score")
    out = streaming_topn_to_changelog(
        stream, order_column="score", n=2, payload_columns=["score", "k"]
    )
    plan = out._jdf.queryExecution().analyzed().toString()
    assert "MapInPandas _local_topn" in plan
    assert "FlatMapGroupsInPandasWithState" in plan
    # pre-shrink feeds the stateful op: the tree prints parents first,
    # so the MapInPandas child must appear after the stateful node
    assert plan.index("MapInPandas _local_topn") > plan.index(
        "FlatMapGroupsInPandasWithState"
    )


def test_hier3_cell_sizes_cross_engine_parity():
    """The oracle derives (k1,k2,k3) with DuckDB float sqrt/ceil; the
    operator uses exact isqrt. Sweep n across decades and perfect
    squares (the float-boundary risk) and assert both agree — this is
    the cheap proof that the depth-3 oracle stays aligned at corpus
    sizes we can't afford to run through DuckDB end-to-end."""
    import duckdb

    from kamu_cli_spark.operators.similarity import hier3_cell_sizes

    con = duckdb.connect()
    ns = [1, 2, 15, 16, 17, 255, 256, 257, 2000, 19999, 20000, 200000]
    ns += [10**d for d in range(2, 9)]
    ns += [k * k for k in (100, 1000, 1414, 1415, 4096)]
    ns += [k * k + 1 for k in (100, 1000, 1414)]
    for n in ns:
        row = con.execute(
            f"""
            SELECT k1, k2, CAST(ceil(s::DOUBLE / k1) AS INT) AS k3 FROM (
              SELECT s, greatest(4, CAST(ceil(sqrt(s)) AS INT)) AS k1,
                     greatest(4, CAST(ceil(sqrt(s)) AS INT)) AS k2 FROM (
                SELECT greatest(16, CAST(ceil(sqrt({n}::DOUBLE)) AS INT)) AS s))
            """
        ).fetchone()
        assert tuple(row) == hier3_cell_sizes(n), (n, row, hier3_cell_sizes(n))
