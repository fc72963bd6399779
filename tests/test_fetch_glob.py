"""FilesGlob polling ingest: one commit per file, source-state resume."""

from __future__ import annotations

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.sources.fetch import ingest_files_glob


def test_files_glob_one_commit_per_file_and_resume(spark, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    (inbox / "2024-01-01.csv").write_text("k,v\na,1\n")
    (inbox / "2024-01-02.csv").write_text("k,v\nb,2\n")

    ds = Dataset.create(str(tmp_path), "glob")
    strat = MergeStrategyLedger(["k"])
    evs = ingest_files_glob(spark, ds, strat, str(inbox / "*.csv"))
    assert len(evs) == 2
    assert ds.read(spark).count() == 2

    # re-poll with no new files → nothing ingested
    assert ingest_files_glob(spark, ds, strat, str(inbox / "*.csv")) == []

    # drop a third file → only it is ingested
    (inbox / "2024-01-03.csv").write_text("k,v\nc,3\nb,2\n")
    evs3 = ingest_files_glob(spark, ds, strat, str(inbox / "*.csv"))
    assert len(evs3) == 1
    assert evs3[0]["new_data"]["num_records"] == 1  # b deduped by ledger
    assert ds.read(spark).count() == 3
    ds.chain.verify()


def test_files_glob_by_mtime_resume_name_order_mismatch(spark, tmp_path):
    """by_mtime resume must key on the (mtime, name) sort key, not the
    bare name: a NEWER file whose name sorts before the last-ingested
    one was silently skipped forever (regression: ADVICE r1/r2)."""
    import os

    inbox = tmp_path / "inbox2"
    inbox.mkdir()
    f_z = inbox / "zzz.csv"
    f_z.write_text("k,v\na,1\n")
    os.utime(f_z, (1_700_000_000, 1_700_000_000))

    ds = Dataset.create(str(tmp_path), "globm")
    strat = MergeStrategyLedger(["k"])
    evs = ingest_files_glob(
        spark, ds, strat, str(inbox / "*.csv"), order="by_mtime"
    )
    assert len(evs) == 1

    # newer mtime but lexically-smaller name → must still be ingested
    f_a = inbox / "aaa.csv"
    f_a.write_text("k,v\nb,2\n")
    os.utime(f_a, (1_700_000_100, 1_700_000_100))
    evs2 = ingest_files_glob(
        spark, ds, strat, str(inbox / "*.csv"), order="by_mtime"
    )
    assert len(evs2) == 1
    assert ds.read(spark).count() == 2

    # idempotent re-poll
    assert (
        ingest_files_glob(spark, ds, strat, str(inbox / "*.csv"), order="by_mtime")
        == []
    )
