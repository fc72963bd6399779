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
