"""Dataset reset (kamu_cli_spark/reset.py — mirrors
reset_planner_impl.rs / reset_executor_impl.rs) and the lifecycle CLI
verbs reset / search / rename / delete."""

from __future__ import annotations

import json
import os

import yaml

from kamu_cli_spark import cli
from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.reset import OldHeadMismatchError, reset_dataset


def _run(capsys, *argv) -> tuple[int, str]:
    rc = cli.main(list(argv))
    return rc, capsys.readouterr().out


def _mk_cities(tmp_path, capsys, ws):
    manifest = tmp_path / "cities.yaml"
    manifest.write_text(
        yaml.safe_dump(
            {
                "kind": "Root",
                "name": "cities",
                "merge": {"kind": "ledger", "primary_key": ["city"]},
            }
        )
    )
    assert _run(capsys, "--workspace", ws, "add", str(manifest))[0] == 0


class TestReset:
    def _two_batches(self, spark, tmp_path, capsys):
        ws = str(tmp_path)
        _mk_cities(tmp_path, capsys, ws)
        f1 = tmp_path / "d1.csv"
        f1.write_text("city,population\nkyiv,2967\nlviv,717\n")
        assert _run(capsys, "--workspace", ws, "ingest", "cities", str(f1))[0] == 0
        ds = Dataset(os.path.join(ws, "cities"))
        head_after_b1 = ds.chain.head().block_hash
        f2 = tmp_path / "d2.csv"
        f2.write_text("city,population\nodesa,1010\n")
        assert _run(capsys, "--workspace", ws, "ingest", "cities", str(f2))[0] == 0
        # fresh handle: each CLI ingest appended via its own Dataset
        ds = Dataset(os.path.join(ws, "cities"))
        return ws, ds, head_after_b1

    def test_reset_to_block_drops_later_data(self, spark, tmp_path, capsys):
        ws, ds, head_b1 = self._two_batches(spark, tmp_path, capsys)
        assert ds.read(spark).count() == 3
        n_slices_before = len(ds.slice_paths())

        out = reset_dataset(ds, new_head=head_b1)
        assert out["new_head"] == head_b1 and out["dropped_blocks"] >= 1
        assert ds.chain.head().block_hash == head_b1
        # batch-2 rows and their slice are gone
        cities = {r["city"] for r in ds.read(spark).collect()}
        assert cities == {"kyiv", "lviv"}
        assert len(ds.slice_paths()) < n_slices_before
        assert out["removed_slices"]
        # chain still verifies end-to-end after the truncation
        ds.chain.verify()

    def test_reset_default_goes_to_seed(self, spark, tmp_path, capsys):
        ws, ds, _ = self._two_batches(spark, tmp_path, capsys)
        out = reset_dataset(ds)
        assert out["new_head"] == ds.chain.blocks()[0].block_hash
        assert ds.chain.next_offset() == 0
        assert ds.read(spark) is None or ds.read(spark).count() == 0

    def test_old_head_cas_guard(self, spark, tmp_path, capsys):
        ws, ds, head_b1 = self._two_batches(spark, tmp_path, capsys)
        try:
            reset_dataset(ds, new_head=head_b1, old_head="zzz-not-the-head")
            assert False, "expected OldHeadMismatchError"
        except OldHeadMismatchError:
            pass
        # nothing moved
        assert ds.read(spark).count() == 3

    def test_reset_then_reingest_continues_chain(self, spark, tmp_path, capsys):
        ws, ds, head_b1 = self._two_batches(spark, tmp_path, capsys)
        reset_dataset(ds, new_head=head_b1)
        f3 = tmp_path / "d3.csv"
        f3.write_text("city,population\nkharkiv,1421\n")
        assert _run(capsys, "--workspace", ws, "ingest", "cities", str(f3))[0] == 0
        ds = Dataset(os.path.join(ws, "cities"))  # fresh post-ingest handle
        cities = {r["city"] for r in ds.read(spark).collect()}
        assert cities == {"kyiv", "lviv", "kharkiv"}
        ds.chain.verify()

    def test_cli_reset_verb(self, spark, tmp_path, capsys):
        ws, ds, head_b1 = self._two_batches(spark, tmp_path, capsys)
        rc, out = _run(capsys, "--workspace", ws, "reset", "cities", head_b1)
        assert rc == 0
        assert json.loads(out)["new_head"] == head_b1


class TestLifecycleVerbs:
    def test_search_rename_delete(self, spark, tmp_path, capsys):
        ws = str(tmp_path)
        _mk_cities(tmp_path, capsys, ws)
        rc, _ = _run(
            capsys, "--workspace", ws, "set-info", "cities",
            "--description", "urban population ledger",
            "--keyword", "demography",
        )
        assert rc == 0

        # matches by name, by description, by keyword; misses otherwise
        for q in ("citi", "urban", "demography"):
            rc, out = _run(capsys, "--workspace", ws, "search", q)
            assert rc == 0 and "cities" in out, q
        rc, out = _run(capsys, "--workspace", ws, "search", "nomatch")
        assert rc == 0 and "cities" not in out

        rc, _ = _run(capsys, "--workspace", ws, "rename", "cities", "towns")
        assert rc == 0
        assert os.path.isdir(os.path.join(ws, "towns"))
        assert not os.path.exists(os.path.join(ws, "cities"))
        # refuse clobbering an existing dataset
        _mk_cities(tmp_path, capsys, ws)
        assert cli.main(["--workspace", ws, "rename", "towns", "cities"]) == 1
        capsys.readouterr()

        # delete requires --yes
        assert cli.main(["--workspace", ws, "delete", "towns"]) == 1
        capsys.readouterr()
        rc, _ = _run(capsys, "--workspace", ws, "delete", "towns", "--yes")
        assert rc == 0
        assert not os.path.exists(os.path.join(ws, "towns"))


class TestWatermarkPropagation:
    """ODF completeness rule: a derivative's watermark is the MIN over
    its inputs' watermarks, and a pure watermark advance (no new data)
    still propagates through a pull (reference:
    transform_elaboration_service_impl.rs:68)."""

    def _root(self, ws, name, spark, rows, system_time, wm=None):
        from datetime import datetime, timezone

        from kamu_cli_spark.dataset import Dataset
        from kamu_cli_spark.operators import MergeStrategyLedger
        from kamu_cli_spark.writer import DataWriter

        import os as _os

        path = _os.path.join(ws, name)
        if not _os.path.exists(path):
            Dataset.create(ws, name, system_time=system_time.isoformat())
        ds = Dataset(path)
        if rows:
            DataWriter(ds, MergeStrategyLedger(["k"])).write(
                spark,
                spark.createDataFrame(rows, "event_time timestamp, k long"),
                system_time=system_time,
            )
        return Dataset(path)

    def test_min_of_inputs_and_watermark_only_pull(self, spark, tmp_path):
        from datetime import datetime, timezone

        from kamu_cli_spark.dataset import Dataset
        from kamu_cli_spark.transform import TransformExecutor, set_transform
        from kamu_cli_spark.watermark import set_watermark

        import os as _os

        ws = str(tmp_path)
        d = lambda day: datetime(2024, 1, day, tzinfo=timezone.utc)  # noqa: E731
        a = self._root(ws, "a", spark, [(d(5), 1)], d(6))
        b = self._root(ws, "b", spark, [(d(3), 10)], d(6))
        assert a.chain.current_watermark() > b.chain.current_watermark()

        out = Dataset.create(ws, "joined", kind="Derivative",
                             system_time=d(6).isoformat())
        set_transform(
            out,
            {"a": _os.path.join(ws, "a"), "b": _os.path.join(ws, "b")},
            "SELECT a.event_time, a.k FROM a CROSS JOIN b",
            system_time=d(6).isoformat(),
        )
        ex = TransformExecutor(out)
        ex.execute(spark, system_time=d(6))
        # min rule: output watermark is the LAGGARD input's (b, day 3),
        # even though the output rows carry day-5 event times
        assert out.chain.current_watermark() == d(3).isoformat()

        # advance b's watermark explicitly, no new data rows
        set_watermark(Dataset(_os.path.join(ws, "b")), d(4))
        ex2 = TransformExecutor(Dataset(_os.path.join(ws, "joined")))
        ev = ex2.execute(spark, system_time=d(7))
        # the watermark-only pull commits and carries day 4 downstream
        assert ev is not None and ev.get("new_data") is None
        assert Dataset(
            _os.path.join(ws, "joined")
        ).chain.current_watermark() == d(4).isoformat()

        # fully up to date now -> no-op pull
        assert TransformExecutor(
            Dataset(_os.path.join(ws, "joined"))
        ).execute(spark, system_time=d(8)) is None

    def test_no_input_watermark_means_no_advance(self, spark, tmp_path):
        """A derivative commit whose inputs assert NO watermark must not
        derive one from its OUTPUT batch's event times — that would
        claim completeness beyond anything the inputs asserted (the
        reference emits no watermark when inputs have none). An AddData
        root commit of the same rows still derives max-event-time."""
        from datetime import datetime, timezone

        from kamu_cli_spark.dataset import Dataset
        from kamu_cli_spark.operators import MergeStrategyAppend
        from kamu_cli_spark.writer import DataWriter

        d = lambda day: datetime(2024, 1, day, tzinfo=timezone.utc)  # noqa: E731
        ws = str(tmp_path)
        rows = spark.createDataFrame([(d(5), 1)], "event_time timestamp, k long")

        der = Dataset.create(ws, "der", kind="Derivative",
                             system_time=d(6).isoformat())
        ev = DataWriter(der, MergeStrategyAppend()).write(
            spark, rows, system_time=d(6),
            event_kind="ExecuteTransform",
            extra_event={"query_inputs": {}},
            explicit_watermark=None,
        )
        assert ev["new_watermark"] is None  # no advance past the inputs
        assert Dataset(der.path).chain.current_watermark() is None

        root = Dataset.create(ws, "root", system_time=d(6).isoformat())
        ev2 = DataWriter(root, MergeStrategyAppend()).write(
            spark, rows, system_time=d(6)
        )
        assert ev2["new_watermark"] == d(5).isoformat()


class TestGc:
    def test_gc_reaps_orphans_and_tmp_dirs(self, spark, tmp_path, capsys):
        ws = str(tmp_path)
        _mk_cities(tmp_path, capsys, ws)
        f1 = tmp_path / "d1.csv"
        f1.write_text("city,population\nkyiv,2967\n")
        assert _run(capsys, "--workspace", ws, "ingest", "cities", str(f1))[0] == 0
        ds_path = os.path.join(ws, "cities")
        # plant an orphan slice (a CAS loser's leftover) + a crashed
        # writer staging dir
        orphan = os.path.join(ds_path, "data", "999999-0-0-deadbeef.parquet")
        open(orphan, "wb").write(b"not a real slice")
        os.makedirs(os.path.join(ds_path, ".tmp-crashed"))

        # default min-age: BOTH fresh artifacts could belong to a LIVE
        # writer (the slice lands in data/ before its chain commit) —
        # nothing younger than the cutoff is reaped
        rc, out = _run(capsys, "--workspace", ws, "gc")
        assert rc == 0 and "0 objects removed" in out
        assert os.path.exists(orphan)
        assert os.path.exists(os.path.join(ds_path, ".tmp-crashed"))
        # --min-age 0 reaps the orphan slice and the staging dir
        rc, out = _run(capsys, "--workspace", ws, "gc", "--min-age", "0")
        assert rc == 0 and "2 objects removed" in out
        assert not os.path.exists(orphan)
        assert not os.path.exists(os.path.join(ds_path, ".tmp-crashed"))
        # live data untouched
        assert Dataset(ds_path).read(spark).count() == 1

    def test_gc_noop_on_clean_workspace(self, spark, tmp_path, capsys):
        ws = str(tmp_path)
        _mk_cities(tmp_path, capsys, ws)
        rc, out = _run(capsys, "--workspace", ws, "gc")
        assert rc == 0 and "0 objects removed" in out


class TestIngestPreprocess:
    """SetPollingSource's preprocess(SQL) stage between read and merge
    (reference: polling_ingest_service_impl.rs:141-290; the covid
    examples' `FROM input` convention)."""

    def test_cli_ingest_runs_preprocess_sql(self, spark, tmp_path, capsys):
        ws = str(tmp_path)
        manifest = tmp_path / "cases.yaml"
        manifest.write_text(
            yaml.safe_dump(
                {
                    "kind": "Root",
                    "name": "cases",
                    "merge": {"kind": "ledger", "primary_key": ["id"]},
                    # covid-parity: derive a synthetic PK and harmonize
                    # a gender column, straight from the raw batch
                    "preprocess": {
                        "kind": "Sql",
                        "query": (
                            "SELECT CAST(row_number() OVER (ORDER BY name)"
                            " AS BIGINT) AS id,"
                            " CASE WHEN sex IN ('M', 'Male') THEN 'M'"
                            "      WHEN sex IN ('F', 'Female') THEN 'F'"
                            "      ELSE 'U' END AS gender,"
                            " upper(name) AS name FROM input"
                        ),
                    },
                }
            )
        )
        assert _run(capsys, "--workspace", ws, "add", str(manifest))[0] == 0
        f1 = tmp_path / "r1.csv"
        f1.write_text("name,sex\nalice,Female\nbob,M\ncharlie,unknown\n")
        assert _run(capsys, "--workspace", ws, "ingest", "cases", str(f1))[0] == 0

        ds = Dataset(os.path.join(ws, "cases"))
        rows = {
            (r["id"], r["gender"], r["name"])
            for r in ds.read(spark).collect()
        }
        assert rows == {(1, "F", "ALICE"), (2, "M", "BOB"), (3, "U", "CHARLIE")}
        # raw columns never reach the committed schema
        assert "sex" not in ds.read(spark).columns

    def test_multi_step_preprocess(self, spark, tmp_path, capsys):
        ws = str(tmp_path)
        manifest = tmp_path / "m.yaml"
        manifest.write_text(
            yaml.safe_dump(
                {
                    "kind": "Root",
                    "name": "m",
                    "merge": {"kind": "append"},
                    "preprocess": [
                        {"alias": "cleaned",
                         "query": "SELECT trim(v) AS v FROM input"},
                        {"query": "SELECT v, length(v) AS n FROM cleaned"},
                    ],
                }
            )
        )
        assert _run(capsys, "--workspace", ws, "add", str(manifest))[0] == 0
        f1 = tmp_path / "r.csv"
        f1.write_text("v\n  hi  \n")
        assert _run(capsys, "--workspace", ws, "ingest", "m", str(f1))[0] == 0
        ds = Dataset(os.path.join(ws, "m"))
        (r,) = ds.read(spark).select("v", "n").collect()
        assert (r["v"], r["n"]) == ("hi", 2)


class TestManifestReadStep:
    def test_declared_read_schema_and_options(self, spark, tmp_path, capsys):
        """The manifest's ODF ReadStep (kind, camelCase options,
        explicit schema) is the ingest contract; no --format flag
        needed and no schema inference drift across polls."""
        ws = str(tmp_path)
        manifest = tmp_path / "t.yaml"
        manifest.write_text(
            yaml.safe_dump(
                {
                    "kind": "Root",
                    "name": "t",
                    "merge": {"kind": "ledger", "primary_key": ["id"]},
                    "read": {
                        "kind": "csv",
                        "separator": ";",
                        "nullValue": "NA",
                        "schema": {
                            "fields": [
                                {"name": "id", "type": "Int64"},
                                {"name": "amount", "type": {"kind": "Decimal",
                                                            "precision": 10,
                                                            "scale": 2}},
                                {"name": "note", "type": "String"},
                            ]
                        },
                    },
                }
            )
        )
        assert _run(capsys, "--workspace", ws, "add", str(manifest))[0] == 0
        f1 = tmp_path / "r.csv"
        f1.write_text("id;amount;note\n1;10.50;ok\n2;3.00;NA\n")
        assert _run(capsys, "--workspace", ws, "ingest", "t", str(f1))[0] == 0

        ds = Dataset(os.path.join(ws, "t"))
        df = ds.read(spark)
        assert dict(df.dtypes)["amount"] == "decimal(10,2)"
        rows = {(r["id"], str(r["amount"]), r["note"]) for r in df.collect()}
        assert rows == {(1, "10.50", "ok"), (2, "3.00", None)}


class TestNewScaffold:
    def test_new_root_manifest_is_addable(self, spark, tmp_path, capsys, monkeypatch):
        monkeypatch.chdir(tmp_path)
        ws = str(tmp_path)
        rc, _ = _run(capsys, "--workspace", ws, "new", "mydata")
        assert rc == 0 and os.path.exists("mydata.yaml")
        rc, _ = _run(capsys, "--workspace", ws, "add", "mydata.yaml")
        assert rc == 0
        # refuses to clobber
        assert cli.main(["--workspace", ws, "new", "mydata"]) == 1
        capsys.readouterr()

    def test_new_derivative_shape(self, spark, tmp_path, capsys, monkeypatch):
        monkeypatch.chdir(tmp_path)
        rc, _ = _run(capsys, "--workspace", str(tmp_path), "new", "dv",
                     "--derivative")
        assert rc == 0
        m = yaml.safe_load(open("dv.yaml"))
        assert m["kind"] == "Derivative" and "queries" in m


class TestDisabledSources:
    """DisablePollingSource / DisablePushSource must actually refuse
    ingestion, and a re-declared source re-enables
    (dtos_generated.rs:2151-2162)."""

    def test_polling_disable_reenable_cycle(self, spark, tmp_path, capsys):
        ws = str(tmp_path)
        _mk_cities(tmp_path, capsys, ws)
        f1 = tmp_path / "d1.csv"
        f1.write_text("city,population\nkyiv,2967\n")
        assert _run(capsys, "--workspace", ws, "ingest", "cities", str(f1))[0] == 0

        ds = Dataset(os.path.join(ws, "cities"))
        ds.chain.append({"kind": "DisablePollingSource"})
        assert cli.main(["--workspace", ws, "ingest", "cities", str(f1)]) == 1
        capsys.readouterr()

        # re-declaring the source re-enables ingestion
        ds.chain.append(
            {"kind": "SetPollingSource",
             "merge": {"kind": "ledger", "primary_key": ["city"]}}
        )
        f2 = tmp_path / "d2.csv"
        f2.write_text("city,population\nlviv,717\n")
        assert _run(capsys, "--workspace", ws, "ingest", "cities", str(f2))[0] == 0
        assert Dataset(os.path.join(ws, "cities")).read(spark).count() == 2

    def test_push_source_activation_by_name(self, tmp_path):
        from kamu_cli_spark.ledger.chain import active_push_source

        ws = str(tmp_path)
        ds = Dataset.create(ws, "p")
        ds.chain.append({"kind": "AddPushSource", "source_name": "a",
                         "merge": {"kind": "append"}})
        ds.chain.append({"kind": "AddPushSource", "source_name": "b",
                         "merge": {"kind": "append"}})
        assert active_push_source(ds.chain, "a") is not None
        ds.chain.append({"kind": "DisablePushSource", "source_name": "a"})
        assert active_push_source(ds.chain, "a") is None
        # 'b' unaffected; unnamed lookup resolves to the sole survivor
        assert active_push_source(ds.chain, "b") is not None
        assert active_push_source(ds.chain).event["source_name"] == "b"


class TestManifestVocab:
    def test_custom_event_time_column_end_to_end(self, spark, tmp_path, capsys):
        """A manifest-declared vocabulary (SetVocab) renames the system
        columns; the writer stamps/sorts by the custom event-time name
        and the watermark follows it."""
        ws = str(tmp_path)
        manifest = tmp_path / "scores.yaml"
        manifest.write_text(
            yaml.safe_dump(
                {
                    "kind": "Root",
                    "name": "scores",
                    "vocab": {"event_time_column": "match_time"},
                    "merge": {"kind": "ledger", "primary_key": ["match_id"]},
                }
            )
        )
        assert _run(capsys, "--workspace", ws, "add", str(manifest))[0] == 0
        f1 = tmp_path / "d.csv"
        f1.write_text("match_time,match_id,score\n2024-01-02T00:00:00,1,10\n")
        assert _run(
            capsys, "--workspace", ws, "ingest", "scores", str(f1)
        )[0] == 0

        ds = Dataset(os.path.join(ws, "scores"))
        assert ds.vocab.event_time_column == "match_time"
        df = ds.read(spark)
        assert "match_time" in df.columns and "event_time" not in df.columns
        assert ds.chain.current_watermark().startswith("2024-01-02")


class TestPullPollsRoots:
    def test_pull_recursive_polls_root_then_transforms(
        self, spark, tmp_path, capsys
    ):
        """`kamu pull --recursive` on a derivative first polls its Root
        input from the chain-recorded FilesGlob fetch (no flags — the
        SetPollingSource event is the whole contract), then runs the
        transform over the fresh data."""
        ws = str(tmp_path)
        inbox = tmp_path / "inbox"
        inbox.mkdir()
        root_manifest = tmp_path / "cities.yaml"
        root_manifest.write_text(
            yaml.safe_dump(
                {
                    "kind": "Root",
                    "name": "cities",
                    "fetch": {"kind": "FilesGlob", "path": f"{inbox}/*.csv"},
                    "read": {"kind": "csv"},
                    "merge": {"kind": "ledger", "primary_key": ["city"]},
                }
            )
        )
        big_manifest = tmp_path / "big.yaml"
        big_manifest.write_text(
            yaml.safe_dump(
                {
                    "kind": "Derivative",
                    "name": "big",
                    "inputs": {"cities": "cities"},
                    "queries": [
                        {"query": "SELECT event_time, city, population"
                                  " FROM cities WHERE population > 1000"}
                    ],
                }
            )
        )
        assert _run(capsys, "--workspace", ws, "add", str(root_manifest))[0] == 0
        assert _run(capsys, "--workspace", ws, "add", str(big_manifest))[0] == 0

        (inbox / "a.csv").write_text("city,population\nkyiv,2967\nlviv,717\n")
        rc, out = _run(capsys, "--workspace", ws, "pull", "big", "--recursive")
        assert rc == 0
        assert "cities: committed 2 records" in out
        assert "big: committed 1 records" in out

        # idempotent second pull
        rc, out = _run(capsys, "--workspace", ws, "pull", "big", "--recursive")
        assert rc == 0 and out.count("up-to-date") == 2

        # a new inbox file flows through root AND derivative in one pull
        (inbox / "b.csv").write_text("city,population\nkharkiv,1421\n")
        rc, out = _run(capsys, "--workspace", ws, "pull", "big", "--recursive")
        assert rc == 0
        assert "cities: committed 1 records" in out
        assert "big: committed 1 records" in out
        big = Dataset(os.path.join(ws, "big")).read(spark)
        assert {r["city"] for r in big.collect()} == {"kyiv", "kharkiv"}


class TestResetAppendRace:
    def test_in_lock_cas_aborts_on_concurrent_append(self, tmp_path):
        """The old-head guard re-runs inside the chain lock: an append
        that lands between reset planning and execution aborts the
        truncation instead of being destroyed."""
        from kamu_cli_spark.ledger.chain import MetadataChain

        ws = str(tmp_path)
        ds = Dataset.create(ws, "r")
        ds.chain.append({"kind": "SetPollingSource", "merge": {"kind": "append"}})
        planned_head = ds.chain.head().block_hash

        # simulate the interleaved writer: ANOTHER process handle
        # appends after our reset has planned against planned_head
        other = MetadataChain(ds.chain.path)
        other.append({"kind": "SetInfo", "description": "late commit"})

        try:
            # our stale in-memory view still shows planned_head, so the
            # pre-check passes; the locked reload must catch it
            reset_dataset(ds, new_head=ds.chain.blocks()[0].block_hash,
                          old_head=planned_head)
            assert False, "expected OldHeadMismatchError"
        except OldHeadMismatchError:
            pass
        # the concurrent append survived intact
        fresh = MetadataChain(ds.chain.path)
        assert fresh.head().event["kind"] == "SetInfo"
        assert len(fresh) == 3


def test_reset_defer_slice_gc_leaves_files_for_aged_sweep(spark, tmp_path):
    """Multi-reader mode: a deferred reset moves the head but keeps the
    dropped slice files until an aged gc reaps them — a reader planned
    against the old head can still finish."""
    import os
    import time
    from datetime import datetime, timezone

    from kamu_cli_spark.operators import MergeStrategyAppend
    from kamu_cli_spark.reset import reset_dataset
    from kamu_cli_spark.writer import DataWriter

    T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
    ds = Dataset.create(str(tmp_path), "d", system_time=T0.isoformat())
    w = DataWriter(ds, MergeStrategyAppend())
    w.write(spark, spark.createDataFrame([(1,)], "k int"), system_time=T0)
    head1 = ds.chain.head().block_hash
    w.write(
        spark,
        spark.createDataFrame([(2,)], "k int"),
        system_time=datetime(2024, 1, 2, tzinfo=timezone.utc),
    )
    dropped_path = ds.chain.data_files()[-1]["path"]

    res = reset_dataset(ds, new_head=head1, defer_slice_gc=True)
    assert res["removed_slices"] == []
    assert res["deferred_slices"] == [dropped_path]
    full = os.path.join(ds.path, dropped_path)
    assert os.path.exists(full)  # still readable by an in-flight query
    ds.chain.verify()
    assert ds.read(spark).count() == 1

    # the aged sweep refuses young files, then reaps once past min_age
    assert ds.clean_orphan_slices(min_age=3600) == []
    assert os.path.exists(full)
    os.utime(full, (time.time() - 7200, time.time() - 7200))
    assert ds.clean_orphan_slices(min_age=3600) == [dropped_path]
    assert not os.path.exists(full)
