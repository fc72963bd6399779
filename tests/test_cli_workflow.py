"""End-to-end CLI verb workflow (the reference's e2e command tests,
layer 4 of SURVEY §5): add → ingest → sql → tail → log → verify →
compact → export → list, in-process through cli.main."""

from __future__ import annotations

import json

import yaml

from kamu_cli_spark import cli


def _run(capsys, *argv) -> tuple[int, str]:
    rc = cli.main(list(argv))
    return rc, capsys.readouterr().out


def test_cli_full_workflow(spark, tmp_path, capsys):
    ws = str(tmp_path)
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
    rc, _ = _run(capsys, "--workspace", ws, "add", str(manifest))
    assert rc == 0

    f1 = tmp_path / "d1.csv"
    f1.write_text("city,population\nkyiv,2967\nlviv,717\n")
    rc, _ = _run(capsys, "--workspace", ws, "ingest", "cities", str(f1))
    assert rc == 0
    f2 = tmp_path / "d2.csv"
    f2.write_text("city,population\nodesa,1010\nkyiv,2967\n")
    rc, _ = _run(capsys, "--workspace", ws, "ingest", "cities", str(f2))
    assert rc == 0

    rc, out = _run(
        capsys, "--workspace", ws, "sql",
        "SELECT count(*) AS n FROM cities",
    )
    assert rc == 0 and "3" in out  # kyiv deduped by ledger PK

    rc, out = _run(capsys, "--workspace", ws, "tail", "cities", "--limit", "2")
    assert rc == 0 and "odesa" in out

    rc, out = _run(capsys, "--workspace", ws, "log", "cities")
    assert rc == 0 and "AddData" in out

    rc, out = _run(capsys, "--workspace", ws, "verify", "cities")
    assert rc == 0

    rc, out = _run(
        capsys, "--workspace", ws, "compact", "cities", "--max-records", "10"
    )
    assert rc == 0

    outdir = tmp_path / "exp"
    rc, _ = _run(
        capsys, "--workspace", ws, "export", "cities", str(outdir),
        "--format", "ndjson",
    )
    assert rc == 0
    rows = []
    for p in outdir.glob("*.json*"):
        if p.suffix == ".crc":
            continue
        rows += [json.loads(ln) for ln in p.read_text().splitlines() if ln]
    assert {r["city"] for r in rows} == {"kyiv", "lviv", "odesa"}

    rc, out = _run(capsys, "--workspace", ws, "list")
    assert rc == 0 and "cities" in out

    # post-compaction integrity: chain still verifies, data intact
    rc, out = _run(
        capsys, "--workspace", ws, "sql",
        "SELECT count(*) AS n FROM cities",
    )
    assert rc == 0 and "3" in out


def test_cli_set_info_attachments_roundtrip(spark, tmp_path, capsys):
    """SetInfo / SetLicense / SetAttachments events committed by the CLI
    surface back through `info` and the metadata chain (reference:
    MetadataEvent::SetAttachments, dtos_generated.rs:1253)."""
    ws = str(tmp_path)
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
    rc, _ = _run(capsys, "--workspace", ws, "add", str(manifest))
    assert rc == 0

    readme = tmp_path / "README.md"
    readme.write_text("# Cities\nA registry.")
    rc, _ = _run(
        capsys, "--workspace", ws, "set-info", "cities",
        "--description", "City registry",
        "--keywords", "cities,geo",
        "--license", "apache-2.0",
        "--attachment", str(readme),
    )
    assert rc == 0

    rc, out = _run(capsys, "--workspace", ws, "info", "cities")
    assert rc == 0
    meta = json.loads(out)
    assert meta["description"] == "City registry"
    assert meta["keywords"] == ["cities", "geo"]
    assert meta["license"] == "apache-2.0"
    assert meta["attachments"] == ["README.md"]

    # the attachment content itself is preserved verbatim in the chain
    from kamu_cli_spark.dataset import Dataset

    ds = Dataset(f"{ws}/cities")
    ev = ds.chain.last_event("SetAttachments").event
    assert ev["attachments"][0]["content"] == "# Cities\nA registry."
