"""Container-protocol fetch: env contract, state files, pagination,
up-to-date detection, and `${{ env.X || 'default' }}` templating.

Reference semantics: fetch_service/container.rs:30-234 (ODF container
protocol) and fetch_service/template.rs:63-122 (env templating). The
tests exec a local shell script in place of an OCI image — the
protocol (ODF_* env vars, stdout capture, state files) is identical.
"""

from __future__ import annotations

import os
import stat

import pytest

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.sources.fetch import (
    ContainerProtocolError,
    TemplateError,
    fetch_container,
    ingest_container,
    template_string,
)


def test_template_string_env_and_fallbacks(monkeypatch):
    monkeypatch.setenv("ODF_TEST_TOKEN", "s3cret")
    monkeypatch.delenv("ODF_TEST_MISSING", raising=False)
    assert template_string("x=${{ env.ODF_TEST_TOKEN }}") == "x=s3cret"
    assert template_string("${{ env.ODF_TEST_MISSING || 'fallback' }}") == "fallback"
    assert template_string("${{ env.ODF_TEST_MISSING || 42 }}") == "42"
    assert template_string("${{ 'a' }}/${{ '' }}/${{ -1.5 }}") == "a//-1.5"
    assert template_string("no templates here") == "no templates here"
    with pytest.raises(TemplateError):
        template_string("${{ env.ODF_TEST_MISSING }}")
    with pytest.raises(TemplateError):
        template_string("${{ not_a_token }}")


def _script(tmp_path, name: str, body: str) -> str:
    p = tmp_path / name
    p.write_text("#!/bin/sh\n" + body)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    return str(p)


def test_fetch_container_state_roundtrip_and_up_to_date(tmp_path):
    # emits one CSV batch and reports etag "v1"; on a repeat poll with
    # ODF_ETAG already v1 it reports the same etag and emits nothing
    src = _script(
        tmp_path,
        "source.sh",
        'if [ "$ODF_ETAG" = "v1" ]; then\n'
        '  printf "v1" > "$ODF_NEW_ETAG_PATH"\n'
        "  exit 0\n"
        "fi\n"
        'printf "k,v\\na,1\\n"\n'
        'printf "v1" > "$ODF_NEW_ETAG_PATH"\n',
    )
    staging = str(tmp_path / "staged")
    path, state, has_more = fetch_container([src], staging)
    assert path == staging
    assert state == {"kind": "container", "etag": "v1"}
    assert not has_more
    assert open(staging).read() == "k,v\na,1\n"

    # same state in → up-to-date, no data
    path2, state2, _ = fetch_container([src], str(tmp_path / "staged2"), state)
    assert path2 is None
    assert state2 == state


def test_fetch_container_unchanged_state_with_data_is_protocol_error(tmp_path):
    src = _script(
        tmp_path,
        "bad.sh",
        'printf "k,v\\na,1\\n"\nprintf "v1" > "$ODF_NEW_ETAG_PATH"\n',
    )
    staging = str(tmp_path / "s")
    _, state, _ = fetch_container([src], staging)
    with pytest.raises(ContainerProtocolError, match="state didn't change"):
        fetch_container([src], str(tmp_path / "s2"), state)


def test_fetch_container_nonzero_exit(tmp_path):
    src = _script(tmp_path, "fail.sh", 'echo "boom" >&2\nexit 3\n')
    with pytest.raises(ContainerProtocolError, match="exited 3.*boom"):
        fetch_container([src], str(tmp_path / "s"))


def test_ingest_container_pagination_and_resume(spark, tmp_path, monkeypatch):
    """Three-page source driven by the has-more-data flag: one commit
    per page, cursor carried in the chain's source_state, idempotent
    re-poll, and `${{ env }}` templating of the env block."""
    monkeypatch.setenv("ODF_TEST_PAGES", "3")
    src = _script(
        tmp_path,
        "paged.sh",
        "page=${ODF_ETAG:-0}\n"
        'total="$SRC_PAGES"\n'
        'if [ "$page" -ge "$total" ]; then\n'
        '  printf "%s" "$page" > "$ODF_NEW_ETAG_PATH"\n'
        "  exit 0\n"
        "fi\n"
        "next=$((page + 1))\n"
        'printf "k,v\\nrow%s,%s\\n" "$next" "$next"\n'
        'printf "%s" "$next" > "$ODF_NEW_ETAG_PATH"\n'
        'if [ "$next" -lt "$total" ]; then touch "$ODF_NEW_HAS_MORE_DATA_PATH"; fi\n',
    )
    ds = Dataset.create(str(tmp_path), "paged")
    strat = MergeStrategyLedger(["k"])
    evs = ingest_container(
        spark,
        ds,
        strat,
        [src],
        env={"SRC_PAGES": "${{ env.ODF_TEST_PAGES || 3 }}"},
        fmt="csv",
    )
    assert len(evs) == 3
    assert ds.read(spark).count() == 3
    # cursor recorded in the chain
    states = [
        b.event.get("source_state")
        for b in ds.chain.blocks()
        if b.event.get("kind") == "AddData"
    ]
    assert states[-1] == {"kind": "container", "etag": "3"}

    # re-poll: source reports same etag, nothing ingested
    assert (
        ingest_container(
            spark, ds, strat, [src], env={"SRC_PAGES": "3"}, fmt="csv"
        )
        == []
    )
    ds.chain.verify()
