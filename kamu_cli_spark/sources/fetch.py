"""Fetch steps — polling sources that stage files for ingest.

Spark-side analogue of the reference's fetch service (SURVEY.md §2.1):

- **FilesGlob**: poll a local glob, ingest files in deterministic order
  (by name or mtime), one commit per file, recording `SourceState` in
  the chain so an interrupted poll resumes where it left off
  (fetch_service/file.rs semantics).
- **Url**: out of scope in this sandbox (no network) — the staging +
  SourceState (etag/last-modified) bookkeeping is identical; a caller
  can stage with any HTTP client and reuse `ingest_staged`.
"""

from __future__ import annotations

import glob as globmod
import json
import os
from datetime import datetime, timezone
from typing import Any

from pyspark.sql import SparkSession

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators.merge import MergeStrategy
from kamu_cli_spark.sources.readers import (
    apply_preprocess,
    prep_decompress,
    read_format,
)
from kamu_cli_spark.writer import DataWriter


def _last_source_state(ds: Dataset) -> dict[str, Any] | None:
    for b in reversed(ds.chain.blocks()):
        if b.event.get("kind") in ("AddData", "ExecuteTransform") and b.event.get(
            "source_state"
        ):
            return b.event["source_state"]
    return None


def fetch_url(
    url: str,
    staging_path: str,
    source_state: dict[str, Any] | None = None,
    timeout: float = 30.0,
) -> tuple[str | None, dict[str, Any]]:
    """Conditional HTTP fetch with ETag / Last-Modified caching
    (reference: fetch_service/http.rs savepoint semantics).

    Sends If-None-Match / If-Modified-Since from the previous
    `source_state`; returns ``(staged_path_or_None, new_state)`` —
    None when the server answered 304 Not Modified (up-to-date poll).
    """
    import urllib.error
    import urllib.request

    headers = {}
    state = source_state or {}
    if state.get("etag"):
        headers["If-None-Match"] = state["etag"]
    if state.get("last_modified"):
        headers["If-Modified-Since"] = state["last_modified"]

    req = urllib.request.Request(url, headers=headers)
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            body = resp.read()
            new_state = {
                "kind": "url",
                "url": url,
                "etag": resp.headers.get("ETag"),
                "last_modified": resp.headers.get("Last-Modified"),
            }
    except urllib.error.HTTPError as e:
        if e.code == 304:
            return None, {**state, "kind": "url", "url": url}
        raise
    os.makedirs(os.path.dirname(staging_path) or ".", exist_ok=True)
    with open(staging_path, "wb") as f:
        f.write(body)
    return staging_path, new_state


def ingest_url(
    spark: SparkSession,
    dataset: Dataset,
    strategy: MergeStrategy,
    url: str,
    fmt: str = "csv",
    event_time_column: str | None = None,
    preprocess=None,
    **reader_options,
) -> dict[str, Any] | None:
    """Polling ingest from a URL: conditional fetch → prep → read →
    preprocess(SQL) → merge → commit, recording the HTTP cache state in
    the chain. Returns None when the source is unchanged (304)."""
    import tempfile

    prev_state = _last_source_state(dataset)
    staged, new_state = fetch_url(
        url,
        os.path.join(tempfile.mkdtemp(), os.path.basename(url) or "fetched"),
        prev_state if prev_state and prev_state.get("kind") == "url" else None,
    )
    if staged is None:
        return None
    if staged.endswith((".gz", ".zip")):
        staged = prep_decompress(staged)
    df = read_format(spark, fmt, staged, **reader_options)
    df = apply_preprocess(spark, df, preprocess)
    if event_time_column and event_time_column in df.columns:
        df = df.withColumnRenamed(event_time_column, dataset.vocab.event_time_column)
    writer = DataWriter(dataset, strategy, infer_schema="schema" not in reader_options)
    return writer.write(
        spark,
        df,
        system_time=datetime.now(timezone.utc),
        extra_event={"source_state": new_state},
    )


class TemplateError(Exception):
    pass


def template_string(s: str, lookup=None) -> str:
    """`${{ env.NAME || 'literal' || 42 }}` substitution with a `||`
    fallback chain (reference: fetch_service/template.rs:63-122).
    Tokens: `env.NAME` (looked up, default os.environ), a bare number,
    or a single-quoted string. Raises TemplateError on an unparseable
    token or when no token in the chain yields a value."""
    import re

    lookup = lookup or (lambda name: os.environ.get(name))
    re_tpl = re.compile(r"\$\{\{([^}]*)\}\}")
    re_env = re.compile(r"^env\.([a-zA-Z\-_0-9]+)$")
    re_num = re.compile(r"^(-?[0-9]+(?:\.[0-9]+)?)$")
    re_str = re.compile(r"^'([^']*)'$")

    def resolve(tokens_str: str) -> str:
        for token in tokens_str.split("||"):
            token = token.strip()
            if m := re_env.match(token):
                v = lookup(m.group(1))
                if v is not None:
                    return v
            elif m := re_num.match(token):
                return m.group(1)
            elif m := re_str.match(token):
                return m.group(1)
            else:
                raise TemplateError(f"invalid template token: {token!r}")
        raise TemplateError(f"no value for template: {tokens_str!r}")

    while m := re_tpl.search(s):
        s = s[: m.start()] + resolve(m.group(1).strip()) + s[m.end() :]
    return s


class ContainerProtocolError(Exception):
    pass


def fetch_container(
    command: list[str],
    staging_path: str,
    source_state: dict[str, Any] | None = None,
    env: dict[str, str | None] | None = None,
    batch_size: int = 10_000,
    timeout: float = 300.0,
) -> tuple[str | None, dict[str, Any] | None, bool]:
    """FetchStep::Container via subprocess (reference:
    fetch_service/container.rs:30-234; DTO dtos_generated.rs:2187-2198).

    The reference runs an OCI image attached, pipes the container's
    stdout into the staging file, and speaks the ODF container protocol
    through env vars: `ODF_ETAG`/`ODF_LAST_MODIFIED` carry the previous
    source state in; the process reports new state by writing
    `$ODF_NEW_ETAG_PATH` / `$ODF_NEW_LAST_MODIFIED_PATH`, and signals a
    paginated source via `$ODF_NEW_HAS_MORE_DATA_PATH`. No OCI runtime
    exists in this environment, so `command` is an argv exec'd directly
    — the protocol (env contract, stdout capture, state files,
    up-to-date detection) is identical, and a runtime-backed variant is
    `command=["docker", "run", ...image]`.

    Returns ``(staged_path_or_None, new_source_state, has_more)`` —
    path None when the source reported unchanged state (up-to-date).
    Raises ContainerProtocolError if state is unchanged but the process
    still wrote output bytes (mirrors container.rs:218-224).
    """
    import subprocess
    import tempfile

    state = source_state or {}
    out_dir = tempfile.mkdtemp(prefix="odf-fetch-")
    new_etag_path = os.path.join(out_dir, "new-etag")
    new_lm_path = os.path.join(out_dir, "new-last-modified")
    has_more_path = os.path.join(out_dir, "new-has-more-data")

    proc_env = dict(os.environ)
    for name, value in (env or {}).items():
        if value is None:
            raise TemplateError(f"env var {name!r} has no value")
        proc_env[name] = template_string(str(value))
    proc_env.update(
        {
            "ODF_ETAG": state.get("etag") or "",
            "ODF_LAST_MODIFIED": state.get("last_modified") or "",
            "ODF_NEW_ETAG_PATH": new_etag_path,
            "ODF_NEW_LAST_MODIFIED_PATH": new_lm_path,
            "ODF_NEW_HAS_MORE_DATA_PATH": has_more_path,
            "ODF_BATCH_SIZE": str(proc_env.get("ODF_BATCH_SIZE", batch_size)),
        }
    )

    os.makedirs(os.path.dirname(staging_path) or ".", exist_ok=True)
    argv = [template_string(a) for a in command]
    with open(staging_path, "wb") as out:
        res = subprocess.run(
            argv, stdout=out, stderr=subprocess.PIPE, env=proc_env, timeout=timeout
        )
    if res.returncode != 0:
        raise ContainerProtocolError(
            f"container fetch exited {res.returncode}: "
            f"{res.stderr.decode(errors='replace')[:500]}"
        )

    new_state: dict[str, Any] | None = None
    if os.path.exists(new_etag_path):
        with open(new_etag_path) as f:
            new_state = {"kind": "container", "etag": f.read().strip()}
    elif os.path.exists(new_lm_path):
        with open(new_lm_path) as f:
            new_state = {"kind": "container", "last_modified": f.read().strip()}
    has_more = os.path.exists(has_more_path)

    unchanged = (
        new_state is not None
        and state
        and new_state.get("etag") == state.get("etag")
        and new_state.get("last_modified") == state.get("last_modified")
    )
    if unchanged:
        if os.path.getsize(staging_path) != 0:
            raise ContainerProtocolError(
                "source state didn't change but output data was returned"
            )
        return None, new_state, has_more
    return staging_path, new_state, has_more


def ingest_container(
    spark: SparkSession,
    dataset: Dataset,
    strategy: MergeStrategy,
    command: list[str],
    fmt: str = "csv",
    env: dict[str, str | None] | None = None,
    event_time_column: str | None = None,
    max_rounds: int = 100,
    preprocess=None,
    **reader_options,
) -> list[dict[str, Any]]:
    """Polling ingest from a container-protocol source: fetch → read →
    merge → commit per round, honoring `has_more` pagination and
    recording the reported source state in the chain."""
    import tempfile

    events: list[dict[str, Any]] = []
    for _ in range(max_rounds):
        prev = _last_source_state(dataset)
        staged, new_state, has_more = fetch_container(
            command,
            os.path.join(tempfile.mkdtemp(), "fetched"),
            prev if prev and prev.get("kind") == "container" else None,
            env=env,
        )
        if staged is None:
            break
        df = read_format(spark, fmt, staged, **reader_options)
        df = apply_preprocess(spark, df, preprocess)
        if event_time_column and event_time_column in df.columns:
            df = df.withColumnRenamed(
                event_time_column, dataset.vocab.event_time_column
            )
        ev = DataWriter(dataset, strategy, infer_schema="schema" not in reader_options).write(
            spark,
            df,
            system_time=datetime.now(timezone.utc),
            extra_event={"source_state": new_state} if new_state else None,
        )
        if ev is not None:
            events.append(ev)
        if not has_more:
            break
    return events


def fetch_mqtt(
    staging_path: str,
    host: str = "localhost",
    port: int = 1883,
    topics: list[str] | None = None,
    username: str | None = None,
    password: str | None = None,
    max_messages: int = 10_000,
    idle_timeout: float = 2.0,
    client: Any | None = None,
) -> tuple[str | None, dict[str, Any]]:
    """FetchStep::Mqtt — bounded subscribe (reference:
    fetch_service/mqtt.rs; DTO dtos_generated.rs FetchStepMqtt): connect,
    subscribe to `topics`, drain messages until the broker goes idle for
    `idle_timeout` seconds (or `max_messages`), stage payloads as NDJSON
    lines. MQTT is at-least-once fire-hose — there is no resumable
    source state, so each poll stages whatever arrived (the reference
    relies on the merge strategy for dedup, same here).

    `client` injects the broker connection — any object with
    ``connect(host, port, username, password)``,
    ``subscribe(topics)``, ``poll(timeout) -> (topic, bytes) | None``
    and ``close()``. Defaults to a paho-mqtt adapter when that package
    exists; this environment has no broker or client library, so tests
    inject a fake.
    """
    if client is None:  # pragma: no cover - paho not in this environment
        try:
            from paho.mqtt.client import Client as _Paho  # type: ignore
        except ImportError as e:
            raise NotImplementedError(
                "mqtt fetch requires the paho-mqtt package or an injected client"
            ) from e
        client = _PahoAdapter(_Paho())
    client.connect(host, port, username, password)
    client.subscribe(topics or ["#"])
    os.makedirs(os.path.dirname(staging_path) or ".", exist_ok=True)
    n = 0
    try:
        with open(staging_path, "wb") as out:
            while n < max_messages:
                msg = client.poll(idle_timeout)
                if msg is None:
                    break
                _topic, payload = msg
                out.write(payload.rstrip(b"\n") + b"\n")
                n += 1
    finally:
        client.close()
    if n == 0:
        return None, {"kind": "mqtt"}
    return staging_path, {"kind": "mqtt"}


class _PahoAdapter:  # pragma: no cover - requires paho + a broker
    def __init__(self, client):
        import queue

        self._c = client
        self._q = queue.Queue()
        client.on_message = lambda _c, _u, m: self._q.put((m.topic, m.payload))

    def connect(self, host, port, username, password):
        if username:
            self._c.username_pw_set(username, password)
        self._c.connect(host, port)
        self._c.loop_start()

    def subscribe(self, topics):
        for t in topics:
            self._c.subscribe(t)

    def poll(self, timeout):
        import queue

        try:
            return self._q.get(timeout=timeout)
        except queue.Empty:
            return None

    def close(self):
        self._c.loop_stop()
        self._c.disconnect()


def _jsonrpc_http(node_url: str):
    """Minimal stdlib JSON-RPC transport for an Ethereum node."""
    import urllib.request

    counter = {"id": 0}

    def call(method: str, params: list) -> Any:
        counter["id"] += 1
        req = urllib.request.Request(
            node_url,
            data=json.dumps(
                {
                    "jsonrpc": "2.0",
                    "id": counter["id"],
                    "method": method,
                    "params": params,
                }
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=30) as resp:
            body = json.loads(resp.read())
        if "error" in body:
            raise RuntimeError(f"{method}: {body['error']}")
        return body["result"]

    return call


def fetch_ethereum_logs(
    staging_path: str,
    node_url: str | None = None,
    filter_address: str | list[str] | None = None,
    filter_topics: list | None = None,
    source_state: dict[str, Any] | None = None,
    block_page: int = 2_000,
    confirmations: int = 0,
    rpc: Any | None = None,
) -> tuple[str | None, dict[str, Any]]:
    """FetchStep::EthereumLogs — incremental `eth_getLogs` scan
    (reference: fetch_service/evm.rs; DTO FetchStepEthereumLogs).

    Scans `(last_seen_block, head - confirmations]` in `block_page`
    windows, staging one NDJSON record per log (block number/hash,
    tx + log index, address, topics, data — the reference's raw log
    schema before its SQL prefilter, which here is any Spark filter on
    the ingested table). Source state carries the last fully-scanned
    block, so polls resume exactly and reorg-safety comes from the
    `confirmations` margin.

    `rpc` injects the transport: ``rpc(method, params) -> result``.
    Defaults to a stdlib JSON-RPC HTTP client against `node_url` (no
    web3 dependency); tests inject a fake.
    """
    if rpc is None:
        if node_url is None:
            raise ValueError("fetch_ethereum_logs needs node_url or rpc")
        rpc = _jsonrpc_http(node_url)

    state = source_state or {}
    last_seen = int(state.get("last_seen_block", -1))
    head = int(rpc("eth_blockNumber", []), 16)
    upper = head - confirmations
    if upper <= last_seen:
        return None, {"kind": "ethereum_logs", "last_seen_block": last_seen}

    os.makedirs(os.path.dirname(staging_path) or ".", exist_ok=True)
    n = 0
    with open(staging_path, "w", encoding="utf-8") as out:
        frm = last_seen + 1
        while frm <= upper:
            to = min(frm + block_page - 1, upper)
            flt: dict[str, Any] = {
                "fromBlock": hex(frm),
                "toBlock": hex(to),
            }
            if filter_address:
                flt["address"] = filter_address
            if filter_topics:
                flt["topics"] = filter_topics
            for log in rpc("eth_getLogs", [flt]):
                rec = {
                    "block_number": int(log["blockNumber"], 16),
                    "block_hash": log.get("blockHash"),
                    "transaction_index": int(log.get("transactionIndex", "0x0"), 16),
                    "transaction_hash": log.get("transactionHash"),
                    "log_index": int(log.get("logIndex", "0x0"), 16),
                    "address": log.get("address"),
                    "topic0": (log.get("topics") or [None])[0],
                    "topics": log.get("topics") or [],
                    "data": log.get("data"),
                }
                out.write(json.dumps(rec) + "\n")
                n += 1
            frm = to + 1
    new_state = {"kind": "ethereum_logs", "last_seen_block": upper}
    if n == 0:
        os.unlink(staging_path)
        return None, new_state
    return staging_path, new_state


def ingest_ethereum_logs(
    spark: SparkSession,
    dataset: Dataset,
    strategy: MergeStrategy,
    rpc: Any = None,
    node_url: str | None = None,
    preprocess=None,
    **fetch_options,
) -> dict[str, Any] | None:
    """Polling ingest of an EVM log scan: fetch → NDJSON read →
    preprocess(SQL) → merge → commit, carrying the block cursor in the
    chain's source_state. The preprocess step is where raw log topics/
    data decode into typed event columns (the reference decodes via the
    declared event signature; the SQL form keeps the decode auditable —
    see examples/reth)."""
    import tempfile

    prev = _last_source_state(dataset)
    staged, new_state = fetch_ethereum_logs(
        os.path.join(tempfile.mkdtemp(), "logs.ndjson"),
        node_url=node_url,
        source_state=prev if prev and prev.get("kind") == "ethereum_logs" else None,
        rpc=rpc,
        **fetch_options,
    )
    if staged is None:
        if new_state != prev:
            # advance the cursor with a data-less block (empty scan range
            # still moves last_seen_block)
            ev = {
                "kind": "AddData",
                "new_data": None,
                "new_watermark": dataset.chain.current_watermark(),
                "source_state": new_state,
            }
            dataset.chain.append(ev)
            return ev
        return None
    df = read_format(spark, "ndjson", staged)
    df = apply_preprocess(spark, df, preprocess)
    return DataWriter(dataset, strategy, infer_schema=True).write(
        spark,
        df,
        system_time=datetime.now(timezone.utc),
        extra_event={"source_state": new_state},
    )


def ingest_files_glob(
    spark: SparkSession,
    dataset: Dataset,
    strategy: MergeStrategy,
    pattern: str,
    fmt: str = "csv",
    order: str = "by_name",
    event_time_column: str | None = None,
    preprocess=None,
    **reader_options,
) -> list[dict[str, Any]]:
    """Poll `pattern`; ingest each not-yet-seen file as ONE commit in
    order, advancing the source state (last ingested file marker).

    Resume state is ORDER-AWARE: for ``by_mtime`` the marker is the
    ``(mtime, name)`` sort key, not the bare name — comparing names
    alone would silently skip a newer file whose name sorts before the
    last-ingested one (reference: fetch_service/file.rs keeps the full
    ordering key in FetchSavepoint for the same reason).
    """
    files = globmod.glob(pattern)
    if order == "by_name":
        files.sort()
    elif order == "by_mtime":
        files.sort(key=lambda p: (os.path.getmtime(p), p))
    else:
        raise ValueError(f"unknown order: {order}")

    state = _last_source_state(dataset)
    last_seen = state.get("last_file") if state else None
    last_mtime = state.get("last_mtime") if state else None
    events = []
    for path in files:
        marker = os.path.basename(path)
        if order == "by_mtime":
            mtime = os.path.getmtime(path)
            if (
                last_seen is not None
                and last_mtime is not None
                and (mtime, marker) <= (last_mtime, last_seen)
            ):
                continue
        elif last_seen is not None and marker <= last_seen:
            continue
        new_state = {"kind": "files_glob", "order": order, "last_file": marker}
        if order == "by_mtime":
            new_state["last_mtime"] = os.path.getmtime(path)
        staged = path
        if path.endswith((".gz", ".zip")):
            staged = prep_decompress(path)
        df = read_format(spark, fmt, staged, **reader_options)
        df = apply_preprocess(spark, df, preprocess)
        if event_time_column and event_time_column in df.columns:
            df = df.withColumnRenamed(
                event_time_column, dataset.vocab.event_time_column
            )
        writer = DataWriter(dataset, strategy, infer_schema="schema" not in reader_options)
        ev = writer.write(
            spark,
            df,
            system_time=datetime.now(timezone.utc),
            extra_event={"source_state": new_state},
        )
        if ev is None:
            # up-to-date poll: still advance the marker with a data-less
            # block so the file isn't re-read next poll
            ev = {
                "kind": "AddData",
                "new_data": None,
                "new_watermark": dataset.chain.current_watermark(),
                "source_state": new_state,
            }
            dataset.chain.append(ev)
        events.append(ev)
        last_seen = marker
        last_mtime = new_state.get("last_mtime")
    return events
