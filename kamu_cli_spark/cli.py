"""Command-line interface — the reference's CLI verb surface
(SURVEY.md §5 layer 4: add / ingest / pull / sql / tail / log / verify /
compact / export / lineage / list) over a workspace directory.

Usage: python -m kamu_cli_spark.cli <verb> [args...] [--workspace DIR]

Dataset manifests are YAML (same shape as the reference's
DatasetSnapshot):

    kind: Root            # or Derivative
    name: cities
    merge:
      kind: snapshot      # append|ledger|snapshot|changelog|upsert
      primary_key: [city]
    # derivative only:
    inputs: {alias: dataset_name}
    queries:
      - alias: step1
        query: SELECT ...
      - query: SELECT ...  # final unaliased step = output
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from datetime import datetime, timezone

import yaml


def _spark():
    from kamu_cli_spark.session import get_spark

    return get_spark(app_name="kamu-cli-spark")


def _dataset(args, name=None):
    from kamu_cli_spark.dataset import Dataset

    return Dataset(os.path.join(args.workspace, name or args.dataset))


def _list_datasets(workspace: str) -> list[str]:
    """Dataset dirs in the workspace — pure filesystem, so list/search/
    gc never pay SparkSession startup for zero Spark work."""
    if not os.path.isdir(workspace):
        return []
    return sorted(
        n
        for n in os.listdir(workspace)
        if os.path.isfile(os.path.join(workspace, n, "metadata.jsonl"))
    )


def cmd_add(args) -> int:
    from kamu_cli_spark.dataset import Dataset
    from kamu_cli_spark.transform import set_transform

    manifest = yaml.safe_load(open(args.manifest))
    name = manifest["name"]
    kind = manifest.get("kind", "Root")
    vocab_kwargs = {}
    if manifest.get("vocab"):
        from kamu_cli_spark.vocab import DEFAULT_VOCAB
        from dataclasses import replace as _dc_replace

        vocab_kwargs["vocab"] = _dc_replace(DEFAULT_VOCAB, **manifest["vocab"])
    ds = Dataset.create(args.workspace, name, kind=kind, **vocab_kwargs)
    if any(manifest.get(k) for k in ("merge", "preprocess", "read", "fetch")):
        ev = {"kind": "SetPollingSource", "merge": manifest.get("merge") or {"kind": "append"}}
        for key in ("fetch", "preprocess", "read"):
            if manifest.get(key):
                ev[key] = manifest[key]
        ds.chain.append(ev)
    if kind == "Derivative":
        inputs = {
            alias: os.path.join(args.workspace, ref)
            for alias, ref in manifest["inputs"].items()
        }
        set_transform(
            ds,
            inputs,
            manifest["queries"],
            temporal_tables=manifest.get("temporal_tables"),
            executor=manifest.get("executor"),
        )
    print(f"added dataset {name} ({kind})")
    return 0


def _reader_options(read_cfg: dict) -> dict:
    """Translate an ODF ReadStep DTO (camelCase keys, `schema` as an
    ODF field list) into reader kwargs (snake_case, Spark StructType)."""
    import re as _re

    from kamu_cli_spark.odf_schema import odf_schema_to_struct

    out = {}
    for k, v in read_cfg.items():
        if k == "kind":
            continue
        if k == "schema":
            fields = v.get("fields") if isinstance(v, dict) else v
            out["schema"] = odf_schema_to_struct(fields)
            continue
        out[_re.sub(r"(?<!^)(?=[A-Z])", "_", k).lower()] = v
    return out


def cmd_ingest(args) -> int:
    from kamu_cli_spark.operators.merge import make_merge_strategy
    from kamu_cli_spark.sources.readers import (
        apply_preprocess,
        prep_decompress,
        read_format,
    )
    from kamu_cli_spark.writer import DataWriter

    ds = _dataset(args)
    src = ds.chain.last_event("SetPollingSource")
    if src is not None:
        from kamu_cli_spark.ledger.chain import active_polling_source

        if active_polling_source(ds.chain) is None:
            print(
                f"error: polling source of {args.dataset} is disabled "
                "(DisablePollingSource)",
                file=sys.stderr,
            )
            return 1
    merge_cfg = (src.event.get("merge") if src else None) or {"kind": "append"}
    strategy = make_merge_strategy(
        merge_cfg.get("kind", "append"),
        merge_cfg.get("primary_key"),
        merge_cfg.get("compare_columns"),
        ds.vocab,
    )
    spark = _spark()
    path = args.file
    if path.endswith((".gz", ".zip")):
        path = prep_decompress(path)
    # the manifest's declared read step (format kind + reader options +
    # explicit schema) is the contract; the --format flag overrides it
    read_cfg = dict((src.event.get("read") if src else None) or {})
    fmt = args.format or read_cfg.pop("kind", None) or "csv"
    read_opts = _reader_options(read_cfg)
    df = read_format(spark, fmt, path, **read_opts)
    df = apply_preprocess(
        spark, df, src.event.get("preprocess") if src else None
    )
    if args.event_time_column and args.event_time_column in df.columns:
        df = df.withColumnRenamed(args.event_time_column, ds.vocab.event_time_column)
    ev = DataWriter(ds, strategy).write(spark, df)
    if ev is None:
        print("dataset up-to-date — no new data")
    else:
        iv = ev["new_data"]["offset_interval"]
        print(
            f"committed {ev['new_data']['num_records']} records "
            f"(offsets {iv['start']}..{iv['end']})"
        )
    return 0


def _poll_root(spark, ds) -> "dict | None":
    """Pull a Root dataset from its chain-recorded polling source: the
    SetPollingSource event's fetch/read/preprocess/merge ARE the
    contract, so `kamu pull` needs no flags (reference:
    polling_ingest_service_impl.rs:141-290). Returns the last committed
    event, or None when up-to-date / no pollable fetch declared."""
    from kamu_cli_spark.ledger.chain import active_polling_source
    from kamu_cli_spark.operators.merge import make_merge_strategy
    from kamu_cli_spark.sources.fetch import (
        ingest_ethereum_logs,
        ingest_files_glob,
        ingest_url,
    )

    src = active_polling_source(ds.chain)
    if src is None:
        return None
    ev = src.event
    fetch = ev.get("fetch") or {}
    kind = str(fetch.get("kind", "")).replace("_", "").lower()
    merge_cfg = ev.get("merge") or {"kind": "append"}
    strategy = make_merge_strategy(
        merge_cfg.get("kind", "append"),
        merge_cfg.get("primary_key"),
        merge_cfg.get("compare_columns"),
        ds.vocab,
    )
    read_cfg = dict(ev.get("read") or {})
    fmt = read_cfg.pop("kind", "csv") or "csv"
    opts = _reader_options(read_cfg)
    pre = ev.get("preprocess")
    if kind == "filesglob":
        evs = ingest_files_glob(
            spark, ds, strategy, fetch["path"], fmt=str(fmt).lower(),
            order=fetch.get("order", "by_name"), preprocess=pre, **opts,
        )
        return evs[-1] if evs else None
    if kind == "url":
        return ingest_url(
            spark, ds, strategy, fetch["url"], fmt=str(fmt).lower(),
            preprocess=pre, **opts,
        )
    if kind == "ethereumlogs":
        return ingest_ethereum_logs(
            spark, ds, strategy, node_url=fetch.get("node_url"),
            preprocess=pre,
            filter_address=fetch.get("filter_address"),
        )
    return None


def cmd_pull(args) -> int:
    from kamu_cli_spark.provenance import lineage, topological_order
    from kamu_cli_spark.transform import make_transform_executor

    spark = _spark()
    order: list[str] = []

    def topo(node):
        for sub in node["inputs"]:
            topo(sub)
        if node["name"] not in order:
            order.append(node["name"])

    if args.dataset == "--all" or args.all:
        order = topological_order(args.workspace)
    elif args.recursive:
        topo(lineage(args.workspace, args.dataset))
    else:
        order = [args.dataset]

    for name in order:
        ds = _dataset(args, name)
        if ds.kind == "Root":
            ev = _poll_root(spark, ds)
        else:
            ev = make_transform_executor(ds).execute(spark)
        if ev is None:
            print(f"{name}: up-to-date")
        elif ev.get("new_data"):
            print(f"{name}: committed {ev['new_data']['num_records']} records")
        else:
            print(f"{name}: advanced inputs, no new records")
    return 0


def cmd_sql(args) -> int:
    from kamu_cli_spark.query import QueryService

    qs = QueryService(_spark(), args.workspace)
    df = qs.sql(args.query)
    rows = df.limit(args.limit).collect()
    print("\t".join(df.columns))
    for r in rows:
        print("\t".join(str(v) for v in r))
    return 0


def cmd_tail(args) -> int:
    from kamu_cli_spark.query import QueryService

    qs = QueryService(_spark(), args.workspace)
    df = qs.tail(args.dataset, limit=args.limit)
    for r in df.collect():
        print(json.dumps({k: str(v) for k, v in r.asDict().items()}))
    return 0


def cmd_log(args) -> int:
    ds = _dataset(args)
    for b in reversed(ds.chain.blocks()):
        kind = b.event.get("kind")
        extra = ""
        if b.event.get("new_data"):
            iv = b.event["new_data"]["offset_interval"]
            extra = f" offsets={iv['start']}..{iv['end']}"
        print(f"[{b.sequence_number}] {b.block_hash[:16]} {b.system_time} {kind}{extra}")
    return 0


def cmd_verify(args) -> int:
    from kamu_cli_spark.verification import verify_dataset, verify_transform_replay

    spark = _spark()
    res = verify_dataset(spark, _dataset(args))
    print(f"ok: {res['slices']} slices, {res['blocks']} blocks")
    if args.replay:
        same = verify_transform_replay(spark, _dataset(args))
        print("replay deterministic:", same)
        return 0 if same else 1
    return 0


def cmd_schema(args) -> int:
    """Expose the dataset schema in DDL / ODF forms (reference:
    services/schema_service_impl.rs)."""
    from kamu_cli_spark.odf_schema import spark_to_odf_type

    ds = _dataset(args)
    ev = ds.schema_event()
    if ev is None:
        print("no schema committed yet")
        return 1
    if args.format == "ddl":
        print(", ".join(f"{f['name']} {f['type']}" for f in ev["fields"]))
    else:  # odf
        df = ds.read(_spark())
        out = [
            {
                "name": f.name,
                "type": spark_to_odf_type(f.dataType),
                "nullable": f.nullable,
            }
            for f in df.schema.fields
        ]
        print(json.dumps(out, indent=2))
    return 0


def cmd_compact(args) -> int:
    from kamu_cli_spark.compaction import compact, reset_keep_metadata_only

    if args.keep_metadata_only:
        reset_keep_metadata_only(_dataset(args))
        print("reset to metadata-only")
        return 0
    res = compact(_spark(), _dataset(args), max_slice_records=args.max_records)
    print(json.dumps(res))
    return 0


def cmd_export(args) -> int:
    from kamu_cli_spark.export import export

    ds = _dataset(args)
    n = export(ds.read(_spark()), args.output, args.format, args.records_per_file)
    print(f"exported {n} records to {args.output}")
    return 0


def cmd_set_info(args) -> int:
    """Attach descriptive metadata (SetInfo / SetLicense / SetAttachments)."""
    ds = _dataset(args)
    if args.description or args.keywords:
        ds.chain.append(
            {
                "kind": "SetInfo",
                "description": args.description,
                "keywords": (args.keywords or "").split(",") if args.keywords else [],
            }
        )
    if args.license:
        ds.chain.append(
            {"kind": "SetLicense", "short_name": args.license, "name": args.license}
        )
    if args.attachment:
        ds.chain.append(
            {
                "kind": "SetAttachments",
                "attachments": [
                    {"name": os.path.basename(a), "content": open(a).read()}
                    for a in args.attachment
                ],
            }
        )
    print("metadata updated")
    return 0


def cmd_info(args) -> int:
    ds = _dataset(args)
    out = {"name": ds.name, "kind": ds.kind, "blocks": len(ds.chain)}
    for b in ds.chain.blocks():
        k = b.event.get("kind")
        if k == "SetInfo":
            out["description"] = b.event.get("description")
            out["keywords"] = b.event.get("keywords")
        elif k == "SetLicense":
            out["license"] = b.event.get("short_name")
        elif k == "SetAttachments":
            out["attachments"] = [
                a["name"] for a in b.event.get("attachments", [])
            ]
    out["num_records"] = sum(d["num_records"] for d in ds.chain.data_files())
    out["watermark"] = ds.chain.current_watermark()
    print(json.dumps(out, indent=2))
    return 0


def cmd_lineage(args) -> int:
    from kamu_cli_spark.provenance import lineage

    print(json.dumps(lineage(args.workspace, args.dataset), indent=2))
    return 0


def cmd_reset(args) -> int:
    """`kamu reset` equivalent: move the head to an earlier block
    (default: Seed) and drop later data
    (reference: reset_planner_impl.rs:29-73, reset_executor_impl.rs)."""
    from kamu_cli_spark.reset import ResetError, reset_dataset

    try:
        out = reset_dataset(
            _dataset(args), new_head=args.new_head, old_head=args.old_head
        )
    except ResetError as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    print(json.dumps(out))
    return 0


def cmd_search(args) -> int:
    """`kamu search` equivalent over the local workspace: lowercased
    substring match on dataset names + SetInfo description/keywords
    (reference heuristic: adapter/graphql/src/queries/search.rs:29-80;
    same matcher as the GraphQL search endpoint)."""
    q = args.query.lower()
    for name in _list_datasets(args.workspace):
        ds = _dataset(args, name)
        info = ds.chain.last_event("SetInfo")
        ev = info.event if info else {}
        hay = [name, ev.get("description") or ""] + list(ev.get("keywords") or [])
        if any(q in h.lower() for h in hay):
            desc = ev.get("description") or ""
            print(f"{name}\t{ds.kind}\t{desc}")
    return 0


def cmd_rename(args) -> int:
    """`kamu rename` equivalent: datasets are addressed by directory
    name, so a rename is an atomic directory move (refused if the
    target exists). Derivative inputs reference datasets by name —
    like the reference warns, downstream transforms must be updated."""
    src = os.path.join(args.workspace, args.dataset)
    dst = os.path.join(args.workspace, args.new_name)
    if not os.path.isdir(src):
        print(f"error: no dataset {args.dataset}", file=sys.stderr)
        return 1
    if os.path.exists(dst):
        print(f"error: {args.new_name} already exists", file=sys.stderr)
        return 1
    os.rename(src, dst)
    print(f"renamed {args.dataset} -> {args.new_name}")
    return 0


def cmd_delete(args) -> int:
    """`kamu delete` equivalent; requires --yes (the reference prompts
    interactively)."""
    import shutil

    target = os.path.join(args.workspace, args.dataset)
    if not os.path.isdir(target):
        print(f"error: no dataset {args.dataset}", file=sys.stderr)
        return 1
    if not args.yes:
        print("refusing to delete without --yes", file=sys.stderr)
        return 1
    shutil.rmtree(target)
    print(f"deleted {args.dataset}")
    return 0


def cmd_new(args) -> int:
    """`kamu new` equivalent: write a commented starter manifest
    (root snapshot shape, or --derivative for a transform)."""
    out = f"{args.name}.yaml"
    if os.path.exists(out):
        print(f"error: {out} already exists", file=sys.stderr)
        return 1
    if args.derivative:
        body = {
            "kind": "Derivative",
            "name": args.name,
            "inputs": {"alias": "upstream-dataset-name"},
            "queries": [{"query": "SELECT * FROM alias"}],
        }
    else:
        body = {
            "kind": "Root",
            "name": args.name,
            "read": {"kind": "csv", "header": True},
            "merge": {"kind": "ledger", "primary_key": ["id"]},
        }
    with open(out, "w") as f:
        yaml.safe_dump(body, f, sort_keys=False)
    print(f"wrote {out}")
    return 0


def cmd_gc(args) -> int:
    """`kamu system gc` equivalent: per dataset, remove slices no chain
    block references (losers of the commit CAS, remnants of reset) and
    crashed-writer `.tmp-*` staging dirs."""
    import shutil
    import time

    total = 0
    for name in _list_datasets(args.workspace):
        ds = _dataset(args, name)
        # --min-age guards BOTH reap classes against live writers: a
        # writer lands its parquet in data/ before the chain commit, so
        # an unreferenced-but-fresh slice may be committed moments later
        removed = ds.clean_orphan_slices(min_age=args.min_age)
        dead_states = ds.clean_dead_state_variants(min_age=args.min_age)
        cutoff = time.time() - args.min_age
        tmps = [
            f
            for f in os.listdir(ds.path)
            if f.startswith(".tmp-")
            and os.path.isdir(os.path.join(ds.path, f))
            and os.path.getmtime(os.path.join(ds.path, f)) < cutoff
        ]
        for t in tmps:
            shutil.rmtree(os.path.join(ds.path, t))
        n = len(removed) + len(tmps) + len(dead_states)
        total += n
        if n:
            print(
                f"{name}: removed {len(removed)} orphan slices, "
                f"{len(tmps)} tmp dirs, {len(dead_states)} dead state checkpoints"
            )
    print(f"gc: {total} objects removed")
    return 0


def cmd_list(args) -> int:
    for name in _list_datasets(args.workspace):
        ds = _dataset(args, name)
        n = sum(d["num_records"] for d in ds.chain.data_files())
        print(f"{name}\t{ds.kind}\t{n} records\t{len(ds.chain)} blocks")
    return 0


# server handles from the last `api-server --no-block` run, so embedding
# callers (and tests) can shut the daemon-thread servers down cleanly
_SERVERS: list = []


def cmd_api_server(args) -> int:
    """`kamu system api-server` equivalent: REST (+ OData + GraphQL
    routes) and optionally Arrow Flight SQL over one shared
    SparkSession/workspace (reference: api_server.rs wiring)."""
    from kamu_cli_spark.api import serve
    from kamu_cli_spark.api.flight import serve_flight

    spark = _spark()
    _SERVERS.clear()
    if args.flight_port:
        _SERVERS.append(
            serve_flight(
                spark, args.workspace, port=args.flight_port, background=True
            )
        )
        print(f"flight-sql: grpc://127.0.0.1:{args.flight_port}")
    print(f"rest: http://127.0.0.1:{args.port}")
    srv = serve(spark, args.workspace, port=args.port, background=True)
    _SERVERS.append(srv)
    if args.block:  # pragma: no cover - interactive mode
        import time

        while True:
            time.sleep(3600)
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="kamu-cli-spark")
    p.add_argument("--workspace", default=os.environ.get("KAMU_WORKSPACE", "."))
    sub = p.add_subparsers(dest="verb", required=True)

    s = sub.add_parser("add"); s.add_argument("manifest"); s.set_defaults(fn=cmd_add)
    s = sub.add_parser("ingest")
    s.add_argument("dataset"); s.add_argument("file")
    # None -> fall back to the manifest's declared read.kind, then csv
    s.add_argument("--format", default=None)
    s.add_argument("--event-time-column", default=None)
    s.set_defaults(fn=cmd_ingest)
    s = sub.add_parser("pull")
    s.add_argument("dataset", nargs="?", default="")
    s.add_argument("--recursive", action="store_true")
    s.add_argument("--all", action="store_true")
    s.set_defaults(fn=cmd_pull)
    s = sub.add_parser("sql")
    s.add_argument("query"); s.add_argument("--limit", type=int, default=50)
    s.set_defaults(fn=cmd_sql)
    s = sub.add_parser("tail")
    s.add_argument("dataset"); s.add_argument("--limit", type=int, default=10)
    s.set_defaults(fn=cmd_tail)
    s = sub.add_parser("log"); s.add_argument("dataset"); s.set_defaults(fn=cmd_log)
    s = sub.add_parser("verify")
    s.add_argument("dataset")
    s.add_argument("--replay", action="store_true")
    s.set_defaults(fn=cmd_verify)
    s = sub.add_parser("schema")
    s.add_argument("dataset")
    s.add_argument("--format", choices=["ddl", "odf"], default="ddl")
    s.set_defaults(fn=cmd_schema)
    s = sub.add_parser("compact")
    s.add_argument("dataset"); s.add_argument("--max-records", type=int, default=1_000_000)
    s.add_argument("--keep-metadata-only", action="store_true")
    s.set_defaults(fn=cmd_compact)
    s = sub.add_parser("export")
    s.add_argument("dataset"); s.add_argument("output")
    s.add_argument("--format", default="parquet")
    s.add_argument("--records-per-file", type=int, default=None)
    s.set_defaults(fn=cmd_export)
    s = sub.add_parser("set-info")
    s.add_argument("dataset")
    s.add_argument("--description", default=None)
    s.add_argument("--keywords", default=None)
    s.add_argument("--license", default=None)
    s.add_argument("--attachment", action="append", default=None)
    s.set_defaults(fn=cmd_set_info)
    s = sub.add_parser("info"); s.add_argument("dataset"); s.set_defaults(fn=cmd_info)
    s = sub.add_parser("lineage"); s.add_argument("dataset"); s.set_defaults(fn=cmd_lineage)
    s = sub.add_parser("list"); s.set_defaults(fn=cmd_list)
    s = sub.add_parser("reset")
    s.add_argument("dataset"); s.add_argument("new_head", nargs="?", default=None)
    s.add_argument("--old-head", dest="old_head", default=None)
    s.set_defaults(fn=cmd_reset)
    s = sub.add_parser("search"); s.add_argument("query"); s.set_defaults(fn=cmd_search)
    s = sub.add_parser("rename")
    s.add_argument("dataset"); s.add_argument("new_name"); s.set_defaults(fn=cmd_rename)
    s = sub.add_parser("delete")
    s.add_argument("dataset"); s.add_argument("--yes", action="store_true")
    s.set_defaults(fn=cmd_delete)
    s = sub.add_parser("gc")
    s.add_argument("--min-age", type=float, default=3600.0,
                   help="only reap .tmp-* staging dirs older than this many seconds")
    s.set_defaults(fn=cmd_gc)
    s = sub.add_parser("new")
    s.add_argument("name"); s.add_argument("--derivative", action="store_true")
    s.set_defaults(fn=cmd_new)
    s = sub.add_parser("api-server")
    s.add_argument("--port", type=int, default=8080)
    s.add_argument("--flight-port", type=int, default=None)
    s.add_argument(
        "--no-block", dest="block", action="store_false", default=True,
        help="start servers on daemon threads and return (embedding/tests)",
    )
    s.set_defaults(fn=cmd_api_server)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
