"""REST data API — the reference's HTTP adapter surface
(SURVEY.md §2.8: POST /query, GET /tail, POST /ingest, GET /metadata,
POST /verify; adapter/http/src/data/query_types.rs).

Minimal stdlib implementation (no web framework in this environment):
one worker SparkSession behind a threaded HTTP server. Response
formats follow the reference's JSON AoS (array-of-structures) /
SoA / AoA data formats.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, SparkSession


def _df_payload(df: DataFrame, fmt: str = "aos", limit: int = 1000) -> dict:
    rows = df.limit(limit).collect()
    cols = df.columns
    if fmt == "aos":
        data = [{c: _j(v) for c, v in zip(cols, r)} for r in rows]
    elif fmt == "soa":
        data = {c: [_j(r[i]) for r in rows] for i, c in enumerate(cols)}
    elif fmt == "aoa":
        data = [[_j(v) for v in r] for r in rows]
    else:
        raise ValueError(f"unknown data format: {fmt}")
    schema = [
        {"name": f.name, "type": f.dataType.simpleString()} for f in df.schema.fields
    ]
    return {"schema": schema, "data": data, "dataFormat": fmt}


def _j(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


class _Handler(BaseHTTPRequestHandler):
    server_version = "kamu-cli-spark/0.1"
    qs = None  # QueryService, injected
    spark: SparkSession = None
    signer = None  # QuerySigner for /query proofs, injected

    def log_message(self, *args):  # quiet
        pass

    def _send(self, code: int, payload: dict):
        body = json.dumps(payload).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _error(self, code: int, msg: str):
        self._send(code, {"error": msg})

    def _odata(self, url, q):
        """Minimal OData v4 JSON protocol (reference: adapter/odata):
        service document, $metadata, and entity-set reads with
        $top/$skip/$select/$orderby."""
        seg = url.path[len("/odata") :].strip("/")
        if seg == "":
            sets = [
                {"name": n, "kind": "EntitySet", "url": n}
                for n in self.qs.list_datasets()
            ]
            return self._send(200, {"@odata.context": "$metadata", "value": sets})
        if seg == "$metadata":
            out = {}
            for n in self.qs.list_datasets():
                ds = self.qs.dataset(n)
                ev = ds.schema_event()
                out[n] = ev["fields"] if ev else []
            return self._send(200, {"$Version": "4.0", "entities": out})
        name = seg
        df = self.qs.get_data(name)
        if df is None:
            return self._error(404, f"entity set not found or empty: {name}")
        from pyspark.sql import functions as F

        if "$filter" in q:
            from kamu_cli_spark.api.odata_filter import parse_filter

            df = df.filter(parse_filter(q["$filter"]))
        if "$orderby" in q:
            parts = [p.strip() for p in q["$orderby"].split(",")]
            cols = [
                F.col(p.split()[0]).desc()
                if p.lower().endswith(" desc")
                else F.col(p.split()[0]).asc()
                for p in parts
            ]
            df = df.orderBy(*cols)
        if "$select" in q:
            df = df.select(*[c.strip() for c in q["$select"].split(",")])
        skip = int(q.get("$skip", 0))
        top = int(q.get("$top", 100))
        if skip:
            df = df.offset(skip)
        rows = [{c: _j(v) for c, v in r.asDict().items()} for r in df.limit(top).collect()]
        return self._send(
            200, {"@odata.context": f"$metadata#{name}", "value": rows}
        )

    def do_GET(self):
        url = urlparse(self.path)
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        try:
            if url.path == "/odata" or url.path.startswith("/odata/"):
                self._odata(url, q)
            elif url.path == "/tail":
                df = self.qs.tail(
                    q["dataset"],
                    skip=int(q.get("skip", 0)),
                    limit=int(q.get("limit", 100)),
                )
                self._send(200, _df_payload(df, q.get("dataFormat", "aos")))
            elif url.path == "/metadata":
                ds = self.qs.dataset(q["dataset"])
                blocks = [
                    json.loads(b.to_json()) for b in ds.chain.blocks()
                ]
                self._send(200, {"name": ds.name, "blocks": blocks})
            elif url.path == "/datasets":
                self._send(200, {"datasets": self.qs.list_datasets()})
            else:
                self._error(404, f"no route {url.path}")
        except KeyError as e:
            self._error(400, f"missing/unknown parameter or dataset: {e}")
        except Exception as e:  # pragma: no cover
            self._error(500, str(e))

    def do_POST(self):
        url = urlparse(self.path)
        n = int(self.headers.get("Content-Length", 0))
        try:
            body = json.loads(self.rfile.read(n) or b"{}")
        except json.JSONDecodeError:
            return self._error(400, "invalid JSON body")
        try:
            if url.path == "/query":
                fmt = body.get("dataFormat", "aos")
                limit = int(body.get("limit", 1000))
                include = set(body.get("include", []))
                pins = {
                    d["alias"]: d["blockHash"] for d in body.get("datasets", [])
                }
                df, state = self.qs.sql_with_state(body["query"], pins=pins)
                payload = _df_payload(df, fmt, limit)
                if "Proof" not in include:
                    self._send(200, payload)
                else:
                    # verifiable-query envelope: pinned input + hash
                    # commitment + Ed25519 proof (query_types.rs:30-448)
                    from kamu_cli_spark.commitments import (
                        make_commitment,
                        make_proof,
                    )

                    input_obj = {
                        "query": body["query"],
                        "queryDialect": "SqlSpark",
                        "dataFormat": fmt,
                        "limit": limit,
                        "include": sorted(include),
                        "datasets": state,
                    }
                    commitment = make_commitment(input_obj, payload)
                    self._send(
                        200,
                        {
                            "input": input_obj,
                            "output": payload,
                            "subQueries": [],
                            "commitment": commitment,
                            "proof": make_proof(self.signer, commitment),
                        },
                    )
            elif url.path == "/ingest":
                from kamu_cli_spark.operators.merge import make_merge_strategy
                from kamu_cli_spark.writer import DataWriter

                from kamu_cli_spark.ledger.chain import (
                    active_polling_source,
                    active_push_sources,
                )

                ds = self.qs.dataset(body["dataset"])
                declared = ds.chain.last_event(
                    "SetPollingSource"
                ) or ds.chain.last_event("AddPushSource")
                src = active_polling_source(ds.chain)
                if src is None:
                    pushes = active_push_sources(ds.chain)
                    want = body.get("source_name")
                    if want is not None:
                        src = pushes.get(want)
                        if declared is not None and src is None:
                            self._error(
                                400, f"push source {want!r} unknown or disabled"
                            )
                            return
                    elif len(pushes) == 1:
                        src = next(iter(pushes.values()))
                    elif len(pushes) > 1:
                        self._error(
                            400,
                            "multiple active push sources — pass source_name "
                            f"(one of {sorted(pushes)})",
                        )
                        return
                if declared is not None and src is None:
                    self._error(
                        400,
                        "source is disabled (DisablePollingSource/"
                        "DisablePushSource)",
                    )
                    return
                cfg = (src.event.get("merge") if src else None) or {"kind": "append"}
                strategy = make_merge_strategy(
                    cfg.get("kind", "append"),
                    cfg.get("primary_key"),
                    cfg.get("compare_columns"),
                    ds.vocab,
                )
                rows = body["data"]  # JSON AoS
                df = self.spark.createDataFrame(rows)
                ev = DataWriter(ds, strategy, infer_schema=True).write(self.spark, df)
                self._send(200, {"committed": ev["new_data"] if ev else None})
            elif url.path == "/verify":
                if "commitment" in body:
                    # replay-verify a query commitment envelope
                    from kamu_cli_spark.commitments import verify_query_envelope

                    self._send(
                        200, verify_query_envelope(self.qs, body, _df_payload)
                    )
                else:
                    from kamu_cli_spark.verification import verify_dataset

                    ds = self.qs.dataset(body["dataset"])
                    res = verify_dataset(self.spark, ds)
                    self._send(200, {"ok": True, **res})
            else:
                self._error(404, f"no route {url.path}")
        except KeyError as e:
            self._error(400, f"missing/unknown parameter or dataset: {e}")
        except Exception as e:
            self._error(500, str(e))


def serve(
    spark: SparkSession,
    workspace: str,
    port: int = 8080,
    background: bool = False,
) -> ThreadingHTTPServer:
    """Start the REST server; returns the server object (call
    `.shutdown()` to stop when background=True)."""
    from kamu_cli_spark.commitments import QuerySigner
    from kamu_cli_spark.query import QueryService

    handler = type(
        "Handler",
        (_Handler,),
        {
            "qs": QueryService(spark, workspace),
            "spark": spark,
            "signer": QuerySigner(),
        },
    )
    srv = ThreadingHTTPServer(("127.0.0.1", port), handler)
    if background:
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        return srv
    srv.serve_forever()
    return srv
