"""FetchStep::Url against a local HTTP server: ETag caching, 304
up-to-date polls, change detection."""

from __future__ import annotations

import hashlib
import socket
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.sources.fetch import fetch_url, ingest_url


class _Srv(BaseHTTPRequestHandler):
    body = b"city,population\nkyiv,3\nlviv,7\n"

    def log_message(self, *a):
        pass

    def do_GET(self):
        etag = '"' + hashlib.md5(self.body).hexdigest() + '"'
        if self.headers.get("If-None-Match") == etag:
            self.send_response(304)
            self.end_headers()
            return
        self.send_response(200)
        self.send_header("ETag", etag)
        self.send_header("Content-Length", str(len(self.body)))
        self.end_headers()
        self.wfile.write(self.body)


@pytest.fixture()
def http_server():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = ThreadingHTTPServer(("127.0.0.1", port), _Srv)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{port}/data.csv", srv
    srv.shutdown()


def test_fetch_url_etag_cycle(http_server, tmp_path):
    url, srv = http_server
    path, state = fetch_url(url, str(tmp_path / "a.csv"))
    assert path and open(path).read().startswith("city,")
    assert state["etag"]

    # unchanged → 304 → None
    path2, state2 = fetch_url(url, str(tmp_path / "b.csv"), state)
    assert path2 is None

    # content changes → refetch with new etag
    _Srv.body = b"city,population\nkyiv,4\n"
    path3, state3 = fetch_url(url, str(tmp_path / "c.csv"), state)
    assert path3 and state3["etag"] != state["etag"]
    _Srv.body = b"city,population\nkyiv,3\nlviv,7\n"


def test_ingest_url_end_to_end(spark, http_server, tmp_path):
    url, srv = http_server
    ds = Dataset.create(str(tmp_path), "remote")
    strat = MergeStrategyLedger(["city"])
    ev = ingest_url(spark, ds, strat, url, fmt="csv")
    assert ev["new_data"]["num_records"] == 2
    assert ev["source_state"]["etag"]

    # second poll: 304 → no commit
    assert ingest_url(spark, ds, strat, url, fmt="csv") is None
    assert len(ds.chain.data_files()) == 1
