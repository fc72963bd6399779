"""Verifiable /query envelopes: pinned input + hash commitment +
Ed25519 proof, replay-verified through POST /verify.

Reference semantics: adapter/http/src/data/query_types.rs:30-448.
"""

from __future__ import annotations

import json
import socket
import urllib.request
from datetime import datetime, timezone, timedelta

from kamu_cli_spark.api import serve
from kamu_cli_spark.commitments import hash_json, verify_proof
from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.writer import DataWriter

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc)
T1 = T0 + timedelta(days=1)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _post(port, path, body):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"},
        method="POST",
    )
    with urllib.request.urlopen(req) as r:
        return json.loads(r.read())


def test_query_commitment_roundtrip(spark, tmp_path):
    ws = str(tmp_path)
    ds = Dataset.create(ws, "cities", system_time=T0.isoformat())
    writer = DataWriter(ds, MergeStrategyLedger(["city"]))
    writer.write(
        spark,
        spark.createDataFrame(
            [("kyiv", 3), ("lviv", 7)], "city string, population int"
        ),
        system_time=T0,
    )

    port = _free_port()
    srv = serve(spark, ws, port=port, background=True)
    try:
        env = _post(
            port,
            "/query",
            {
                "query": "SELECT city, population FROM cities ORDER BY city",
                "include": ["Input", "Proof"],
            },
        )
        # envelope structure
        assert env["output"]["data"] == [
            {"city": "kyiv", "population": 3},
            {"city": "lviv", "population": 7},
        ]
        pinned = env["input"]["datasets"]
        assert len(pinned) == 1 and pinned[0]["alias"] == "cities"
        assert pinned[0]["blockHash"] == ds.chain.head().block_hash
        # commitment hashes recomputable client-side
        assert env["commitment"]["inputHash"] == hash_json(env["input"])
        assert env["commitment"]["outputHash"] == hash_json(env["output"])
        # proof verifies offline
        assert verify_proof(env["proof"], env["commitment"])
        assert env["proof"]["type"] == "Ed25519Signature2020"
        assert env["proof"]["verificationMethod"].startswith("did:key:z")

        # replay-verify through the server — with data ADDED after the
        # commitment, so only block-hash pinning keeps it reproducible
        writer.write(
            spark,
            spark.createDataFrame([("odesa", 5)], "city string, population int"),
            system_time=T1,
        )
        res = _post(port, "/verify", {k: env[k] for k in ("input", "commitment", "proof")})
        assert res == {"ok": True}

        # unpinned query now sees three rows (sanity: data really changed)
        q2 = _post(port, "/query", {"query": "SELECT count(*) AS n FROM cities"})
        assert q2["data"] == [{"n": 3}]

        # tampered output hash → mismatch
        bad = {
            "input": env["input"],
            "commitment": {**env["commitment"], "outputHash": "f1620" + "0" * 64},
        }
        bad["commitment"].pop("inputHash")
        bad["commitment"]["inputHash"] = hash_json(env["input"])
        res = _post(port, "/verify", bad)
        assert res["ok"] is False and res["error"]["kind"] == "Outputs::Mismatch"

        # tampered input → input-hash mismatch
        res = _post(
            port,
            "/verify",
            {
                "input": {**env["input"], "query": "SELECT 1"},
                "commitment": env["commitment"],
            },
        )
        assert res["ok"] is False
        assert res["error"]["kind"] == "InvalidRequest::InputHash"

        # forged signature → bad-signature
        forged = dict(env["proof"])
        forged["proofValue"] = "u" + "A" * 86
        res = _post(
            port,
            "/verify",
            {"input": env["input"], "commitment": env["commitment"], "proof": forged},
        )
        assert res["ok"] is False
        assert res["error"]["kind"] == "InvalidRequest::BadSignature"
    finally:
        srv.shutdown()
