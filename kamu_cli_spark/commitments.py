"""Query commitments & cryptographic proofs for the REST /query surface.

Mirrors the reference's verifiable-query envelope
(adapter/http/src/data/query_types.rs:30-448): a response optionally
carries

- ``input`` — the canonical request with every referenced dataset
  pinned to the block hash it was served from (the replay parameters);
- ``commitment`` — sha3-256 multihashes of the canonical-JSON input,
  output, and sub-queries list;
- ``proof`` — an Ed25519Signature2020 over the canonical commitment,
  with the node's ``did:key`` as verification method.

Anyone holding the envelope can (a) check the signature offline, and
(b) replay ``input`` against the (immutable, hash-chained) pinned
blocks and compare output hashes — dispute resolution without trusting
the serving node. Hash/JSON canonicalization matches the repo's ledger
conventions (ledger/chain.py: sorted-key compact JSON, ``f1620``
multihash prefix).

Note: replay-verifiability assumes the query itself is deterministic
(stable ORDER BY); the reference makes the same assumption.
"""

from __future__ import annotations

import base64
import hashlib
import json
from typing import Any

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"


def canonical_json(obj: Any) -> bytes:
    return json.dumps(
        obj, sort_keys=True, separators=(",", ":"), ensure_ascii=False
    ).encode("utf-8")


def hash_json(obj: Any) -> str:
    """sha3-256 multihash (hex, `f1620` prefix) of canonical JSON."""
    return "f1620" + hashlib.sha3_256(canonical_json(obj)).hexdigest()


def _b58encode(data: bytes) -> str:
    n = int.from_bytes(data, "big")
    out = ""
    while n > 0:
        n, rem = divmod(n, 58)
        out = _B58_ALPHABET[rem] + out
    pad = 0
    for b in data:
        if b == 0:
            pad += 1
        else:
            break
    return "1" * pad + out


def _b58decode(s: str) -> bytes:
    n = 0
    for ch in s:
        n = n * 58 + _B58_ALPHABET.index(ch)
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
    pad = len(s) - len(s.lstrip("1"))
    return b"\x00" * pad + raw


class QuerySigner:
    """Node identity key signing query commitments (ephemeral per
    server by default — the reference uses the node's configured
    identity key; inject `private_bytes` to persist one)."""

    def __init__(self, private_bytes: bytes | None = None):
        from cryptography.hazmat.primitives.asymmetric.ed25519 import (
            Ed25519PrivateKey,
        )

        if private_bytes is not None:
            self._key = Ed25519PrivateKey.from_private_bytes(private_bytes)
        else:
            self._key = Ed25519PrivateKey.generate()

    @property
    def did(self) -> str:
        """did:key of the public key (multicodec ed25519-pub 0xed01,
        base58btc multibase)."""
        from cryptography.hazmat.primitives.serialization import (
            Encoding,
            PublicFormat,
        )

        pub = self._key.public_key().public_bytes(Encoding.Raw, PublicFormat.Raw)
        return "did:key:z" + _b58encode(b"\xed\x01" + pub)

    def sign(self, data: bytes) -> str:
        """Multibase base64url (no pad) signature string."""
        sig = self._key.sign(data)
        return "u" + base64.urlsafe_b64encode(sig).decode().rstrip("=")


def make_commitment(input_obj: dict, output_obj: dict, sub_queries=None) -> dict:
    return {
        "inputHash": hash_json(input_obj),
        "outputHash": hash_json(output_obj),
        "subQueriesHash": hash_json(sub_queries or []),
    }


def make_proof(signer: QuerySigner, commitment: dict) -> dict:
    return {
        "type": "Ed25519Signature2020",
        "verificationMethod": signer.did,
        "proofValue": signer.sign(canonical_json(commitment)),
    }


def verify_proof(proof: dict, commitment: dict) -> bool:
    """Offline signature check against the did:key in the proof."""
    from cryptography.exceptions import InvalidSignature
    from cryptography.hazmat.primitives.asymmetric.ed25519 import (
        Ed25519PublicKey,
    )

    did = proof.get("verificationMethod", "")
    if not did.startswith("did:key:z"):
        return False
    raw = _b58decode(did[len("did:key:z") :])
    if raw[:2] != b"\xed\x01":
        return False
    sig_mb = proof.get("proofValue", "")
    if not sig_mb.startswith("u"):
        return False
    sig = base64.urlsafe_b64decode(sig_mb[1:] + "=" * (-len(sig_mb[1:]) % 4))
    try:
        Ed25519PublicKey.from_public_bytes(raw[2:]).verify(
            sig, canonical_json(commitment)
        )
        return True
    except InvalidSignature:
        return False


def verify_query_envelope(qs, envelope: dict, payload_fn) -> dict:
    """Replay-verify an (input, commitment[, proof]) envelope.

    `payload_fn(df, data_format, limit) -> dict` renders the replayed
    DataFrame exactly like the serving endpoint. Error kinds mirror
    query_types.rs VerifyResponse: InvalidRequest::InputHash,
    InvalidRequest::BadSignature, Outputs::Mismatch, plus
    Dataset-level failures surfacing as InvalidRequest::Dataset.
    """
    input_obj = envelope.get("input") or {}
    commitment = envelope.get("commitment") or {}
    proof = envelope.get("proof")

    if hash_json(input_obj) != commitment.get("inputHash"):
        return {"ok": False, "error": {"kind": "InvalidRequest::InputHash"}}
    if proof is not None and not verify_proof(proof, commitment):
        return {"ok": False, "error": {"kind": "InvalidRequest::BadSignature"}}

    pins = {
        d["alias"]: d["blockHash"] for d in input_obj.get("datasets", [])
    }
    try:
        df, _state = qs.sql_with_state(
            input_obj["query"], pins=pins
        )
    except Exception as e:
        return {
            "ok": False,
            "error": {"kind": "InvalidRequest::Dataset", "message": str(e)},
        }
    output = payload_fn(
        df, input_obj.get("dataFormat", "aos"), int(input_obj.get("limit", 1000))
    )
    actual = hash_json(output)
    if actual != commitment.get("outputHash"):
        return {
            "ok": False,
            "error": {
                "kind": "Outputs::Mismatch",
                "expectedHash": commitment.get("outputHash"),
                "actualHash": actual,
            },
        }
    return {"ok": True}
