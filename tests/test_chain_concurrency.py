"""Concurrent chain appends must serialize (lock + head reload)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from kamu_cli_spark.ledger import MetadataChain


def test_concurrent_appends_serialize(tmp_path):
    path = str(tmp_path / "metadata.jsonl")
    MetadataChain(path).append({"kind": "Seed", "dataset_id": "x", "dataset_kind": "Root"})

    def worker(i: int):
        # each worker gets its OWN chain instance (separate process
        # simulation) — stale in-memory views must reload under the lock
        chain = MetadataChain(path)
        chain.append({"kind": "SetInfo", "description": f"w{i}"})

    with ThreadPoolExecutor(8) as pool:
        list(pool.map(worker, range(24)))

    final = MetadataChain(path)
    final.verify()  # dense sequence numbers, intact hash links
    assert len(final) == 25
    descs = sorted(
        b.event["description"] for b in final.blocks() if b.event["kind"] == "SetInfo"
    )
    assert descs == sorted(f"w{i}" for i in range(24))
