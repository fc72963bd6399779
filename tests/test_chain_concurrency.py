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


def test_stale_view_detects_equal_count_divergence(tmp_path):
    """ABA on the line count: truncate_to makes file length
    non-monotonic, so a reset that drops k blocks followed by k new
    appends re-equals a stale process's count while the head hash is a
    different block. The staleness check must be by content — a stale
    appender must chain onto the NEW head, never a dropped block."""
    path = str(tmp_path / "metadata.jsonl")
    a = MetadataChain(path)
    a.append({"kind": "Seed", "dataset_id": "x", "dataset_kind": "Root"})
    seed_hash = a.head().block_hash
    a.append({"kind": "SetInfo", "description": "old-1"})
    a.append({"kind": "SetInfo", "description": "old-2"})
    assert len(a) == 3  # A's (about-to-be-stale) view

    # another process resets to Seed, then appends two NEW blocks —
    # same on-disk line count as A remembers, different head
    b = MetadataChain(path)
    dropped = b.truncate_to(seed_hash)
    assert [d.event["description"] for d in dropped] == ["old-1", "old-2"]
    b.append({"kind": "SetInfo", "description": "new-1"})
    b.append({"kind": "SetInfo", "description": "new-2"})
    new_head = b.head().block_hash

    blk = a.append({"kind": "SetInfo", "description": "from-stale"})
    assert blk.prev_block_hash == new_head  # chained onto true head

    final = MetadataChain(path)
    final.verify()
    descs = [
        b.event["description"] for b in final.blocks() if b.event["kind"] == "SetInfo"
    ]
    assert descs == ["new-1", "new-2", "from-stale"]


def test_stale_view_truncate_reloads_before_rewrite(tmp_path):
    """A truncation computed from a stale in-memory view must reload
    under the lock so it cannot resurrect blocks dropped by another
    process or silently destroy blocks it never saw."""
    path = str(tmp_path / "metadata.jsonl")
    a = MetadataChain(path)
    a.append({"kind": "Seed", "dataset_id": "x", "dataset_kind": "Root"})
    seed_hash = a.head().block_hash
    a.append({"kind": "SetInfo", "description": "seen-by-a"})

    b = MetadataChain(path)
    b.append({"kind": "SetInfo", "description": "unseen-by-a"})

    dropped = a.truncate_to(seed_hash)  # stale view: must reload first
    assert sorted(d.event["description"] for d in dropped) == [
        "seen-by-a",
        "unseen-by-a",
    ]
    final = MetadataChain(path)
    final.verify()
    assert len(final) == 1 and final.head().block_hash == seed_hash
