"""Hash-chained metadata ledger — the dataset's append-only block chain.

A dataset's history is a chain of metadata blocks, each carrying a
sha3-256 hash of its content plus the hash of its predecessor, stored as
one JSON object per line in ``metadata.jsonl``. Event kinds and chain
invariants follow ODF (reference:
`src/odf/metadata/src/dtos/dtos_generated.rs:1231` MetadataBlock,
`:1246-1260` MetadataEvent kinds;
`src/odf/dataset/src/entities/metadata_chain.rs:968-990` invariants):

- sequence numbers dense from 0; ``prev_block_hash`` links blocks;
- data offsets across AddData/ExecuteTransform blocks are contiguous;
- ``system_time`` and watermark are monotonically non-decreasing.

This is deliberately a tiny driver-side structure (like a Delta log):
the heavy lifting happens in Spark; the chain just records provenance
and pins file lists for reproducible as-of queries.
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any, Iterator

EVENT_KINDS = {
    "Seed",
    "SetVocab",
    "SetDataSchema",
    "SetPollingSource",
    "AddPushSource",
    "DisablePushSource",
    "DisablePollingSource",
    "SetTransform",
    "SetInfo",
    "SetLicense",
    "SetAttachments",
    "AddData",
    "ExecuteTransform",
}

DATA_EVENTS = {"AddData", "ExecuteTransform"}


class ChainIntegrityError(Exception):
    pass


def _canonical_json(obj: Any) -> str:
    return json.dumps(obj, sort_keys=True, separators=(",", ":"), default=str)


def _multihash(payload: str) -> str:
    # sha3-256 multihash, hex multibase (codes 0x16 0x20 as in ODF refs)
    return "f1620" + hashlib.sha3_256(payload.encode("utf-8")).hexdigest()


def utc_now_iso() -> str:
    return datetime.now(timezone.utc).isoformat()


@dataclass
class MetadataBlock:
    sequence_number: int
    prev_block_hash: str | None
    system_time: str
    event: dict[str, Any]  # {"kind": <EVENT_KINDS>, ...payload}
    block_hash: str = field(default="")

    def compute_hash(self) -> str:
        return _multihash(
            _canonical_json(
                {
                    "sequence_number": self.sequence_number,
                    "prev_block_hash": self.prev_block_hash,
                    "system_time": self.system_time,
                    "event": self.event,
                }
            )
        )

    def to_json(self) -> str:
        return _canonical_json(
            {
                "block_hash": self.block_hash,
                "sequence_number": self.sequence_number,
                "prev_block_hash": self.prev_block_hash,
                "system_time": self.system_time,
                "event": self.event,
            }
        )

    @staticmethod
    def from_json(line: str) -> "MetadataBlock":
        d = json.loads(line)
        return MetadataBlock(
            sequence_number=d["sequence_number"],
            prev_block_hash=d["prev_block_hash"],
            system_time=d["system_time"],
            event=d["event"],
            block_hash=d["block_hash"],
        )


class MetadataChain:
    """Append-only block chain persisted as JSON lines."""

    def __init__(self, path: str):
        self.path = path
        self._blocks: list[MetadataBlock] = []
        if os.path.exists(path):
            with open(path, encoding="utf-8") as f:
                for line in f:
                    line = line.strip()
                    if line:
                        self._blocks.append(MetadataBlock.from_json(line))

    # -- reads ---------------------------------------------------------

    def __len__(self) -> int:
        return len(self._blocks)

    def blocks(self, as_of: str | None = None) -> list[MetadataBlock]:
        """All blocks up to and including `as_of` block hash (or all)."""
        if as_of is None:
            return list(self._blocks)
        out = []
        for b in self._blocks:
            out.append(b)
            if b.block_hash == as_of:
                return out
        raise ChainIntegrityError(f"block {as_of} not found in chain {self.path}")

    def head(self) -> MetadataBlock | None:
        return self._blocks[-1] if self._blocks else None

    def iter_events(self, kind: str, as_of: str | None = None) -> Iterator[MetadataBlock]:
        for b in self.blocks(as_of):
            if b.event.get("kind") == kind:
                yield b

    def last_event(self, kind: str, as_of: str | None = None) -> MetadataBlock | None:
        found = None
        for b in self.iter_events(kind, as_of):
            found = b
        return found

    def next_offset(self, as_of: str | None = None) -> int:
        """One past the last written data offset (0 for an empty dataset)."""
        last = None
        for b in self.blocks(as_of):
            if b.event.get("kind") in DATA_EVENTS and b.event.get("new_data"):
                last = b.event["new_data"]["offset_interval"]["end"]
        return 0 if last is None else last + 1

    def current_watermark(self, as_of: str | None = None) -> str | None:
        wm = None
        for b in self.blocks(as_of):
            if b.event.get("kind") in DATA_EVENTS:
                w = b.event.get("new_watermark")
                if w is not None:
                    wm = w
        return wm

    def data_files(self, as_of: str | None = None) -> list[dict[str, Any]]:
        """Slice descriptors {path, offset_interval, size, num_records} in
        chain order — the reproducible as-of file list."""
        out = []
        for b in self.blocks(as_of):
            if b.event.get("kind") in DATA_EVENTS and b.event.get("new_data"):
                out.append(b.event["new_data"])
        return out

    # -- writes --------------------------------------------------------

    def _acquire_lock(self, timeout: float = 30.0) -> str:
        """Exclusive advisory lock via O_EXCL lockfile — serializes
        concurrent appends (the prev-hash CAS makes interleaved commits
        detectable; the lock makes them impossible)."""
        import time

        lock = self.path + ".lock"
        deadline = time.time() + timeout
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return lock
            except FileExistsError:
                if time.time() > deadline:
                    raise ChainIntegrityError(
                        f"could not acquire chain lock {lock} (held by another writer)"
                    )
                time.sleep(0.05)

    def append(self, event: dict[str, Any], system_time: str | None = None) -> MetadataBlock:
        kind = event.get("kind")
        if kind not in EVENT_KINDS:
            raise ChainIntegrityError(f"unknown metadata event kind: {kind}")
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        lock = self._acquire_lock()
        try:
            return self._append_locked(event, system_time)
        finally:
            os.remove(lock)

    def _reload_if_stale(self) -> None:
        """Re-read the chain if another process changed it since we
        loaded — callers hold the lock, so the reloaded view is the
        true head for the duration of the write.

        Staleness is detected by CONTENT (head block_hash), not line
        count: truncate_to makes the file length non-monotonic, so a
        reset followed by the same number of appends would re-equal a
        stale count while pointing at a different head — and chaining
        onto that stale head would silently corrupt the ledger."""
        if not os.path.exists(self.path):
            if self._blocks:
                self._blocks = []
            return
        with open(self.path, encoding="utf-8") as f:
            lines = [line for line in f if line.strip()]
        mem_head = self._blocks[-1].block_hash if self._blocks else None
        disk_head = (
            json.loads(lines[-1])["block_hash"] if lines else None
        )
        if len(lines) != len(self._blocks) or disk_head != mem_head:
            self._blocks = [MetadataBlock.from_json(ln) for ln in lines]

    def _append_locked(
        self, event: dict[str, Any], system_time: str | None = None
    ) -> MetadataBlock:
        kind = event.get("kind")
        # prev-hash CAS: if another process appended since we loaded,
        # reload before validating so we chain onto the true head
        self._reload_if_stale()
        head = self.head()
        if head is None and kind != "Seed":
            raise ChainIntegrityError("chain must start with a Seed block")
        if head is not None and kind == "Seed":
            raise ChainIntegrityError("Seed block must be first")
        system_time = system_time or utc_now_iso()
        if head is not None and system_time < head.system_time:
            raise ChainIntegrityError(
                f"system_time regression: {system_time} < {head.system_time}"
            )

        if kind in DATA_EVENTS and event.get("new_data"):
            iv = event["new_data"]["offset_interval"]
            expected = self.next_offset()
            if iv["start"] != expected:
                raise ChainIntegrityError(
                    f"offsets not contiguous: expected start {expected}, got {iv['start']}"
                )
            if iv["end"] < iv["start"]:
                raise ChainIntegrityError(f"invalid offset interval {iv}")
        if kind in DATA_EVENTS and event.get("new_watermark") is not None:
            prev_wm = self.current_watermark()
            if prev_wm is not None and event["new_watermark"] < prev_wm:
                raise ChainIntegrityError(
                    f"watermark regression: {event['new_watermark']} < {prev_wm}"
                )

        block = MetadataBlock(
            sequence_number=len(self._blocks),
            prev_block_hash=head.block_hash if head else None,
            system_time=system_time,
            event=event,
        )
        block.block_hash = block.compute_hash()
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(block.to_json() + "\n")
        self._blocks.append(block)
        return block

    def truncate_to(
        self, block_hash: str, expect_head: str | None = None
    ) -> list["MetadataBlock"]:
        """Move the chain head back to `block_hash`, dropping every
        later block (the linear-file equivalent of the reference's
        reset `set_ref(Head, new_head)` —
        src/infra/core/src/services/reset/reset_executor_impl.rs:24-46).
        Atomic rewrite under the chain lock; returns the dropped
        blocks so callers can clean up orphaned slices.

        `expect_head` is the compare-and-set guard, checked INSIDE the
        lock after reloading — a concurrent append between planning and
        execution aborts the truncation instead of being destroyed."""
        lock = self._acquire_lock()
        try:
            self._reload_if_stale()
            if expect_head is not None and (
                not self._blocks or self._blocks[-1].block_hash != expect_head
            ):
                cur = self._blocks[-1].block_hash if self._blocks else None
                raise ChainIntegrityError(
                    f"head mismatch: chain head is {cur}, expected {expect_head}"
                )
            idx = next(
                (
                    i
                    for i, b in enumerate(self._blocks)
                    if b.block_hash == block_hash
                ),
                None,
            )
            if idx is None:
                raise ChainIntegrityError(
                    f"block {block_hash} not found in chain {self.path}"
                )
            keep, dropped = self._blocks[: idx + 1], self._blocks[idx + 1 :]
            tmp = self.path + ".tmp"
            with open(tmp, "w", encoding="utf-8") as f:
                for b in keep:
                    f.write(b.to_json() + "\n")
            os.replace(tmp, self.path)
            self._blocks = keep
            return dropped
        finally:
            os.remove(lock)

    # -- verification --------------------------------------------------

    def verify(self) -> None:
        """Recompute hashes and link/offset invariants for every block."""
        prev_hash = None
        next_off = 0
        prev_st = ""
        for i, b in enumerate(self._blocks):
            if b.sequence_number != i:
                raise ChainIntegrityError(f"block {i}: bad sequence number")
            if b.prev_block_hash != prev_hash:
                raise ChainIntegrityError(f"block {i}: broken prev-hash link")
            if b.compute_hash() != b.block_hash:
                raise ChainIntegrityError(f"block {i}: content hash mismatch")
            if b.system_time < prev_st:
                raise ChainIntegrityError(f"block {i}: system_time regression")
            if b.event.get("kind") in DATA_EVENTS and b.event.get("new_data"):
                iv = b.event["new_data"]["offset_interval"]
                if iv["start"] != next_off:
                    raise ChainIntegrityError(f"block {i}: offsets not contiguous")
                next_off = iv["end"] + 1
            prev_hash = b.block_hash
            prev_st = b.system_time


def active_polling_source(chain: "MetadataChain") -> MetadataBlock | None:
    """The currently-active SetPollingSource block, honoring disables:
    a later DisablePollingSource deactivates it, a later
    SetPollingSource re-activates (reference DTOs:
    dtos_generated.rs:2151-2153; ingest services refuse disabled
    sources)."""
    active = None
    for b in chain.blocks():
        k = b.event.get("kind")
        if k == "SetPollingSource":
            active = b
        elif k == "DisablePollingSource":
            active = None
    return active


def active_push_sources(
    chain: "MetadataChain",
) -> dict[str | None, MetadataBlock]:
    """All currently-active AddPushSource blocks keyed by source_name,
    honoring DisablePushSource{source_name}
    (dtos_generated.rs:2158-2162)."""
    active: dict[str | None, MetadataBlock] = {}
    for b in chain.blocks():
        k = b.event.get("kind")
        if k == "AddPushSource":
            active[b.event.get("source_name")] = b
        elif k == "DisablePushSource":
            active.pop(b.event.get("source_name"), None)
    return active


def active_push_source(
    chain: "MetadataChain", source_name: str | None = None
) -> MetadataBlock | None:
    """The active AddPushSource for `source_name`; with no name, the
    sole active source if unambiguous (callers wanting to distinguish
    ambiguous-vs-disabled use :func:`active_push_sources`)."""
    active = active_push_sources(chain)
    if source_name is not None:
        return active.get(source_name)
    return next(iter(active.values())) if len(active) == 1 else active.get(None)
