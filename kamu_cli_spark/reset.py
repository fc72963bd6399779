"""Dataset reset: move the metadata head back to an earlier block and
drop the data committed after it.

Mirrors the reference's two-step service
(src/infra/core/src/services/reset/reset_planner_impl.rs:29-73 — plan:
default new head = the Seed block, optional old-head compare-and-set;
reset_executor_impl.rs:24-46 — execute: move the Head ref). Our chain
is a linear JSONL file, so "move the ref" is an atomic truncation
(`MetadataChain.truncate_to`), and the slices referenced only by the
dropped blocks are physically removed (the role the reference's GC
plays after a ref move). The head-guarded materialized state
invalidates itself on the next read.
"""

from __future__ import annotations

from typing import Any

from kamu_cli_spark.dataset import Dataset


class ResetError(Exception):
    pass


class OldHeadMismatchError(ResetError):
    """The compare-and-set guard failed: the dataset's current head is
    not the one the caller planned against (reference:
    ResetPlanningError::OldHeadMismatch)."""


def reset_dataset(
    ds: Dataset,
    new_head: str | None = None,
    old_head: str | None = None,
    defer_slice_gc: bool = False,
) -> dict[str, Any]:
    """Reset `ds` so `new_head` (default: the Seed block) becomes the
    chain head. Returns a summary of what moved and what was removed.

    ``defer_slice_gc=True`` moves the head but leaves the dropped
    slice files on disk for a later aged ``gc`` sweep
    (``clean_orphan_slices(min_age=...)``) — the multi-reader-safe
    mode: a query planned against the old head can still read its
    files instead of failing mid-job on a concurrent physical delete
    (the transient race the chain stress test documents). Default
    remains immediate deletion, matching the reference's
    ref-move-then-GC behavior for a single-operator workspace."""
    from kamu_cli_spark.ledger.chain import ChainIntegrityError

    chain = ds.chain
    cur = chain.head()
    if cur is None:
        raise ResetError(f"dataset {ds.path} has an empty chain")
    if old_head is not None and cur.block_hash != old_head:
        raise OldHeadMismatchError(
            f"current head {cur.block_hash} != expected {old_head}"
        )
    if new_head is None:
        new_head = chain.blocks()[0].block_hash  # Seed
    elif all(b.block_hash != new_head for b in chain.blocks()):
        raise ResetError(f"block {new_head} not found in chain")
    try:
        # the guard re-runs INSIDE the chain lock: a concurrent append
        # between the check above and the truncation aborts the reset
        # (reference: ResetPlanningError::OldHeadMismatch semantics)
        dropped = chain.truncate_to(new_head, expect_head=old_head)
    except ChainIntegrityError as e:
        if "head mismatch" in str(e):
            raise OldHeadMismatchError(str(e)) from e
        raise ResetError(str(e)) from e
    # reap exactly the slices the truncation dropped (computed from the
    # under-lock reloaded chain, so never a stale view) — an in-flight
    # writer's not-yet-committed slice is untouched
    dropped_paths = [
        b.event["new_data"]["path"]
        for b in dropped
        if b.event.get("new_data")
    ]
    if defer_slice_gc:
        # the aged gc sweep measures min_age from file mtime; re-stamp
        # the deferred slices NOW so the grace period runs from the
        # moment they became orphans, not from when they were written —
        # otherwise a sweep seconds after the reset could reap a
        # long-lived slice an in-flight reader still needs
        import os as _os

        for rel in dropped_paths:
            p = _os.path.join(ds.path, rel)
            if _os.path.exists(p):
                _os.utime(p)
        removed: list[str] = []
    else:
        removed = ds.clean_orphan_slices(paths=dropped_paths)
    return {
        "old_head": cur.block_hash,
        "new_head": new_head,
        "dropped_blocks": len(dropped),
        "removed_slices": removed,
        **({"deferred_slices": dropped_paths} if defer_slice_gc else {}),
    }
