"""Compaction service — concatenate small slices into bounded batches
(reference: compaction_planner_impl.rs:40-160, compaction_executor_impl
.rs:75-98; plus the `keep_metadata_only` reset flavor).

The metadata chain is rewritten: data blocks covering the compacted
range are replaced by one AddData per output batch; Seed/SetVocab/
SetDataSchema/SetTransform and other non-data events are preserved in
order. Offsets are untouched (slices are concatenated in offset order),
so downstream incremental readers keep working.
"""

from __future__ import annotations

import os
import shutil
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.ledger import MetadataChain


class CompactionError(Exception):
    pass


def plan_compaction(
    dataset: Dataset,
    max_slice_records: int = 1_000_000,
    max_slice_size: int = 300 * 1024 * 1024,
) -> list[list[dict[str, Any]]]:
    """Greedy batching of consecutive slices under the record/size caps.
    Returns batches of slice descriptors; singleton batches need no
    rewrite."""
    batches: list[list[dict[str, Any]]] = []
    cur: list[dict[str, Any]] = []
    cur_n = cur_sz = 0
    for d in dataset.chain.data_files():
        n, sz = d["num_records"], d.get("size", 0)
        if cur and (cur_n + n > max_slice_records or cur_sz + sz > max_slice_size):
            batches.append(cur)
            cur, cur_n, cur_sz = [], 0, 0
        cur.append(d)
        cur_n += n
        cur_sz += sz
    if cur:
        batches.append(cur)
    return batches


def compact(
    spark: SparkSession,
    dataset: Dataset,
    max_slice_records: int = 1_000_000,
    max_slice_size: int = 300 * 1024 * 1024,
    compute_logical_hash: bool = False,
) -> dict[str, Any]:
    """Execute compaction: merge slice batches, rewrite the chain.

    Root datasets only (reference: compaction_planner_impl.rs:211) —
    compacting a Derivative would rewrite ExecuteTransform blocks as
    AddData, discarding `query_inputs` and forcing the next transform to
    reprocess all input history. Use ``reset_keep_metadata_only`` to
    reset a derivative dataset.
    """
    if dataset.kind != "Root":
        raise CompactionError(
            f"cannot compact {dataset.kind} dataset {dataset.name!r}: "
            "only Root datasets are compactable (use keep_metadata_only "
            "to reset a derivative)"
        )
    batches = plan_compaction(dataset, max_slice_records, max_slice_size)
    if all(len(b) == 1 for b in batches):
        return {"compacted": False, "slices_before": sum(map(len, batches))}

    off = dataset.vocab.offset_column
    old_blocks = dataset.chain.blocks()
    data_events: list[dict[str, Any]] = []
    slices_before = 0

    new_files: list[tuple[str, dict[str, Any]]] = []
    for i, batch in enumerate(batches):
        paths = [os.path.join(dataset.path, d["path"]) for d in batch]
        slices_before += len(batch)
        start = batch[0]["offset_interval"]["start"]
        end = batch[-1]["offset_interval"]["end"]
        n = sum(d["num_records"] for d in batch)
        rel = f"data/compact-{i:06d}-{start}-{end}.parquet"
        tmp_dir = os.path.join(dataset.path, f".tmp-compact-{i}")
        (
            spark.read.parquet(*paths)
            .orderBy(off)
            .coalesce(1)
            .sortWithinPartitions(off)
            .write.mode("overwrite")
            .parquet(tmp_dir, compression="snappy")
        )
        part = [f for f in os.listdir(tmp_dir) if f.endswith(".parquet")][0]
        os.replace(os.path.join(tmp_dir, part), os.path.join(dataset.path, rel))
        shutil.rmtree(tmp_dir, ignore_errors=True)

        from kamu_cli_spark.verification import (
            LOGICAL_HASH_SCHEME,
            logical_hash,
            physical_hash,
        )

        desc = {
            "offset_interval": {"start": start, "end": end},
            "num_records": n,
            "size": os.path.getsize(os.path.join(dataset.path, rel)),
            "physical_hash": physical_hash(os.path.join(dataset.path, rel)),
        }
        if compute_logical_hash:
            desc["logical_hash"] = logical_hash(
                spark.read.parquet(os.path.join(dataset.path, rel)), off
            )
            desc["logical_hash_scheme"] = LOGICAL_HASH_SCHEME
        new_files.append((rel, desc))
        data_events.append(batch[-1])  # carries the latest watermark

    # rewrite chain: non-data blocks in order, then one AddData per batch
    chain_path = dataset.chain.path
    backup = chain_path + ".bak"
    shutil.copy(chain_path, backup)
    os.remove(chain_path)
    new_chain = MetadataChain(chain_path)
    try:
        last_st = old_blocks[-1].system_time
        for b in old_blocks:
            if b.event.get("kind") not in ("AddData", "ExecuteTransform"):
                new_chain.append(b.event, system_time=b.system_time)
        # Resume state must survive compaction or the source re-ingests
        # seen inputs. PER BATCH (reference: compaction_executor_impl.rs
        # :124-158): each compacted AddData carries the latest
        # source_state among the dropped blocks it absorbs — data-less
        # polling markers attach to the batch of the preceding data
        # block — so as-of reads pinned at an intermediate compacted
        # block see the same resume state the uncompacted chain had at
        # that offset.
        batch_ends = [nd["offset_interval"]["end"] for _, nd in new_files]
        batch_states: list[Any] = [None] * len(new_files)
        bi = 0
        for b in old_blocks:
            ev = b.event
            if ev.get("kind") not in ("AddData", "ExecuteTransform"):
                continue
            nd_old = ev.get("new_data")
            if nd_old is not None:
                while (
                    bi < len(batch_ends)
                    and nd_old["offset_interval"]["end"] > batch_ends[bi]
                ):
                    bi += 1
            if ev.get("source_state"):
                batch_states[min(bi, len(batch_states) - 1)] = ev["source_state"]
        for ((rel, nd), src), b_state in zip(
            zip(new_files, data_events), batch_states
        ):
            wm = None
            for b in old_blocks:
                if (
                    b.event.get("kind") in ("AddData", "ExecuteTransform")
                    and b.event.get("new_data")
                    and b.event["new_data"]["offset_interval"]["end"]
                    <= nd["offset_interval"]["end"]
                    and b.event.get("new_watermark")
                ):
                    wm = b.event["new_watermark"]
            new_chain.append(
                {
                    "kind": "AddData",
                    "new_data": {"path": rel, **nd},
                    "new_watermark": wm,
                    "compacted": True,
                    **({"source_state": b_state} if b_state else {}),
                },
                system_time=last_st,
            )
        new_chain.verify()
    except Exception:
        shutil.copy(backup, chain_path)
        raise
    finally:
        if os.path.exists(backup):
            os.remove(backup)

    # refresh in-memory chain and drop the old slice files
    dataset.chain = MetadataChain(chain_path)
    live = {d["path"] for d in dataset.chain.data_files()}
    data_dir = os.path.join(dataset.path, "data")
    for fn in os.listdir(data_dir):
        if "data/" + fn not in live:
            os.remove(os.path.join(data_dir, fn))

    return {
        "compacted": True,
        "slices_before": slices_before,
        "slices_after": len(new_files),
    }


def reset_keep_metadata_only(dataset: Dataset) -> None:
    """`keep_metadata_only` flavor: drop all data, keep the declarative
    chain (Seed/SetVocab/Schema/Transform/Sources)."""
    chain_path = dataset.chain.path
    old_blocks = dataset.chain.blocks()
    os.remove(chain_path)
    new_chain = MetadataChain(chain_path)
    for b in old_blocks:
        if b.event.get("kind") not in ("AddData", "ExecuteTransform", "SetDataSchema"):
            new_chain.append(b.event, system_time=b.system_time)
    dataset.chain = new_chain
    data_dir = os.path.join(dataset.path, "data")
    if os.path.isdir(data_dir):
        for fn in os.listdir(data_dir):
            os.remove(os.path.join(data_dir, fn))
