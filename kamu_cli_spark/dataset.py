"""Dataset storage layout and lifecycle.

A dataset is a directory::

    <workspace>/<name>/
        metadata.jsonl     # hash-chained metadata ledger
        data/<seq>-<start>-<end>-<nonce>.parquet   # immutable sorted slices

Mirrors the ODF dataset model (reference: MetadataBlock chain +
Parquet slices, dtos_generated.rs:1231/:990) with a Spark-first
layout: slice files are plain Parquet readable by `spark.read`, the
chain pins reproducible as-of file lists (like Delta time travel).
"""

from __future__ import annotations

import json
import os
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from kamu_cli_spark.ledger import MetadataChain
from kamu_cli_spark.vocab import DEFAULT_VOCAB, DatasetVocabulary


class Dataset:
    def __init__(self, path: str):
        self.path = path
        self.name = os.path.basename(path.rstrip("/"))
        self.chain = MetadataChain(os.path.join(path, "metadata.jsonl"))

    # -- lifecycle -----------------------------------------------------

    @staticmethod
    def create(
        workspace: str,
        name: str,
        kind: str = "Root",
        vocab: DatasetVocabulary = DEFAULT_VOCAB,
        system_time: str | None = None,
    ) -> "Dataset":
        path = os.path.join(workspace, name)
        if os.path.exists(os.path.join(path, "metadata.jsonl")):
            raise ValueError(f"dataset already exists: {path}")
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        ds = Dataset(path)
        ds.chain.append(
            {
                "kind": "Seed",
                "dataset_id": "did:odf:" + uuid.uuid4().hex,
                "dataset_kind": kind,
            },
            system_time=system_time,
        )
        if vocab != DEFAULT_VOCAB:
            ds.chain.append(
                {
                    "kind": "SetVocab",
                    "offset_column": vocab.offset_column,
                    "operation_type_column": vocab.operation_type_column,
                    "system_time_column": vocab.system_time_column,
                    "event_time_column": vocab.event_time_column,
                }
            )
        return ds

    @property
    def vocab(self) -> DatasetVocabulary:
        b = self.chain.last_event("SetVocab")
        if b is None:
            return DEFAULT_VOCAB
        e = b.event
        return DatasetVocabulary(
            offset_column=e.get("offset_column", "offset"),
            operation_type_column=e.get("operation_type_column", "op"),
            system_time_column=e.get("system_time_column", "system_time"),
            event_time_column=e.get("event_time_column", "event_time"),
        )

    @property
    def kind(self) -> str:
        b = self.chain.blocks()[0]
        return b.event.get("dataset_kind", "Root")

    # -- data access ---------------------------------------------------

    def slice_paths(self, as_of: str | None = None) -> list[str]:
        return [
            os.path.join(self.path, d["path"]) for d in self.chain.data_files(as_of)
        ]

    def read(self, spark: SparkSession, as_of: str | None = None) -> DataFrame | None:
        """Whole changelog as-of a block (reproducible state pinning,
        reference: query_service_impl.rs:59-304)."""
        paths = self.slice_paths(as_of)
        if not paths:
            return None
        st = self.declared_schema(as_of)
        reader = spark.read.schema(st) if st is not None else spark.read
        return reader.parquet(*paths)

    def read_between(
        self,
        spark: SparkSession,
        prev_offset: int | None,
        new_offset: int | None,
    ) -> DataFrame | None:
        """Half-open offset interval read ``(prev_offset, new_offset]`` —
        the incremental-transform input (reference:
        transform_helpers.rs:120-269). Slice pruning happens at the FILE
        level using ledger offset intervals, so Spark never opens slices
        entirely outside the range; a residual filter trims boundaries.
        """
        lo = -1 if prev_offset is None else prev_offset
        files = [
            d
            for d in self.chain.data_files()
            if d["offset_interval"]["end"] > lo
            and (new_offset is None or d["offset_interval"]["start"] <= new_offset)
        ]
        if not files:
            return None
        st = self.declared_schema()
        reader = spark.read.schema(st) if st is not None else spark.read
        df = reader.parquet(*[os.path.join(self.path, d["path"]) for d in files])
        off = self.vocab.offset_column
        df = df.filter(f"{off} > {lo}")
        if new_offset is not None:
            df = df.filter(f"{off} <= {new_offset}")
        return df

    # -- materialized state (perf: avoids the full-history scan the
    # -- reference flags as a TODO at writer.rs:232) -------------------

    def state_path(self) -> str:
        return os.path.join(self.path, "state")

    def read_state(
        self, spark: SparkSession, primary_key: list[str] | None = None
    ) -> DataFrame | None:
        """Latest-per-PK projection (retractions included), maintained
        incrementally by the writer. None when never materialized.

        `primary_key`: when given, the state is returned only if it was
        materialized under the SAME key — a projection grouped on a
        different key is silently wrong for the caller, so the key the
        state was built with is recorded alongside it and checked here.
        """
        marker = os.path.join(self.state_path(), "_HEAD")
        if not os.path.exists(marker):
            return None
        head = open(marker).read().strip()
        if head != (self.head_hash() or ""):
            return None  # stale (e.g. compaction/reset rewrote history)
        if primary_key is not None:
            pk_marker = os.path.join(self.state_path(), "_PK")
            if not os.path.exists(pk_marker):
                return None
            if json.load(open(pk_marker)) != list(primary_key):
                return None
        return spark.read.parquet(os.path.join(self.state_path(), "latest"))

    def write_state(
        self, df: DataFrame, primary_key: list[str] | None = None
    ) -> None:
        """Atomically replace the materialized state for current head."""
        import shutil

        target = os.path.join(self.state_path(), "latest")
        tmp = os.path.join(self.state_path(), ".latest.tmp")
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(target):
            shutil.rmtree(target)
        os.replace(tmp, target)
        pk_marker = os.path.join(self.state_path(), "_PK")
        if primary_key is not None:
            with open(pk_marker, "w") as f:
                json.dump(list(primary_key), f)
        elif os.path.exists(pk_marker):
            os.remove(pk_marker)
        with open(os.path.join(self.state_path(), "_HEAD"), "w") as f:
            f.write(self.head_hash() or "")

    def clean_orphan_slices(
        self, min_age: float = 0.0, paths: list[str] | None = None
    ) -> list[str]:
        """Remove data files not referenced by the chain — leftovers of a
        writer that crashed between slice write and commit, or slices a
        reset dropped.

        Two guards close the race with an in-flight writer, which lands
        its final parquet in data/ BEFORE committing the chain block:

        - the chain is re-read from disk under the chain lock before
          computing the live set, so a slice committed by another
          process since we loaded is never treated as orphaned;
        - with `paths=None`, only unreferenced files whose mtime is at
          least `min_age` seconds old are reaped — a just-written slice
          whose commit is still in flight survives. Callers that know
          the exact orphans (reset, after truncate_to returns the
          dropped blocks) pass them via `paths` and skip the age guard.
        """
        import time

        lock = self.chain._acquire_lock()
        try:
            self.chain._reload_if_stale()
            live = {d["path"] for d in self.chain.data_files()}
            data_dir = os.path.join(self.path, "data")
            cutoff = time.time() - min_age
            removed = []
            if os.path.isdir(data_dir):
                for fn in os.listdir(data_dir):
                    rel = "data/" + fn
                    if rel in live or not fn.endswith(".parquet"):
                        continue
                    if paths is not None:
                        if rel not in paths:
                            continue
                    else:
                        full = os.path.join(data_dir, fn)
                        if os.path.getmtime(full) >= cutoff:
                            continue
                    os.remove(os.path.join(data_dir, fn))
                    removed.append(rel)
            return removed
        finally:
            os.remove(lock)

    def schema_event(self, as_of: str | None = None) -> dict[str, Any] | None:
        b = self.chain.last_event("SetDataSchema", as_of)
        return b.event if b else None

    def declared_schema(self, as_of: str | None = None):
        """The ledger-declared schema as a StructType, pinned `as_of` a
        block. Reads pass this schema explicitly so (a) Spark skips
        footer inference entirely — at 100 TB / many thousands of slice
        files, mergeSchema-style footer reconciliation is a driver-side
        scale killer — and (b) slices written before an additive schema
        evolution surface the later columns as typed nulls.
        """
        from pyspark.sql import types as T

        ev = self.schema_event(as_of)
        if ev is None:
            return None
        ddl = ", ".join(f"`{f['name']}` {f['type']}" for f in ev["fields"])
        return T.StructType.fromDDL(ddl)

    def head_hash(self) -> str | None:
        h = self.chain.head()
        return h.block_hash if h else None

    def set_info(
        self,
        description: str | None = None,
        keywords: list[str] | None = None,
        readme: str | None = None,
        system_time: str | None = None,
    ) -> None:
        """Commit a SetInfo event (reference: dataset_metadata.rs:255-296
        current_info/current_readme projections)."""
        ev: dict[str, Any] = {"kind": "SetInfo"}
        if description is not None:
            ev["description"] = description
        if keywords is not None:
            ev["keywords"] = keywords
        if readme is not None:
            ev["readme"] = readme
        self.chain.append(ev, system_time=system_time)

    def set_license(
        self,
        short_name: str,
        name: str,
        spdx_id: str | None = None,
        website_url: str | None = None,
        system_time: str | None = None,
    ) -> None:
        """Commit a SetLicense event (reference:
        dataset_metadata.rs:298-310 current_license projection)."""
        ev: dict[str, Any] = {
            "kind": "SetLicense",
            "short_name": short_name,
            "name": name,
        }
        if spdx_id is not None:
            ev["spdx_id"] = spdx_id
        if website_url is not None:
            ev["website_url"] = website_url
        self.chain.append(ev, system_time=system_time)
