"""Provenance / lineage — recursive walk of transform input declarations
(reference: services/provenance_service_impl.rs)."""

from __future__ import annotations

import os
from typing import Any

from kamu_cli_spark.dataset import Dataset


def lineage(workspace: str, name: str, _seen: set[str] | None = None) -> dict[str, Any]:
    """Dependency tree of a dataset: {name, kind, inputs: [subtrees]}.
    Cycles are reported, not followed."""
    seen = _seen or set()
    ds = Dataset(os.path.join(workspace, name))
    node: dict[str, Any] = {"name": name, "kind": ds.kind, "inputs": []}
    if name in seen:
        node["cycle"] = True
        return node
    seen = seen | {name}
    b = ds.chain.last_event("SetTransform")
    if b:
        for alias, path in b.event["inputs"].items():
            input_name = os.path.basename(path.rstrip("/"))
            sub = lineage(os.path.dirname(path) or workspace, input_name, seen)
            sub["alias"] = alias
            node["inputs"].append(sub)
    return node


def topological_order(workspace: str) -> list[str]:
    """All derivative datasets in the workspace, dependency-first —
    the `pull --all` schedule. Roots are excluded (they pull from
    external sources on their own cadence)."""
    datasets = [
        d
        for d in sorted(os.listdir(workspace))
        if os.path.exists(os.path.join(workspace, d, "metadata.jsonl"))
    ]
    deps: dict[str, list[str]] = {}
    for d in datasets:
        ds = Dataset(os.path.join(workspace, d))
        b = ds.chain.last_event("SetTransform")
        deps[d] = (
            [os.path.basename(p.rstrip("/")) for p in b.event["inputs"].values()]
            if b
            else []
        )
    order: list[str] = []
    seen: set[str] = set()

    def visit(n: str, stack: tuple[str, ...]):
        if n in seen or n not in deps:
            return
        if n in stack:
            raise ValueError(f"dependency cycle: {' -> '.join(stack + (n,))}")
        for dep in deps[n]:
            visit(dep, stack + (n,))
        seen.add(n)
        if deps[n]:  # derivative
            order.append(n)

    for d in datasets:
        visit(d, ())
    return order


def downstream(workspace: str, name: str) -> list[str]:
    """Datasets in the workspace that consume `name` directly."""
    out = []
    for d in sorted(os.listdir(workspace)):
        meta = os.path.join(workspace, d, "metadata.jsonl")
        if not os.path.exists(meta) or d == name:
            continue
        ds = Dataset(os.path.join(workspace, d))
        b = ds.chain.last_event("SetTransform")
        if b and any(
            os.path.basename(p.rstrip("/")) == name for p in b.event["inputs"].values()
        ):
            out.append(d)
    return out
