"""Ad-hoc SQL query service over registered datasets.

Spark shape of the reference's query stack (query_service_impl.rs:
sql_statement :584-602, tail :446-495, get_data :498-513, state
projection :629-734, to_table UDTF registration :365-386;
kamu_table.rs:230-295 recency pruning):

- each dataset registers as a temp view over its as-of slice file list
  (reproducible state pinning — like Delta time travel);
- ``tail`` prunes slices from the ledger BEFORE Spark sees them: only
  the newest files covering the requested row budget are read, so tail
  cost is O(limit), not O(history);
- ``to_table('ref')`` inside SQL is rewritten (regex pre-pass, the
  Spark analogue of the reference's UDTF) to a registered state-
  projection view.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators.merge import project_changelog


_TO_TABLE_RE = re.compile(
    r"to_table\(\s*'([^']+)'\s*(?:,\s*'([^']+)'\s*)?\)", re.IGNORECASE
)


class QueryService:
    def __init__(self, spark: SparkSession, workspace: str):
        self.spark = spark
        self.workspace = workspace
        self._primary_keys: dict[str, list[str]] = {}

    # -- registry ------------------------------------------------------

    def dataset(self, name: str) -> Dataset:
        path = os.path.join(self.workspace, name)
        if not os.path.exists(os.path.join(path, "metadata.jsonl")):
            raise KeyError(f"dataset not found: {name}")
        return Dataset(path)

    def list_datasets(self) -> list[str]:
        if not os.path.isdir(self.workspace):
            return []
        return sorted(
            d
            for d in os.listdir(self.workspace)
            if os.path.exists(os.path.join(self.workspace, d, "metadata.jsonl"))
        )

    def primary_key_of(self, ds: Dataset) -> list[str]:
        """Primary key from the dataset's source/transform declarations
        (reference: query_service_impl.rs:629-734 walks merge strategy /
        push sources for the PK)."""
        for kind in ("SetPollingSource", "AddPushSource"):
            b = ds.chain.last_event(kind)
            if b and b.event.get("merge", {}).get("primary_key"):
                return b.event["merge"]["primary_key"]
        return []

    # -- view registration --------------------------------------------

    @staticmethod
    def _view_name(name: str) -> str:
        """Dataset names may contain chars temp views can't (`-`, `.`);
        views get a sanitized alias and `sql()` rewrites references."""
        return re.sub(r"\W", "_", name)

    def register(self, name: str, as_of: str | None = None) -> DataFrame | None:
        """Register dataset as temp view (sanitized name), pinned to `as_of`."""
        ds = self.dataset(name)
        df = ds.read(self.spark, as_of)
        if df is None:
            return None
        df.createOrReplaceTempView(self._view_name(name))
        return df

    def register_projection(
        self,
        name: str,
        view_name: str | None = None,
        as_of: str | None = None,
    ) -> DataFrame:
        """Register the dataset's latest-state projection (changelog →
        state by PK) as a view, optionally pinned to a block hash
        (time travel). Reference: get_changelog_projection."""
        ds = self.dataset(name)
        df = ds.read(self.spark, as_of)
        if df is None:
            raise KeyError(f"dataset has no data: {name}")
        pk = self.primary_key_of(ds)
        if pk:
            df = project_changelog(df, pk, ds.vocab)
        df.createOrReplaceTempView(view_name or name)
        return df

    # -- query entry points -------------------------------------------

    def sql(self, statement: str, args: dict | list | None = None) -> DataFrame:
        """Run SQL; any `to_table('name')` calls are rewritten to state-
        projection views registered on the fly; bare dataset names used
        as tables are auto-registered. `args` are Spark parameterized-SQL
        bindings (dict for `:name` markers, list for positional `?`) —
        the prepared-statement path of the Flight SQL surface."""
        return self.sql_with_state(statement, args=args)[0]

    def sql_with_state(
        self,
        statement: str,
        args: dict | list | None = None,
        pins: dict[str, str] | None = None,
    ) -> tuple[DataFrame, list[dict]]:
        """Like :meth:`sql`, but also returns the input state the query
        was served from: one ``{"alias", "blockHash"}`` entry per
        auto-registered dataset — the replay parameters of a query
        commitment (reference: query_types.rs QueryRequest.datasets).
        `pins` maps dataset name → block hash to serve AS-OF that block
        instead of head (commitment replay / time travel)."""
        pins = pins or {}
        for i, (ref, as_of) in enumerate(set(_TO_TABLE_RE.findall(statement))):
            view = f"__to_table_{i}_{re.sub(r'[^A-Za-z0-9_]', '_', ref)}"
            self.register_projection(ref, view, as_of=as_of or None)
            pat = (
                r"to_table\(\s*'" + re.escape(ref) + r"'\s*"
                + (r",\s*'" + re.escape(as_of) + r"'\s*" if as_of else "")
                + r"\)"
            )
            statement = re.sub(pat, view, statement)
        state: list[dict] = []
        referenced = self._referenced_tables(statement)
        for name in self.list_datasets():
            if name not in referenced:
                continue
            pattern = rf"`{re.escape(name)}`|(?<![\w.`-]){re.escape(name)}(?![\w.`-])"
            as_of = pins.get(name)
            if self.register(name, as_of=as_of) is not None:
                statement = re.sub(pattern, self._view_name(name), statement)
                head = self.dataset(name).chain.head()
                state.append(
                    {
                        "alias": name,
                        "blockHash": as_of or (head.block_hash if head else None),
                    }
                )
        if args:
            return self.spark.sql(statement, args=args), state
        return self.spark.sql(statement), state

    def _referenced_tables(self, statement: str) -> set[str]:
        """Table references from Spark's own parser — an AST walk like
        the reference's (query_service_impl.rs:741-808), not a regex
        scan: CTE aliases are excluded, subqueries (scalar/IN/EXISTS/
        lateral) are walked, and dataset names inside string literals or
        column names are NOT false positives. Falls back to a broad
        regex match if the statement doesn't parse (the subsequent
        spark.sql raises the real error either way)."""
        try:
            parser = self.spark._jsparkSession.sessionState().sqlParser()
            plan = parser.parsePlan(statement)
        except Exception:
            return {
                name
                for name in self.list_datasets()
                if re.search(
                    rf"`{re.escape(name)}`|(?<![\w.`-]){re.escape(name)}(?![\w.`-])",
                    statement,
                )
            }
        names: set[str] = set()
        ctes: set[str] = set()

        def walk_plan(node) -> None:
            cls = node.getClass().getSimpleName()
            if cls == "UnresolvedRelation":
                ident = node.multipartIdentifier()
                names.add(".".join(ident.apply(i) for i in range(ident.size())))
            elif cls == "UnresolvedWith":
                rels = node.cteRelations()
                for i in range(rels.size()):
                    ctes.add(rels.apply(i)._1())
            ch = node.children()
            for i in range(ch.size()):
                walk_plan(ch.apply(i))
            exprs = node.expressions()
            for i in range(exprs.size()):
                walk_expr(exprs.apply(i))

        def walk_expr(expr) -> None:
            if expr.getClass().getSimpleName() in (
                "ScalarSubquery",
                "Exists",
                "ListQuery",
                "LateralSubquery",
            ):
                try:
                    walk_plan(expr.plan())
                except Exception:
                    pass
            ch = expr.children()
            for i in range(ch.size()):
                walk_expr(ch.apply(i))

        walk_plan(plan)
        return names - ctes

    def get_data(self, name: str, as_of: str | None = None) -> DataFrame | None:
        return self.register(name, as_of)

    def tail(self, name: str, skip: int = 0, limit: int = 100) -> DataFrame:
        """Last `limit` records by offset (after `skip`), ascending.

        Slice pruning (reference kamu_table.rs:230-295): walk the ledger
        newest-first, take files until the row budget is covered — the
        scan reads O(limit) data no matter how long the history is.
        """
        ds = self.dataset(name)
        budget = skip + limit
        files: list[str] = []
        got = 0
        for d in reversed(ds.chain.data_files()):
            files.append(os.path.join(ds.path, d["path"]))
            got += d["num_records"]
            if got >= budget:
                break
        if not files:
            return self.spark.createDataFrame([], "offset long")
        off = ds.vocab.offset_column
        df = self.spark.read.parquet(*files).orderBy(F.desc(off))
        if skip:
            df = df.offset(skip)
        return df.limit(limit).orderBy(F.asc(off))
