"""GraphQL data API — the reference's GraphQL query surface
(SURVEY.md §2.8; adapter/graphql/src/queries/datasets/*):

- ``datasets.list`` / ``byName`` / ``byId``
  (datasets.rs);
- ``dataset.data.tail`` / ``.query`` (dataset_data.rs:69-95);
- ``dataset.metadata`` — the metadata chain (blockCount / blocks /
  blockByHash, metadata_chain.rs:48-130), current SetInfo / SetLicense
  / readme / schema / vocab / transform projections
  (dataset_metadata.rs:204-325), and upstream/downstream dependencies
  (dataset_metadata.rs:147-202) resolved through
  :mod:`kamu_cli_spark.provenance`;
- ``dataset.lineage`` — the full recursive input tree;
- ``search.query`` — paginated dataset search (search.rs:29-80):
  lowercased substring match on names, extended to SetInfo
  description/keywords.

Built on graphql-core: schema-first SDL + object resolvers. Row data
and event payloads return as JSON-encoded strings, mirroring the
reference's JSON data formats.
"""

from __future__ import annotations

import json

from graphql import build_schema, graphql_sync
from pyspark.sql import SparkSession

SDL = """
type Query {
  datasets: Datasets!
  search: Search!
}

type Search {
  query(query: String!, page: Int = 0, perPage: Int = 15): SearchResultConnection!
}

type SearchResultConnection {
  nodes: [Dataset!]!
  totalCount: Int!
  pageInfo: PageInfo!
}

type PageInfo {
  hasPreviousPage: Boolean!
  hasNextPage: Boolean!
  currentPage: Int!
  totalPages: Int!
}

type Datasets {
  list: [String!]!
  byName(name: String!): Dataset
  byId(id: String!): Dataset
}

type Dataset {
  id: String!
  name: String!
  kind: String!
  numBlocks: Int!
  numRecords: Int!
  watermark: String
  head: String
  data: DataQueries!
  metadata: DatasetMetadata!
  lineage: LineageNode!
}

type DataQueries {
  tail(limit: Int = 10, skip: Int = 0): String!
  query(sql: String!, limit: Int = 1000): String!
}

type DatasetMetadata {
  chain: MetadataChain!
  eventKinds: [String!]!
  currentInfo: SetInfo
  currentLicense: SetLicense
  currentReadme: String
  currentSchema: String
  currentVocab: String
  currentTransform: String
  currentPollingSource: String
  currentWatermark: String
  currentUpstreamDependencies: [LineageNode!]!
  currentDownstreamDependencies: [String!]!
}

type MetadataChain {
  blockCount: Int!
  blocks(kind: String, limit: Int = 100): [MetadataBlock!]!
  blockByHash(hash: String!): MetadataBlock
}

type MetadataBlock {
  hash: String!
  prevHash: String
  sequenceNumber: Int!
  systemTime: String!
  eventKind: String!
  event: String!
}

type SetInfo {
  description: String
  keywords: [String!]
}

type SetLicense {
  shortName: String
  name: String
  spdxId: String
  websiteUrl: String
}

type LineageNode {
  name: String!
  kind: String!
  alias: String
  cycle: Boolean
  inputs: [LineageNode!]!
}
"""


def _json_str(obj) -> str | None:
    return None if obj is None else json.dumps(obj)


def _event_payload(block) -> dict:
    return {k: v for k, v in block.event.items() if k != "kind"}


class _DataQueries:
    def __init__(self, qs, name: str):
        self._qs = qs
        self._name = name

    def tail(self, info, limit: int = 10, skip: int = 0) -> str:
        df = self._qs.tail(self._name, skip=skip, limit=limit)
        return json.dumps(
            [{c: str(v) for c, v in r.asDict().items()} for r in df.collect()]
        )

    def query(self, info, sql: str, limit: int = 1000) -> str:
        df = self._qs.sql(sql)
        return json.dumps(
            [
                {c: (v if isinstance(v, (int, float, str, bool, type(None))) else str(v))
                 for c, v in r.asDict().items()}
                for r in df.limit(limit).collect()
            ]
        )


class _Block:
    def __init__(self, block):
        self.hash = block.block_hash
        self.prevHash = block.prev_block_hash
        self.sequenceNumber = block.sequence_number
        self.systemTime = block.system_time
        self.eventKind = block.event["kind"]
        self.event = json.dumps(_event_payload(block))


class _Chain:
    def __init__(self, ds):
        self._ds = ds

    def blockCount(self, info):
        return len(self._ds.chain)

    def blocks(self, info, kind: str | None = None, limit: int = 100):
        out = []
        # newest first, like the reference's chain pagination
        for b in reversed(self._ds.chain.blocks()):
            if kind is not None and b.event["kind"] != kind:
                continue
            out.append(_Block(b))
            if len(out) >= limit:
                break
        return out

    def blockByHash(self, info, hash: str):
        for b in self._ds.chain.blocks():
            if b.block_hash == hash:
                return _Block(b)
        return None


class _SetInfo:
    def __init__(self, ev: dict):
        self.description = ev.get("description")
        self.keywords = ev.get("keywords")


class _SetLicense:
    def __init__(self, ev: dict):
        self.shortName = ev.get("short_name")
        self.name = ev.get("name")
        self.spdxId = ev.get("spdx_id")
        self.websiteUrl = ev.get("website_url")


class _Lineage:
    def __init__(self, node: dict):
        self.name = node["name"]
        self.kind = node["kind"]
        self.alias = node.get("alias")
        self.cycle = node.get("cycle")
        self.inputs = [_Lineage(i) for i in node.get("inputs", [])]


class _Metadata:
    def __init__(self, qs, name: str, ds):
        self._qs = qs
        self._name = name
        self._ds = ds

    def chain(self, info):
        return _Chain(self._ds)

    def eventKinds(self, info):
        return [b.event["kind"] for b in self._ds.chain.blocks()]

    def _last(self, kind: str):
        b = self._ds.chain.last_event(kind)
        return None if b is None else _event_payload(b)

    def currentInfo(self, info):
        ev = self._last("SetInfo")
        return None if ev is None else _SetInfo(ev)

    def currentLicense(self, info):
        ev = self._last("SetLicense")
        return None if ev is None else _SetLicense(ev)

    def currentReadme(self, info):
        ev = self._last("SetInfo")
        return None if ev is None else ev.get("readme")

    def currentSchema(self, info):
        return _json_str(self._ds.schema_event())

    def currentVocab(self, info):
        return _json_str(self._last("SetVocab"))

    def currentTransform(self, info):
        return _json_str(self._last("SetTransform"))

    def currentPollingSource(self, info):
        return _json_str(self._last("SetPollingSource"))

    def currentWatermark(self, info):
        return self._ds.chain.current_watermark()

    def currentUpstreamDependencies(self, info):
        from kamu_cli_spark.provenance import lineage

        tree = lineage(self._qs.workspace, self._name)
        return [_Lineage(i) for i in tree["inputs"]]

    def currentDownstreamDependencies(self, info):
        from kamu_cli_spark.provenance import downstream

        return downstream(self._qs.workspace, self._name)


class _Dataset:
    def __init__(self, qs, name: str):
        self._qs = qs
        self.name = name
        self._ds = qs.dataset(name)

    @property
    def kind(self):
        return self._ds.kind

    def id(self, info):
        seed = self._ds.chain.last_event("Seed")
        return seed.event["dataset_id"] if seed else ""

    def numBlocks(self, info):
        return len(self._ds.chain)

    def numRecords(self, info):
        return sum(d["num_records"] for d in self._ds.chain.data_files())

    def watermark(self, info):
        return self._ds.chain.current_watermark()

    def head(self, info):
        return self._ds.head_hash()

    def data(self, info):
        return _DataQueries(self._qs, self.name)

    def metadata(self, info):
        return _Metadata(self._qs, self.name, self._ds)

    def lineage(self, info):
        from kamu_cli_spark.provenance import lineage

        return _Lineage(lineage(self._qs.workspace, self.name))


class _Datasets:
    def __init__(self, qs):
        self._qs = qs

    def list(self, info):
        return self._qs.list_datasets()

    def byName(self, info, name: str):
        try:
            return _Dataset(self._qs, name)
        except KeyError:
            return None

    def byId(self, info, id: str):
        for name in self._qs.list_datasets():
            ds = self._qs.dataset(name)
            seed = ds.chain.last_event("Seed")
            if seed and seed.event.get("dataset_id") == id:
                return _Dataset(self._qs, name)
        return None


class _PageInfo:
    def __init__(self, page: int, total_pages: int):
        self.hasPreviousPage = page > 0
        self.hasNextPage = page + 1 < total_pages
        self.currentPage = page
        self.totalPages = total_pages


class _SearchConnection:
    def __init__(self, qs, names: list[str], page: int, per_page: int):
        self._qs = qs
        self._names = names
        self._page = page
        self._per = per_page

    def totalCount(self, info):
        return len(self._names)

    def pageInfo(self, info):
        total_pages = max(1, -(-len(self._names) // self._per))
        return _PageInfo(self._page, total_pages)

    def nodes(self, info):
        lo = self._page * self._per
        return [_Dataset(self._qs, n) for n in self._names[lo : lo + self._per]]


class _Search:
    """Dataset search mirroring the reference's single-input heuristic
    endpoint (adapter/graphql/src/queries/search.rs:29-80): the query
    string is lowercased and substring-matched against dataset names —
    extended here to SetInfo description/keywords, since the metadata
    chain is local — with page/perPage pagination (default 15/page)."""

    def __init__(self, qs):
        self._qs = qs

    def _matches(self, name: str, q: str) -> bool:
        if q in name.lower():
            return True
        ds = self._qs.dataset(name)
        info = ds.chain.last_event("SetInfo")
        if not info:
            return False
        ev = info.event
        if q in (ev.get("description") or "").lower():
            return True
        return any(q in kw.lower() for kw in ev.get("keywords") or [])

    def query(self, info, query: str, page: int = 0, perPage: int = 15):
        q = query.lower()
        names = [
            n
            for n in sorted(self._qs.list_datasets())
            if self._matches(n, q)
        ]
        return _SearchConnection(self._qs, names, page, perPage)


class _Root:
    def __init__(self, qs):
        self._qs = qs

    def datasets(self, info):
        return _Datasets(self._qs)

    def search(self, info):
        return _Search(self._qs)


def execute_graphql(spark: SparkSession, workspace: str, query: str) -> dict:
    """Run a GraphQL query against the workspace; returns
    {"data": ..., "errors": [...]}."""
    from kamu_cli_spark.query import QueryService

    schema = build_schema(SDL)
    result = graphql_sync(schema, query, root_value=_Root(QueryService(spark, workspace)))
    out: dict = {"data": result.data}
    if result.errors:
        out["errors"] = [e.message for e in result.errors]
    return out
