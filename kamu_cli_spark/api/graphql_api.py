"""GraphQL data API — the reference's GraphQL query surface
(SURVEY.md §2.8; adapter/graphql/src/queries/datasets/dataset_data.rs:
`datasets.byName(...).data.tail(...)` and `.data.query(...)`).

Built on graphql-core: schema-first SDL + object resolvers. Row data
returns as a JSON-encoded string field (AoS), mirroring the
reference's JSON data formats.
"""

from __future__ import annotations

import json

from graphql import build_schema, graphql_sync
from pyspark.sql import SparkSession

SDL = """
type Query {
  datasets: Datasets!
}

type Datasets {
  list: [String!]!
  byName(name: String!): Dataset
}

type Dataset {
  name: String!
  kind: String!
  numBlocks: Int!
  numRecords: Int!
  watermark: String
  data: DataQueries!
  metadata: [String!]!
}

type DataQueries {
  tail(limit: Int = 10, skip: Int = 0): String!
  query(sql: String!, limit: Int = 1000): String!
}
"""


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


class _Dataset:
    def __init__(self, qs, name: str):
        self._qs = qs
        self.name = name
        self._ds = qs.dataset(name)

    @property
    def kind(self):
        return self._ds.kind

    def numBlocks(self, info):
        return len(self._ds.chain)

    def numRecords(self, info):
        return sum(d["num_records"] for d in self._ds.chain.data_files())

    def watermark(self, info):
        return self._ds.chain.current_watermark()

    def data(self, info):
        return _DataQueries(self._qs, self.name)

    def metadata(self, info):
        return [b.event["kind"] for b in self._ds.chain.blocks()]


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


class _Root:
    def __init__(self, qs):
        self._qs = qs

    def datasets(self, info):
        return _Datasets(self._qs)


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
