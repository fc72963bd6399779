"""Mqtt and EthereumLogs fetch steps driven through injected
client/transport fakes (no broker / node in this environment; the
protocol logic — bounded drain, block-cursor resume, pagination,
data-less cursor advance — is what's under test).

Reference semantics: fetch_service/mqtt.rs, fetch_service/evm.rs.
"""

from __future__ import annotations

import json

import pytest

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyLedger
from kamu_cli_spark.sources.fetch import (
    fetch_ethereum_logs,
    fetch_mqtt,
    ingest_ethereum_logs,
)


class FakeMqttClient:
    def __init__(self, messages):
        self.messages = list(messages)
        self.subscribed = None
        self.closed = False

    def connect(self, host, port, username, password):
        self.conn = (host, port, username, password)

    def subscribe(self, topics):
        self.subscribed = topics

    def poll(self, timeout):
        return self.messages.pop(0) if self.messages else None

    def close(self):
        self.closed = True


def test_fetch_mqtt_bounded_drain(tmp_path):
    msgs = [
        ("sensors/a", b'{"k": "a", "v": 1}'),
        ("sensors/b", b'{"k": "b", "v": 2}\n'),
    ]
    client = FakeMqttClient(msgs)
    staging = str(tmp_path / "mqtt.ndjson")
    path, state = fetch_mqtt(staging, topics=["sensors/#"], client=client)
    assert path == staging and state == {"kind": "mqtt"}
    assert client.subscribed == ["sensors/#"] and client.closed
    lines = open(staging).read().splitlines()
    assert [json.loads(ln)["k"] for ln in lines] == ["a", "b"]

    # idle broker → up-to-date poll
    path2, _ = fetch_mqtt(str(tmp_path / "m2"), client=FakeMqttClient([]))
    assert path2 is None


def test_fetch_mqtt_max_messages(tmp_path):
    client = FakeMqttClient([("t", b"{}")] * 50)
    path, _ = fetch_mqtt(str(tmp_path / "m"), client=client, max_messages=10)
    assert len(open(path).read().splitlines()) == 10


class FakeEthNode:
    """Two-block-page chain with logs on specific blocks."""

    def __init__(self, head, logs_by_block):
        self.head = head
        self.logs_by_block = logs_by_block
        self.getlogs_calls = []

    def __call__(self, method, params):
        if method == "eth_blockNumber":
            return hex(self.head)
        if method == "eth_getLogs":
            flt = params[0]
            self.getlogs_calls.append(flt)
            lo, hi = int(flt["fromBlock"], 16), int(flt["toBlock"], 16)
            out = []
            for b, logs in self.logs_by_block.items():
                if lo <= b <= hi:
                    for i, log in enumerate(logs):
                        out.append(
                            {
                                "blockNumber": hex(b),
                                "blockHash": f"0xb{b:02x}",
                                "transactionIndex": "0x0",
                                "transactionHash": log.get(
                                    "transactionHash", f"0xt{b:02x}{i:02x}"
                                ),
                                "logIndex": hex(i),
                                "address": log["address"],
                                "topics": log.get("topics", []),
                                "data": log.get("data", "0x"),
                            }
                        )
            return out
        raise AssertionError(f"unexpected method {method}")


def test_fetch_ethereum_logs_pagination_and_resume(tmp_path):
    node = FakeEthNode(
        head=4500,
        logs_by_block={
            10: [{"address": "0xaaa", "topics": ["0xt0"], "data": "0x01"}],
            2500: [{"address": "0xbbb", "topics": ["0xt1"], "data": "0x02"}],
        },
    )
    staging = str(tmp_path / "logs.ndjson")
    path, state = fetch_ethereum_logs(staging, rpc=node, block_page=2000)
    assert path == staging
    assert state == {"kind": "ethereum_logs", "last_seen_block": 4500}
    # paginated into [0,1999], [2000,3999], [4000,4500]
    assert len(node.getlogs_calls) == 3
    recs = [json.loads(ln) for ln in open(staging)]
    assert [r["block_number"] for r in recs] == [10, 2500]
    assert recs[0]["topic0"] == "0xt0"

    # resume: nothing new → no staging, cursor unchanged
    path2, state2 = fetch_ethereum_logs(
        str(tmp_path / "l2"), rpc=node, source_state=state
    )
    assert path2 is None and state2["last_seen_block"] == 4500

    # chain advances with no logs → cursor still moves
    node.head = 5000
    path3, state3 = fetch_ethereum_logs(
        str(tmp_path / "l3"), rpc=node, source_state=state, block_page=2000
    )
    assert path3 is None and state3["last_seen_block"] == 5000


def test_fetch_ethereum_confirmations(tmp_path):
    node = FakeEthNode(head=100, logs_by_block={})
    _, state = fetch_ethereum_logs(
        str(tmp_path / "l"), rpc=node, confirmations=12
    )
    assert state["last_seen_block"] == 88


def test_ingest_ethereum_logs_end_to_end(spark, tmp_path):
    node = FakeEthNode(
        head=10,
        logs_by_block={5: [{"address": "0xaaa", "topics": ["0xt"], "data": "0x01"}]},
    )
    ds = Dataset.create(str(tmp_path), "evm")
    strat = MergeStrategyLedger(["block_number", "log_index"])
    ev = ingest_ethereum_logs(spark, ds, strat, rpc=node)
    assert ev["new_data"]["num_records"] == 1
    assert ds.read(spark).count() == 1

    # idle chain → None, no new block
    assert ingest_ethereum_logs(spark, ds, strat, rpc=node) is None

    # chain advances, no logs → data-less cursor advance
    node.head = 20
    ev2 = ingest_ethereum_logs(spark, ds, strat, rpc=node)
    assert ev2["new_data"] is None
    assert ev2["source_state"]["last_seen_block"] == 20

    # new log appears → only the new range is scanned
    node.logs_by_block[25] = [{"address": "0xccc", "topics": [], "data": "0x"}]
    node.head = 30
    n_calls = len(node.getlogs_calls)
    ev3 = ingest_ethereum_logs(spark, ds, strat, rpc=node)
    assert ev3["new_data"]["num_records"] == 1
    assert int(node.getlogs_calls[n_calls]["fromBlock"], 16) == 21
    ds.chain.verify()
