"""End-to-end port of the reference's reth-vs-snp500 example
(examples/reth/*): EthereumLogs ingestion with SQL ABI decode →
mint/burn union → cumulative per-holder portfolio → USD pricing via a
temporal as-of join — driven by a fake JSON-RPC node."""

from __future__ import annotations

import os
from datetime import datetime, timezone

import yaml

from kamu_cli_spark.dataset import Dataset
from kamu_cli_spark.operators import MergeStrategyAppend, MergeStrategyLedger
from kamu_cli_spark.sources.fetch import ingest_ethereum_logs
from kamu_cli_spark.transform import (
    StatefulTransformExecutor,
    TransformExecutor,
    make_transform_executor,
    set_transform,
)
from kamu_cli_spark.writer import DataWriter

from tests.test_fetch_mqtt_evm import FakeEthNode

EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
T0 = datetime(2024, 1, 5, tzinfo=timezone.utc)
DAY = 86400
JAN1 = 1704067200  # 2024-01-01T00:00:00Z


def w256(n: int) -> str:
    return format(n, "064x")


def topic_addr(addr: str) -> str:
    return "0x" + "0" * 24 + addr[2:]


def mint_log(tx: int, holder: str, amount_eth: float, t_unix: int) -> dict:
    wei = int(amount_eth * 10**18)
    return {
        "address": "0xae78736cd615f374d3085123a210448e74fc6393",
        "transactionHash": f"0xtx{tx:04x}",
        "topics": ["0xminted", topic_addr(holder)],
        # data = amount, ethAmount, time (3 x 32-byte words)
        "data": "0x" + w256(wei) + w256(wei) + w256(t_unix),
    }


def _add_from_manifest(ws, fname):
    m = yaml.safe_load(open(os.path.join(EXAMPLES, "reth", fname)))
    ds = Dataset.create(ws, m["name"], kind=m.get("kind", "Root"),
                        system_time=T0.isoformat())
    ev = {"kind": "SetPollingSource", "merge": m.get("merge") or {"kind": "append"}}
    if m.get("preprocess"):
        ev["preprocess"] = m["preprocess"]
    if m["kind"] == "Root":
        ds.chain.append(ev, system_time=T0.isoformat())
    else:
        set_transform(
            ds,
            {a: os.path.join(ws, r) for a, r in m["inputs"].items()},
            m["queries"],
            system_time=T0.isoformat(),
            temporal_tables=m.get("temporal_tables"),
            executor=m.get("executor"),
        )
    return ds, m


def test_reth_pipeline(spark, tmp_path):
    ws = str(tmp_path)
    minted, m_mint = _add_from_manifest(ws, "tokens-minted.yaml")
    burned, m_burn = _add_from_manifest(ws, "tokens-burned.yaml")
    ethusd, _ = _add_from_manifest(ws, "eth-usd.yaml")
    mb, _ = _add_from_manifest(ws, "mint-burn.yaml")
    pf, _ = _add_from_manifest(ws, "portfolio.yaml")
    pfu, _ = _add_from_manifest(ws, "portfolio-usd.yaml")

    alice, bob = "0x" + "aa" * 20, "0x" + "bb" * 20
    # block 100 (Jan 1): alice mints 2 rETH; block 150 (Jan 2): bob 1.5
    mint_node = FakeEthNode(
        head=200,
        logs_by_block={
            100: [mint_log(1, alice, 2.0, JAN1)],
            150: [mint_log(2, bob, 1.5, JAN1 + DAY)],
        },
    )
    ev = ingest_ethereum_logs(
        spark, minted, MergeStrategyAppend(minted.vocab),
        rpc=mint_node, preprocess=m_mint["preprocess"],
        filter_address=m_mint["fetch"]["filter_address"],
    )
    assert ev["new_data"]["num_records"] == 2
    # block 180 (Jan 3): alice burns 0.5
    burn_node = FakeEthNode(
        head=200,
        logs_by_block={180: [mint_log(3, alice, 0.5, JAN1 + 2 * DAY)]},
    )
    ingest_ethereum_logs(
        spark, burned, MergeStrategyAppend(burned.vocab),
        rpc=burn_node, preprocess=m_burn["preprocess"],
    )

    # daily candles (ledger root)
    d = lambda day: datetime(2024, 1, day, tzinfo=timezone.utc)  # noqa: E731
    DataWriter(ethusd, MergeStrategyLedger(["event_time", "symbol"])).write(
        spark,
        spark.createDataFrame(
            [(d(1), "eth-usd", 2000.0), (d(2), "eth-usd", 2100.0),
             (d(3), "eth-usd", 2200.0)],
            "event_time timestamp, symbol string, close double",
        ),
        system_time=T0,
    )

    TransformExecutor(mb).execute(spark, system_time=T0)
    ex = make_transform_executor(pf)
    assert isinstance(ex, StatefulTransformExecutor)
    ex.execute(spark, system_time=T0)
    TransformExecutor(pfu).execute(spark, system_time=T0)

    rows = {
        (r["holder"], r["amount"], r["token_balance"], r["eth_amount_usd"])
        for r in pfu.read(spark).collect()
    }
    assert rows == {
        (alice, 2.0, 2.0, 2.0 * 2000.0),    # Jan-1 mint at Jan-1 close
        (bob, 1.5, 1.5, 1.5 * 2100.0),      # Jan-2 mint at Jan-2 close
        (alice, -0.5, 1.5, -0.5 * 2200.0),  # Jan-3 burn at Jan-3 close
    }

    # incremental: a later mint lands in a new block range; the cursor
    # resumes and downstream appends exactly one priced row
    mint_node.head = 300
    mint_node.logs_by_block[250] = [mint_log(4, bob, 0.25, JAN1 + 2 * DAY)]
    ev2 = ingest_ethereum_logs(
        spark, Dataset(os.path.join(ws, "tokens-minted")),
        MergeStrategyAppend(minted.vocab),
        rpc=mint_node, preprocess=m_mint["preprocess"],
    )
    assert ev2["new_data"]["num_records"] == 1
    TransformExecutor(Dataset(os.path.join(ws, "mint-burn"))).execute(
        spark, system_time=T0
    )
    make_transform_executor(Dataset(os.path.join(ws, "portfolio"))).execute(
        spark, system_time=T0
    )
    TransformExecutor(Dataset(os.path.join(ws, "portfolio-usd"))).execute(
        spark, system_time=T0
    )
    out = Dataset(os.path.join(ws, "portfolio-usd")).read(spark)
    assert out.count() == 4
    (new_row,) = out.filter("transaction_hash = '0xtx0004'").collect()
    assert new_row["token_balance"] == 1.75 and new_row["eth_amount_usd"] == 0.25 * 2200.0
