"""TRUE cross-process chain storm — the thread storms
(test_chain_stress.py, test_streaming_storm.py) exercise the same
lockfile/CAS primitives, but threads share a GIL and an in-memory
chain object; separate OS processes are the deployment reality the
O_EXCL lockfile exists for. Metadata-only (no Spark), so dozens of
processes interleave appends, truncations, and compaction-style
tmp+os.replace rebuilds in seconds."""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

from kamu_cli_spark.ledger import MetadataChain

T0 = datetime(2024, 1, 1, tzinfo=timezone.utc).isoformat()

WORKER = r"""
import json, os, random, sys
sys.path.insert(0, {repo!r})
from kamu_cli_spark.ledger import MetadataChain
from kamu_cli_spark.ledger.chain import ChainIntegrityError

path, seed = sys.argv[1], int(sys.argv[2])
rng = random.Random(seed)
ok = races = 0
for step in range(30):
    chain = MetadataChain(path)  # fresh read every op — maybe stale
    op = rng.choice(["append", "append", "append", "truncate", "rebuild"])
    try:
        if op == "append":
            start = chain.next_offset()
            chain.append({{
                "kind": "AddData",
                "new_data": {{
                    "path": f"data/{{seed}}-{{step}}.parquet",
                    "offset_interval": {{"start": start, "end": start}},
                    "num_records": 1,
                }},
            }})
            ok += 1
        elif op == "truncate":
            blocks = chain.blocks()
            if len(blocks) > 2:
                chain.truncate_to(
                    blocks[-2].block_hash,
                    expect_head=blocks[-1].block_hash,
                )
                ok += 1
        else:
            # compaction-style rebuild: snapshot, re-chain under the
            # lock with an expect-head CAS, tmp + os.replace swap
            old = chain.blocks()
            if len(old) < 3:
                continue
            lock = chain._acquire_lock()
            try:
                chain._reload_if_stale()
                head = chain.head()
                if head is None or head.block_hash != old[-1].block_hash:
                    races += 1
                    continue
                tmp = path + f".rb{{seed}}"
                if os.path.exists(tmp):
                    os.remove(tmp)
                nc = MetadataChain(tmp)
                for b in old:
                    nc._append_locked(b.event, system_time=b.system_time)
                nc.verify()
                os.replace(tmp, path)
                ok += 1
            finally:
                os.remove(lock)
    except ChainIntegrityError as e:
        msg = str(e)
        if (
            "offsets not contiguous" in msg
            or "system_time regression" in msg
            or "head mismatch" in msg
            or "could not acquire" in msg
        ):
            races += 1  # lost a cross-process race — expected
        else:
            print(json.dumps({{"error": f"{{seed}}/{{step}}/{{op}}: {{msg}}"}}))
            sys.exit(1)
print(json.dumps({{"ok": ok, "races": races}}))
"""


def test_cross_process_chain_storm(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = str(tmp_path / "metadata.jsonl")
    chain = MetadataChain(path)
    chain.append({"kind": "Seed", "dataset_id": "storm"}, system_time=T0)

    script = WORKER.format(repo=repo)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", script, path, str(seed)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for seed in range(8)
    ]
    results = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, (out, err)
        results.append(json.loads(out.strip().splitlines()[-1]))

    # someone made real progress, and every invariant held at the end
    assert sum(r["ok"] for r in results) > 20, results
    final = MetadataChain(path)
    final.verify()
    assert final.blocks()[0].event["kind"] == "Seed"
    # offsets dense across whatever survived the storm
    expect = 0
    for d in final.data_files():
        assert d["offset_interval"]["start"] == expect
        expect = d["offset_interval"]["end"] + 1
