"""One number for the COMPOSED pretrain pipeline (examples/
pretrain_pipeline) at a scaled data dir: quality gate → PII audit →
exact dedup → substring strip → MinHash/LSH near-dup → SemDeDup →
vocab/coverage → split → packing → shuffle manifest, end to end.

Usage: python tools/bench_pipeline.py /tmp/sf10 [substring_min_len]
Prints one JSON line {"sf_dir": ..., "total_sec": ..., "outputs": {...},
"rows": {...}}.

The `kept` frame is persisted before materialization so the shared
dedup lineage runs once (exactly what a real run sinking each stage to
a dataset would do); every result field is then forced through the
noop sink. Total = the one number the 100 TB story wants.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from examples.pretrain_pipeline.pipeline import run_pipeline
from kamu_cli_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    min_len = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark(app_name="bench-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # embeddings are keyed vec_id; the pipeline dedups them by doc id
    emb = emb.withColumnRenamed("vec_id", "doc_id")
    # the SemDeDup operating point the operator documents: constant
    # cluster size via k ≈ n/300 (k=8 pinned only in the graded oracle)
    sem_k = max(8, emb.count() // 300)

    t0 = time.time()
    res = run_pipeline(
        spark,
        docs,
        embeddings=emb,
        substring_min_len=min_len,
        sem_k=sem_k,
    )
    res.kept.persist()
    outputs: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in (
        "kept",
        "quality",
        "pii",
        "exact_groups",
        "near_clusters",
        "semantic",
        "vocab",
        "coverage",
        "split_sizes",
        "packed",
        "shuffle",
    ):
        df = getattr(res, name)
        if df is None:
            continue
        t = time.time()
        df.write.format("noop").mode("overwrite").save()
        outputs[name] = round(time.time() - t, 2)
        rows[name] = df.count() if name in ("kept", "packed", "shuffle") else -1
    total = round(time.time() - t0, 2)
    res.kept.unpersist()
    print(json.dumps({
        "sf_dir": sf_dir,
        "substring_min_len": min_len,
        "sem_k": sem_k,
        "total_sec": total,
        "outputs": outputs,
        "rows": {k: v for k, v in rows.items() if v >= 0},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
