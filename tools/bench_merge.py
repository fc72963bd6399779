"""Merge-operator micro-benchmarks at the reference's scale.

Mirrors the three criterion benches the reference ships
(BASELINE.md; src/infra/ingest-datafusion/benches/):

1. snapshot: 1,000,000-row prev state; new snapshot with 100k removed,
   200k changed, 100k added → expect 600,000 change events;
2. ledger: 1,000,000 prev + 500,000 new with 100,000 overlap →
   400,000 appended;
3. project: changelog→state projection over 1,000,000 rows,
   composite PK.

Prints one JSON line with seconds per workload and rows/s.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from kamu_cli_spark.operators import (  # noqa: E402
    MergeStrategyLedger,
    MergeStrategySnapshot,
    project_changelog,
)
from kamu_cli_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="merge-bench")
    N = 1_000_000
    times: dict[str, float] = {}

    # JVM/shuffle warmup so workloads measure steady state
    spark.range(N).groupBy((F.col("id") % 100).alias("k")).count().write.mode(
        "overwrite"
    ).format("noop").save()

    # --- snapshot CDC diff -------------------------------------------
    prev = spark.range(N).select(
        F.col("id").alias("offset"),
        F.lit(0).cast("int").alias("op"),
        F.col("id").alias("pk1"),
        (F.col("id") % 1000).alias("pk2"),
        (F.col("id") * 2).alias("cmp1"),
        (F.col("id") % 97).cast("double").alias("cmp2"),
    )
    new = (
        spark.range(N)
        .filter(F.col("id") >= 100_000)  # 100k removed
        .select(
            F.col("id").alias("pk1"),
            (F.col("id") % 1000).alias("pk2"),
            F.when(F.col("id") < 300_000, F.col("id") * 2 + 1)
            .otherwise(F.col("id") * 2)
            .alias("cmp1"),  # 200k changed
            (F.col("id") % 97).cast("double").alias("cmp2"),
        )
        .unionByName(
            spark.range(N, N + 100_000).select(  # 100k added
                F.col("id").alias("pk1"),
                (F.col("id") % 1000).alias("pk2"),
                (F.col("id") * 2).alias("cmp1"),
                F.lit(0.0).alias("cmp2"),
            )
        )
    )
    strat = MergeStrategySnapshot(["pk1", "pk2"])
    t0 = time.time()
    n_events = strat.merge(prev, new).count()
    times["snapshot_1m"] = round(time.time() - t0, 3)
    assert n_events == 600_000, n_events

    # --- ledger anti-join dedup --------------------------------------
    prev_l = spark.range(N).select(
        F.col("id").alias("offset"),
        F.lit(0).cast("int").alias("op"),
        F.col("id").alias("pk"),
        (F.col("id") % 13).alias("v"),
    )
    new_l = spark.range(N - 100_000, N + 400_000).select(
        F.col("id").alias("pk"), (F.col("id") % 13).alias("v")
    )
    t0 = time.time()
    n_appended = MergeStrategyLedger(["pk"]).merge(prev_l, new_l).count()
    times["ledger_1m"] = round(time.time() - t0, 3)
    assert n_appended == 400_000, n_appended

    # --- changelog → state projection --------------------------------
    ledger = spark.range(N).select(
        F.col("id").alias("offset"),
        (F.col("id") % 10 == 9).cast("int").alias("op"),
        (F.col("id") % 250_000).alias("pk1"),
        (F.col("id") % 7).alias("pk2"),
        (F.col("id") * 3).alias("cmp1"),
    )
    t0 = time.time()
    n_state = project_changelog(ledger, ["pk1", "pk2"]).count()
    times["project_1m"] = round(time.time() - t0, 3)

    print(
        json.dumps(
            {
                "metric": "merge_micro_benchmarks",
                "unit": "sec",
                "workloads": times,
                "rows_per_sec": {
                    "snapshot_1m": round((N + 1_000_000) / times["snapshot_1m"]),
                    "ledger_1m": round(1_500_000 / times["ledger_1m"]),
                    "project_1m": round(N / times["project_1m"]),
                },
                "events": {"snapshot": n_events, "ledger": n_appended, "project_state": n_state},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
